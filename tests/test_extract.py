"""PDF extraction plumbing tests (SRC3): generated PDF round-trip."""

from calculate_file_content_size_for_vector_db_spark.sources.extract import (
    extract_pages,
    extract_pdf_text,
    make_simple_pdf,
)


def test_roundtrip_local():
    pages = ["hello world page one", "page two (with parens) and \\backslash"]
    data = make_simple_pdf(pages)
    assert data.startswith(b"%PDF-")
    assert extract_pdf_text(data) == pages


def test_distributed_extraction(spark):
    rows = [
        ("a.pdf", make_simple_pdf(["alpha", "beta"])),
        ("b.pdf", make_simple_pdf(["gamma"])),
    ]
    files = spark.createDataFrame(rows, "path string, content binary")
    out = {
        (r.path, r.page_number): (r.page_text, r.n_pages)
        for r in extract_pages(files).collect()
    }
    assert out[("a.pdf", 0)] == ("alpha", 2)
    assert out[("a.pdf", 1)] == ("beta", 2)
    assert out[("b.pdf", 0)] == ("gamma", 1)
