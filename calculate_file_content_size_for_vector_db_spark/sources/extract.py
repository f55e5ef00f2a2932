"""SRC3: PDF -> per-page text, as distributed mapInPandas plumbing
(SURVEY.md section 2.1 SRC3; reference pdf_reader.py:442-443 uses
langchain's PyPDFLoader driver-side per process).

Spark-first shape: the `binaryFile` scan yields (path, content bytes);
``extract_pages`` fans each file out to one row PER PAGE. That page-row
granularity is what kills the reference's skew problem (one 1,652-page
file pinning a worker, README.md:20): downstream chunking/aggregation
re-parallelizes over pages, and AQE rebalances the post-extract shuffle.

Parsing backend: pypdf when importable (not in this container). The
fallback is a minimal parser for the uncompressed single-stream PDFs
produced by ``make_simple_pdf`` — it keeps the distributed plumbing
(schema, Arrow batching, page fan-out) real and testable without the
binary dependency; arbitrary real-world PDFs need pypdf.
"""

from __future__ import annotations

import io
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:
    import pypdf  # optional extra

    HAVE_PYPDF = True
except ImportError:
    HAVE_PYPDF = False

PAGE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("page_number", IntegerType()),
        StructField("page_text", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("file_size", LongType()),
    ]
)


def _escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _unescape_pdf_string(s: str) -> str:
    return s.replace(r"\(", "(").replace(r"\)", ")").replace(r"\\", "\\")


def make_simple_pdf(pages: list[str]) -> bytes:
    """Deterministic, uncompressed, single-font PDF — one Tj text run
    per page. ASCII-safe payloads only (non-ASCII is dropped)."""
    objects: list[bytes] = []
    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    for i, text in enumerate(pages):
        page_obj = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R /Resources << /Font << /F1 "
            f"{3 + 2 * n} 0 R >> >> >>"
        )
        objects.append(page_obj.encode())
        payload = _escape_pdf_string(text.encode("ascii", "ignore").decode("ascii"))
        stream = f"BT /F1 12 Tf 72 720 Td ({payload}) Tj ET".encode()
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objects, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(obj)
        out.write(b"\nendobj\n")
    xref_at = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objects) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(b"%010d 00000 n \n" % off)
    out.write(
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return out.getvalue()


_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)


def _extract_pages_fallback(data: bytes) -> list[str]:
    pages = []
    for m in _STREAM_RE.finditer(data):
        texts = [
            _unescape_pdf_string(t.decode("latin-1")) for t in _TJ_RE.findall(m.group(1))
        ]
        pages.append(" ".join(texts))
    return pages


def extract_pdf_text(data: bytes) -> list[str]:
    """One string per page."""
    if HAVE_PYPDF:
        reader = pypdf.PdfReader(io.BytesIO(data))
        return [p.extract_text() or "" for p in reader.pages]
    return _extract_pages_fallback(data)


def extract_pages(files: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """binaryFile rows -> one row per page (path, page_number 0-based,
    page_text, n_pages, file_size). Arrow-batched per partition."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for path, content in zip(pdf_batch[path_col], pdf_batch[content_col]):
                data = bytes(content)
                pages = extract_pdf_text(data)
                for i, text in enumerate(pages):
                    rows.append((path, i, text, len(pages), len(data)))
            yield pd.DataFrame(rows, columns=[f.name for f in PAGE_SCHEMA.fields])

    from calculate_file_content_size_for_vector_db_spark.partitioning import spread

    return spread(files.select(path_col, content_col)).mapInPandas(_extract, PAGE_SCHEMA)


def text_to_pdf_udf(first_page_chars: int = 100):
    """Pandas UDF: text column -> deterministic 2-page PDF bytes (test
    harness for the extraction plumbing when no real PDFs exist)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def to_pdf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: make_simple_pdf([t[:first_page_chars], t[first_page_chars:]])
        )

    return to_pdf
