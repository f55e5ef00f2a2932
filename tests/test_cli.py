"""End-to-end CLI test: generate a folder of PDFs, run the CLI main,
check console table + CSV output (the reference's section 3.1 flow)."""

import os

from calculate_file_content_size_for_vector_db_spark.cli import folder_to_csv_name, main
from calculate_file_content_size_for_vector_db_spark.sources.extract import make_simple_pdf


def test_folder_to_csv_name():
    assert folder_to_csv_name("/data/my docs!") == "data_my_docs_.csv"
    assert folder_to_csv_name("---") == "folder.csv"


def test_cli_end_to_end(spark, tmp_path, capsys):
    pdf_dir = tmp_path / "pdfs"
    pdf_dir.mkdir()
    (pdf_dir / "a.pdf").write_bytes(make_simple_pdf(["hello world " * 30, "page two"]))
    (pdf_dir / "b.PDF").write_bytes(make_simple_pdf(["short doc"]))
    (pdf_dir / "ignore.txt").write_bytes(b"not a pdf")

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    rc = main([str(pdf_dir), "--chunk-size", "50", "--output-dir", str(out_dir)])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "a.pdf" in printed and "b.PDF" in printed
    assert "ignore.txt" not in printed  # extension filter (case-insensitive)
    assert "SUM TOTAL" in printed
    assert "Estimate: 100 GB" in printed

    csv_dirs = [p for p in os.listdir(out_dir) if p.endswith(".csv.d")]
    assert len(csv_dirs) == 1
    csv_df = spark.read.option("header", True).csv(str(out_dir / csv_dirs[0]))
    assert csv_df.count() == 3  # 2 files + SUM TOTAL


def test_cli_progress_streams_per_file_rows(spark, tmp_path, capsys):
    pdf_dir = tmp_path / "pdfs_p"
    pdf_dir.mkdir()
    (pdf_dir / "x.pdf").write_bytes(make_simple_pdf(["alpha beta " * 20]))
    (pdf_dir / "y.pdf").write_bytes(make_simple_pdf(["gamma delta"]))
    out_dir = tmp_path / "out_p"
    out_dir.mkdir()
    rc = main([str(pdf_dir), "--chunk-size", "40", "--output-dir", str(out_dir), "--progress"])
    assert rc == 0
    printed = capsys.readouterr().out
    # one 'done <file>' line per input file, before the summary table
    assert printed.count("done x.pdf:") == 1
    assert printed.count("done y.pdf:") == 1
    assert printed.index("done x.pdf:") < printed.index("SUM TOTAL")


def test_compact_parquet_reduces_files(spark, tmp_path):
    from calculate_file_content_size_for_vector_db_spark.sources.io import compact_parquet

    d = str(tmp_path / "frag")
    df = spark.range(1000).withColumnRenamed("id", "k")
    df.repartition(40).write.mode("overwrite").parquet(d)
    import os

    before = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(before) == 40
    n_files = compact_parquet(spark, d, target_rows_per_file=500)
    after = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert n_files == 2 and len(after) == 2
    assert spark.read.parquet(d).count() == 1000
    assert {r.k for r in spark.read.parquet(d).collect()} == set(range(1000))
