"""CLI — the reference's entry point (pdf_reader.py:621-666) on Spark.

Usage parity with `python pdf_reader.py <dir>... <n> [--print_metadata]`:

    python -m calculate_file_content_size_for_vector_db_spark <dir>... [--parallelism N]
        [--file-type .pdf] [--chunk-size 1200] [--chunk-overlap 0]
        [--print-metadata]

Differences (documented, SURVEY.md section 1.3):
- the reference's trailing positional thread count (pdf_reader.py:276)
  becomes --parallelism (Spark parallelism comes from partitions; the
  knob only sets local[] width when no session exists yet);
- zero-text corpora print a NULL ratio instead of crashing (Q2);
- output CSV is written per input folder, filename derived by the same
  sanitization rule (pdf_reader.py:195-215).
"""

from __future__ import annotations

import argparse
import re
import sys
import time

from pyspark.sql import functions as F


def folder_to_csv_name(path: str) -> str:
    """S9 (pdf_reader.py:195-215): sanitize a folder path into a csv
    file name; empty result falls back to 'folder'."""
    name = re.sub(r"[^\w\-]", "_", path).lstrip("-_")
    return (name or "folder") + ".csv"


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="calculate_file_content_size_for_vector_db_spark")
    ap.add_argument("folders", nargs="+", help="input folders of PDF files")
    ap.add_argument("--parallelism", type=int, default=32)
    ap.add_argument("--file-type", default=".pdf")
    ap.add_argument("--chunk-size", type=int, default=1200)
    ap.add_argument("--chunk-overlap", type=int, default=0)
    ap.add_argument("--print-metadata", action="store_true")
    ap.add_argument(
        "--progress",
        action="store_true",
        help="print each file's row as it completes (K1, pdf_reader.py:592-614); "
        "rows arrive in task-completion order, and the reference's per-file "
        "seconds column is omitted (per-file wall time has no meaning when one "
        "file's pages run as many parallel tasks)",
    )
    ap.add_argument("--output-dir", default=".")
    args = ap.parse_args(argv)

    from calculate_file_content_size_for_vector_db_spark.operators import metrics
    from calculate_file_content_size_for_vector_db_spark.session import get_spark
    from calculate_file_content_size_for_vector_db_spark.sources.extract import extract_pages
    from calculate_file_content_size_for_vector_db_spark.sources.io import scan_files, write_csv
    from calculate_file_content_size_for_vector_db_spark.operators import chunk as chunk_ops
    from calculate_file_content_size_for_vector_db_spark.functions.text import preprocess_text

    spark = get_spark(app_name="content-sizer-cli", cpus=args.parallelism)

    for folder in args.folders:
        t0 = time.time()
        # the reference swallows missing-dir/permission errors per
        # folder and moves on (pdf_reader.py:349-359)
        try:
            files = scan_files(spark, folder, extension=args.file_type)
            files.first()
        except Exception as e:  # noqa: BLE001
            print(f"== {folder}: skipped ({type(e).__name__}: {str(e).splitlines()[0]})")
            continue
        pages = extract_pages(files)
        chunked = chunk_ops.chunk_recursive(
            pages,
            chunk_size=args.chunk_size,
            chunk_overlap=args.chunk_overlap,
            text_col="page_text",
            keep_cols=["path", "page_number", "n_pages", "file_size"],
        )
        chunked = chunked.withColumn("content", preprocess_text("chunk_text")).withColumn(
            "chunk_length", F.length("content").cast("int")
        )
        per_file = (
            chunked.groupBy("path")
            .agg(
                F.first("n_pages").alias("pages"),
                F.first("file_size").alias("file_size"),
                F.count("*").alias("chunks"),
                F.sum("chunk_length").cast("long").alias("text_size"),
            )
            .withColumn("ratio", metrics.ratio("file_size", "text_size", 2))
            .withColumn("filename", F.element_at(F.split("path", "/"), -1))
        )
        if args.progress:
            # stream per-file rows to the console as partitions finish
            # (completion order, like the reference's pool workers);
            # persist so the summary below reuses the computed rows
            per_file = per_file.persist()
            for r in per_file.toLocalIterator():
                ratio_s = "n/a" if r.ratio is None else f"{r.ratio:,.2f}"
                print(
                    f"done {r.filename}: pages={r.pages:,} chunks={r.chunks:,} "
                    f"file_size={r.file_size:,} text_size={r.text_size:,} ratio={ratio_s}"
                )
        summary = metrics.rollup_summary(per_file)
        rows = summary.orderBy(F.desc("file_size")).collect()
        if args.print_metadata:
            for r in per_file.select(F.to_json(F.struct("*")).alias("j")).collect():
                print(r.j)
        wall = time.time() - t0
        print(f"== {folder} ({wall:.2f}s) ==")
        header = f"{'Filename':40} {'Chunks':>8} {'File Size':>14} {'Text Size':>14} {'Ratio':>8}"
        print(header)
        print("-" * len(header))
        for r in rows:
            ratio_s = "n/a" if r.ratio is None else f"{r.ratio:,.2f}"
            print(
                f"{r.filename:40} {r.chunks:>8,} {r.file_size:>14,} "
                f"{r.text_size:>14,} {ratio_s:>8}"
            )
        out = f"{args.output_dir}/{folder_to_csv_name(folder)}.d"
        write_csv(summary, out)
        total = next(r for r in rows if r.filename == metrics.SUM_TOTAL_LABEL)
        if total.ratio:
            print(
                f"Estimate: 100 GB of files would extract to "
                f"~{100.0 / total.ratio:.1f} GB of text."
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
