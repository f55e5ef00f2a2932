"""Display formatting (SURVEY.md S6-S8, S10).

The reference bakes formatted strings INTO its data before the sink
(pdf_reader.py:59-101: every cell of the display/CSV table is
pre-formatted — `f"{v:,}"`, `f"{v:.2f}"`). The Spark design keeps
numeric columns end-to-end and formats only at the sink, which keeps
the table queryable; these helpers produce the same strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def thousands(col: Column | str, decimals: int = 0) -> Column:
    """S6/S7 (pdf_reader.py:11-26): '{:,.Nf}' formatting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.format_number(c, decimals)


def fixed_point(col: Column | str, decimals: int = 2) -> Column:
    """S8 (pdf_reader.py:76): f'{v:.2f}' — no grouping."""
    c = F.col(col) if isinstance(col, str) else col
    return F.format_string(f"%.{decimals}f", c)


def record_to_json(*cols: str) -> Column:
    """S10 (pdf_reader.py:136-138): result record -> JSON string."""
    return F.to_json(F.struct(*cols))


def format_summary(summary: DataFrame) -> DataFrame:
    """The README.md:17-27 table, formatted like the reference's
    _to_table_format (pdf_reader.py:59-101): sizes with thousands
    separators, ratio with one decimal (pdf_reader.py:162 uses 1dp for
    the total, per-file shows raw float — we use 2dp uniformly and keep
    the numeric columns alongside)."""
    return summary.select(
        "filename",
        thousands("file_size").alias("file_size_fmt"),
        thousands("text_size").alias("text_size_fmt"),
        thousands("chunks").alias("chunks_fmt"),
        fixed_point("ratio", 2).alias("ratio_fmt"),
    )
