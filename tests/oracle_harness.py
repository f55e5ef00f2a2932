"""Local replica of the driver's DuckDB-oracle compare.

Runs each registered query on Spark and its oracle SQL on DuckDB over
the same parquet fixtures, then compares row count, column names, and
(order-insensitively) values — floats approximately, everything else
exactly. Keeping this green locally is the cheapest proxy for the
driver's CORRECTNESS_r{N}.json gate.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from calculate_file_content_size_for_vector_db_spark.sources.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # arrays/lists (e.g. signature, centroid columns) are not
            # sortable/hashable as ndarray — canonicalize to tuples
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v
            )
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            _values_equal(_null(x), _null(y)) for x, y in zip(a, b)
        )
    if isinstance(a, float) or isinstance(b, float):
        fa = float("nan") if a is None else float(a)
        fb = float("nan") if b is None else float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        return [f"column mismatch: spark={sc} oracle={oc}"]
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    a, b = _canon(spark_df), _canon(oracle_df)
    for col in a.columns:
        av, bv = list(a[col]), list(b[col])
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(av, bv))
            if not _values_equal(_null(x), _null(y))
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {col!r}: {len(bad)}/{len(av)} values differ; first at row {i}: "
                f"spark={x!r} oracle={y!r}"
            )
    return problems


def _null(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def run_one(spark, con, name: str, fn, sql: str | None, sf_dir: str) -> list[str]:
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        return [] if len(sdf) >= 0 else ["spark query failed"]
    odf = con.execute(sql).fetchdf()
    return compare_frames(sdf, odf)
