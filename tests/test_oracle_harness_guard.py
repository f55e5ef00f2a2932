"""The oracle harness must itself catch mismatches — tests of the gate
(a compare that silently passes everything would green every round)."""

from tests.conftest import SF_DIR
from tests.oracle_harness import duck_connection, run_one


def _fn_ok(spark, sf_dir):
    from calculate_file_content_size_for_vector_db_spark.sources.io import read_table

    return read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")


def test_harness_green_on_true_parity(spark):
    con = duck_connection(SF_DIR)
    assert run_one(spark, con, "g", _fn_ok, "SELECT doc_id, n_chars FROM documents", SF_DIR) == []


def test_harness_flags_value_row_and_column_drift(spark):
    con = duck_connection(SF_DIR)
    value_drift = run_one(
        spark, con, "g", _fn_ok,
        "SELECT doc_id, n_chars + 1 AS n_chars FROM documents", SF_DIR,
    )
    assert value_drift and "values differ" in value_drift[0]
    row_drift = run_one(
        spark, con, "g", _fn_ok,
        "SELECT doc_id, n_chars FROM documents WHERE doc_id > 0", SF_DIR,
    )
    assert row_drift and "row count" in row_drift[0]
    col_drift = run_one(
        spark, con, "g", _fn_ok,
        "SELECT doc_id, n_chars AS chars FROM documents", SF_DIR,
    )
    assert col_drift and "column mismatch" in col_drift[0]


def test_harness_float_tolerance_is_tight(spark):
    # tolerance must absorb 1e-9 noise and nothing more
    from tests.oracle_harness import compare_frames
    import pandas as pd

    a = pd.DataFrame({"x": [1.0, 2.0]})
    assert compare_frames(a, pd.DataFrame({"x": [1.0 + 1e-12, 2.0]})) == []
    assert compare_frames(a, pd.DataFrame({"x": [1.0 + 1e-5, 2.0]})) != []
