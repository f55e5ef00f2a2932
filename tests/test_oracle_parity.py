"""Every registered query vs its DuckDB oracle at sf0.001 (fast local
replica of the driver's t2 gate — the driver itself runs sf0.01)."""

import pytest

from calculate_file_content_size_for_vector_db_spark.entry_queries import REGISTRY
from tests.conftest import SF_DIR
from tests.oracle_harness import duck_connection, run_one


@pytest.fixture(scope="module")
def con():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    q = REGISTRY[name]
    problems = run_one(spark, con, name, q.fn, q.oracle, SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
