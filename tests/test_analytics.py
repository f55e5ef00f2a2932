"""Behavioral tests for the analytics queries (funnel ordering,
islands run-splitting) on crafted event sequences."""

from calculate_file_content_size_for_vector_db_spark.entry_queries import REGISTRY


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    )
    return df


def test_funnel_requires_stage_order(spark, tmp_path):
    rows = [
        # user 1: full ordered funnel
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 00:01:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-01 00:02:00", 1, "purchase", 0.0, "{}"),
        # user 2: view -> click, but the purchase PRECEDES the first
        # click -> click credit yes, purchase credit no
        (4, "2024-01-01 00:00:00", 2, "view", 0.0, "{}"),
        (5, "2024-01-01 00:02:00", 2, "purchase", 0.0, "{}"),
        (6, "2024-01-01 00:03:00", 2, "click", 0.0, "{}"),
        # user 3: click with NO prior view -> no click stage credit
        (7, "2024-01-01 00:00:00", 3, "click", 0.0, "{}"),
    ]
    d = str(tmp_path)
    _events(spark, rows).write.mode("overwrite").parquet(d + "/events.parquet")
    got = {
        r.stage: r.n_users
        for r in REGISTRY["funnel_conversion"].fn(spark, d).collect()
    }
    assert got == {"view": 2, "click_after_view": 2, "purchase_after_click": 1}


def test_islands_split_on_interleave(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 00:01:00", 1, "view", 0.0, "{}"),
        (3, "2024-01-01 00:02:00", 1, "click", 0.0, "{}"),
        (4, "2024-01-01 00:03:00", 1, "view", 0.0, "{}"),  # new view run
    ]
    d = str(tmp_path)
    _events(spark, rows).write.mode("overwrite").parquet(d + "/events.parquet")
    runs = sorted(
        (r.event_type, r.run_start, r.n_events)
        for r in REGISTRY["event_type_islands"].fn(spark, d).collect()
    )
    assert runs == [
        ("click", "2024-01-01 00:02:00", 1),
        ("view", "2024-01-01 00:00:00", 2),
        ("view", "2024-01-01 00:03:00", 1),
    ]


def test_unigram_logprob_ranks_common_text_higher(spark):
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        unigram_logprob,
    )

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the rug"),
        (2, "zyx qwv jkp xxq zzt opq"),  # rare-token soup
        (3, ""),  # zero tokens -> NULL score
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = {r.doc_id: r.lm_score for r in unigram_logprob(df).collect()}
    assert s[3] is None
    # docs built from corpus-frequent tokens must outscore the
    # rare-token soup (every soup token has tf=1)
    assert s[0] > s[2] and s[1] > s[2]


def test_source_reputation_separates_sources(spark):
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        source_reputation,
    )

    rows = [
        (0, "the cat is in the house and a dog", "clean"),
        (1, "the sun is up and the day is new", "clean"),
        (2, "$$$ !!! ### %%% @@@ ^^^ &&& ***", "spam"),
        (3, "!!! ??? $$$ ### @@@ %%% ^^^ (((", "spam"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rep = {r.source: (r.n_docs, r.source_quality) for r in source_reputation(df).collect()}
    assert rep["clean"][0] == 2 and rep["spam"][0] == 2
    # stopword-rich prose outscores pure punctuation soup
    assert rep["clean"][1] > rep["spam"][1]


def test_approx_distinct_within_error_bound(spark):
    """The HLL estimate must sit within 5x the configured rsd of the
    exact count on both fixture scales (VERDICT r05 item 6)."""
    from calculate_file_content_size_for_vector_db_spark.entry_queries import REGISTRY
    from tests.conftest import SF_DIR

    for sf_dir in (SF_DIR, "/root/testdata/sf0.01"):
        row = REGISTRY["approx_distinct_error"].fn(spark, sf_dir).collect()[0]
        assert row.within_bound, f"{sf_dir}: HLL estimate off by >10%"
        exact = row.n_exact
        approx = (
            REGISTRY["approx_distinct_customers"].fn(spark, sf_dir).collect()[0].n_approx
        )
        assert abs(approx - exact) / exact <= 0.10
