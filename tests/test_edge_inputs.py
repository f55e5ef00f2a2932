"""Pathological-input sweep: every operator must handle NULL/empty/
unicode/degenerate inputs without throwing (the fixtures contain none
of these, so the oracle gate can't catch regressions here)."""

import pytest

from calculate_file_content_size_for_vector_db_spark.operators import dedup, textstats
from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
    nearest_neighbor_blocked,
)
from calculate_file_content_size_for_vector_db_spark.plans.pipeline import DocumentPipeline


@pytest.fixture(scope="module")
def weird_docs(spark):
    rows = [
        (0, None, 0),
        (1, "", 0),
        (2, "one", 3),
        (3, "a b", 3),
        (4, "héllo wörld 世界 test five", 20),
        (5, "x " * 500, 1000),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


@pytest.mark.parametrize(
    "op",
    [
        lambda s, d: DocumentPipeline(s, chunk_size=5).summary(d),
        lambda s, d: dedup.exact_dedup(d),
        lambda s, d: dedup.ngram_jaccard_pairs(d),
        lambda s, d: dedup.minhash_lsh_pairs(d),
        lambda s, d: dedup.simhash(d),
        lambda s, d: dedup.simhash_pairs(d),
        lambda s, d: textstats.quality_score(d).select("doc_id", "quality_score"),
        lambda s, d: textstats.lang_id(d).select("doc_id", "predicted_lang"),
        lambda s, d: textstats.token_counts(d).select("doc_id", "n_tokens"),
    ],
    ids=[
        "pipeline_summary", "exact_dedup", "ngram_jaccard", "minhash_lsh",
        "simhash", "simhash_pairs", "quality", "lang_id", "token_counts",
    ],
)
def test_operator_survives_weird_docs(spark, weird_docs, op):
    op(spark, weird_docs).count()  # no exception == pass


def test_simhash_preserves_all_docs(spark, weird_docs):
    # the explode-based rewrite must not drop zero-token docs
    got = {r.doc_id: r.simhash for r in dedup.simhash(weird_docs).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5}
    assert got[0] == 0 and got[1] == 0


def test_blocked_nn_zero_norm_ranks_last(spark):
    rows = [(0, [0.0] * 64), (1, [1.0] * 64), (2, [1.0] * 32 + [0.0] * 32)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    nn = {r.query_id: (r.neighbor_id, r.cosine) for r in nearest_neighbor_blocked(emb).collect()}
    # zero vector: all cosines 0, tie-break -> smallest other id
    assert nn[0] == (1, 0.0)
    # real vectors prefer each other over the zero vector
    assert nn[1][0] == 2 and nn[2][0] == 1
