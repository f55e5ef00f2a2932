"""Unit tests for dedup operators on crafted micro-fixtures."""

from pyspark.sql import functions as F

from calculate_file_content_size_for_vector_db_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_identical_text(spark):
    df = _docs(spark, [(0, "same text"), (1, "same text"), (2, "different")])
    rows = {r.keeper_id: r.dup_count for r in dedup.exact_dedup(df).collect()}
    assert rows == {0: 2, 2: 1}


def test_shingles_window_and_guard(spark):
    df = _docs(spark, [(0, "a b c d"), (1, "a b")])
    got = {
        r.doc_id: sorted(r.sh)
        for r in df.select("doc_id", dedup.shingles("text").alias("sh")).collect()
    }
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # fewer than 3 tokens -> no shingles


def test_ngram_jaccard_identical_docs(spark):
    df = _docs(spark, [(0, "w x y z q"), (1, "w x y z q"), (2, "totally other words here now")])
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert [(p.a_id, p.b_id, p.jaccard) for p in pairs] == [(0, 1, 1.0)]


def test_minhash_identical_signatures(spark):
    df = _docs(spark, [(0, "p q r s t"), (1, "p q r s t")])
    sigs = {r.doc_id: r.signature for r in dedup.minhash_signature(df).collect()}
    assert sigs[0] == sigs[1] and len(sigs[0]) == dedup.MINHASH_FUNCS


def test_minhash_lsh_finds_exact_dup(spark):
    df = _docs(
        spark,
        [(0, "p q r s t u v"), (1, "p q r s t u v"), (2, "unrelated words entirely different")],
    )
    pairs = dedup.minhash_lsh_pairs(df, threshold=0.5).collect()
    assert [(p.a_id, p.b_id, p.jaccard) for p in pairs] == [(0, 1, 1.0)]


def test_simhash_equal_for_equal_token_multisets(spark):
    df = _docs(spark, [(0, "m n o"), (1, "o n m"), (2, "aa bb cc dd ee")])
    s = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    assert s[0] == s[1]  # order-insensitive
    assert isinstance(s[2], int)


def test_simhash_pairs_hamming_zero_for_dups(spark):
    df = _docs(spark, [(0, "m n o p q"), (1, "m n o p q")])
    pairs = dedup.simhash_pairs(df, max_hamming=0).collect()
    assert [(p.a_id, p.b_id, p.hamming) for p in pairs] == [(0, 1, 0)]
