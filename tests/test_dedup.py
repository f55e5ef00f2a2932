"""Unit tests for dedup operators on crafted micro-fixtures."""
import pytest

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


def test_ngram_jaccard_hub_shingle_cap(spark):
    # every doc shares the hub shingle "the same boiler"; real dup pair
    # (0,1) also shares its own distinct shingles. With the cap below
    # the hub's frequency the hub is pruned from the JOIN side only:
    # the (0,1) pair survives via its private shingles and unrelated
    # docs produce no candidates at all.
    hub = "the same boiler"
    rows = [
        (0, f"{hub} alpha beta gamma delta"),
        (1, f"{hub} alpha beta gamma delta"),
    ] + [(i, f"{hub} unique{i} only{i} words{i}") for i in range(2, 12)]
    df = _docs(spark, rows)
    capped = dedup.ngram_jaccard_pairs(df, threshold=0.3, max_shingle_freq=5).collect()
    assert [(p.a_id, p.b_id) for p in capped] == [(0, 1)]
    # jaccard is undercounted (hub overlap excluded from inter, kept in
    # sizes), never overcounted
    exact = {
        (p.a_id, p.b_id): p.jaccard
        for p in dedup.ngram_jaccard_pairs(df, threshold=0.3).collect()
    }
    assert capped[0].jaccard <= exact[(0, 1)]
    # cap above the max observed frequency == exact semantics
    loose = dedup.ngram_jaccard_pairs(df, threshold=0.3, max_shingle_freq=1000).collect()
    assert sorted((p.a_id, p.b_id, p.jaccard) for p in loose) == sorted(
        (a, b, j) for (a, b), j in exact.items()
    )


def test_minhash_identical_signatures(spark):
    df = _docs(spark, [(0, "p q r s t"), (1, "p q r s t")])
    sigs = {r.doc_id: r.signature for r in dedup.minhash_signature(df).collect()}
    assert sigs[0] == sigs[1] and len(sigs[0]) == dedup.MINHASH_FUNCS


def test_bands_from_shingle_sets_bit_identical_to_from_text(spark):
    """The r16 store-build derivation: bands derived from a shingle-set
    table (persisted or parquet-stored) must be row-identical to the
    from-text path — explode(sh) reproduces shingle_table exactly and
    the signature min-agg is duplicate/order-insensitive."""
    df = _docs(
        spark,
        [
            (0, "p q r s t u v"),
            (1, "p q r s t u v w x"),
            (2, "unrelated words entirely different body"),
            (3, ""),  # no shingles -> absent from both band tables
        ],
    )
    from_text = dedup.minhash_bands(dedup.minhash_signature(df)).collect()
    from_sets = dedup.bands_from_shingle_sets(dedup.shingle_sets(df)).collect()
    key = lambda r: (r.doc_id, r.band, r.band_hash)  # noqa: E731
    assert sorted(map(key, from_sets)) == sorted(map(key, from_text))


def test_minhash_lsh_finds_exact_dup(spark):
    df = _docs(
        spark,
        [(0, "p q r s t u v"), (1, "p q r s t u v"), (2, "unrelated words entirely different")],
    )
    pairs = dedup.minhash_lsh_pairs(df, threshold=0.5).collect()
    assert [(p.a_id, p.b_id, p.jaccard) for p in pairs] == [(0, 1, 1.0)]


def test_minhash_lsh_bucket_cap_bounds_low_entropy_corpus(spark):
    # adversarial low-entropy corpus: 40 identical docs collapse every
    # band into a single bucket, so exact LSH candidate generation is
    # quadratic — C(40,2) = 780 pairs. The cap drops the mega-bucket
    # whole, bounding per-bucket fanout at cap^2, while a genuine
    # near-dup pair living in small buckets is still found.
    boiler = "the quick brown fox jumps over the lazy dog again"
    rows = [(i, boiler) for i in range(40)] + [
        (100, "completely different private document body text here"),
        (101, "completely different private document body text here"),
    ]
    df = _docs(spark, rows)
    uncapped = dedup.minhash_lsh_pairs(df, threshold=0.5).collect()
    assert len(uncapped) == 40 * 39 // 2 + 1  # quadratic in the hub cluster
    capped = dedup.minhash_lsh_pairs(df, threshold=0.5, max_bucket_size=16).collect()
    assert [(p.a_id, p.b_id, p.jaccard) for p in capped] == [(100, 101, 1.0)]
    # cap above the largest bucket == exact LSH semantics
    loose = dedup.minhash_lsh_pairs(df, threshold=0.5, max_bucket_size=64).collect()
    assert sorted((p.a_id, p.b_id) for p in loose) == sorted(
        (p.a_id, p.b_id) for p in uncapped
    )


def test_capped_lsh_registration_neutral_at_fixture_scale(spark):
    # the registered production default (dedup_minhash_lsh_capped) must
    # produce the exact query's output wherever no bucket exceeds the
    # cap — which holds for the driver fixtures (max bucket 3 at sf0.01)
    from calculate_file_content_size_for_vector_db_spark.entry_queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    exact = sorted(map(tuple, REGISTRY["dedup_minhash_lsh"].fn(spark, sf).collect()))
    capped = sorted(map(tuple, REGISTRY["dedup_minhash_lsh_capped"].fn(spark, sf).collect()))
    assert exact == capped


def test_simhash_equal_for_equal_token_multisets(spark):
    df = _docs(spark, [(0, "m n o"), (1, "o n m"), (2, "aa bb cc dd ee")])
    s = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    assert s[0] == s[1]  # order-insensitive
    assert isinstance(s[2], int)


def test_simhash_pairs_hamming_zero_for_dups(spark):
    df = _docs(spark, [(0, "m n o p q"), (1, "m n o p q")])
    pairs = dedup.simhash_pairs(df, max_hamming=0).collect()
    assert [(p.a_id, p.b_id, p.hamming) for p in pairs] == [(0, 1, 0)]


def test_simhash_pairs_wide_sketch_matches_narrow_semantics(spark):
    # the 28-bit scale sketch must agree with a brute-force hamming
    # computation over its own simhash values (pigeonhole banding is
    # lossless at any width)
    docs = [(i, f"w{i} common tokens shared by all docs {i % 3}") for i in range(12)]
    df = _docs(spark, docs)
    s = {r.doc_id: r.simhash for r in dedup.simhash(df, bits=28).collect()}
    expect = sorted(
        (a, b, bin(s[a] ^ s[b]).count("1"))
        for a in s
        for b in s
        if a < b and bin(s[a] ^ s[b]).count("1") <= 3
    )
    got = sorted(
        (p.a_id, p.b_id, p.hamming)
        for p in dedup.simhash_pairs(df, max_hamming=3, bits=28).collect()
    )
    assert got == expect
    # the token hash really carries entropy above bit 16, so a 28-bit
    # sketch has live high bits (even if this tiny corpus's majority
    # vote zeroes them)
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import token_hash
    from pyspark.sql import functions as F

    hashes = [
        r.h
        for r in spark.createDataFrame([(f"token{i}",) for i in range(50)], "tok string")
        .select(token_hash(F.col("tok")).alias("h"))
        .collect()
    ]
    assert any(h >= (1 << 16) for h in hashes)


def test_simhash_wide_bucket_cap_bounds_low_entropy_corpus(spark):
    # adversarial low-entropy corpus for SimHash: identical docs
    # collapse every segment into one bucket -> quadratic candidates.
    # The registered scale defaults (28 bits + bucket cap) drop the
    # mega-bucket whole while distinct near-dup pairs in small buckets
    # survive.
    boiler = "the quick brown fox jumps over the lazy dog again"
    rows = [(i, boiler) for i in range(40)] + [
        (100, "completely different private document body text here"),
        (101, "completely different private document body text here"),
    ]
    df = _docs(spark, rows)
    uncapped = dedup.simhash_pairs(df, max_hamming=3, bits=dedup.SIMHASH_BITS_SCALE)
    assert uncapped.count() == 40 * 39 // 2 + 1
    capped = dedup.simhash_pairs(
        df,
        max_hamming=3,
        bits=dedup.SIMHASH_BITS_SCALE,
        max_bucket_size=dedup.PROD_MAX_BUCKET_SIZE,
    ).collect()
    assert [(p.a_id, p.b_id, p.hamming) for p in capped] == [(100, 101, 0)]


def test_wide_simhash_registration_is_bounded_subset(spark):
    # the synthetic fixture corpus is low-entropy enough that 28-bit
    # sketches collapse and segment buckets exceed the cap — exactly
    # the degeneration the cap exists for. The registered query must
    # return a SUBSET of the uncapped pairs (cap only removes
    # candidates, never invents them), all within the hamming bound.
    from calculate_file_content_size_for_vector_db_spark.entry_queries import REGISTRY
    from calculate_file_content_size_for_vector_db_spark.sources.io import read_table

    sf = "/root/testdata/sf0.001"
    registered = {
        (p.a_id, p.b_id): p.hamming
        for p in REGISTRY["simhash_pairs_wide"].fn(spark, sf).collect()
    }
    docs = read_table(spark, sf, "documents")
    uncapped = {
        (p.a_id, p.b_id): p.hamming
        for p in dedup.simhash_pairs(
            docs, max_hamming=3, bits=dedup.SIMHASH_BITS_SCALE
        ).collect()
    }
    assert registered, "capped wide simhash returned nothing at fixture scale"
    assert len(registered) < len(uncapped)  # the cap actually bit
    for pair, ham in registered.items():
        assert uncapped[pair] == ham
        assert 0 <= ham <= 3


def test_ngram_jaccard_capped_registration_neutral_at_fixture_scale(spark):
    # same contract as the minhash pair: exact and capped registrations
    # agree wherever no shingle exceeds the frequency cap
    from calculate_file_content_size_for_vector_db_spark.entry_queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    exact = sorted(map(tuple, REGISTRY["dedup_ngram_jaccard"].fn(spark, sf).collect()))
    capped = sorted(
        map(tuple, REGISTRY["dedup_ngram_jaccard_capped"].fn(spark, sf).collect())
    )
    assert exact == capped


def test_dedup_survivors_keeps_one_per_cluster(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),  # dup of 0
        (2, "alpha beta gamma delta epsilon zeta"),  # dup of 0
        (3, "one two three four five six seven"),
        (4, "totally different body of text here entirely"),
    ]
    df = _docs(spark, rows)
    kept = sorted(r.doc_id for r in dedup.dedup_survivors(df, threshold=0.5).collect())
    # cluster {0,1,2} collapses to keeper 0; singletons survive
    assert kept == [0, 3, 4]


def test_incremental_matches_full_lsh_cross_pairs(spark):
    """Incremental batch-vs-corpus pairs == the cross-boundary subset
    of full-corpus LSH pairs (same signatures, same verify)."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),   # batch
        (1, "alpha beta gamma delta epsilon zeta"),   # corpus dup of 0
        (2, "one two three four five six seven"),     # batch, unique
        (3, "red green blue cyan magenta yellow"),    # corpus
        (4, "red green blue cyan magenta yellow"),    # corpus dup of 3 (not cross)
        (5, "alpha beta gamma delta epsilon eta"),    # corpus near-dup of 0
    ]
    docs = _docs(spark, rows)
    batch = docs.where("doc_id IN (0, 2)")
    corpus = docs.where("doc_id NOT IN (0, 2)")

    full = dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    batch_ids = {0, 2}
    expect = {
        (r.a_id, r.b_id, r.jaccard) if r.a_id in batch_ids else (r.b_id, r.a_id, r.jaccard)
        for r in full
        if (r.a_id in batch_ids) != (r.b_id in batch_ids)
    }
    assert expect  # the fixture must actually cross the boundary

    bands = dedup.minhash_bands(dedup.minhash_signature(corpus))
    got = dedup.incremental_neardup_pairs(batch, bands, dedup.shingle_sets(corpus))
    assert {(r.new_id, r.corpus_id, r.jaccard) for r in got.collect()} == expect

    surv = dedup.incremental_survivors(batch, got)
    assert {r.doc_id for r in surv.collect()} == {2}  # 0 dups against corpus


def test_incremental_bucket_cap_drops_hub_buckets(spark):
    # every corpus doc is the same text -> one giant band bucket; the
    # cap drops it whole, so the batch twin finds no candidates
    rows = [(0, "the very same boilerplate text here")] + [
        (i, "the very same boilerplate text here") for i in range(1, 12)
    ]
    docs = _docs(spark, rows)
    batch = docs.where("doc_id = 0")
    corpus = docs.where("doc_id > 0")
    bands = dedup.minhash_bands(dedup.minhash_signature(corpus))
    sh = dedup.shingle_sets(corpus)
    uncapped = dedup.incremental_neardup_pairs(batch, bands, sh)
    assert uncapped.count() == 11
    capped = dedup.incremental_neardup_pairs(batch, bands, sh, max_bucket_size=5)
    assert capped.count() == 0


def test_span_rewrite_keeps_first_occurrence_only(spark):
    # docs 0 and 1 share the 5-token span "a b c d e"; doc 0 (smaller
    # id) keeps it, doc 1 loses exactly those 5 tokens; doc 2 untouched
    rows = [
        (0, "a b c d e tail zero"),
        (1, "head one a b c d e"),
        (2, "entirely different words here now"),
    ]
    got = {r.doc_id: r for r in dedup.span_dedup_rewrite(_docs(spark, rows)).collect()}
    assert got[0].clean_text == "a b c d e tail zero"
    assert got[0].n_tokens_removed == 0
    assert got[1].clean_text == "head one"
    assert (got[1].n_tokens_kept, got[1].n_tokens_removed) == (2, 5)
    assert got[2].clean_text == "entirely different words here now"


def test_span_rewrite_overlapping_spans_union_coverage(spark):
    # doc 1 repeats a 6-token run from doc 0 -> two overlapping dup
    # 5-token spans; covered positions are the UNION (6 tokens), not
    # double-counted
    rows = [
        (0, "x1 x2 x3 x4 x5 x6 unique0"),
        (1, "pre x1 x2 x3 x4 x5 x6 post"),
    ]
    got = {r.doc_id: r for r in dedup.span_dedup_rewrite(_docs(spark, rows)).collect()}
    assert got[0].n_tokens_removed == 0
    assert got[1].clean_text == "pre post"
    assert got[1].n_tokens_removed == 6


def test_span_rewrite_short_and_empty_docs_pass_through(spark):
    rows = [(0, "one two three"), (1, "")]
    got = {r.doc_id: r for r in dedup.span_dedup_rewrite(_docs(spark, rows)).collect()}
    assert got[0].clean_text == "one two three"
    assert got[1].clean_text == "" and got[1].n_tokens_kept == 0


def test_span_rewrite_properties_random_corpora(spark):
    """Property sweep on seeded random corpora: (1) every clean_text is
    a subsequence of the original token stream; (2) kept + removed =
    original token count; (3) a keeper that lost nothing overall
    retains each span it keeps verbatim. (Unconditional keeper
    retention is NOT a theorem: a doc can be keeper of span A yet lose
    A-overlapping tokens through a different span B it doesn't keep —
    so the check is gated on n_tokens_removed == 0.)"""
    import random

    rng = random.Random(53)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(5):
        docs = []
        for d in range(8):
            n = rng.randrange(0, 14)
            docs.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
        df = _docs(spark, docs)
        got = {r.doc_id: r for r in dedup.span_dedup_rewrite(df).collect()}
        originals = dict(docs)
        for d, text in docs:
            orig = text.split() if text else []
            clean = got[d].clean_text.split() if got[d].clean_text else []
            # subsequence check
            it = iter(orig)
            assert all(tok in it for tok in clean), (trial, d, text, got[d].clean_text)
            assert got[d].n_tokens_kept == len(clean)
            assert got[d].n_tokens_kept + got[d].n_tokens_removed == len(orig)
        # keeper retention: recompute duplicated spans in python
        spans = {}
        for d, text in docs:
            toks = text.split()
            for i in range(len(toks) - 4):
                spans.setdefault(" ".join(toks[i : i + 5]), set()).add(d)
        for span, ds in spans.items():
            if len(ds) >= 2:
                keeper = min(ds)
                if got[keeper].n_tokens_removed == 0:
                    assert span in got[keeper].clean_text, (trial, span, keeper)


def test_incremental_empty_batch_and_empty_corpus(spark):
    docs = _docs(spark, [(0, "alpha beta gamma delta epsilon"), (1, "one two three four five")])
    empty = docs.where("doc_id < 0")
    bands = dedup.minhash_bands(dedup.minhash_signature(docs))
    sh = dedup.shingle_sets(docs)
    # empty batch: no pairs, no survivors
    pairs = dedup.incremental_neardup_pairs(empty, bands, sh)
    assert pairs.count() == 0
    assert dedup.incremental_survivors(empty, pairs).count() == 0
    # empty corpus: every batch doc survives
    ebands = dedup.minhash_bands(dedup.minhash_signature(empty))
    epairs = dedup.incremental_neardup_pairs(docs, ebands, dedup.shingle_sets(empty))
    assert epairs.count() == 0
    assert dedup.incremental_survivors(docs, epairs).count() == 2


def test_containment_catches_subset_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(0, short), (1, long), (2, "totally different words here entirely now")],
        "doc_id long, text string",
    )
    # every shingle of the short doc appears in the long doc
    pairs = {(r.a_id, r.b_id): r for r in dedup.containment_pairs(df, threshold=0.8).collect()}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    assert r.containment_a == 1.0          # short fully contained
    assert r.containment_b < 0.5           # long is mostly other text
    # Jaccard at the same threshold misses the pair entirely
    jac = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert all((p.a_id, p.b_id) != (0, 1) for p in jac)
    # the unrelated doc pairs with nothing
    assert all(2 not in (a, b) for a, b in pairs)


def test_containment_direction_arithmetic(spark):
    # A has 4 shingles, B shares exactly 2 of them and has 2 others
    a = "t1 t2 t3 t4 t5 t6"          # shingles: t1t2t3..t4t5t6 (4)
    b = "t1 t2 t3 t4 x1 x2 x3"       # shares t1t2t3, t2t3t4; adds 3 others
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    rows = dedup.containment_pairs(df, threshold=0.4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.containment_a == 0.5          # 2 of A's 4 shingles
    assert r.containment_b == 0.4          # 2 of B's 5 shingles


def test_minhash_estimate_exact_one_for_identical_docs(spark):
    text = "one two three four five six seven eight nine ten"
    df = _docs(spark, [(0, text), (1, text), (2, "other words entirely distinct here now")])
    rows = {(r.a_id, r.b_id): r for r in dedup.minhash_jaccard_estimate(df).collect()}
    r = rows[(0, 1)]
    # identical shingle sets -> identical signatures -> estimate exactly 1
    assert r.jaccard_est == 1.0 and r.jaccard_exact == 1.0 and r.abs_error == 0.0


def test_minhash_estimate_structural_properties_on_fixture(spark):
    """Structural guarantees of the estimate on the sf0.001 fixture
    (k=8, 4 bands x 2 rows). The naive 3-sigma bound sqrt(J(1-J)/k)
    does NOT hold conditionally: LSH candidates are selected BECAUSE a
    band agreed, so low-Jaccard candidates are exactly the pairs whose
    estimate errs high — what holds deterministically is the
    quantization grid and the shared-band floor (>= 2 of 8 components
    agree for every candidate)."""
    from calculate_file_content_size_for_vector_db_spark.sources.io import read_table
    from tests.conftest import SF_DIR

    docs = read_table(spark, SF_DIR, "documents")
    rows = dedup.minhash_jaccard_estimate(docs).collect()
    assert rows, "fixture produced no LSH candidate pairs"
    k = 8
    grid = {round(i / k, 6) for i in range(k + 1)}
    for r in rows:
        assert r.jaccard_est in grid, r
        # candidate => at least one full band (2 components) agrees
        assert r.jaccard_est >= round(2 / k, 6), r
        assert r.abs_error == round(abs(r.jaccard_est - r.jaccard_exact), 6)
    # the estimate still discriminates: true near-dups (exact >= 0.5)
    # must estimate at least as high as the candidate floor average
    hi = [r.jaccard_est for r in rows if r.jaccard_exact >= 0.5]
    lo = [r.jaccard_est for r in rows if r.jaccard_exact < 0.1]
    if hi and lo:
        assert sum(hi) / len(hi) > sum(lo) / len(lo)


def test_dup_rate_by_source_within_source_semantics(spark):
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        dup_rate_by_source,
    )

    rows = [
        (0, "same text", "a"),
        (1, "same text", "a"),      # within-source dup
        (2, "same text", "b"),      # cross-source copy: NOT a dup for b
        (3, "unique one", "b"),
        (4, "unique two", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in dup_rate_by_source(df).collect()}
    assert (got["a"].n_docs, got["a"].n_distinct, got["a"].n_dup) == (2, 1, 1)
    assert got["a"].dup_rate == 0.5
    assert (got["b"].n_docs, got["b"].n_distinct, got["b"].n_dup) == (3, 3, 0)
    assert got["b"].dup_rate == 0.0


def test_neardup_clusters_chained_corpus_guard_and_convergence(spark):
    """VERDICT r06 item 6: a CHAINED near-dup corpus (rolling word
    windows — doc_i ~ doc_{i+1..i+3}, nothing farther) has pair-graph
    diameter ~n/3, so min-label propagation must either converge or
    RAISE — never return a silently-partial labeling that splits one
    true cluster."""
    import pytest

    from calculate_file_content_size_for_vector_db_spark.operators.dedup import neardup_clusters

    words = [f"w{i:03d}" for i in range(200)]
    L, s, n = 30, 3, 9  # J(offset d) = (L-s*d-2)/(L+s*d-2): >=0.5 iff d<=3
    rows = [(i, " ".join(words[i * s : i * s + L])) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_clusters(df, threshold=0.5, max_iterations=1)
    out = neardup_clusters(df, threshold=0.5, max_iterations=20).collect()
    assert len(out) == n  # every doc is in some pair, so every doc labeled
    assert {r.cluster_id for r in out} == {0}  # ONE chain-connected cluster


def test_neardup_clusters_pointer_jumping_fewer_rounds_same_output(spark):
    """pointer_jumping=True (label := label(label) each round) must
    converge in O(log diameter) rounds — on the 15-doc chain it lands
    in 3 where plain min-label still raises at 4 — and produce the
    IDENTICAL labeling (fixpoints coincide: component-min self-labels),
    so the registered query's oracle is unchanged."""
    import pytest

    from calculate_file_content_size_for_vector_db_spark.operators.dedup import neardup_clusters

    words = [f"w{i:03d}" for i in range(200)]
    L, s, n = 30, 3, 15
    rows = [(i, " ".join(words[i * s : i * s + L])) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_clusters(df, threshold=0.5, max_iterations=4)
    fast = neardup_clusters(
        df, threshold=0.5, max_iterations=3, pointer_jumping=True
    ).collect()
    slow = neardup_clusters(df, threshold=0.5, max_iterations=20).collect()
    as_map = lambda rs: {r.doc_id: r.cluster_id for r in rs}
    assert as_map(fast) == as_map(slow)
    assert set(as_map(fast).values()) == {0}


def test_dedup_pair_quality_matrix_semantics(spark):
    """LSH tiers verify by exact Jaccard -> precision exactly 1.0 and
    found = hits; the capped tier can only lose recall vs uncapped;
    SimHash's numbers measure how hamming<=3 proxies Jaccard here."""
    rows = [
        (0, "p q r s t u v w"),
        (1, "p q r s t u v w"),          # exact dup of 0
        (2, "p q r s t u v DIFFERENT"),  # near dup of 0/1
        (3, "totally other words entirely unrelated body"),
        (4, "x y z x y z x y z"),
        (5, "x y z x y z x y q"),        # near dup of 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.method: r for r in dedup.dedup_pair_quality(df).collect()}
    assert set(got) == {"minhash_lsh", "minhash_lsh_capped", "simhash"}
    for m in ("minhash_lsh", "minhash_lsh_capped"):
        r = got[m]
        assert r.n_found == r.n_hit  # exact-verified: no false positives
        assert r.pair_precision in (1.0, None)
        assert r.n_true == got["minhash_lsh"].n_true  # shared truth
    assert got["minhash_lsh_capped"].n_hit <= got["minhash_lsh"].n_hit
    assert got["simhash"].n_true == got["minhash_lsh"].n_true


# ---------------------------------------------------------------------------
# Bloom pre-gate (bloom_bitmap / bloom_probe / bloom_neardup_prefilter)
# ---------------------------------------------------------------------------


def test_bloom_bitmap_is_bounded_and_32bit(spark):
    df = _docs(spark, [(i, f"doc {i} body text {i * 7}") for i in range(20)])
    bands = dedup.minhash_bands(dedup.minhash_signature(df))
    bm = dedup.bloom_bitmap(bands, m_bits=1 << 10).collect()
    assert len(bm) <= (1 << 10) // 32
    for r in bm:
        assert 0 <= r.word_id < (1 << 10) // 32
        assert 0 < r.word < (1 << 32)  # only the low 32 bits ever set


def test_bloom_prefilter_no_false_negatives_vs_band_join(spark):
    # docs 0/8 and 3/21 are exact dups across the batch/corpus split
    # (batch = %7==0: docs 0,7,14,21); every doc the band join would
    # pair MUST be flagged maybe_neardup — the gate's only guarantee.
    rows = []
    for i in range(24):
        rows.append((i, f"unique words number {i} alpha beta gamma delta {i}"))
    rows[8] = (8, rows[0][1])
    rows[21] = (21, rows[3][1])
    df = _docs(spark, rows)
    batch = df.where(F.col("doc_id") % 7 == 0)
    corpus = df.where(F.col("doc_id") % 7 != 0)
    corpus_bands = dedup.minhash_bands(dedup.minhash_signature(corpus))
    verdict = {
        r.doc_id: r.maybe_neardup
        for r in dedup.bloom_neardup_prefilter(batch, corpus_bands).collect()
    }
    pairs = dedup.incremental_neardup_pairs(
        batch, corpus_bands, dedup.shingle_sets(corpus)
    ).collect()
    assert {p.new_id for p in pairs} == {0, 21}
    for p in pairs:
        assert verdict[p.new_id] is True
    # every batch doc gets a verdict, including never-paired ones
    assert set(verdict) == {0, 7, 14, 21}


def test_bloom_prefilter_precomputed_batch_bands_hook(spark):
    # the batch_bands hook (r16: the handoff feeds every gate from one
    # shared signature pass) must return bit-identical verdicts to the
    # derive-inline default — bands are a pure function of the text.
    rows = [(i, f"unique words number {i} alpha beta gamma delta {i}") for i in range(24)]
    rows[8] = (8, rows[0][1])
    df = _docs(spark, rows)
    batch = df.where(F.col("doc_id") % 7 == 0)
    corpus = df.where(F.col("doc_id") % 7 != 0)
    corpus_bands = dedup.minhash_bands(dedup.minhash_signature(corpus))
    precomputed = dedup.minhash_bands(dedup.minhash_signature(batch))
    inline = {
        r.doc_id: r.maybe_neardup
        for r in dedup.bloom_neardup_prefilter(batch, corpus_bands).collect()
    }
    hooked = {
        r.doc_id: r.maybe_neardup
        for r in dedup.bloom_neardup_prefilter(
            batch, corpus_bands, batch_bands=precomputed
        ).collect()
    }
    assert hooked == inline
    assert set(hooked) == {0, 7, 14, 21}


def test_bloom_prefilter_empty_text_is_false(spark):
    df = _docs(spark, [(0, None), (7, ""), (14, "short"), (1, "corpus doc words here")])
    batch = df.where(F.col("doc_id") % 7 == 0)
    corpus = df.where(F.col("doc_id") % 7 != 0)
    corpus_bands = dedup.minhash_bands(dedup.minhash_signature(corpus))
    verdict = {
        r.doc_id: r.maybe_neardup
        for r in dedup.bloom_neardup_prefilter(batch, corpus_bands).collect()
    }
    # NULL / empty / <3-token docs have no shingles -> no bands -> false
    assert verdict == {0: False, 7: False, 14: False}


def test_bloom_packed_probe_equals_position_set_membership(spark):
    # the packed-word probe must agree with direct membership of every
    # probe position in the corpus position set (packing is lossless)
    df = _docs(spark, [(i, f"some body of text {i} for hashing {i * 3}") for i in range(30)])
    bands = dedup.minhash_bands(dedup.minhash_signature(df))
    m, k = 1 << 12, 5
    corpus_b = bands.where(F.col("doc_id") % 3 != 0)
    probe_b = bands.where(F.col("doc_id") % 3 == 0)
    bitmap = dedup.bloom_bitmap(corpus_b, m_bits=m, n_hashes=k)
    packed = {
        r.doc_id: r.maybe_member
        for r in dedup.bloom_probe(
            probe_b, bitmap, "band_hash", ["doc_id"], m_bits=m, n_hashes=k
        ).collect()
    }
    def pos_rows(df_):
        return df_.select(
            "doc_id",
            "band",
            F.explode(dedup._bloom_positions(F.col("band_hash"), m, k)).alias("p"),
        ).collect()

    corpus_pos = {r.p for r in pos_rows(corpus_b)}
    per_band: dict[tuple, list] = {}
    for r in pos_rows(probe_b):
        per_band.setdefault((r.doc_id, r.band), []).append(r.p in corpus_pos)
    naive: dict[int, bool] = {}
    for (doc_id, _), hits in per_band.items():
        naive[doc_id] = naive.get(doc_id, False) or all(hits)
    assert packed == naive


# ---------------------------------------------------------------------------
# star_components (large-star/small-star CC)
# ---------------------------------------------------------------------------


def test_star_components_adversarial_id_path(spark):
    # the exact structure that defeats pointer jumping: a long PATH
    # whose node ids are a deterministic pseudo-random permutation, so
    # the window-min id keeps landing mid-window. star contraction
    # must converge (O(log^2 n) bound) and label every node with the
    # component minimum.
    n = 64
    ids = sorted(range(n), key=lambda i: (i * 37) % n)  # permutation
    edges = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.cluster_id for r in dedup.star_components(e).collect()}
    assert got == {i: 0 for i in range(n)}


def test_star_components_two_components_and_pair(spark):
    e = spark.createDataFrame(
        [(5, 9), (9, 2), (11, 30), (40, 41)], "src long, dst long"
    )
    got = {r.node: r.cluster_id for r in dedup.star_components(e).collect()}
    assert got == {5: 2, 9: 2, 2: 2, 11: 11, 30: 11, 40: 40, 41: 40}


def test_cluster_append_merges_touched_keeps_untouched(spark):
    # stored: {10,20,30} labeled 10, {50,60} labeled 50, {70,80} labeled 70.
    # batch edges: new node 5 bridges the two first clusters (5-20, 5-60)
    # and new nodes 90-91 form their own pair. Cluster {70,80} is
    # untouched and must keep its label verbatim; the merged component's
    # label must drop to the new global min (5).
    stored = spark.createDataFrame(
        [(10, 10), (20, 10), (30, 10), (50, 50), (60, 50), (70, 70), (80, 70)],
        "doc_id long, cluster_id long",
    )
    edges = spark.createDataFrame(
        [(5, 20), (5, 60), (90, 91)], "src long, dst long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup.cluster_append(stored, edges).collect()}
    assert got == {
        10: 5, 20: 5, 30: 5, 50: 5, 60: 5, 5: 5,
        70: 70, 80: 70,
        90: 90, 91: 90,
    }


def test_cluster_append_equals_full_recompute(spark):
    # incremental-from-store == star CC over the union edge set, on a
    # random-ish split of one synthetic pair graph.
    all_edges = [(1, 2), (2, 3), (4, 5), (6, 7), (7, 8), (3, 9), (10, 11)]
    corpus_edges = [(u, v) for u, v in all_edges if u % 3 != 0 and v % 3 != 0]
    batch_edges = [e for e in all_edges if e not in corpus_edges]
    ce = spark.createDataFrame(corpus_edges, "src long, dst long")
    be = spark.createDataFrame(batch_edges, "src long, dst long")
    stored = dedup.star_components(ce).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    inc = {
        (r.doc_id, r.cluster_id)
        for r in dedup.cluster_append(stored, be).collect()
    }
    full = {
        (r.node, r.cluster_id)
        for r in dedup.star_components(
            spark.createDataFrame(all_edges, "src long, dst long")
        ).collect()
    }
    assert inc == full


def test_cluster_append_empty_batch_is_identity(spark):
    stored = spark.createDataFrame(
        [(10, 10), (20, 10), (50, 50)], "doc_id long, cluster_id long"
    )
    edges = spark.createDataFrame([], "src long, dst long")
    got = {r.doc_id: r.cluster_id for r in dedup.cluster_append(stored, edges).collect()}
    assert got == {10: 10, 20: 10, 50: 50}


def test_neardup_clusters_star_equals_label_method(spark):
    rows = []
    for i in range(12):
        rows.append((i, f"unique filler number {i} one two three {i}"))
    # a chained near-dup family: 2~5~8 share text, 3~9 share text
    rows[5] = (5, rows[2][1])
    rows[8] = (8, rows[2][1])
    rows[9] = (9, rows[3][1])
    df = _docs(spark, rows)
    lab = {
        (r.doc_id, r.cluster_id)
        for r in dedup.neardup_clusters(df, threshold=0.5).collect()
    }
    star = {
        (r.doc_id, r.cluster_id)
        for r in dedup.neardup_clusters(df, threshold=0.5, method="star").collect()
    }
    assert star == lab
    assert {(2, 2), (5, 2), (8, 2), (3, 3), (9, 3)} <= star


def test_neardup_clusters_precomputed_artifact_hooks(spark):
    # the bands_df/shingles_df pass-through (r16: dedup_clusters_append
    # shares one corpus signature pass across the stored clustering and
    # the cross pair join) must label identically to the derive-inline
    # default — the hooks reach minhash_lsh_pairs' existing contract.
    rows = [(i, f"unique filler number {i} one two three {i}") for i in range(12)]
    rows[5] = (5, rows[2][1])
    rows[8] = (8, rows[2][1])
    df = _docs(spark, rows)
    inline = {
        (r.doc_id, r.cluster_id)
        for r in dedup.neardup_clusters(df, threshold=0.5, method="star").collect()
    }
    bands = dedup.minhash_bands(dedup.minhash_signature(df))
    sh = dedup.shingle_sets(df)
    hooked = {
        (r.doc_id, r.cluster_id)
        for r in dedup.neardup_clusters(
            df, threshold=0.5, method="star", bands_df=bands, shingles_df=sh
        ).collect()
    }
    assert hooked == inline
    assert {(2, 2), (5, 2), (8, 2)} <= hooked


def test_line_dedup_rewrite_goldens(spark):
    df = spark.createDataFrame(
        [
            (0, "a\nb\na\n\nb\nc\n\na"),  # dups of a, b dropped; empties kept
            (1, None),
            (2, ""),
            (3, "only\nunique\nlines"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_lines_kept, r.n_lines_removed)
        for r in dedup.line_dedup_rewrite(df).collect()
    }
    assert got[0] == ("a\nb\n\nc\n", 5, 3)
    assert got[1] == (None, 0, 0)
    assert got[2] == ("", 1, 0)
    assert got[3] == ("only\nunique\nlines", 3, 0)


def test_bloom_bitmap_union_equals_rebuild_and_is_idempotent(spark):
    """The incremental-bitmap contract (VERDICT r07 item 3): unioning
    a batch's delta bitmap into the stored bitmap must equal the
    from-scratch bitmap over store+batch, and re-admitting the same
    delta (checkpoint replay) must change nothing — both direct
    consequences of bit_or idempotence that the plumbing (full-outer
    + coalesce + OR) must preserve."""
    docs = spark.createDataFrame(
        [(i, f"doc number {i} with some shared words and tail {i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    corpus = docs.where("doc_id % 4 != 0")
    batch = docs.where("doc_id % 4 = 0")
    b_corpus = dedup.bloom_bitmap(dedup.minhash_bands(dedup.minhash_signature(corpus)))
    b_batch = dedup.bloom_bitmap(dedup.minhash_bands(dedup.minhash_signature(batch)))
    b_all = dedup.bloom_bitmap(dedup.minhash_bands(dedup.minhash_signature(docs)))

    unioned = dedup.bloom_bitmap_union(b_corpus, b_batch)
    got = sorted(map(tuple, unioned.collect()))
    want = sorted(map(tuple, b_all.collect()))
    assert got == want and len(got) > 0

    # replaying the same delta is a no-op
    again = dedup.bloom_bitmap_union(unioned, b_batch)
    assert sorted(map(tuple, again.collect())) == want

    # and probes through the unioned bitmap see every stored hash
    bands_all = dedup.minhash_bands(dedup.minhash_signature(docs))
    verdicts = dedup.bloom_probe(bands_all, unioned)
    assert all(r.maybe_member for r in verdicts.collect())


def test_paragraph_dedup_rewrite_cross_document_first_occurrence(spark):
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        paragraph_dedup_rewrite,
    )

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "x y a b"), (4, "p q r"), (5, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup_rewrite(df, para_words=2).collect()}
    # doc 1 owns 'a b' (smallest (doc, pid) corpus-wide)
    assert out[1].text_dedup == "a b c d" and (out[1].n_paras, out[1].n_kept) == (2, 2)
    # doc 2 loses 'a b' to doc 1 but owns 'x y'
    assert out[2].text_dedup == "x y" and out[2].n_kept == 1
    # doc 3: both paragraphs already seen -> fully rewritten away
    assert out[3].text_dedup == "" and (out[3].n_paras, out[3].n_kept) == (2, 0)
    # ragged tail keeps its short last paragraph
    assert out[4].text_dedup == "p q r" and out[4].n_paras == 2
    # empty doc keeps its row with zero paragraphs
    assert out[5].text_dedup == "" and (out[5].n_paras, out[5].n_kept) == (0, 0)


def test_canonical_dedup_catches_case_and_whitespace_mangling(spark):
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        canonical_dedup,
        exact_dedup,
    )

    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),   # same canonical form as doc 1
            (3, "HELLO WORLD."),    # and again
            (4, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    # byte-exact dedup sees four distinct texts
    assert exact_dedup(df).count() == 4
    out = {r.keeper_id: r for r in canonical_dedup(df).collect()}
    assert set(out) == {1, 4}
    # the mangled trio collapses; raw_distinct prices what ONLY
    # canonicalization found (3 raw forms in one canonical group)
    assert out[1].dup_count == 3 and out[1].raw_distinct == 3
    assert out[4].dup_count == 1 and out[4].raw_distinct == 1


def test_prefix_filter_cuts_candidates_with_zero_recall_loss(spark):
    """The SSJoin prefix-filter guarantee, measured: the prefix join
    generates strictly fewer candidate pairs than the full shingle
    equi-join, and the verified output is IDENTICAL (no false
    negatives — also hash-pinned by the shared oracle)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_prefix_pairs,
        shingle_table,
    )
    from calculate_file_content_size_for_vector_db_spark.sources.io import read_table
    from tests.conftest import SF_DIR

    docs = read_table(spark, SF_DIR, "documents")
    sh = shingle_table(docs).persist()
    full_cand = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("_df"), F.asc("shingle"))
    pref = (
        sh.join(freq, "shingle")
        .withColumn("_pos", F.row_number().over(w))
        .join(sizes, "doc_id")
        .where(F.col("_pos") <= F.col("n") - F.ceil(F.lit(0.5) * F.col("n")) + 1)
        .select("doc_id", "shingle")
    )
    pref_cand = (
        pref.alias("a")
        .join(pref.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    assert pref_cand < full_cand
    got = {
        (r.a_id, r.b_id, r.jaccard)
        for r in ngram_jaccard_prefix_pairs(docs, threshold=0.5).collect()
    }
    want = {
        (r.a_id, r.b_id, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert got == want
    sh.unpersist()


# ---------------------------------------------------------------------------
# cluster_takedown (right-to-be-forgotten repair of the stored labeling)
# ---------------------------------------------------------------------------


def _takedown_fixture(spark, rows, takedown_ids):
    """Build (stored labels, takedown, bands, shingles) the way the
    registered query does — from the corpus itself."""
    docs = _docs(spark, rows)
    stored = dedup.neardup_clusters(docs, threshold=0.5, method="star")
    bands = dedup.minhash_bands(dedup.minhash_signature(docs))
    sh = dedup.shingle_sets(docs)
    td = spark.createDataFrame([(i,) for i in takedown_ids], "doc_id long")
    return docs, stored, td, bands, sh


def test_cluster_takedown_untouched_verbatim_relabel_and_singleton_drop(spark):
    # exact-dup groups: {1,2,3} (label 1), {10,11} (label 10),
    # {20,21,22} (label 20); 30 is a singleton (never labeled).
    # takedown {1, 22}: cluster 1 loses its MINIMUM (relabel 2->2,3->2),
    # cluster 20 loses a non-min member (label stays 20), cluster 10 is
    # untouched and must come back verbatim.
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "alpha beta gamma delta epsilon"),
        (10, "omega psi chi phi upsilon"),
        (11, "omega psi chi phi upsilon"),
        (20, "red green blue cyan magenta"),
        (21, "red green blue cyan magenta"),
        (22, "red green blue cyan magenta"),
        (30, "lonely words with no duplicate here"),
    ]
    docs, stored, td, bands, sh = _takedown_fixture(spark, rows, [1, 22])
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.cluster_takedown(stored, td, bands, sh).collect()
    }
    assert got == {2: 2, 3: 2, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cluster_takedown_bridge_removal_splits_and_equals_rebuild(spark):
    # chain A(100)~B(101)~C(102) via token-window overlap (A and C do
    # not near-dup each other); removing the bridge B must SPLIT the
    # cluster — both survivors lose their only edge and drop out of
    # the labeling. Exact-dup pair {200,201} stays untouched.
    t = [f"tok{i}" for i in range(20)]
    rows = [
        (100, " ".join(t[0:10])),
        (101, " ".join(t[2:12])),
        (102, " ".join(t[4:14])),
        (200, "solid stable pair of documents here"),
        (201, "solid stable pair of documents here"),
    ]
    docs, stored, td, bands, sh = _takedown_fixture(spark, rows, [101])
    pre = {r.doc_id: r.cluster_id for r in stored.collect()}
    # the fixture is only meaningful if the chain actually clustered
    assert pre.get(100) == 100 and pre.get(101) == 100 and pre.get(102) == 100
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup.cluster_takedown(stored, td, bands, sh).collect()
    }
    assert got == {(200, 200), (201, 200)}
    # localized repair == full rebuild without the takedown docs
    remaining = docs.where(F.col("doc_id") != 101)
    rebuild = {
        (r.doc_id, r.cluster_id)
        for r in dedup.neardup_clusters(remaining, threshold=0.5, method="star").collect()
    }
    assert got == rebuild


def test_cluster_takedown_equals_rebuild_on_mixed_corpus(spark):
    # a larger mixed corpus: several dup groups + chains, takedown a
    # scattering of members; the repaired labeling must equal a
    # from-scratch clustering of the survivors.
    rows = []
    for g in range(4):
        text = f"group{g} common words shared by all members {g}"
        for m in range(3):
            rows.append((g * 10 + m, text))
    rows += [(90, "unique ninety document text body"), (91, "another unique text entirely")]
    takedown_ids = [0, 11, 22]  # min of group 0, non-min of groups 1 and 2
    docs, stored, td, bands, sh = _takedown_fixture(spark, rows, takedown_ids)
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup.cluster_takedown(stored, td, bands, sh).collect()
    }
    remaining = docs.join(td, "doc_id", "left_anti")
    rebuild = {
        (r.doc_id, r.cluster_id)
        for r in dedup.neardup_clusters(remaining, threshold=0.5, method="star").collect()
    }
    assert got == rebuild


def test_cluster_takedown_empty_and_unknown_ids_are_identity(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (10, "omega psi chi phi upsilon"),
        (11, "omega psi chi phi upsilon"),
        (30, "a singleton never clustered at all"),
    ]
    docs, stored, _, bands, sh = _takedown_fixture(spark, rows, [])
    before = {(r.doc_id, r.cluster_id) for r in stored.collect()}
    # empty takedown set
    td_empty = spark.createDataFrame([], "doc_id long")
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup.cluster_takedown(stored, td_empty, bands, sh).collect()
    }
    assert got == before
    # takedown of a never-clustered singleton and an unknown id touches
    # no cluster -> identity
    td_miss = spark.createDataFrame([(30,), (999,)], "doc_id long")
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup.cluster_takedown(stored, td_miss, bands, sh).collect()
    }
    assert got == before


def test_cluster_takedown_bucket_cap_bounds_repair(spark):
    """max_bucket_size passthrough (ADVICE r10): the hub-bucket cap
    applies to the SURVIVOR band table of touched clusters. cap=1
    forbids every repair pair (any surviving dup pair shares a >=2-row
    bucket) so touched survivors drop to singletons, while untouched
    clusters come back verbatim; a roomy cap reproduces the uncapped
    repair exactly."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "alpha beta gamma delta epsilon"),
        (10, "omega psi chi phi upsilon"),
        (11, "omega psi chi phi upsilon"),
    ]
    docs, stored, td, bands, sh = _takedown_fixture(spark, rows, [1])
    capped_out = {
        r.doc_id: r.cluster_id
        for r in dedup.cluster_takedown(stored, td, bands, sh, max_bucket_size=1).collect()
    }
    assert capped_out == {10: 10, 11: 10}  # {2,3} repair suppressed by the cap
    roomy = {
        r.doc_id: r.cluster_id
        for r in dedup.cluster_takedown(stored, td, bands, sh, max_bucket_size=64).collect()
    }
    uncapped = {
        r.doc_id: r.cluster_id
        for r in dedup.cluster_takedown(stored, td, bands, sh).collect()
    }
    assert roomy == uncapped == {2: 2, 3: 2, 10: 10, 11: 10}


def test_cluster_takedown_cap_counts_corpus_wide_survivors(spark):
    """ADVICE r11 item 1: the hub-bucket cap must count a bucket over
    ALL survivor rows corpus-wide — the capped-REBUILD universe — not
    just the touched-cluster slice. Hand-crafted artifacts: cluster
    {1,2,3} exists via two small bridge buckets through doc 1; a hub
    bucket {2,3,20,21,30} (5 rows > cap 4) was suppressed at build
    time, which is why 20/21 were never clustered. Takedown of bridge
    doc 1: a capped rebuild on the survivors still suppresses the hub
    (5 survivor rows corpus-wide) and the small buckets are single-row
    after the purge, so the correct repaired labeling is EMPTY.
    Slice-counting (the pre-fix bug) would see only hub rows {2,3}
    (2 <= 4), emit the (2,3) pair the capped build suppressed, and
    merge a cluster the stored labeling kept apart."""
    sa, sb, sc = ["a", "b", "c", "d"], ["x", "y", "z", "w"], ["p", "q", "r", "s"]
    sh = spark.createDataFrame(
        [(1, sa), (2, sa), (3, sa), (20, sb), (21, sb), (30, sc)],
        "doc_id long, sh array<string>",
    )
    bands = spark.createDataFrame(
        [
            (1, 1, 100), (2, 1, 100),            # bridge bucket S1: {1,2}
            (1, 2, 200), (3, 2, 200),            # bridge bucket S2: {1,3}
            (2, 0, 777), (3, 0, 777), (20, 0, 777), (21, 0, 777), (30, 0, 777),
        ],
        "doc_id long, band int, band_hash long",
    )
    stored = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    td = spark.createDataFrame([(1,)], "doc_id long")
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup.cluster_takedown(
            stored, td, bands, sh, max_bucket_size=4
        ).collect()
    }
    assert got == set()  # == capped rebuild on survivors; slice-count gave {(2,2),(3,2)}


def test_cluster_takedown_whole_cluster_vanishes(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (10, "omega psi chi phi upsilon"),
        (11, "omega psi chi phi upsilon"),
    ]
    docs, stored, td, bands, sh = _takedown_fixture(spark, rows, [1, 2])
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup.cluster_takedown(stored, td, bands, sh).collect()
    }
    assert got == {(10, 10), (11, 10)}

# ---------------------------------------------------------------------------
# dedup_upsert — re-ingest CHANGED documents into the stored labeling
# (round 12, late session; registration deferred to the round-13
# budget). Composition: cluster_takedown + batch-sized edge discovery
# + cluster_append, pinned == from-scratch clustering of the current
# corpus.
# ---------------------------------------------------------------------------


def _upsert_fixture(spark, rows):
    docs = _docs(spark, rows)
    stored = dedup.neardup_clusters(docs, threshold=0.5, method="star")
    bands = dedup.minhash_bands(dedup.minhash_signature(docs))
    sh = dedup.shingle_sets(docs)
    return docs, stored, bands, sh


def _labels(df):
    return {(r.doc_id, r.cluster_id) for r in df.collect()}


def test_dedup_upsert_equals_rebuild_on_current_corpus(spark):
    """Doc 11 is rewritten to leave group 1 and duplicate group 2's
    text; doc 99 is brand-new (a dup of group 1) — one batch. The
    upserted labeling must equal a from-scratch clustering of the
    current corpus: group 2 absorbs 11, group 1 absorbs 99."""
    rows = [
        (10, "alpha beta gamma delta epsilon"),
        (11, "alpha beta gamma delta epsilon"),
        (12, "alpha beta gamma delta epsilon"),
        (20, "omega psi chi phi upsilon"),
        (21, "omega psi chi phi upsilon"),
        (30, "a lone unique document body"),
    ]
    docs, stored, bands, sh = _upsert_fixture(spark, rows)
    batch = _docs(
        spark,
        [(11, "omega psi chi phi upsilon"), (99, "alpha beta gamma delta epsilon")],
    )
    got = _labels(dedup.dedup_upsert(stored, batch, bands, sh))
    current = docs.where(~F.col("doc_id").isin(11, 99)).unionByName(batch)
    rebuild = _labels(dedup.neardup_clusters(current, threshold=0.5, method="star"))
    assert got == rebuild
    # the readable motions: 11 now labels with group 2's min (11 < 20
    # makes it the NEW component min), 99 joins group 1 under min 10
    assert {(11, 11), (20, 11), (21, 11), (99, 10), (10, 10), (12, 10)} == got


def test_dedup_upsert_to_singleton_drops_row(spark):
    """A doc rewritten to match NOTHING must vanish from the labeling
    (singletons carry no row — the neardup_clusters convention), and
    its old cluster must relabel without it."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "alpha beta gamma delta epsilon"),
    ]
    docs, stored, bands, sh = _upsert_fixture(spark, rows)
    batch = _docs(spark, [(1, "completely unrelated new content body")])
    got = _labels(dedup.dedup_upsert(stored, batch, bands, sh))
    assert got == {(2, 2), (3, 2)}


def test_dedup_upsert_empty_batch_is_identity(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (10, "omega psi chi phi upsilon"),
        (11, "omega psi chi phi upsilon"),
    ]
    docs, stored, bands, sh = _upsert_fixture(spark, rows)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert _labels(dedup.dedup_upsert(stored, empty, bands, sh)) == _labels(stored)


def test_dedup_upsert_replay_idempotent(spark):
    """Re-delivering the same changed batch against the post-upsert
    store (labels + rewritten band/shingle artifacts, as production
    would hold them) must change nothing."""
    rows = [
        (10, "alpha beta gamma delta epsilon"),
        (11, "alpha beta gamma delta epsilon"),
        (20, "omega psi chi phi upsilon"),
        (21, "omega psi chi phi upsilon"),
    ]
    docs, stored, bands, sh = _upsert_fixture(spark, rows)
    batch = _docs(spark, [(11, "omega psi chi phi upsilon")])
    once = dedup.dedup_upsert(stored, batch, bands, sh)
    current = docs.where(F.col("doc_id") != 11).unionByName(batch)
    bands2 = dedup.minhash_bands(dedup.minhash_signature(current))
    sh2 = dedup.shingle_sets(current)
    twice = dedup.dedup_upsert(once, batch, bands2, sh2)
    assert _labels(twice) == _labels(once)


@pytest.mark.parametrize("seed", [23, 41])
def test_dedup_upsert_randomized_equals_rebuild(spark, seed):
    """Randomized sweep: shuffled dup-group corpora, a random batch of
    rewrites (docs moved between groups, to fresh text, or duplicated
    into a group they never touched) plus new ids — upsert must equal
    the from-scratch clustering of the current corpus."""
    import random

    rng = random.Random(seed)
    groups = [f"group {g} shares these exact common words {g}" for g in range(5)]
    rows = [(g * 10 + m, groups[g]) for g in range(5) for m in range(rng.randint(2, 4))]
    rows += [(90 + i, f"unique stray number {i} text body piece") for i in range(3)]
    docs, stored, bands, sh = _upsert_fixture(spark, rows)
    all_ids = [r[0] for r in rows]
    changed = rng.sample(all_ids, 4)
    new_ids = [200 + i for i in range(2)]
    batch_rows = [(i, groups[rng.randrange(5)]) for i in changed]
    batch_rows += [(i, rng.choice(groups + ["fresh singleton text entirely new"])) for i in new_ids]
    batch = _docs(spark, batch_rows)
    got = _labels(dedup.dedup_upsert(stored, batch, bands, sh))
    current = docs.where(~F.col("doc_id").isin(*(changed + new_ids))).unionByName(batch)
    rebuild = _labels(dedup.neardup_clusters(current, threshold=0.5, method="star"))
    assert got == rebuild
