"""Text query family (split from the entry_queries monolith;
see entry_queries/__init__.py for the assembled registry)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calculate_file_content_size_for_vector_db_spark.entry_queries._core import (
    REGISTRY,
    _BPE_N,
    _INCR_BATCH_MOD,
    _SQL_EMB,
    _SQL_QUALITY_CHAIN,
    _SQL_TOKENS,
    _docs,
    _emb,
    _sql_bpe_chain,
    register,
)


@register(
    "text_tokens",
    f"""
SELECT doc_id,
       CAST(len({_SQL_TOKENS}) AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INT) AS n_bpe_tokens,
       CAST(length(text) AS INT) AS n_chars_text
FROM documents
""",
)
def text_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import token_counts

    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_bpe_tokens", "n_chars_text"
    )


@register(
    "text_quality",
    f"""
WITH {_SQL_QUALITY_CHAIN}
SELECT doc_id, punct_ratio, alpha_ratio, stopword_ratio, mean_word_len, quality_score
FROM q
""",
)
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import quality_score

    return quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "punct_ratio", "alpha_ratio", "stopword_ratio",
        "mean_word_len", "quality_score",
    )


@register(
    "text_lang_id",
    f"""
WITH t AS (
    SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents
), s AS (
    SELECT doc_id,
           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS INT) AS score_en,
           CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ist','ein'))) AS INT) AS score_de,
           CAST(len(list_filter(ws, w -> w IN ('el','la','de','que','y','un'))) AS INT) AS score_es,
           CAST(len(list_filter(ws, w -> w IN ('le','la','et','les','des','un'))) AS INT) AS score_fr,
           CAST(len(list_filter(ws, w -> w IN ('的','是','了','在'))) AS INT) AS score_zh
    FROM t
)
SELECT doc_id, score_en, score_de, score_es, score_fr, score_zh,
       CASE WHEN greatest(score_en, score_de, score_es, score_fr, score_zh) = 0 THEN 'und'
            WHEN score_en = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'en'
            WHEN score_de = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'de'
            WHEN score_es = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'es'
            WHEN score_fr = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'fr'
            ELSE 'zh' END AS predicted_lang
FROM s
""",
)
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import lang_id

    return lang_id(_docs(spark, sf_dir)).select(
        "doc_id", "score_en", "score_de", "score_es", "score_fr", "score_zh",
        "predicted_lang",
    )


@register(
    "text_fingerprint",
    """
SELECT doc_id,
       CASE WHEN text IS NULL OR length(text) = 0 THEN 0
            ELSE list_reduce(
                list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT)),
                (a, b) -> (a * 31 + b) % 1000000007) END AS fp
FROM documents
""",
)
def text_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import fingerprint

    return _docs(spark, sf_dir).select("doc_id", fingerprint("text").alias("fp"))


@register(
    "text_lm_score",
    f"""
WITH tok AS (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
),
freq AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM freq)
SELECT d.doc_id, s.lm_score
FROM documents d LEFT JOIN (
    SELECT t.doc_id, round(avg(ln(f.tf / tot.n)), 6) AS lm_score
    FROM tok t JOIN freq f USING (tok), tot
    GROUP BY t.doc_id
) s USING (doc_id)
""",
)
def text_lm_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram LM filter score (textstats.unigram_logprob):
    corpus frequencies are the LM, docs score by mean token
    ln-probability."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        unigram_logprob,
    )

    return unigram_logprob(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Corpus/ML utilities: vocabulary, TF-IDF, deterministic splits,
# map explode, window-function breadth
# ---------------------------------------------------------------------------


@register(
    "vocabulary",
    f"""
WITH toks AS (
    SELECT unnest({_SQL_TOKENS}) AS word FROM documents
)
SELECT word, count(*) AS n,
       CAST(row_number() OVER (ORDER BY count(*) DESC, word) AS INT) AS rank
FROM toks GROUP BY word
""",
)
def vocabulary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with frequency ranks (explode + count + rank).

    The rank window is global (unpartitioned) but its input is the
    POST-AGGREGATION distinct-word frame — natural-language vocabulary
    grows ~O(corpus^0.5) (Heaps' law), millions of rows at 100 TB, not
    the token fact table's trillions. Consumers needing only the head
    should add .limit(k) before collecting. Pinned by
    tests/test_plans.py::test_global_window_rankers_rank_aggregated_frames.
    """
    from pyspark.sql import Window

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import tokens

    toks = _docs(spark, sf_dir).select(F.explode(tokens("text")).alias("word"))
    counts = toks.groupBy("word").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("word"))
    return counts.withColumn("rank", F.row_number().over(w).cast("int"))


@register(
    "tfidf_top_terms",
    f"""
WITH toks AS (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS word FROM documents
),
tf AS (
    SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
),
df_t AS (
    SELECT word, count(DISTINCT doc_id) AS dfreq FROM toks GROUP BY word
),
n_docs AS (SELECT count(*) AS n FROM documents),
scored AS (
    SELECT tf.doc_id, tf.word,
           round(tf.tf * ln(CAST(n_docs.n AS DOUBLE) / df_t.dfreq), 6) AS tfidf
    FROM tf JOIN df_t USING (word) CROSS JOIN n_docs
)
SELECT doc_id, word, tfidf, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, word) AS INT) AS rank
    FROM scored
) WHERE rank <= 3
""",
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: two hash-aggs (term-freq, doc-freq) + a broadcast join of
    the term dictionary + windowed top-3 terms per doc."""
    from pyspark.sql import Window

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import tokens

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dft = toks.groupBy("word").agg(F.countDistinct("doc_id").alias("dfreq"))
    n = docs.count()
    scored = tf.join(F.broadcast(dft), "word").select(
        "doc_id",
        "word",
        F.round(F.col("tf") * F.log(F.lit(float(n)) / F.col("dfreq")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "word", "tfidf", "rank")
    )


@register(
    "text_readability",
    """
WITH m AS (
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS BIGINT) AS n_words,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
           CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syllables
    FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words = 0 THEN NULL
            ELSE round(206.835
                       - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                       - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)), 6)
       END AS flesch
FROM m
""",
)
def text_readability_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (vowel-group syllable proxy,
    [.!?]-run sentence proxy) — the prose-complexity quality signal
    next to gopher_quality's boilerplate rules. Pure per-row
    regexp_count derivation: no shuffle, whole-stage codegen."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import readability

    return readability(_docs(spark, sf_dir))


@register(
    "bpe_top_pairs",
    f"""
WITH w AS (
    SELECT t AS word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest({_SQL_TOKENS}) AS t FROM documents)
    GROUP BY 1
),
p AS (
    SELECT substring(word, CAST(j AS INT), 2) AS pair, n
    FROM (SELECT word, n, unnest(range(1, greatest(length(word), 1))) AS j FROM w)
),
f AS (
    SELECT pair, CAST(sum(n) AS BIGINT) AS freq
    FROM p WHERE length(pair) = 2 GROUP BY 1
)
SELECT pair, freq, CAST(row_number() OVER (ORDER BY freq DESC, pair) AS INT) AS rank
FROM f QUALIFY rank <= 20
""",
)
def bpe_top_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scoring pass of one BPE merge step (Sennrich et al. 2016)
    run distributed: top-20 adjacent character pairs by corpus
    frequency. Occurrences compress to the (word, count) dictionary
    first — the orders-of-magnitude-smaller frame classic BPE trains
    on — then explode to length-1 pairs and one keyed sum."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir))


@register(
    "bpe_train_merges",
    _sql_bpe_chain(_BPE_N)
    + "\n"
    + " UNION ALL ".join(
        f"SELECT CAST(rank AS INT) AS rank, lhs, rhs, merged, pair_count FROM b{i}"
        for i in range(1, _BPE_N + 1)
    ),
)
def bpe_train_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained BPE merge table (Sennrich et al. 2016) — 8 greedy
    merges over the corpus word dictionary, the tokenizer-as-artifact
    next to quality_classifier_weights' classifier-as-artifact. Every
    round is vocab-bounded (pair hash-agg + 1-row argmax + one literal
    replace rewrite), the corpus itself is scanned exactly once for
    word counts; rounds localCheckpoint the |V|-row repr table so the
    plan stays flat (operators/textstats.py:_bpe_train_reprs)."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_train_merges,
    )

    return bpe_train_merges(_docs(spark, sf_dir))


@register(
    "bpe_apply_tokens",
    _sql_bpe_chain(_BPE_N)
    + f""",
vocab AS (
    SELECT word,
           CAST(len(string_split(trim(repr), '  ')) AS BIGINT) AS n_sym
    FROM r{_BPE_N}
),
tk AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS word FROM documents)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
FROM tk JOIN vocab USING (word) GROUP BY doc_id
""",
)
def bpe_apply_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token counts under the TRAINED segmentation: the final
    merged reprs ARE the segmentation of every vocab word, so serving
    is one broadcast join from the exploded corpus onto the |V|-row
    (word -> n_symbols) map — the merge loop never touches documents.
    Docs with zero tokens are absent on both sides (inner join)."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_apply_tokens,
    )

    return bpe_apply_tokens(_docs(spark, sf_dir))


@register(
    "bpe_apply_oov",
    _sql_bpe_chain(_BPE_N, train_where="WHERE doc_id % 17 <> 0")
    + f""",
nw AS (
    SELECT DISTINCT t AS word
    FROM (SELECT unnest({_SQL_TOKENS}) AS t FROM documents WHERE doc_id % 17 = 0)
),
a0 AS (
    SELECT word,
           ' ' || array_to_string(string_split(word, ''), '  ') || ' ' AS repr
    FROM nw
),
"""
    + ",\n".join(
        f"""a{i} AS (
    SELECT word, replace(repr, ' ' || b.lhs || '  ' || b.rhs || ' ',
                         ' ' || b.merged || ' ') AS repr
    FROM a{i - 1} CROSS JOIN b{i} b
)"""
        for i in range(1, _BPE_N + 1)
    )
    + f""",
vocab AS (
    SELECT word,
           CAST(len(string_split(trim(repr), '  ')) AS BIGINT) AS n_sym
    FROM a{_BPE_N}
),
tk AS (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS word
    FROM documents WHERE doc_id % 17 = 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
FROM tk JOIN vocab USING (word) GROUP BY doc_id
""",
)
def bpe_apply_oov_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The out-of-vocabulary serving path: a tokenizer trained ONLY on
    docs with id % 17 != 0 segments the HELD-OUT docs by replaying the
    stored merge table in rank order — an F.aggregate fold over the
    merges as a 1-row broadcast (textstats.bpe_segment_with_merges),
    each step the same boundary-safe literal replace training used.
    Distinct held-out words fold once; documents pay one broadcast
    join. This is what a deployed tokenizer does to fresh crawl data;
    the oracle replays the identical merges as unrolled CTE rounds."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_apply_oov,
    )

    return bpe_apply_oov(_docs(spark, sf_dir))


@register(
    "bpe_vocab_coverage",
    f"""
WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS w FROM documents),
vocab AS (SELECT DISTINCT w FROM tok WHERE doc_id % 17 <> 0),
bw AS (SELECT w, CAST(count(*) AS BIGINT) AS occ
       FROM tok WHERE doc_id % 17 = 0 GROUP BY w),
fl AS (SELECT bw.occ, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
       FROM bw LEFT JOIN vocab v ON bw.w = v.w)
SELECT CAST(count(*) AS BIGINT) AS n_batch_words,
       CAST(sum(oov) AS BIGINT) AS n_oov_words,
       CAST(sum(occ) AS BIGINT) AS n_batch_tokens,
       CAST(sum(oov * occ) AS BIGINT) AS n_oov_tokens,
       round(sum(oov) / CAST(NULLIF(count(*), 0) AS DOUBLE), 6) AS oov_word_rate,
       round(sum(oov * occ) / CAST(NULLIF(sum(occ), 0) AS DOUBLE), 6) AS oov_token_rate
FROM fl
""",
)
def bpe_vocab_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-staleness QA (textstats.bpe_vocab_coverage): OOV
    word/token rates of the held-out batch (the bpe_apply_oov split,
    doc_id % 17 == 0) against the stored training vocabulary — the
    retrain trigger for the trained merge table, completing the
    round-8 store-maintenance symmetry (sim_ivf_append/ivf_staleness
    :: bpe_apply_oov/bpe_vocab_coverage). Coverage needs only the
    vocab's word set, so no merge training appears in the plan."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_vocab_coverage,
    )

    return bpe_vocab_coverage(_docs(spark, sf_dir))


@register(
    "text_bigram_lm",
    f"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
bg AS (
    SELECT doc_id, toks[CAST(j AS INT)] AS w1, toks[CAST(j AS INT) + 1] AS w2
    FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks), 1))) AS j FROM t)
),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      FROM (SELECT unnest(toks) AS tok FROM t)),
sc AS (
    SELECT b.doc_id,
           round(avg(ln((c12.c12 + 1) / CAST(c1.c1 + v.v AS DOUBLE))), 6) AS lm2_score
    FROM bg b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY 1
)
SELECT d.doc_id, sc.lm2_score FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
""",
)
def text_bigram_lm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM score with add-1 smoothing (mean ln P(w2|w1)) — the
    word-ORDER-aware sequel to text_lm_score: scrambled text keeps its
    unigram score but collapses here. Bigrams derive per-row from the
    token array (slice+zip, no positional self-join); the LM is two
    vocab-bounded hash-aggs."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import bigram_logprob

    return bigram_logprob(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Round-6 extension surface (sixth wave): BM25 lexical retrieval,
# Markov event transitions, referential-integrity audit
# ---------------------------------------------------------------------------

_BM25_QUERIES = [(0, "spark hash join"), (1, "table scan fast"), (2, "sort merge batch")]

# Shared by bm25_search and hybrid_search_rrf so the lexical side of
# the fusion provably matches the standalone ranking.
_SQL_BM25_CTES = f"""q AS (SELECT * FROM (VALUES {", ".join(f"({i}, '{s}')" for i, s in _BM25_QUERIES)}) AS t(query_id, q)),
qt AS (
    SELECT DISTINCT query_id,
           unnest(list_filter(regexp_split_to_array(q, '\\s+'), w -> w <> '')) AS term
    FROM q
),
toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
st AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
              (SELECT avg(dl) FROM dl) AS avgdl),
sc AS (
    SELECT qt.query_id, tf.doc_id,
           round(sum(ln((st.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 6) AS score
    FROM tf JOIN qt USING (term) JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
    GROUP BY 1, 2
)"""


@register(
    "bm25_search",
    f"""
WITH {_SQL_BM25_CTES}
SELECT query_id, doc_id, score,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
FROM sc QUALIFY rank <= 10
""",
)
def bm25_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per keyword query (Lucene +1 idf form) — lexical
    retrieval next to the nine embedding tiers, and the standard
    hybrid-search complement. The scoring join is posting-list-sized
    (only rows whose term appears in a query), never corpus-sized;
    query terms and the 1-row (N, avgdl) frame broadcast."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import bm25_search

    return bm25_search(_docs(spark, sf_dir), _BM25_QUERIES)


@register("bm25_search_stored", None)  # oracle assigned below — identical to bm25_search
def bm25_search_stored_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LEXICAL index under bm25_search's oracle VERBATIM —
    retrieval joins the incremental-store family: the base corpus's
    posting artifacts (per-(doc,term) tf, per-doc lengths, 1-row
    n_docs meta) persist to parquet, the daily batch's artifacts are
    computed batch-only and APPENDED (doc-keyed tables with disjoint
    keys union by plain append; the meta row appends and sums on
    read), and the search serves entirely from the merged store
    through bm25_search's tf_df/dl_df/meta_df hooks — df/idf/avgdl
    derive at query time, so no stored statistic ever goes stale.
    The shared-oracle hash pins append == full rebuild AND the
    parquet seam (tf/dl are ints — lossless)."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bm25_postings,
        bm25_search,
    )

    docs = _docs(spark, sf_dir)
    base = docs.where(F.col("doc_id") % _INCR_BATCH_MOD != 0)
    batch = docs.where(F.col("doc_id") % _INCR_BATCH_MOD == 0)
    store = tempfile.mkdtemp(prefix="bm25_store_")
    tf_b, dl_b, meta_b = bm25_postings(base)
    tf_b.write.mode("overwrite").parquet(f"{store}/tf")
    dl_b.write.mode("overwrite").parquet(f"{store}/dl")
    meta_b.write.mode("overwrite").parquet(f"{store}/meta")
    tf_n, dl_n, meta_n = bm25_postings(batch)
    tf_n.write.mode("append").parquet(f"{store}/tf")
    dl_n.write.mode("append").parquet(f"{store}/dl")
    meta_n.write.mode("append").parquet(f"{store}/meta")
    meta = spark.read.parquet(f"{store}/meta").agg(
        F.sum("n_docs").cast("long").alias("n_docs")
    )
    return bm25_search(
        None,
        _BM25_QUERIES,
        tf_df=spark.read.parquet(f"{store}/tf"),
        dl_df=spark.read.parquet(f"{store}/dl"),
        meta_df=meta,
    )


REGISTRY["bm25_search_stored"].oracle = REGISTRY["bm25_search"].oracle


# The takedown oracle is bm25_search's CTE chain verbatim, rebased
# onto the survivor corpus: because df/idf/avgdl derive from tf/dl at
# QUERY time (never stored), purging a doc's tf and dl rows plus a
# compensating n_docs partial is EXACTLY a rebuild on survivors — the
# strong equivalence the graph takedown intentionally does not claim.
_SQL_BM25_SURV_CTES = (
    "dsurv AS (SELECT * FROM documents WHERE doc_id % 13 <> 0),\n"
    + _SQL_BM25_CTES.replace("FROM documents", "FROM dsurv")
)


@register(
    "bm25_takedown_search",
    f"""
WITH {_SQL_BM25_SURV_CTES}
SELECT query_id, doc_id, score,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
FROM sc QUALIFY rank <= 10
""",
)
def bm25_takedown_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-store takedown (VERDICT r10 item 4) — right-to-be-
    forgotten for the LEXICAL index, closing the lifecycle asymmetry:
    a forgotten doc influences BM25 three ways (its own tf rows — the
    direct "deleted doc still retrievable" leak; its dl row — avgdl
    shifts for every doc; its +1 in n_docs — idf shifts for every
    term), and this row pins all three. The full corpus's posting
    artifacts persist to parquet, textstats.postings_takedown purges
    the % 13 family (tf/dl by broadcast anti-join, written as v2
    stores) and emits a compensating NEGATIVE n_docs partial that is
    APPENDED to the meta store and sum-folded on read — the
    subtractive direction of the same append-and-sum contract
    bm25_search_stored's batch append exercises. Search serves
    entirely from the purged store; the oracle is bm25_search's chain
    on the survivor corpus, so the hash pins purge == rebuild (true
    equivalence here because every global statistic derives at query
    time). idf/avgdl move for EVERY query when n_docs drops, so a
    stale meta row — the easiest takedown bug — shifts every score in
    the hash. At 100 TB: two request-sized broadcast anti-joins over
    posting scans a compaction pays anyway, one appended 1-row
    partial, zero retraining."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bm25_postings,
        bm25_search,
        postings_takedown,
    )

    docs = _docs(spark, sf_dir)
    store = tempfile.mkdtemp(prefix="bm25_takedown_")
    tf, dl, meta = bm25_postings(docs)
    tf.write.parquet(f"{store}/tf")
    dl.write.parquet(f"{store}/dl")
    meta.write.parquet(f"{store}/meta")
    forgotten = docs.where(F.col("doc_id") % 13 == 0).select("doc_id")
    tf2, dl2, meta_delta = postings_takedown(
        spark.read.parquet(f"{store}/tf"),
        spark.read.parquet(f"{store}/dl"),
        forgotten,
        admitted=docs,  # the ingested universe: exact n_docs even for zero-token docs
    )
    tf2.write.parquet(f"{store}/tf_v2")
    dl2.write.parquet(f"{store}/dl_v2")
    meta_delta.write.mode("append").parquet(f"{store}/meta")
    meta_merged = spark.read.parquet(f"{store}/meta").agg(
        F.sum("n_docs").cast("long").alias("n_docs")
    )
    return bm25_search(
        None,
        _BM25_QUERIES,
        tf_df=spark.read.parquet(f"{store}/tf_v2"),
        dl_df=spark.read.parquet(f"{store}/dl_v2"),
        meta_df=meta_merged,
    )


# The upsert oracle is bm25_search's CTE chain verbatim, rebased onto
# the CURRENT corpus (every 13th doc re-delivered with deterministically
# edited text) — the same strong purge==rebuild equivalence the takedown
# row pins, in the replace direction.
_SQL_BM25_CUR_CTES = (
    "cdocs AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0 "
    "THEN text || ' spark spark hash' ELSE text END AS text FROM documents),\n"
    + _SQL_BM25_CTES.replace("FROM documents", "FROM cdocs")
)


@register(
    "bm25_upsert_search",
    f"""
WITH {_SQL_BM25_CUR_CTES}
SELECT query_id, doc_id, score,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
FROM sc QUALIFY rank <= 10
""",
)
def bm25_upsert_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPSERT for the LEXICAL posting store (VERDICT r12 item 2 — the
    BM25 twin of sim_ivf_upsert, registered from the r12-built
    surface): every 13th doc is RE-DELIVERED with edited text (a
    deterministic append both engines derive: " spark spark hash",
    which shifts tf for live query terms, so a stale posting row
    moves scores in the hash), and textstats.postings_upsert replaces
    its tf/dl rows as takedown + append in one plan — broadcast
    anti-join purges, batch-only re-tokenize, and a netted meta delta
    (−|batch| compensating partial + |batch| re-admit) appended to
    the sum-folded meta store. The upsert is applied TWICE through
    parquet store seams (v1 -> v2 -> v3), so one hash pins
    replay-safety AND upsert == rebuild-on-current-corpus — a TRUE
    equality for BM25 because df/idf/avgdl derive from tf/dl at query
    time, never stored (the same argument as the takedown row, in the
    replace direction). Search serves entirely from the upserted
    store; the oracle is bm25_search's chain on the edited corpus."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bm25_postings,
        bm25_search,
        postings_upsert,
    )

    docs = _docs(spark, sf_dir)
    store = tempfile.mkdtemp(prefix="bm25_upsert_")
    tf, dl, meta = bm25_postings(docs)
    tf.write.parquet(f"{store}/tf_v1")
    dl.write.parquet(f"{store}/dl_v1")
    meta.write.parquet(f"{store}/meta")
    changed = docs.where(F.col("doc_id") % 13 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" spark spark hash")).alias("text")
    )
    for v in (1, 2):
        tf_v, dl_v, meta_delta = postings_upsert(
            spark.read.parquet(f"{store}/tf_v{v}"),
            spark.read.parquet(f"{store}/dl_v{v}"),
            changed,
            admitted=docs,  # the ingested id universe (ids unchanged by re-delivery)
        )
        tf_v.write.parquet(f"{store}/tf_v{v + 1}")
        dl_v.write.parquet(f"{store}/dl_v{v + 1}")
        meta_delta.write.mode("append").parquet(f"{store}/meta")
    meta_merged = spark.read.parquet(f"{store}/meta").agg(
        F.sum("n_docs").cast("long").alias("n_docs")
    )
    return bm25_search(
        None,
        _BM25_QUERIES,
        tf_df=spark.read.parquet(f"{store}/tf_v3"),
        dl_df=spark.read.parquet(f"{store}/dl_v3"),
        meta_df=meta_merged,
    )


# ---------------------------------------------------------------------------
# Round-6 extension surface (seventh wave): lang-ID confusion matrix,
# KS distribution-drift monitor, weekday seasonality profile
# ---------------------------------------------------------------------------


@register(
    "lang_confusion",
    f"""
WITH t AS (
    SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents
), s AS (
    SELECT doc_id,
           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS INT) AS score_en,
           CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ist','ein'))) AS INT) AS score_de,
           CAST(len(list_filter(ws, w -> w IN ('el','la','de','que','y','un'))) AS INT) AS score_es,
           CAST(len(list_filter(ws, w -> w IN ('le','la','et','les','des','un'))) AS INT) AS score_fr,
           CAST(len(list_filter(ws, w -> w IN ('的','是','了','在'))) AS INT) AS score_zh
    FROM t
), p AS (
    SELECT doc_id,
           CASE WHEN greatest(score_en, score_de, score_es, score_fr, score_zh) = 0 THEN 'und'
                WHEN score_en = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'en'
                WHEN score_de = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'de'
                WHEN score_es = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'es'
                WHEN score_fr = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'fr'
                ELSE 'zh' END AS predicted_lang
    FROM s
), c AS (
    SELECT d.lang, p.predicted_lang, CAST(count(*) AS BIGINT) AS n
    FROM documents d JOIN p USING (doc_id)
    GROUP BY 1, 2
)
SELECT lang, predicted_lang, n,
       round(n / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share
FROM c
""",
)
def lang_confusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-word language identifier vs the
    labeled language — the QA for the lang-ID gate itself (which
    corpus slices the heuristic would mis-route, and where 'und'
    fallback mass concentrates). Narrow scoring map + one tiny
    langs^2-group agg + a windowed row-normalizer."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import lang_confusion

    return lang_confusion(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Round-6 extension surface (seventh wave): hybrid retrieval
# ---------------------------------------------------------------------------


@register(
    "hybrid_search_rrf",
    f"""
WITH {_SQL_BM25_CTES},
ltop AS (
    SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM sc
    ) WHERE rank <= 10
),
{_SQL_EMB},
vtop AS (
    SELECT query_id, doc_id, rank FROM (
        SELECT CAST(a.vec_id AS INT) AS query_id, b.vec_id AS doc_id,
               CAST(row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id) AS INT) AS rank
        FROM e a, e b WHERE a.vec_id < 3 AND a.vec_id <> b.vec_id
    ) WHERE rank <= 10
),
fused AS (
    SELECT query_id, doc_id,
           round(coalesce(1.0::DOUBLE / (60 + l.rank), 0) + coalesce(1.0::DOUBLE / (60 + v.rank), 0), 6) AS rrf_score,
           l.rank AS lex_rank, v.rank AS vec_rank
    FROM ltop l FULL OUTER JOIN vtop v USING (query_id, doc_id)
)
SELECT query_id, doc_id, rrf_score, lex_rank, vec_rank,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
FROM fused QUALIFY rank <= 10
""",
)
def hybrid_search_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-10 fused with cosine vector
    top-10 by reciprocal-rank fusion (k=60) — the query shape every
    vector DB ships as "hybrid search", and the capstone of this
    repo's retrieval surface (bm25_search x the nine embedding tiers).
    The three keyword queries pair with query vectors 0..2 (the
    fixture's doc/vec ids align), modeling a query with both a text
    and an embedding form. rrf_fuse is rank-based, so at 100 TB the
    vector side swaps to any ANN tier (IVF x PQ, binary, SQ8) without
    touching the fusion; both fused inputs stay candidate-list-sized,
    so fusion cost never scales with the corpus."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        rrf_fuse,
        topk_bruteforce,
    )
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import bm25_search

    lex = bm25_search(_docs(spark, sf_dir), _BM25_QUERIES)
    emb = _emb(spark, sf_dir)
    vec = topk_bruteforce(emb, emb.where(F.col("vec_id") < 3), k=10).withColumnRenamed(
        "neighbor_id", "doc_id"
    )
    return rrf_fuse(lex, vec, k_rrf=60, topn=10)


@register(
    "retrieval_recall_families",
    f"""
WITH {_SQL_BM25_CTES},
ltop AS (
    SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM sc
    ) WHERE rank <= 10
),
{_SQL_EMB},
vtop AS (
    SELECT query_id, doc_id, rank FROM (
        SELECT CAST(a.vec_id AS INT) AS query_id, b.vec_id AS doc_id,
               CAST(row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id) AS INT) AS rank
        FROM e a, e b WHERE a.vec_id < 3 AND a.vec_id <> b.vec_id
    ) WHERE rank <= 10
),
fused AS (
    SELECT query_id, doc_id,
           round(coalesce(1.0::DOUBLE / (60 + l.rank), 0) + coalesce(1.0::DOUBLE / (60 + v.rank), 0), 6) AS rrf_score
    FROM ltop l FULL OUTER JOIN vtop v USING (query_id, doc_id)
),
hy AS (
    SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fused
    ) WHERE rank <= 10
)
SELECT 'lexical' AS family,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.doc_id) AS BIGINT) AS n_hits,
       round(count(ap.doc_id) / CAST(count(*) AS DOUBLE), 6) AS recall
FROM vtop ex LEFT JOIN ltop ap
  ON ex.query_id = ap.query_id AND ex.doc_id = ap.doc_id
UNION ALL
SELECT 'hybrid' AS family,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.doc_id) AS BIGINT) AS n_hits,
       round(count(ap.doc_id) / CAST(count(*) AS DOUBLE), 6) AS recall
FROM vtop ex LEFT JOIN hy ap
  ON ex.query_id = ap.query_id AND ex.doc_id = ap.doc_id
""",
)
def retrieval_recall_families_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the LEXICAL (BM25) and HYBRID (RRF-fused) retrieval
    families against the exact-cosine truth — extending the recall
    matrix that so far graded only the ANN tiers to the other two
    families the engine serves. The three two-form fixture queries
    (keyword text paired with query vectors 0..2) are retrieved
    lexically and by exact vector search, fused by RRF, and both
    candidate lists are scored against the same brute-force truth the
    ANN recall rows use; the vector side IS that truth, so the hybrid
    row isolates what fusing a (recall-1.0) vector list with a lexical
    list costs or buys. Everything past the BM25 scoring join is
    candidate-list-sized (3 queries x 10 rows); the recall join and
    1-row aggregates never scale with the corpus."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        rrf_fuse,
        topk_bruteforce,
    )
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import bm25_search

    emb = _emb(spark, sf_dir)
    exact = topk_bruteforce(emb, emb.where(F.col("vec_id") < 3), k=10)
    lex = bm25_search(_docs(spark, sf_dir), _BM25_QUERIES)
    hyb = rrf_fuse(lex, exact.withColumnRenamed("neighbor_id", "doc_id"), k_rrf=60, topn=10)
    lex_recall = recall_vs_exact(exact, lex.withColumnRenamed("doc_id", "neighbor_id"))
    hyb_recall = recall_vs_exact(exact, hyb.withColumnRenamed("doc_id", "neighbor_id"))
    return lex_recall.select(F.lit("lexical").alias("family"), "*").unionByName(
        hyb_recall.select(F.lit("hybrid").alias("family"), "*")
    )


@register(
    "bpe_fertility_by_lang",
    _sql_bpe_chain(_BPE_N)
    + f""",
vocab AS (
    SELECT word,
           CAST(len(string_split(trim(repr), '  ')) AS BIGINT) AS n_sym
    FROM r{_BPE_N}
),
tk AS (SELECT lang, unnest({_SQL_TOKENS}) AS word FROM documents),
g AS (
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(length(word)) AS BIGINT) AS n_chars
    FROM tk JOIN vocab USING (word) GROUP BY lang
)
SELECT lang, n_words, n_bpe_tokens, n_chars,
       round(n_bpe_tokens / CAST(n_words AS DOUBLE), 6) AS fertility,
       round(n_chars / CAST(n_bpe_tokens AS DOUBLE), 6) AS chars_per_token
FROM g
""",
)
def bpe_fertility_by_lang_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer FERTILITY (BPE tokens per word) and
    compression (chars per BPE token) under the trained merge table
    (textstats.bpe_fertility) — the multilingual-tokenizer equity
    metric: the language the 8 greedy merges underserve segments into
    more pieces per word and pays more sequence length for the same
    text, making it the first candidate for more merges or more
    training data. The QUALITY half of the tokenizer-staleness pair
    (bpe_vocab_coverage = how much of the batch the vocab has seen;
    this row = how well it segments what it saw). Training is the
    vocab-bounded 8-round chain scanned once from the corpus; serving
    is one explode + broadcast |V|-row join + |langs|-group agg."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_fertility,
    )

    return bpe_fertility(_docs(spark, sf_dir))


@register("bpe_apply_stored", None)  # oracle assigned below
def bpe_apply_stored_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer serving THROUGH the parquet store, under
    bpe_apply_oov's oracle verbatim: the merge table is trained on the
    %17 train split, WRITTEN to parquet, read back, and the held-out
    batch is segmented by replaying the STORED merges — no training
    lineage in the serving plan. The merge table is strings and ints
    (rank, lhs, rhs, merged, pair_count), lossless in parquet, so the
    hash pins the serialization seam exactly as sim_topk_ivf_stored
    does for the index."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_apply_oov,
        bpe_train_merges,
    )

    docs = _docs(spark, sf_dir)
    store = tempfile.mkdtemp(prefix="bpe_store_")
    bpe_train_merges(docs.where(F.col("doc_id") % 17 != 0)).write.mode(
        "overwrite"
    ).parquet(store)
    return bpe_apply_oov(docs, merges_df=spark.read.parquet(store))


REGISTRY["bpe_apply_stored"].oracle = REGISTRY["bpe_apply_oov"].oracle
