"""Curation query family (split from the entry_queries monolith;
see entry_queries/__init__.py for the assembled registry)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
    BLOOM_BITS,
    BLOOM_HASHES,
    PROD_MAX_BUCKET_SIZE,
    PROD_MAX_SHINGLE_FREQ,
)

from calculate_file_content_size_for_vector_db_spark.entry_queries._core import (
    REGISTRY,
    _SQL_MINHASH_BANDS,
    _SQL_QUALITY_CHAIN,
    _SQL_TOKENS,
    _docs,
    _sql_hashed_features,
    _sql_logreg_chain,
    register,
)


@register(
    "source_reputation",
    f"""
WITH {_SQL_QUALITY_CHAIN}
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(q.quality_score), 6) AS source_quality
FROM documents d JOIN q USING (doc_id)
GROUP BY d.source
""",
)
def source_reputation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean composite quality (textstats.source_reputation)
    — the domain-reputation table a curation pipeline broadcasts into
    its ingestion gate."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        source_reputation,
    )

    return source_reputation(_docs(spark, sf_dir)).select(
        "source", F.col("n_docs").cast("long").alias("n_docs"), "source_quality"
    )


# (keep_rate, exact percentile literal 1 - keep_rate) — shared between
# the Spark percentile() calls and the DuckDB quantile_cont mirror so
# both interpolate the same binary fraction.
_CALIBRATE_RATES = ((0.5, "0.5"), (0.8, "0.2"), (0.95, "0.05"))


_SQL_CALIBRATE_THRESHOLDS = "\nUNION ALL\n".join(
    f"SELECT CAST({rate} AS DOUBLE) AS keep_rate,"
    f" round(quantile_cont(quality_score, {frac}), 6) AS threshold FROM q"
    for rate, frac in _CALIBRATE_RATES
)


@register(
    "quality_calibrate",
    f"""
WITH {_SQL_QUALITY_CHAIN},
th AS (
{_SQL_CALIBRATE_THRESHOLDS}
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM q)
SELECT th.keep_rate, th.threshold,
       CAST(count(*) FILTER (WHERE s.quality_score >= th.threshold) AS BIGINT) AS n_pass,
       round(count(*) FILTER (WHERE s.quality_score >= th.threshold)
             / CAST(any_value(tot.total) AS DOUBLE), 6) AS pass_rate
FROM q s, th, tot
GROUP BY th.keep_rate, th.threshold
""",
)
def quality_calibrate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate calibration: the quality-score thresholds that keep 50 /
    80 / 95 percent of the corpus, with the realized pass counts —
    pick a data budget, read off the cutoff (instead of hand-tuning a
    magic score). One percentile aggregate + a 1-row broadcast back
    over the scores."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        calibrate_quality_threshold,
    )

    return calibrate_quality_threshold(_docs(spark, sf_dir), _CALIBRATE_RATES)


@register(
    "mix_balanced_recipe",
    """
WITH per AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
corpus AS (
    SELECT CAST(sum(n_docs) AS DOUBLE) AS total,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(n_docs) AS BIGINT) AS min_n
    FROM per
)
SELECT lang, n_docs,
       round(n_docs / total, 6) AS actual_share,
       round(1.0 / n_groups, 6) AS target_share,
       round(min_n / CAST(n_docs AS DOUBLE), 6) AS sample_rate,
       min_n AS expected_docs
FROM per, corpus
""",
)
def mix_balanced_recipe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The uniform data-mixing recipe over languages: downsample every
    lang to the smallest lang's count (per-group sample_rate feeds
    sampleBy / a deterministic mod-id filter when composing the
    training mix). Two bounded shuffles."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        balanced_mix_recipe,
    )

    return balanced_mix_recipe(_docs(spark, sf_dir), "lang")


@register(
    "train_test_split",
    """
SELECT doc_id,
       CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 10 < 8
            THEN 'train' ELSE 'test' END AS split
FROM documents
""",
)
def train_test_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/test assignment (stable under
    reshuffling and incremental loads, unlike random sampling)."""
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % 10
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.when(bucket < 8, "train").otherwise("test").alias("split"),
    )


@register(
    "winsorize_chars",
    """
WITH bounds AS (
    SELECT lang,
           round(quantile_cont(n_chars, 0.05), 6) AS lo,
           round(quantile_cont(n_chars, 0.95), 6) AS hi
    FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars,
       round(least(greatest(CAST(d.n_chars AS DOUBLE), b.lo), b.hi), 6) AS clipped_chars
FROM documents d JOIN bounds b ON d.lang = b.lang
""",
)
def winsorize_chars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping to per-group p05/p95) — the
    data-cleaning step before length-sensitive training statistics.
    The per-group bounds frame is tiny (one row per lang) and
    broadcasts; the clip itself is a narrow map."""
    docs = _docs(spark, sf_dir)
    bounds = docs.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 6).alias("hi"),
    )
    return docs.join(F.broadcast(bounds), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(
            F.least(F.greatest(F.col("n_chars").cast("double"), F.col("lo")), F.col("hi")),
            6,
        ).alias("clipped_chars"),
    )


@register(
    "quality_quarantine",
    f"""
WITH t AS (
    SELECT doc_id, text, n_chars, length(text) AS n,
           CAST(length(text) AS DOUBLE) AS nd,
           {_SQL_TOKENS} AS ws
    FROM documents
), m AS (
    SELECT doc_id, n_chars, n,
           round(CASE WHEN nd = 0 THEN NULL
                 ELSE (nd - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / nd END, 6)
               AS punct_ratio,
           round(CASE WHEN len(ws) = 0 THEN NULL
                 ELSE CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                      / len(ws) END, 6) AS stopword_ratio
    FROM t
)
SELECT CASE WHEN n IS NULL OR n = 0 THEN 'empty'
            WHEN n < 60 THEN 'too_short'
            WHEN round(1.0 - coalesce(punct_ratio, 1.0) + coalesce(stopword_ratio, 0.0), 6) < 1.04
                THEN 'low_quality'
            ELSE 'ok' END AS reject_reason,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM m GROUP BY 1
""",
)
def quality_quarantine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter quality gate: every doc is routed to exactly one
    lane — 'empty' / 'too_short' / 'low_quality' (composite score
    below threshold) / 'ok' — and the per-lane summary is emitted.
    The training pipeline keeps the 'ok' lane; the quarantine lanes
    keep provenance for re-ingestion. One scan, one agg shuffle."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import quality_score

    scored = quality_score(_docs(spark, sf_dir))
    reason = (
        F.when(
            F.col("text").isNull() | (F.length("text") == 0), F.lit("empty")
        )
        .when(F.length("text") < 60, F.lit("too_short"))
        .when(F.col("quality_score") < 1.04, F.lit("low_quality"))
        .otherwise(F.lit("ok"))
    )
    return (
        scored.select(reason.alias("reject_reason"), "n_chars")
        .groupBy("reject_reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data curation surface (operators/curation.py): PII
# redaction, Gopher-style quality rules, sequence packing, embedding
# quantization — the corpus-preparation steps between ingestion and
# training-shard writing.
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


_PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "pii_redact",
    f"""
WITH pii AS (
    SELECT doc_id,
           text || ' Contact: user' || CAST(doc_id AS VARCHAR) || '@mail.example.com or 555-'
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 3) % 256 AS VARCHAR) AS t
    FROM documents
),
st AS (
    SELECT doc_id, t, regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g') AS t1 FROM pii
),
st2 AS (
    SELECT doc_id, t, t1, regexp_replace(t1, '{_PII_PHONE}', '[PHONE]', 'g') AS t2 FROM st
)
SELECT doc_id,
       regexp_replace(t2, '{_PII_IP}', '[IP]', 'g') AS clean_text,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t1, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t2, '{_PII_IP}')) AS BIGINT) AS n_ip
FROM st2
""",
)
def pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents. The fixture text contains no real
    PII, so a deterministic contact line (email + phone + IP derived
    from doc_id) is appended first — the redactor is then exercised on
    every row, and the oracle builds the identical input. Map-only
    regexp pipeline, zero shuffles (operators/curation.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import redact_pii

    d = F.col("doc_id")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        d.cast("string"),
        F.lit("@mail.example.com or 555-"),
        F.lpad((d % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((d * 7) % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (d % 256).cast("string"),
        F.lit("."),
        ((d * 3) % 256).cast("string"),
    )
    staged = _docs(spark, sf_dir).select("doc_id", pii_text.alias("pii_text"))
    return redact_pii(staged, text_col="pii_text")


@register(
    "gopher_quality",
    """
WITH ws_t AS (
    SELECT doc_id, text,
           list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
    FROM documents
),
feat AS (
    SELECT doc_id,
           len(ws) AS n_words,
           list_sum(list_transform(ws, w -> length(w))) AS word_chars,
           len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_symbol,
           len(list_filter(ws, w -> list_contains(['the','and','of','to','a','in','is','it'], lower(w)))) AS stop_hits
    FROM ws_t
),
f2 AS (
    SELECT doc_id, n_words, n_chars, stop_hits,
           (n_chars IS NULL OR n_chars = 0 OR n_words = 0) AS empty,
           round(word_chars / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
           round(n_alpha / CAST(n_words AS DOUBLE), 6) AS alpha_ratio,
           round(n_symbol / CAST(n_chars AS DOUBLE), 6) AS symbol_ratio
    FROM feat
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CASE WHEN NOT empty THEN mean_word_len END AS mean_word_len,
       CASE WHEN NOT empty THEN alpha_ratio END AS alpha_ratio,
       CASE WHEN NOT empty THEN symbol_ratio END AS symbol_ratio,
       CAST(stop_hits AS BIGINT) AS stopword_hits,
       CASE WHEN empty THEN FALSE ELSE
           (n_words BETWEEN 20 AND 100000 AND mean_word_len BETWEEN 3.0 AND 12.0
            AND alpha_ratio >= 0.8 AND symbol_ratio <= 0.1 AND stop_hits >= 2) END AS keep
FROM f2
""",
)
def gopher_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule document quality gate (word count, mean word length,
    alpha-word ratio, symbol ratio, stopword floor) with per-rule
    features and the final keep verdict (operators/curation.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import gopher_quality

    return gopher_quality(_docs(spark, sf_dir))


@register(
    "pack_sequences",
    """
WITH tok AS (
    SELECT doc_id, source,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, source, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
    FROM tok
)
SELECT doc_id, source, n_tokens,
       CAST(floor(cum / 512.0) AS BIGINT) AS seq_id,
       cum % 512 AS seq_offset
FROM packed
""",
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence packing into 512-token training
    sequences, parallel per source stream (operators/curation.py —
    the corpus-level lift of the reference's running chunk offset,
    pdf_reader.py:483-485)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), budget=512)


@register(
    "pack_sequences_salted",
    """
WITH tok AS (
    SELECT doc_id, source,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, source, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
    FROM tok
)
SELECT doc_id, source, n_tokens,
       CAST(floor(cum / 512.0) AS BIGINT) AS seq_id,
       cum % 512 AS seq_offset
FROM packed
""",
)
def pack_sequences_salted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level salted packing (operators/curation.py): identical
    output to pack_sequences — the oracle IS the plain single-window
    formulation, so the driver hash-verifies the salted decomposition's
    equivalence — but the running-sum window runs per (stream,
    key-range substream), so parallelism is n_streams * n_salts tasks
    instead of being bounded by stream cardinality (a 3-source 100 TB
    corpus packs on 3 cores without this)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        pack_sequences_salted,
    )

    return pack_sequences_salted(_docs(spark, sf_dir), budget=512, n_salts=8)


@register(
    "decontaminate",
    """
WITH toks AS (
    SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
    FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 3),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS g
    FROM toks WHERE len(ws) >= 5
)
SELECT t.doc_id,
       CAST(count(DISTINCT t.g) AS BIGINT) AS n_hits,
       CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs
FROM sh t JOIN sh b ON t.g = b.g AND t.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
GROUP BY t.doc_id
""",
)
def decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 5 != 0)
    sharing any 5-gram with the pseudo-benchmark split (doc_id % 5 ==
    0), with contaminated-n-gram and benchmark-doc counts. Shingle
    equi-join, never doc-pairwise (operators/curation.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import decontaminate

    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") % 5 != 0)
    bench = docs.where(F.col("doc_id") % 5 == 0)
    return decontaminate(train, bench, n=5)


@register(
    "doc_repetition",
    """
WITH toks AS (
    SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
    FROM documents
),
g AS (
    SELECT doc_id,
           CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) ELSE [] END AS grams
    FROM toks
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       CASE WHEN len(grams) > 0 THEN round(1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 6) END AS dup_ratio
FROM g
""",
)
def doc_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-3-gram fraction (Gopher repetition
    rule family) — map-only array arithmetic (operators/curation.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        repetition_ratio,
    )

    return repetition_ratio(_docs(spark, sf_dir), n=3)


@register(
    "stratified_sample",
    """
SELECT doc_id, lang, bucket FROM (
    SELECT doc_id, lang,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100 AS bucket
    FROM documents
) WHERE bucket < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
""",
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing via deterministic per-language sampling: keep 50%
    of English, 20% of everything else, by md5 bucket — stable under
    reshuffling and incremental loads, no shuffle
    (operators/curation.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        stratified_sample,
    )

    return stratified_sample(_docs(spark, sf_dir), rates={"en": 50}, default_rate=20)


# ---------------------------------------------------------------------------
# Round-3 additions: entropy quality scoring, SCD2 dimension history,
# deterministic sharded corpus shuffle, ORC source round-trip.
# ---------------------------------------------------------------------------


@register(
    "char_entropy",
    """
WITH ch AS (
    SELECT doc_id, unnest(string_split(text, '')) AS ch
    FROM documents WHERE length(text) > 0
),
cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
ent AS (
    SELECT doc_id,
           round(log2(CAST(sum(c) AS DOUBLE))
                 - sum(c * log2(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE), 6)
               AS char_entropy
    FROM cnt GROUP BY doc_id
)
SELECT d.doc_id, e.char_entropy FROM documents d LEFT JOIN ent e USING (doc_id)
""",
)
def char_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-unigram Shannon entropy per document — the cheap
    gibberish/repetition quality signal (operators/textstats.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import char_entropy

    return char_entropy(_docs(spark, sf_dir))


@register(
    "training_shard_order",
    """
WITH h AS (
    SELECT doc_id, md5('shuffle-seed-1|' || CAST(doc_id AS VARCHAR)) AS h
    FROM documents
)
SELECT doc_id, substring(h, 1, 2) AS shard,
       CAST(row_number() OVER (PARTITION BY substring(h, 1, 2) ORDER BY h, doc_id)
            AS BIGINT) AS shard_pos
FROM h
""",
)
def training_shard_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sharded corpus shuffle: (shard, shard_pos) define
    the training read order, reproducible across engines/runs, with
    per-shard windows instead of one global serial row_number
    (operators/curation.py training_shard_order)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        training_shard_order,
    )

    return training_shard_order(_docs(spark, sf_dir))


@register(
    "mix_temperature_recipe",
    """
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
             sum(pow(CAST(n_docs AS DOUBLE), 0.5)) AS wsum_raw FROM c),
q AS (
    SELECT lang, n_docs, total,
           n_docs / CAST(total AS DOUBLE) AS share,
           pow(n_docs / CAST(total AS DOUBLE), 0.5)
               / (wsum_raw / pow(CAST(total AS DOUBLE), 0.5)) AS mw
    FROM c, t
)
SELECT lang, n_docs,
       round(share, 6) AS share,
       round(mw, 6) AS mix_weight,
       round(least(1.0, mw * 0.5 * total / CAST(n_docs AS DOUBLE)), 6) AS sample_rate,
       round(mw * 0.5 * total, 6) AS expected_docs
FROM q
""",
)
def mix_temperature_recipe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based data-mixing recipe (alpha=0.5, budget=half
    the corpus): sampled mass per language proportional to share^alpha
    renormalized — the multilingual-LM standard (XLM/mT5) that
    up-weights low-resource languages smoothly, next to the hard
    uniform floor of mix_balanced_recipe. One keyed count + a 1-row
    broadcast normalizer; nothing scales with corpus rows."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        temperature_mix_recipe,
    )

    return temperature_mix_recipe(_docs(spark, sf_dir), alpha=0.5, budget_frac=0.5)


@register(
    "dsir_importance",
    f"""
WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
ttok AS (SELECT unnest({_SQL_TOKENS}) AS tok FROM documents WHERE lang = 'en'),
rfreq AS (SELECT tok, count(*) AS rf FROM tok GROUP BY tok),
tfreq AS (SELECT tok, count(*) AS tf FROM ttok GROUP BY tok),
w0 AS (SELECT COALESCE(r.tok, t.tok) AS tok, COALESCE(r.rf, 0) AS rf,
              COALESCE(t.tf, 0) AS tf
       FROM rfreq r FULL OUTER JOIN tfreq t ON r.tok = t.tok),
tot AS (SELECT CAST(sum(rf) AS DOUBLE) AS rn, CAST(sum(tf) AS DOUBLE) AS tn,
               CAST(count(*) AS DOUBLE) AS v FROM w0),
w AS (SELECT tok, ln(((tf + 1) / (tot.tn + tot.v)) / ((rf + 1) / (tot.rn + tot.v))) AS lr
      FROM w0, tot)
SELECT d.doc_id, s.n_tokens, s.dsir_weight
FROM documents d LEFT JOIN (
    SELECT t.doc_id, CAST(count(*) AS INT) AS n_tokens,
           round(avg(w.lr), 6) AS dsir_weight
    FROM tok t JOIN w USING (tok)
    GROUP BY t.doc_id
) s USING (doc_id)
""",
)
def dsir_importance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (textstats.dsir_importance, Xie
    et al. 2023) against an English target domain: per-doc mean
    ln(p_target/p_raw) under add-1-smoothed unigram LMs — resampling
    proportionally to exp(weight) shifts the corpus toward the
    target. The hashed-n-gram curation method sitting between the
    pure-frequency text_lm_score and a trained quality classifier."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        dsir_importance,
    )

    docs = _docs(spark, sf_dir)
    return dsir_importance(docs, docs.where(F.col("lang") == "en"))


@register(
    "source_cap_sample",
    f"""
WITH {_SQL_QUALITY_CHAIN}
SELECT d.doc_id, d.source, q.quality_score,
       CAST(row_number() OVER (
           PARTITION BY d.source
           ORDER BY q.quality_score DESC NULLS LAST, d.doc_id) AS INT) AS source_rank
FROM documents d JOIN q USING (doc_id)
QUALIFY source_rank <= 10
""",
)
def source_cap_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (curation.cap_per_source): at most 10 docs per
    source, best composite quality first — the web-pipeline gate that
    stops one hot domain from dominating the mix. The Spark side runs
    the two-phase salted top-k (output provably identical to the
    plain window the oracle states; phase 1 can never evict a final
    winner), so the hot-domain case distributes instead of piling one
    partition."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import cap_per_source
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import quality_score

    scored = quality_score(_docs(spark, sf_dir)).select("doc_id", "source", "quality_score")
    return cap_per_source(scored, cap=10)


@register(
    "dedup_rate_by_source",
    """
WITH per_text AS (
    SELECT source, sha256(text) AS content_hash, count(*) AS copies
    FROM documents
    GROUP BY source, sha256(text)
)
SELECT source,
       CAST(sum(copies) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(copies) - count(*) AS BIGINT) AS n_dup,
       round((sum(copies) - count(*)) / CAST(sum(copies) AS DOUBLE), 6) AS dup_rate
FROM per_text
GROUP BY source
""",
)
def dedup_rate_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate density per source (dedup.dup_rate_by_source) —
    the dedup observability view: the dedup ops emit pairs/survivors,
    this reports WHERE the duplication comes from, the per-domain
    number that re-prioritizes the next crawl cycle. Within-source
    semantics (a text shared across sources is a duplicate in
    neither), stated identically by both engines' GROUP BYs."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import dup_rate_by_source

    return dup_rate_by_source(_docs(spark, sf_dir))


@register(
    "quality_classifier_weights",
    f"""
WITH {_sql_logreg_chain()}
SELECT CAST(b AS INT) AS b, wgt FROM wl2
""",
)
def quality_classifier_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained model artifact (curation.quality_classifier_weights):
    17 rows of hashed-bucket logistic weights (b=-1 intercept) after 2
    full-batch GD rounds against the English-language label — the
    fastText-style quality gate trained entirely in DataFrame algebra,
    reproduced bit-for-bit by the oracle's unrolled SQL chain. At
    100 TB this trains on a labeled sample (train_df) and broadcasts."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        quality_classifier_weights,
    )

    return quality_classifier_weights(
        _docs(spark, sf_dir), positive=F.col("lang") == "en"
    ).select(F.col("b").cast("int").alias("b"), "wgt")


@register(
    "quality_classifier_score",
    f"""
WITH {_sql_logreg_chain()},
zf AS (SELECT f.doc_id, round(sum(f.x * w.wgt ORDER BY f.b), 6) AS z
       FROM featq f JOIN wl2 w USING (b) GROUP BY f.doc_id)
SELECT d.doc_id, CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS INT) AS label,
       round(1.0 / (1.0 + exp(-zf.z)), 6) AS score
FROM documents d LEFT JOIN zf USING (doc_id)
""",
)
def quality_classifier_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document scored by the trained classifier (curation.
    quality_classifier_score): sigmoid(w·x) next to the training label
    — the probability gate that sits above gopher_quality (rules) and
    dsir_importance (importance heuristic) in the curation ladder.
    Zero-token docs keep NULL score. Scoring is one broadcast of the
    17-row weight table + one keyed agg: linear at any corpus size."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        quality_classifier_score,
    )

    return quality_classifier_score(
        _docs(spark, sf_dir), positive=F.col("lang") == "en"
    )


@register(
    "quality_classifier_score_sampled",
    f"""
WITH {_sql_logreg_chain(train_src="(SELECT * FROM documents WHERE doc_id % 4 = 0)")},
{_sql_hashed_features("f")},
zf AS (SELECT f.doc_id, round(sum(f.x * w.wgt ORDER BY f.b), 6) AS z
       FROM featf f JOIN wl2 w USING (b) GROUP BY f.doc_id)
SELECT d.doc_id, CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS INT) AS label,
       round(1.0 / (1.0 + exp(-zf.z)), 6) AS score
FROM documents d LEFT JOIN zf USING (doc_id)
""",
)
def quality_classifier_score_sampled_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape of quality_classifier_score (VERDICT r07
    item 5): GD runs on a deterministic 25% hash-sample
    (doc_id % 4 = 0) and the resulting 17-row weight table broadcasts
    to score the FULL corpus — at 100 TB training cost is
    sample-sized while scoring stays one broadcast join + one keyed
    agg over the corpus. The oracle trains its unrolled chain on the
    same sample and scores through a second full-corpus feature
    chain, so sampled-train parity is hash-checked end-to-end.
    Buckets unseen in the sample have no weight row on either side
    (inner join drops them); zero-token docs keep NULL score."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        quality_classifier_score,
    )

    docs = _docs(spark, sf_dir)
    return quality_classifier_score(
        docs,
        positive=F.col("lang") == "en",
        train_df=docs.where(F.col("doc_id") % 4 == 0),
    )


@register(
    "contamination_score",
    """
WITH toks AS (
    SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
    FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 3),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS g
    FROM toks WHERE len(ws) >= 5
),
totals AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
    FROM sh WHERE doc_id % 5 <> 0 GROUP BY doc_id
),
bg AS (SELECT DISTINCT g FROM sh WHERE doc_id % 5 = 0),
hits AS (
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM sh t JOIN bg ON t.g = bg.g
    WHERE t.doc_id % 5 <> 0 GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(t.n_grams, 0) AS n_grams,
       COALESCE(h.n_hits, 0) AS n_hits,
       round(COALESCE(h.n_hits, 0) / CAST(NULLIF(t.n_grams, 0) AS DOUBLE), 6)
           AS contamination
FROM documents d
LEFT JOIN totals t USING (doc_id)
LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 5 <> 0
""",
)
def contamination_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded benchmark-overlap measurement (curation.
    contamination_score, GPT-3 appendix-C style): for EVERY training
    doc (doc_id % 5 != 0), the fraction of its distinct 5-grams found
    anywhere in the pseudo-benchmark split — decontaminate gates on
    any overlap; this measures HOW MUCH, which sets drop-vs-surgical
    policy. Same shingle equi-join shape, benchmark side broadcast at
    scale."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        contamination_score,
    )

    docs = _docs(spark, sf_dir)
    return contamination_score(
        docs.where(F.col("doc_id") % 5 != 0),
        docs.where(F.col("doc_id") % 5 == 0),
        n=5,
    )


@register(
    "leakage_safe_split",
    _SQL_MINHASH_BANDS
    + """,
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT c.a_id, c.b_id
    FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
    WHERE round(len(list_intersect(sa.sh, sb.sh)) /
          CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) >= 0.5
),
sym AS (
    SELECT a_id AS src, b_id AS dst FROM pairs
    UNION
    SELECT b_id AS src, a_id AS dst FROM pairs
),
reach AS (
    WITH RECURSIVE r(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, e.dst FROM r JOIN sym e ON r.dst = e.src
    )
    SELECT * FROM r
),
cc AS (
    SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src
)
SELECT d.doc_id,
       CAST(COALESCE(cc.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
       CASE WHEN COALESCE(cc.cluster_id, d.doc_id) % 5 = 0 THEN 'test' ELSE 'train' END
           AS split
FROM documents d LEFT JOIN cc USING (doc_id)
""",
)
def leakage_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/test split (curation.leakage_safe_split):
    every near-dup CLUSTER lands on one side (cluster_id = cluster-min
    doc id, test iff cluster_id % 5 == 0) — the leakage guard
    train_test_split's per-doc hashing lacks; a test doc's near-dup in
    train inflates eval exactly like benchmark contamination. Oracle:
    the dedup_clusters recursive-CTE transitive closure + the same
    modulo rule."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        leakage_safe_split,
    )

    return leakage_safe_split(_docs(spark, sf_dir))


@register(
    "ccnet_lm_buckets",
    f"""
WITH tok AS (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
),
freq AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM freq),
sc AS (
    SELECT t.doc_id, round(avg(ln(f.tf / tot.n)), 6) AS lm_score
    FROM tok t JOIN freq f USING (tok), tot
    GROUP BY t.doc_id
),
b AS (
    SELECT d.doc_id, sc.lm_score,
           ntile(3) OVER (PARTITION BY d.lang ORDER BY sc.lm_score DESC, d.doc_id) AS t
    FROM documents d JOIN sc USING (doc_id)
)
SELECT d.doc_id, d.lang, b.lm_score,
       CASE b.t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' WHEN 3 THEN 'tail' END AS lm_bucket
FROM documents d LEFT JOIN b USING (doc_id)
""",
)
def ccnet_lm_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail partition (textstats.ccnet_lm_buckets,
    Wenzek et al. 2020): each language's docs split into unigram-LM
    perplexity terciles — keep head, sample middle, drop tail PER
    LANGUAGE, the bucketing that doesn't starve low-resource langs.
    One per-lang ntile window over (score, id) pairs on top of the
    text_lm_score chain; zero-token docs keep NULL score and bucket."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        ccnet_lm_buckets,
    )

    return ccnet_lm_buckets(_docs(spark, sf_dir))


@register(
    "dedup_pair_quality",
    _SQL_MINHASH_BANDS
    + f""",
truth AS (
    SELECT sa.doc_id AS a_id, sb.doc_id AS b_id
    FROM sh_t sa JOIN sh_t sb ON sa.doc_id < sb.doc_id
    WHERE round(len(list_intersect(sa.sh, sb.sh))
          / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6)
          >= 0.5
),
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
lshp AS (
    SELECT c.a_id, c.b_id FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
    WHERE round(len(list_intersect(sa.sh, sb.sh))
          / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6)
          >= 0.5
),
bands_f AS (
    SELECT * FROM bands
    QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= {PROD_MAX_BUCKET_SIZE}
),
cand_c AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands_f a JOIN bands_f b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
lshc AS (
    SELECT c.a_id, c.b_id FROM cand_c c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
    WHERE round(len(list_intersect(sa.sh, sb.sh))
          / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6)
          >= 0.5
),
simh AS (
    SELECT doc_id,
           list_transform(ws, w -> list_reduce(
               list_transform(string_split(w, ''), c -> CAST(ord(c) AS BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007)) AS hs
    FROM ws_t
),
simv AS (
    SELECT doc_id,
           CASE WHEN len(hs) = 0 THEN 0
                ELSE CAST(list_sum(list_transform(range(0, 16),
                    b -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
                              THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) END AS s
    FROM simh
),
simp AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM simv a JOIN simv b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
),
m AS (
    SELECT 'minhash_lsh' AS method,
           (SELECT count(*) FROM truth) AS n_true,
           (SELECT count(*) FROM lshp) AS n_found,
           (SELECT count(*) FROM lshp p JOIN truth t
             ON p.a_id = t.a_id AND p.b_id = t.b_id) AS n_hit
    UNION ALL
    SELECT 'minhash_lsh_capped',
           (SELECT count(*) FROM truth),
           (SELECT count(*) FROM lshc),
           (SELECT count(*) FROM lshc p JOIN truth t
             ON p.a_id = t.a_id AND p.b_id = t.b_id)
    UNION ALL
    SELECT 'simhash',
           (SELECT count(*) FROM truth),
           (SELECT count(*) FROM simp),
           (SELECT count(*) FROM simp p JOIN truth t
             ON p.a_id = t.a_id AND p.b_id = t.b_id)
)
SELECT method, CAST(n_true AS BIGINT) AS n_true, CAST(n_found AS BIGINT) AS n_found,
       CAST(n_hit AS BIGINT) AS n_hit,
       round(n_hit / CAST(NULLIF(n_true, 0) AS DOUBLE), 6) AS pair_recall,
       round(n_hit / CAST(NULLIF(n_found, 0) AS DOUBLE), 6) AS pair_precision
FROM m
""",
)
def dedup_pair_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup counterpart of the ANN recall matrix (dedup.
    dedup_pair_quality): per candidate tier (MinHash-LSH, its
    production bucket-capped form, SimHash), recall and precision
    against the exact word-3-gram Jaccard truth — LSH tiers verify by
    exact Jaccard so their precision is 1.0 by construction and recall
    isolates banding coverage; SimHash's precision measures how well
    sketch hamming proxies Jaccard on this corpus. The parameter-
    picking numbers before a 100-TB dedup run."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        dedup_pair_quality,
    )

    return dedup_pair_quality(_docs(spark, sf_dir))


@register(
    "repetition_filters",
    f"""
WITH lines AS (
    SELECT doc_id, trim(ln) AS ln
    FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM documents)
    WHERE trim(ln) <> ''
),
per_line AS (SELECT doc_id, ln, count(*) AS c FROM lines GROUP BY doc_id, ln),
line_stats AS (
    SELECT doc_id,
           round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE), 6)
               AS dup_line_frac,
           round(sum(CASE WHEN c > 1 THEN c * length(ln) ELSE 0 END)
               / CAST(sum(c * length(ln)) AS DOUBLE), 6) AS dup_line_char_frac
    FROM per_line GROUP BY doc_id
),
ws_rep AS (SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents),
tchars AS (
    SELECT doc_id, CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) AS tchars
    FROM ws_rep WHERE len(ws) > 0
),
bg AS (
    SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS g
    FROM ws_rep
),
per_bg AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
top_bg AS (
    SELECT doc_id, round(c * (length(g) - 1) / t.tchars, 6) AS top_2gram_char_frac
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
          FROM per_bg) b
    JOIN tchars t USING (doc_id)
    WHERE rn = 1
),
g5 AS (
    SELECT doc_id,
           unnest(range(1, greatest(len(ws) - 3, 1))) - 1 AS pos,
           unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
               i -> array_to_string(ws[i : i + 4], ' '))) AS g
    FROM ws_rep WHERE len(ws) >= 5
),
g5c AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g),
covered AS (
    SELECT DISTINCT g5.doc_id, g5.pos + unnest([0, 1, 2, 3, 4]) AS pos
    FROM g5 JOIN g5c ON g5.doc_id = g5c.doc_id AND g5.g = g5c.g
    WHERE g5c.c >= 2
),
tokpos AS (
    SELECT doc_id, unnest(range(1, len(ws) + 1)) - 1 AS pos, unnest(ws) AS w
    FROM ws_rep
),
cov_chars AS (
    SELECT c.doc_id, CAST(sum(length(t.w)) AS DOUBLE) AS cchars
    FROM covered c JOIN tokpos t ON c.doc_id = t.doc_id AND c.pos = t.pos
    GROUP BY c.doc_id
)
SELECT d.doc_id,
       COALESCE(ls.dup_line_frac, 0.0) AS dup_line_frac,
       COALESCE(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
       COALESCE(tb.top_2gram_char_frac, 0.0) AS top_2gram_char_frac,
       COALESCE(round(cc.cchars / tc.tchars, 6), 0.0) AS dup_5gram_char_frac
FROM documents d
LEFT JOIN line_stats ls USING (doc_id)
LEFT JOIN top_bg tb USING (doc_id)
LEFT JOIN tchars tc USING (doc_id)
LEFT JOIN cov_chars cc USING (doc_id)
""",
)
def repetition_filters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher REPETITION rules (textstats.repetition_filters, Rae et
    al. 2021 table A1 — the half of the Gopher set gopher_quality's
    scalar features don't cover): duplicate-line fractions, the top
    bigram's character share, and the positional character coverage of
    duplicated 5-grams. Three explodes feeding per-doc hash-aggs —
    no corpus-wide window, linear at any scale."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        repetition_filters,
    )

    return repetition_filters(_docs(spark, sf_dir))


@register(
    "mix_token_budget",
    f"""
WITH c AS (
    SELECT lang, CAST(sum(len({_SQL_TOKENS})) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
             sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS wsum_raw FROM c),
q AS (
    SELECT lang, n_tokens, total,
           n_tokens / CAST(total AS DOUBLE) AS share,
           pow(n_tokens / CAST(total AS DOUBLE), 0.5)
               / (wsum_raw / pow(CAST(total AS DOUBLE), 0.5)) AS mw
    FROM c, t
)
SELECT lang, n_tokens,
       round(share, 6) AS token_share,
       round(mw, 6) AS mix_weight,
       round(mw * 1.0 * total, 6) AS target_tokens,
       CASE WHEN n_tokens > 0
            THEN round(mw * 1.0 * total / CAST(n_tokens AS DOUBLE), 6) END AS epochs,
       CASE WHEN n_tokens > 0
            THEN mw * 1.0 * total / CAST(n_tokens AS DOUBLE) > 1.0 END AS upsampled,
       CASE WHEN n_tokens > 0
            THEN mw * 1.0 * total / CAST(n_tokens AS DOUBLE) > 4.0 END AS over_repeat_cap
FROM q
""",
)
def mix_token_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-denominated temperature mixing recipe (textstats.
    token_budget_recipe, alpha=0.5, budget = one corpus-epoch of
    tokens) — the unit an LLM training budget is actually written in,
    next to mix_temperature_recipe's doc-denominated form. Emits per
    language the implied EPOCH count (target tokens / available
    tokens) plus the two flags a recipe review needs: upsampled
    (repeated beyond one pass) and over_repeat_cap (past the ~4-epoch
    data-constrained-scaling regime where repetition stops helping).
    One corpus scan (narrow size(split()) map, no explode), a
    |langs|-group agg, a 1-row broadcast normalizer; flags compare the
    unrounded ratio so both engines agree at the boundary."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        token_budget_recipe,
    )

    return token_budget_recipe(_docs(spark, sf_dir), alpha=0.5, budget_frac=1.0, max_epochs=4.0)


@register("quality_classifier_score_stored", None)  # oracle assigned below
def quality_classifier_score_stored_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier serving THROUGH the parquet store, under
    quality_classifier_score's oracle verbatim — completing the
    stored-artifact symmetry (index: sim_topk_ivf_stored; tokenizer:
    bpe_apply_stored; classifier: this). The 17-row weight table is
    trained, WRITTEN to parquet, read back, and scoring runs from the
    stored table with zero training lineage in the plan — the hash
    guards the store seam itself (schema drift, a lossy writer, or
    rounding drift in the doubles would mismatch)."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        quality_classifier_score,
        quality_classifier_weights,
    )

    docs = _docs(spark, sf_dir)
    store = tempfile.mkdtemp(prefix="clf_store_")
    quality_classifier_weights(docs, positive=F.col("lang") == "en").write.mode(
        "overwrite"
    ).parquet(store)
    return quality_classifier_score(
        docs,
        positive=F.col("lang") == "en",
        weights_df=spark.read.parquet(store),
    )


REGISTRY["quality_classifier_score_stored"].oracle = REGISTRY[
    "quality_classifier_score"
].oracle


@register(
    "weighted_sample_es",
    """
WITH keyed AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           CASE WHEN n_chars > 0 THEN
               pow((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                        + CAST(1.0 AS DOUBLE))
                   / CAST(1152921504606846977 AS DOUBLE),
                   CAST(1.0 AS DOUBLE) / CAST(n_chars AS DOUBLE))
           ELSE CAST(0.0 AS DOUBLE) END AS es
    FROM documents
)
SELECT doc_id, weight, round(es, 6) AS es_key,
       CAST(row_number() OVER (ORDER BY es DESC, doc_id) AS INT) AS rank
FROM keyed QUALIFY rank <= 100
""",
)
def weighted_sample_es_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement by the Efraimidis-
    Spirakis A-ES reservoir (curation.weighted_sample_es): top-100
    documents by u^(1/weight) with weight = n_chars — length-weighted
    corpus subsetting, the one-pass distributed algorithm (per-
    partition partial top-k via TakeOrdered, no sequential reservoir
    state, no global sort). Randomness is the deterministic 60-bit
    md5 draw (the Bloom/HLL hash plumbing), so the sample is
    reproducible across runs, engines and partitionings — seeded
    sampling as a hash-checked correctness property."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        weighted_sample_es,
    )

    return weighted_sample_es(_docs(spark, sf_dir), k=100)
