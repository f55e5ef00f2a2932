"""Text analysis over document columns (SURVEY.md section 7.4; the
training-data-pipeline extension surface).

All operators are pure Column expressions (whole-stage codegen, no
Python in the hot path): language-ID by marker-word scoring, quality
scoring from length/punctuation/stopword ratios, whitespace + BPE-ish
token counting, and polynomial-rolling-hash document fingerprinting.

At 100 TB these are narrow per-row transforms: no shuffle, fully
pipelined with the scan; the only care is keeping them JVM-side, which
ruling out UDFs here guarantees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker ("stop") words per language for the n-gram/marker heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "que", "y", "un"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "zh": ("的", "是", "了", "在"),
}
# deterministic tie-break: first language in this order wins
LANG_ORDER = ("en", "de", "es", "fr", "zh")

STOPWORDS = LANG_MARKERS["en"]

# "BPE-ish" pre-tokenization: letter runs | digit runs | single other glyph
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

HASH_MOD = 1_000_000_007
HASH_BASE = 31


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, "\\s+"), lambda t: t != "")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens (whitespace), n_bpe_tokens (regex pre-tokenizer),
    n_chars."""
    return df.withColumns(
        {
            "n_tokens": F.size(tokens(text_col)).cast("int"),
            "n_bpe_tokens": F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)).cast("int"),
            "n_chars_text": F.length(text_col).cast("int"),
        }
    )


def _marker_score(toks: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("int")


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """score_<lang> = count of marker-word hits per language."""
    toks = tokens(text_col)
    return df.withColumns(
        {f"score_{lang}": _marker_score(toks, LANG_MARKERS[lang]) for lang in LANG_ORDER}
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """predicted_lang = argmax marker score (ties -> LANG_ORDER)."""
    scored = lang_scores(df, text_col)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_ORDER])
    pred = F.lit(None).cast("string")
    for lang in reversed(LANG_ORDER):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return scored.withColumn("predicted_lang", F.when(best > 0, pred).otherwise(F.lit("und")))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality metrics + a composite score.

    punct_ratio: non-alnum/non-space chars per char; alpha_ratio:
    letters per char; stopword_ratio: stopword tokens per token;
    mean_word_len; quality_score: a fixed linear blend, rounded.
    """
    c = F.col(text_col)
    n = F.length(c).cast("double")
    toks = tokens(text_col)
    n_toks = F.size(toks).cast("double")
    punct = (n - F.length(F.regexp_replace(c, "[^a-zA-Z0-9\\s]", ""))).cast("double")
    alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", "")).cast("double")
    stop = _marker_score(toks, STOPWORDS).cast("double")
    tok_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda a, b: a + b
    ).cast("double")
    out = df.withColumns(
        {
            "punct_ratio": F.round(F.try_divide(punct, n), 6),
            "alpha_ratio": F.round(F.try_divide(alpha, n), 6),
            "stopword_ratio": F.round(F.try_divide(stop, n_toks), 6),
            "mean_word_len": F.round(F.try_divide(tok_chars, n_toks), 6),
        }
    )
    # integer weights keep the blend on the 1e-6 grid of the rounded
    # inputs — a fractional weight would land sums exactly on round-half
    # boundaries where Spark (HALF_UP on shortest-repr) and C/DuckDB
    # (binary value) disagree
    score = (
        F.lit(1.0)
        - F.coalesce(F.col("punct_ratio"), F.lit(1.0))
        + F.coalesce(F.col("stopword_ratio"), F.lit(0.0))
    )
    return out.withColumn("quality_score", F.round(score, 6))


def source_reputation(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """(source, n_docs, source_quality): per-source mean composite
    quality — the "domain reputation" table a curation pipeline gates
    ingestion with (drop whole low-quality sources before any per-doc
    work). One map pass for the per-doc score plus one keyed hash-agg;
    the result is sources-sized, so it BROADCASTS into any gate join
    against the corpus."""
    q = quality_score(df, text_col)
    return q.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("quality_score"), 6).alias("source_quality"),
    )


def char_entropy(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """(key, char_entropy): Shannon entropy of the character unigram
    distribution in bits/char — the classic cheap gibberish/repetition
    detector (near-0 for 'aaaa...', ~4.2 for English prose, higher for
    random bytes). Empty/NULL text -> NULL entropy, row preserved.

    Plan shape: explode chars once, two keyed hash-aggs ((key, ch)
    counts, then one per-key agg) — map-side partial, linear at any
    scale. Uses the algebraic form H = log2(n) - sum(c*log2(c))/n so
    no window/self-join is needed for the total count."""
    from calculate_file_content_size_for_vector_db_spark.partitioning import spread

    df = spread(df)
    chars = df.select(
        F.col(key), F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).where(F.length("ch") > 0)
    counts = chars.groupBy(key, "ch").agg(F.count("*").alias("c"))
    ent = counts.groupBy(key).agg(
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 6
        ).alias("char_entropy")
    )
    return df.select(key).join(ent, key, "left").select(key, "char_entropy")


def fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash over code points, mod 1e9+7 — a
    deterministic 'document fingerprint' (empty/NULL -> 0)."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint"))
    h = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * HASH_BASE + x) % HASH_MOD,
    )
    return F.coalesce(h, F.lit(0).cast("bigint"))


def token_hash(tok: Column) -> Column:
    """Same polynomial hash for a single token (used by simhash)."""
    codes = F.transform(F.split(tok, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * HASH_BASE + x) % HASH_MOD,
    )


def zscore_by_group(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "lang",
    key: str = "doc_id",
) -> DataFrame:
    """Per-group z-score normalization via applyInPandas (grouped-map:
    one pandas DataFrame per group in, one out — the API shape for
    per-entity model scoring / normalization at scale; each group must
    fit in one worker's memory, groups process in parallel).

    Semantics are deliberately also SQL-expressible (sample stddev) so
    the DuckDB oracle can verify this Python path exactly.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField(key, LongType()),
            StructField(group_col, StringType()),
            StructField("zscore", DoubleType()),
        ]
    )

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=1)
        z = (v - v.mean()) / sd if sd and sd > 0 else v * 0.0
        return pd.DataFrame(
            {key: pdf[key], group_col: pdf[group_col], "zscore": z.round(6)}
        )

    return df.select(key, group_col, value_col).groupBy(group_col).applyInPandas(_norm, schema)


def unigram_logprob(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """(key, lm_score): CCNet-style unigram language-model score — the
    mean ln(corpus unigram probability) over a document's tokens.
    Higher = more typical text; strongly negative = rare-token soup.
    The standard cheap LM filter for training-data curation when a
    real KenLM isn't available on the cluster.

    Plan: one token explode; corpus frequencies via one hash-agg (the
    "LM training" pass); scoring is an equi-join on token plus one
    keyed avg — two shuffles total. The frequency table is vocab-sized
    (Heaps-bounded), the 1-row grand total broadcasts. Zero-token docs
    keep a NULL score via the final left join.

    Determinism: ln-probabilities averaged then rounded to 6 decimals
    (partition-order summation noise sits ~1e-13, far below the
    rounding grain) — mirrored by the text_lm_score DuckDB oracle.
    """
    from calculate_file_content_size_for_vector_db_spark.partitioning import spread

    df = spread(df)
    tok = df.select(F.col(key), F.explode(tokens(text_col)).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").alias("tf"))
    total = freq.agg(F.sum("tf").cast("double").alias("n"))
    scored = (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(key)
        .agg(F.round(F.avg(F.log(F.col("tf") / F.col("n"))), 6).alias("lm_score"))
    )
    return df.select(key).join(scored, key, "left")


def langs_per_source(df: DataFrame, group_col: str = "source", lang_col: str = "lang") -> DataFrame:
    """(source, langs): sorted distinct languages per source, as a real
    array<string> column — the library-facing form. The registered
    langs_per_source query serializes `langs` to JSON purely for the
    driver's pandas canonicalizer (which can't hash list cells); array
    consumers should call this instead of the registry entry."""
    return df.groupBy(group_col).agg(
        F.array_sort(F.collect_set(lang_col)).alias("langs")
    )


def calibrate_quality_threshold(
    df: DataFrame,
    keep_rates: tuple[tuple[float, str], ...] = ((0.5, "0.5"), (0.8, "0.2"), (0.95, "0.05")),
    text_col: str = "text",
) -> DataFrame:
    """(keep_rate, threshold, n_pass, pass_rate): the quality-score
    cutoffs that keep a target fraction of the corpus — how a pipeline
    actually sets its gate (pick a budget, read off the threshold),
    instead of guessing a magic score.

    Each entry of ``keep_rates`` is (keep_rate, fraction_literal) where
    the literal is the EXACT percentile string 1 - keep_rate — passed
    textually so the Spark side and a SQL mirror interpolate the same
    binary fraction (1 - 0.8 in float arithmetic is 0.19999...96, and
    exact percentile interpolation is sensitive to it).

    Plan shape: one pass computes all percentiles in a single global
    aggregate (percentile() ignores NULL scores, matching
    quantile_cont); the 1-row result unpivots to one row per rate and
    broadcasts back over the scored corpus for the pass counts — two
    scans of the score column, no quadratic stage, rates bounded.
    NULL-score docs count in the denominator and never pass (a doc the
    scorer can't score doesn't enter the training set).
    """
    q = quality_score(df, text_col).select("quality_score")
    aggs = [
        F.round(F.expr(f"percentile(quality_score, {frac})"), 6).alias(f"_t{i}")
        for i, (_, frac) in enumerate(keep_rates)
    ]
    aggs.append(F.count("*").cast("long").alias("_total"))
    one = q.agg(*aggs)
    stack = ", ".join(
        f"CAST({rate} AS DOUBLE), _t{i}" for i, (rate, _) in enumerate(keep_rates)
    )
    th = one.selectExpr(
        f"stack({len(keep_rates)}, {stack}) AS (keep_rate, threshold)", "_total"
    )
    return (
        q.crossJoin(F.broadcast(th))
        .groupBy("keep_rate", "threshold", "_total")
        .agg(
            F.sum(
                F.when(F.col("quality_score") >= F.col("threshold"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_pass")
        )
        .select(
            "keep_rate",
            "threshold",
            "n_pass",
            F.round(F.col("n_pass") / F.col("_total").cast("double"), 6).alias("pass_rate"),
        )
    )


def balanced_mix_recipe(df: DataFrame, group_col: str = "lang") -> DataFrame:
    """(lang, n_docs, actual_share, target_share, sample_rate,
    expected_docs): the uniform data-mixing recipe — downsample every
    group to the smallest group's count so the output distribution is
    balanced. The per-group sample_rate is what a pipeline feeds to
    df.sampleBy (or a deterministic mod-id filter) when composing a
    training mix.

    Plan shape: one keyed count per group, then the 1-row corpus
    aggregate (total, group count, min group size) broadcasts back —
    two shuffles total, both on bounded (group-cardinality) data.
    """
    per = df.groupBy(group_col).agg(F.count("*").cast("long").alias("n_docs"))
    corpus = per.agg(
        F.sum("n_docs").cast("double").alias("_total"),
        F.count("*").cast("long").alias("_n_groups"),
        F.min("n_docs").cast("long").alias("_min_n"),
    )
    return per.crossJoin(F.broadcast(corpus)).select(
        group_col,
        "n_docs",
        F.round(F.col("n_docs") / F.col("_total"), 6).alias("actual_share"),
        F.round(F.lit(1.0) / F.col("_n_groups"), 6).alias("target_share"),
        F.round(F.col("_min_n") / F.col("n_docs").cast("double"), 6).alias("sample_rate"),
        F.col("_min_n").alias("expected_docs"),
    )
