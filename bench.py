"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": <sf>}

Each query executes end-to-end into a noop sink (full computation, no
driver-side result materialization, no column-prune shortcut a count()
would allow).
"""

from __future__ import annotations

import json
import os
import sys
import time

from calculate_file_content_size_for_vector_db_spark.entry_queries import REGISTRY
from calculate_file_content_size_for_vector_db_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: the flagship chunk pipeline, the heavy relational joins,
# the scale-path dedup/similarity operators, and the windowed streaming
# equivalents — the queries whose plans matter at 100 TB.
HEADLINE = [
    "rollup_summary",
    "chunk_split",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "events_tumbling",
    "events_session",
    "events_asof_join",
    "text_quality",
    "text_fingerprint",
    "training_pipeline",
    "sim_topk_ivf",
    "sim_nearest_neighbor",
]


WARMUP_DIR = "/root/testdata/sf0.01"


def main() -> None:
    # Isolation: if a session already exists in this process (e.g. the
    # correctness sweep ran first), its cached frames and accumulated
    # executor state skew per-query timings by ±2x round-to-round. Tear
    # it down and measure in a fresh context; JIT warmth survives in the
    # JVM, which is exactly the part warmup wants to keep.
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(app_name="bench", cpus=CPUS, shuffle_partitions=CPUS)

    # Warm JIT/codegen/classloading per query shape at a small scale
    # factor, so the measured numbers reflect steady-state throughput
    # (what a long-running cluster job sees), not one-time startup.
    for name in HEADLINE:
        REGISTRY[name].fn(spark, WARMUP_DIR).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
            # queries persist() intermediates and never unpersist (each
            # invocation re-persists a fresh frame); drop them so later
            # queries aren't measured under earlier queries' memory
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)

    # Per-query delta vs the previous round's recorded bench (if any),
    # so regressions are visible per query rather than only in the total.
    prev = _previous_round_timings()
    if prev:
        for name, t in timings.items():
            p = prev.get(name)
            if p:
                sign = "+" if t >= p else ""
                print(
                    f"# delta {name}: {t:.2f}s vs prev {p:.2f}s ({sign}{(t - p) / p * 100:.0f}%)",
                    file=sys.stderr,
                )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


def _previous_round_timings() -> dict[str, float]:
    """Per-query times from the latest BENCH_r{N}.json the driver wrote."""
    import glob
    import re

    best: tuple[int, dict[str, float]] | None = None
    for path in glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
            queries = (data.get("parsed") or {}).get("queries") or data.get("queries") or {}
        except (OSError, json.JSONDecodeError):
            continue
        n = int(m.group(1))
        if queries and (best is None or n > best[0]):
            best = (n, queries)
    return best[1] if best else {}


if __name__ == "__main__":
    main()
