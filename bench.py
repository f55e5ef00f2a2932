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
    "dedup_minhash_lsh_capped",  # the declared production default path
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
    "pq_topk",  # round 5: the PQ-ADC compressed search path
    "sim_topk_ivfpq",  # round 6: the composed billion-scale layout
    "dedup_incremental",  # round 6: the daily batch-vs-corpus ingest op
    "dedup_span_rewrite",  # round 6: exact substring dedup with rewrite
    "knn_graph",  # round 6: all-vectors exact kNN edge list (block grid)
    "curation_pipeline",  # round 6: the composed full curation stack
    "sim_topk_int8",  # round 6: SQ8 compressed scan
    "sim_topk_matryoshka",  # round 6: prefix-dim compressed scan
    "bm25_search",  # round 6: lexical retrieval
    "hybrid_search_rrf",  # round 6: BM25 + vector fused by reciprocal rank
    "heavy_hitters_cms",  # round 6: Count-Min sketch build + probe
    "quality_classifier_score",  # round 7: trained logreg gate — kept as the training-cost row
    "quality_classifier_score_sampled",  # round 8: the 100-TB shape (25% sampled train, full scoring)
    "repetition_filters",  # round 7: Gopher repetition rules (3 explode pipelines)
    "leakage_safe_split",  # round 7: LSH + CC + split composition
    "bpe_train_merges",  # round 7: trained tokenizer (8 vocab-bounded merge rounds)
    "dedup_bloom_prefilter",  # round 7: Bloom-join pre-gate (bounded bitmap probe)
    "line_dedup_rewrite",  # round 7: within-page duplicate-line removal
    "serving_pipeline",  # round 8: composed three-artifact serving flagship
    "sim_topk_graph",  # round 8: graph-ANN beam search (build + 3-hop serve)
    "dedup_clusters_append",  # round 8: incremental CC maintenance (contract + relabel)
    "corpus_datacard_merge",  # round 8: mergeable release summary (partial-state merge)
    "ingest_pipeline",  # round 8: composed daily-ingest flagship (gate+dedup+admit+route)
    # Round 12 (VERDICT r11 item 6): the headline was frozen at r08
    # composition, leaving every r10/r11 lifecycle flagship unbenched
    # round-over-round — a perf regression in the newest, most complex
    # plans was invisible until a ladder run. The three heaviest
    # lifecycle rows join (PLANS.md notes the total-seconds step
    # change; r12 is their baseline round).
    "ingest_serve_handoff",  # round 10: the heaviest composed flagship (train+store+serve handoff)
    "sim_graph_takedown_repair",  # round 11: graph purge + localized repair (the hard takedown)
    "dedup_takedown_recluster",  # round 10: stored-labeling takedown + localized re-CC
    # Round 13: the newly registered lifecycle surface's heaviest
    # MaxSim row joins at its baseline round (same rationale as the
    # r12 additions — regressions in the newest plans must be visible
    # round-over-round, not only in ladder runs). sim_graph_upsert_serve
    # is deliberately NOT here: at sf0.1 it measured 33-42s of which
    # ~30s is fixture overhead (deep unrolled-kmeans plans + five
    # parquet roundtrips on a 2000-vector capped corpus) — noise, not
    # signal; its per-round timing lives in the oracle sweep and its
    # scale evidence is the FLAT isolated ladder (SCALE.md).
    "sim_maxsim_upsert_serve",  # round 13: MaxSim token-index upsert x2 + PLAID serve
    # Round 14 registrations deliberately NOT here, same rationale as
    # sim_graph_upsert_serve: upsert_face_relabel is stream-machinery
    # + store-rewrite stage count on a fixture-sized corpus (its
    # timing lives in the oracle sweep; the verbs it composes are
    # benched via dedup_takedown_recluster and laddered in SCALE.md),
    # and ivf_filtered_recall_at_10 is a recall QA row like every
    # other *_recall_at_10 (accuracy, not throughput).
]


WARMUP_DIR = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# Contention self-diagnosis. Round 3's official bench recorded a +4071%
# regression on dedup_minhash_lsh that turned out to be a co-running
# local[32] JVM from another process, not a code change. Load average
# alone can't tell that apart from our own work (the bench itself pushes
# loadavg to ~CPUS), so we measure EXTERNAL busy CPU: /proc/stat busy
# jiffies minus the jiffies consumed by our own process tree (python +
# Spark JVM + pyspark workers). If other processes burned a significant
# fraction of the machine during the measured window, the emitted JSON
# says so — a contaminated run is diagnosable from the artifact itself.
# ---------------------------------------------------------------------------


def _proc_stat_jiffies() -> tuple[int, int]:
    """(total, busy) jiffies across all CPUs since boot."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
    return sum(vals), sum(vals) - idle


def _tree_jiffies(root: int) -> int:
    """utime+stime (+ reaped children's cutime+cstime) jiffies of
    `root` and every live descendant.

    cutime/cstime fold in children that were already waited on —
    without them, short-lived pyspark worker forks vanish from the sum
    between samples and their cycles get misattributed to EXTERNAL
    busy CPU, raising false CONTENDED flags on clean runs. Live
    children are counted via their own utime/stime only, so nothing is
    double-counted."""
    info: dict[int, tuple[int, int]] = {}  # pid -> (ppid, jiffies)
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        rest = s[s.rindex(")") + 2 :].split()
        own = int(rest[11]) + int(rest[12])  # utime + stime
        reaped = int(rest[13]) + int(rest[14])  # cutime + cstime
        info[int(d)] = (int(rest[1]), own + reaped)
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in info.items():
        children.setdefault(ppid, []).append(pid)
    total, stack = 0, [root]
    while stack:
        pid = stack.pop()
        if pid in info:
            total += info[pid][1]
            stack.extend(children.get(pid, []))
    return total


class _ContentionMeter:
    def __init__(self) -> None:
        self.ncpus = os.cpu_count() or 1
        self._t = _proc_stat_jiffies()
        self._o = _tree_jiffies(os.getpid())

    def sample(self) -> float:
        """External busy CPUs (machine-wide busy minus ours) averaged
        over the interval since the previous sample."""
        t, o = _proc_stat_jiffies(), _tree_jiffies(os.getpid())
        dt_total = max(1, t[0] - self._t[0])
        ext_busy = max(0, (t[1] - self._t[1]) - (o - self._o))
        self._t, self._o = t, o
        return round(ext_busy / dt_total * self.ncpus, 2)


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

    # VERDICT r08 item 2: r08's bench entered at 1-min load 12.1 and every
    # query drifted x1.1-1.3 — sustained sub-threshold contention that the
    # per-window external-busy gate (bursts) can't catch. Gate the WHOLE
    # run on start load, BEFORE warmup pushes loadavg to ~CPUS ourselves:
    # defer while the 1-min loadavg exceeds LOAD_GATE, up to
    # LOAD_GATE_BUDGET_SEC. If it never clears, run anyway but stamp
    # `started_hot` so the artifact self-describes.
    load_gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "4.0"))
    gate_budget = float(os.environ.get("SPARK_GRAFT_LOAD_GATE_BUDGET_SEC", "600"))
    deferred = 0.0
    while os.getloadavg()[0] > load_gate and deferred < gate_budget:
        print(
            f"# load gate: 1-min load {os.getloadavg()[0]:.1f} > {load_gate} — "
            f"deferring 30s ({deferred:.0f}s deferred so far)",
            file=sys.stderr,
        )
        time.sleep(30)
        deferred += 30
    load_before = [round(x, 2) for x in os.getloadavg()]
    started_hot = load_before[0] > load_gate

    spark = get_spark(app_name="bench", cpus=CPUS, shuffle_partitions=CPUS)

    # Warm JIT/codegen/classloading per query shape at a small scale
    # factor, so the measured numbers reflect steady-state throughput
    # (what a long-running cluster job sees), not one-time startup.
    for name in HEADLINE:
        REGISTRY[name].fn(spark, WARMUP_DIR).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    meter = _ContentionMeter()
    def _measure(fn) -> tuple[float, float]:
        """(best seconds, external busy CPUs over the window).

        One UNTIMED run at the bench scale first: the sf0.01 warmup
        covers classloading/codegen but not executor memory/GC steady
        state, and the first sf0.1 executions of heavy composed queries
        run 2-3x slow (r05 published training_pipeline at +26% from
        exactly this — both timed samples landed in the warm-up tail,
        close enough together that the dispersion guard never fired;
        steady state re-measured at r04 level).

        Then best-of-2, plus one extra sample when the two disagree by
        >2x: a single GC pause or memory-pressure stall inside the
        shared JVM can poison both thin samples of a multi-second
        shuffle query (observed: 9.4s vs a stable 2-3s in isolation)."""
        meter.sample()  # reset interval to this query's window
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
            # queries persist() intermediates and never unpersist (each
            # invocation re-persists a fresh frame); drop them so later
            # queries aren't measured under earlier queries' memory
            spark.catalog.clearCache()
        if max(samples) > 2 * min(samples):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(min(samples), 3), meter.sample()

    # A contaminated window means the timing measures the intruder, not
    # the query — re-measure and keep the cleaner sample (round 4
    # flagged contention but still published the dirty number; VERDICT
    # r04 item 6). The threshold is an absolute 2 CPUs, not a fraction
    # of the machine: r06's sim_topk_ivf row recorded a 6.12-CPU
    # external burst — enough to distort a 32-thread shuffle stage by
    # >10% — yet stayed under the old 0.25*ncpus=8 gate and shipped
    # unretried (VERDICT r06 item 2). On a quiet machine external busy
    # measures ~0.06, so 2.0 keeps a wide noise margin while catching
    # any co-running JVM worth worrying about.
    ext_retry_cpus = 2.0
    timings: dict[str, float] = {}
    external_cpus: dict[str, float] = {}
    query_load1: dict[str, float] = {}
    retried: dict[str, int] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t, ext = _measure(fn)
        retried[name] = 0
        while ext > ext_retry_cpus and retried[name] < 2:
            retried[name] += 1
            print(
                f"# {name}: contended window (external busy cpus: {ext}) — "
                f"retry {retried[name]}",
                file=sys.stderr,
            )
            t2, ext2 = _measure(fn)
            if ext2 < ext:
                t, ext = t2, ext2
            if ext2 > ext_retry_cpus and ext > ext_retry_cpus:
                # intruder persisted through both windows; stop burning
                # samples — the CONTENDED flag below marks the row
                break
        timings[name] = t
        external_cpus[name] = ext
        # Per-query 1-min load at window end (VERDICT r08 item 2). Our
        # own 32 threads dominate this number mid-run; it's recorded as
        # raw context so a drifted round can be correlated against
        # machine pressure per query, not to gate on.
        query_load1[name] = round(os.getloadavg()[0], 2)
        flag = "  ** CONTENDED **" if ext > ext_retry_cpus else ""
        print(
            f"# {name}: {t:.2f}s (external busy cpus: {ext}){flag}",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    max_external = max(external_cpus.values()) if external_cpus else 0.0
    contended = max_external > ext_retry_cpus
    if contended:
        print(
            f"# WARNING: external processes used up to {max_external} of "
            f"{meter.ncpus} CPUs during the run — timings are contaminated; "
            "re-run on an idle machine.",
            file=sys.stderr,
        )

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

    # VERDICT r07 item 2: the driver captures only the TAIL of bench
    # output, and r07's single summary line (36 queries x 2 per-query
    # maps) outgrew the capture window — BENCH_r07.json lost the
    # headline total to mid-object truncation. Split the output:
    # the bulky per-query diagnostics go to a side file (and an
    # EARLIER stdout line, so a full capture still has them), and the
    # FINAL line is the lean summary object alone — sized so any
    # plausible tail window contains it whole.
    summary = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "max_external_busy_cpus": max_external,
        "ncpus": meter.ncpus,
        "contended": contended,
        "contention_retries": {n: r for n, r in retried.items() if r},
        "load_before": load_before,
        "started_hot": started_hot,
    }
    diagnostics = {
        "metric": "bench_diagnostics",
        "load_before": load_before,
        "load_gate": load_gate,
        "load_gate_deferred_sec": deferred,
        "started_hot": started_hot,
        "query_load1": query_load1,
        "external_busy_cpus": external_cpus,
        "external_busy_retry_threshold_cpus": ext_retry_cpus,
    }
    diag_path = os.path.join(os.path.dirname(__file__) or ".", "BENCH_DIAG.json")
    try:
        with open(diag_path, "w") as f:
            json.dump(summary | diagnostics, f)
    except OSError:
        pass  # diagnostics side file is best-effort; stdout is the contract
    print(json.dumps(diagnostics))
    print(json.dumps(summary))


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
