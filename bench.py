"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus a crawl
throughput round, and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is fully materialized via the noop writer (no driver
collect, no column pruning shortcut). A warmup query absorbs JVM/JIT
startup so numbers reflect steady-state plans.

Noise handling: the sandbox runs on a shared hypervisor with large
run-to-run variance (identical code measured 2-3x apart minutes
apart).  Each query and the crawl therefore run ``SPARK_GRAFT_
BENCH_TRIALS`` times (default 2) and the reported number is the
per-query MIN — the standard shared-host latency methodology (the
min is the estimate least contaminated by external load).  All raw
trials are kept in the ``trial_secs`` key so no information is
discarded, and a wall-clock budget (``SPARK_GRAFT_BENCH_BUDGET``,
default 480s) skips extra trials rather than blow the driver's
patience on a pathologically slow window.

Load gate (r5 verdict #3): BENCH_r05 was captured under neighbor
load 1.9-3.6 and read 13-30% high on engine-untouched queries, so
the headline artifact now carries the same quiet-window gate the
scaling evidence uses — launch waits for a 1-min load average under
``SPARK_GRAFT_BENCH_MAX_LOAD`` (default 0.5, bounded by ``SPARK_
GRAFT_BENCH_GATE_TIMEOUT``, default 900 s, then measures anyway),
and the output records the 1/5/15-min loads at start and end plus a
``load_clean`` verdict so a dirty capture is self-identifying
instead of requiring forensics.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common_crawl___autumn_2025_spark.session import get_spark  # noqa: E402
from common_crawl___autumn_2025_spark.plans.catalog import QUERIES  # noqa: E402

HEADLINE = [
    "a02_sum_avg_pricing",        # flagship agg (TPC-H Q1 shape)
    "j01_left_join_padded_key",   # broadcast left join, normalized keys
    "j03_fuzzy_similarity_join",  # blocked levenshtein theta join
    "j07_equi_join_derived_key",  # multi-hop equi join
    "w02_topk_per_group",         # ranking window
    "o01_global_sort_topk",       # TakeOrderedAndProject
    "d01_exact_dup",              # hash dedup
    "d02_shingle_jaccard",        # n-gram Jaccard dedup
    "d03_minhash_lsh",            # MinHash+LSH candidates
    "d05_dup_components",         # iterative components clustering
    "v01_cosine_topk_bruteforce", # dense similarity top-k
    "v03_ann_lsh_bucketed",       # LSH ANN
    "v04_ann_ivf_flat",           # IVF-Flat ANN
    "t02_quality_score",          # text quality scan
    "st01_tumbling_window",       # windowed stream-shape agg
    "m01_records_decode_verify",  # image decode/verify pipeline
    "d08_exact_substring",        # chunk-level exact-substring dedup (r5+)
    "v06_semantic_dedup",         # centroid-blocked semantic dedup (r5+)
    "t11_bm25_topk",              # BM25 ranked retrieval (r6+)
    "w07_session_window_native",  # native session_window rollup (r6+)
    "j08_asof_join",              # union-window as-of join (r6+)
    "d09_incremental_dedup",      # batch-vs-history dedup (r6+)
    "d10_incremental_neardup",    # batch-vs-history LSH near-dup (r6+)
    "v07_ann_ivf_pq",             # PQ-compressed ANN + ADC (r6+)
]

# queries added to HEADLINE after round 4 — excluded from the
# like-for-like total so cross-round comparisons stay valid
ADDED_R5 = {"d08_exact_substring", "v06_semantic_dedup"}
ADDED_R6 = {
    "t11_bm25_topk",
    "w07_session_window_native",
    "j08_asof_join",
    "d09_incremental_dedup",
    "d10_incremental_neardup",
    "v07_ann_ivf_pq",
}
_POST_R4 = ADDED_R5 | ADDED_R6


def bench_crawl(spark, partitions: int) -> dict:
    """One crawl config fetched end-to-end; URLs/sec over the run."""
    import shutil
    import tempfile

    from common_crawl___autumn_2025_spark import synthetic as syn
    from common_crawl___autumn_2025_spark.crawl.frontier import (
        CrawlEngine,
        CrawlSpec,
    )

    # 2000 hosts (~9k URLs over 3 depth-2 rounds): large enough that
    # the per-URL work amortizes the fixed per-round cost, small
    # enough to keep the driver's per-round bench under ~20s
    spec = CrawlSpec(
        web=syn.WebConfig(n_hosts=int(os.environ.get("SPARK_GRAFT_CRAWL_HOSTS", "2000"))),
        max_depth=2,
        max_rounds=3,
    )
    seeds = syn.seed_urls(spec.web, spec.web.n_hosts)
    root = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        t0 = time.time()
        eng = CrawlEngine(spark, spec, root, partitions=partitions)
        summary = eng.run(seeds)
        elapsed = time.time() - t0
        fetched = sum(r["fetched"] for r in summary["rounds"])
        return {
            "sec": round(elapsed, 3),
            "fetched": fetched,
            "urls_per_sec": round(fetched / elapsed, 2),
            "rounds": len(summary["rounds"]),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def wait_for_quiet() -> tuple[float, bool]:
    """Block until the 1-min load average is under the gate (or the
    timeout passes), mirroring bench_scaling.py's per-trial gate.
    Returns (load_at_release, gate_satisfied)."""
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "0.5"))
    timeout_s = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_TIMEOUT", "900"))
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load = os.getloadavg()[0]
        if load <= max_load:
            return load, True
        time.sleep(15)
    return os.getloadavg()[0], False


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    gate_load, gated = wait_for_quiet()
    load_start = tuple(round(x, 2) for x in os.getloadavg())
    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)

    # warmup: JVM/codegen/Arrow channels
    QUERIES["a01_count_star"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2")))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "480"))
    bench_t0 = time.time()

    trial_secs: dict[str, list[float]] = {n: [] for n in HEADLINE}
    trial_secs["crawl_3rounds"] = []
    crawl_runs: list[dict] = []
    for t in range(trials):
        if t > 0 and time.time() - bench_t0 > budget:
            break  # slow window: one honest pass beats a truncated second
        for name in HEADLINE:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            trial_secs[name].append(round(time.time() - t0, 3))
        crawl_runs.append(bench_crawl(spark, partitions=cpus))
        trial_secs["crawl_3rounds"].append(crawl_runs[-1]["sec"])

    # Estimator: best-of-N (the shared host swings 2-3x between
    # windows). METHODOLOGY (ADVICE r4): cross-round comparisons must
    # be like-for-like — r1-r3 records are single-trial, r4+ are
    # best-of-2; every raw trial is retained in trial_secs so either
    # estimator can be recomputed (first element = first trial).
    timings = {name: min(secs) for name, secs in trial_secs.items()}
    crawl = min(crawl_runs, key=lambda c: c["sec"])

    total = round(sum(timings.values()), 3)
    total_r4_set = round(
        sum(s for n, s in timings.items() if n not in _POST_R4), 3
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_end = tuple(round(x, 2) for x in os.getloadavg())
    # the bench's own work dominates loadavg once it runs, so
    # cleanliness is judged at LAUNCH: the 1-min gate was satisfied
    # AND the 15-min residual (neighbor history; r5's dirty capture
    # had 5/15-min residuals of 2-3) was low
    load_clean = bool(gated and load_start[2] <= 2.0)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_crawl_total",
                "value": total,
                "total_r4_set": total_r4_set,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "crawl": crawl,
                "cpus": cpus,
                "trials": len(crawl_runs),
                "trial_secs": trial_secs,
                "load_gate": {
                    "gate_satisfied": gated,
                    "load_at_release": round(gate_load, 2),
                    "loadavg_start": load_start,
                    "loadavg_end": load_end,
                },
                "load_clean": load_clean,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
