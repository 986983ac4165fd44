"""Crawl-loop queries for the driver harness (rows-only checks —
the real correctness gate is the oracle-replay pytest suite,
tests/test_crawl_replay.py)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from .. import synthetic as syn
from ..crawl.frontier import CrawlEngine, CrawlSpec
from . import register


def _run_small_crawl(spark):
    spec = CrawlSpec(web=syn.WebConfig(n_hosts=12), max_depth=1, max_rounds=2)
    seeds = syn.seed_urls(spec.web, 10)
    root = tempfile.mkdtemp(prefix="cat_crawl_")
    eng = CrawlEngine(spark, spec, root, partitions=8)
    eng.run(seeds)
    return eng, root


@register("c01_crawl_fetch_log")  # rows-only: full-loop integration
def c01_crawl_fetch_log(spark, sf_dir):
    """End-to-end crawl rounds: returns the politeness-ordered fetch
    log (round, host, seq, surt, status, ts offset). Deterministic —
    equal to the single-thread oracle by the replay test suite."""
    eng, root = _run_small_crawl(spark)
    try:
        latest = eng.store.latest_round()
        logs = None
        for r in range(latest + 1):
            t = eng.store.read_table(r, "fetch_log").select(
                "round", "host", "seq", "surt", "depth", "seed_id", "status",
                "fetch_ts_offset", "target_number",
            )
            logs = t if logs is None else logs.unionByName(t)
        out = logs.orderBy("round", "host", "seq")
        out = spark.createDataFrame(out.collect(), out.schema)  # detach from root
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("c02_crawl_round_metrics")  # rows-only
def c02_crawl_round_metrics(spark, sf_dir):
    """Per-round frontier/dedup/fetch/match counters from the snapshot
    manifests (A13 — the reference's printed per-round counters,
    Matching_P1.py:248,277,367 — as a table)."""
    eng, root = _run_small_crawl(spark)
    try:
        rows = [
            (
                m["round"],
                m["metrics"]["frontier_in"],
                m["metrics"]["deduped_attempted"],
                m["metrics"]["fetched"],
                m["metrics"]["matches_total"],
            )
            for m in reversed(eng.store.lineage())
        ]
        return spark.createDataFrame(
            rows,
            "round int, frontier_in long, deduped_attempted long, "
            "fetched long, matches_total long",
        ).orderBy("round")
    finally:
        shutil.rmtree(root, ignore_errors=True)
