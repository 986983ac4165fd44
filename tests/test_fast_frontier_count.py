"""Pins for run()'s post-round fast path (r7 optimization): the
one-aggregate next-frontier count must equal count(next_frontier)
exactly, round by round, and the narrow hit-row collect must
reproduce the matches delta's seed-id set (union with the prior
mirror being idempotent is what lets run() skip the delta's
window+filter job)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from common_crawl___autumn_2025_spark import synthetic as syn
from common_crawl___autumn_2025_spark.crawl.frontier import (
    MATCH_SCHEMA,
    CrawlEngine,
    CrawlSpec,
    seeds_frontier,
)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(max_depth=2, max_rounds=3),
        dict(max_depth=2, max_rounds=3, retry_max=2),
        dict(max_depth=2, max_rounds=3, early_exit=False),
        dict(max_depth=1, max_rounds=2, scope_mode="exclude_same_netloc"),
    ],
)
def test_fast_count_and_mirror_collect_equivalences(spark, kwargs):
    spec = CrawlSpec(web=syn.WebConfig(n_hosts=40), **kwargs)
    seeds = syn.seed_urls(spec.web, spec.web.n_hosts)
    root = tempfile.mkdtemp(prefix="fastcount_")
    try:
        eng = CrawlEngine(spark, spec, root, partitions=4)
        frontier = seeds_frontier(spark, seeds)
        matches = spark.createDataFrame([], MATCH_SCHEMA)
        # seed the driver mirror the way run() does on a fresh crawl
        eng._matched_ids = set()
        eng._mirror_valid = True
        eng._matched_df_n = None
        fc = len(seeds)
        rounds = 0
        for rnd in range(spec.max_rounds):
            if fc == 0:
                break
            nxt, fetched, delta, _records, _metrics = eng.run_round(
                rnd, frontier, matches, frontier_count=fc
            )
            delta_ids = {r[0] for r in delta.select("seed_id").collect()}
            hit_ids = {
                r[0]
                for r in fetched.where(
                    (F.col("status") == 200) & (F.col("target_number") != "")
                )
                .select("seed_id")
                .collect()
            }
            # narrow hit collect ≡ delta ids beyond the prior mirror
            assert hit_ids - eng._matched_ids == delta_ids
            eng._matched_ids.update(hit_ids)
            slow = nxt.count()
            assert eng._next_frontier_count_fast(fetched) == slow
            matches = matches.unionByName(delta)
            frontier, fc = nxt, slow
            rounds += 1
        assert rounds >= 1
    finally:
        shutil.rmtree(root, ignore_errors=True)
