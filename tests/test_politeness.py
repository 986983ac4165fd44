"""Politeness scheduler: per-host sequences must equal a single-thread
sort at ANY partition count (regression: repartitionByRange samples
boundaries per execution — without pinning the ranked relation, the
offsets join silently dropped rows at ~3k rows / 32 partitions)."""

import numpy as np
from pyspark.sql import functions as F

from common_crawl___autumn_2025_spark.crawl.politeness import with_host_sequence


def _frontier_rows(n_hosts=500, rows=4000, seed=3):
    g = np.random.Generator(np.random.PCG64(seed))
    out = []
    for i in range(rows):
        h = int(g.integers(0, n_hosts))
        # Zipf-ish: fold high host ids down to create hot hosts
        if h > n_hosts // 4 and g.integers(0, 3) == 0:
            h = h % 7
        out.append(
            (f"host{h:04d}.com", float(g.integers(0, 2)), f"surt{i:06d}")
        )
    return out


def _expected_seq(rows):
    by_host = {}
    for host, prio, surt in rows:
        by_host.setdefault(host, []).append((prio, surt))
    expected = {}
    for host, items in by_host.items():
        for seq, (prio, surt) in enumerate(sorted(items), start=1):
            expected[(host, surt)] = seq
    return expected


def test_host_sequence_matches_single_thread_sort_any_parallelism(spark):
    rows = _frontier_rows()
    expected = _expected_seq(rows)
    df = spark.createDataFrame(rows, "host string, priority double, surt string")
    for parts in (4, 32):
        cleanup = []
        got = {
            (r.host, r.surt): r.seq
            for r in with_host_sequence(df, partitions=parts, cleanup=cleanup)
            .select("host", "surt", "seq")
            .collect()
        }
        for c in cleanup:
            c.unpersist()
        assert len(got) == len(rows), f"rows dropped at partitions={parts}"
        assert got == expected, f"sequence mismatch at partitions={parts}"


def test_host_sequence_no_rows_lost_repeated_runs(spark):
    """Run the same scheduling plan several times — row count must be
    stable every time (catches execution-dependent sampling)."""
    rows = _frontier_rows(rows=3000, seed=9)
    df = spark.createDataFrame(rows, "host string, priority double, surt string")
    counts = set()
    for _ in range(3):
        cleanup = []
        counts.add(with_host_sequence(df, partitions=32, cleanup=cleanup).count())
        for c in cleanup:
            c.unpersist()
    assert counts == {len(rows)}
