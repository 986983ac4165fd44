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


def test_round_budget_splits_batches(spark):
    """A host queue longer than the round budget splits into batches:
    batch_id = floor(offset / budget), every batch's offsets fit the
    budget window, and the per-host sequence stays dense across the
    split (§2.9 rate-limiting semantics)."""
    from common_crawl___autumn_2025_spark.crawl.politeness import schedule

    rows = [("hot.com", 0.0, f"surt{i:04d}") for i in range(50)]
    rows += [("cold.com", 0.0, f"surt{i:04d}") for i in range(3)]
    df = spark.createDataFrame(
        [(h, p, s, f"http://{h}/{s}") for h, p, s in rows],
        "host string, priority double, surt string, url string",
    )
    robots = spark.createDataFrame(
        [("hot.com", [], 2.0), ("cold.com", [], 2.0)],
        "host string, disallow array<string>, crawl_delay double",
    )
    out = schedule(df, robots, partitions=4, round_budget_s=20.0).collect()
    hot = sorted((r.seq, r.fetch_ts_offset, r.batch_id)
                 for r in out if r.host == "hot.com")
    assert [s for s, _, _ in hot] == list(range(1, 51))  # dense seq
    for seq, off, batch in hot:
        assert off == (seq - 1) * 2.0
        assert batch == int(off // 20.0)
    assert max(b for _, _, b in hot) == 4  # 98s of queue / 20s budget
    assert all(r.batch_id == 0 for r in out if r.host == "cold.com")


def test_cumsum_matches_single_thread(spark):
    """with_host_sequence's distributed running sum (used for retry
    backoff) equals a single-thread cumulative sum at any parallelism."""
    rows = _frontier_rows(rows=2000, seed=5)
    with_rc = [(h, p, s, int(s[-1]) % 3) for h, p, s in rows]
    df = spark.createDataFrame(
        with_rc, "host string, priority double, surt string, retry_count int"
    )
    by_host = {}
    for h, p, s, rc in with_rc:
        by_host.setdefault(h, []).append((p, s, rc))
    expected = {}
    for h, items in by_host.items():
        cum = 0
        for p, s, rc in sorted(items):
            cum += rc
            expected[(h, s)] = cum
    for parts in (3, 16):
        cleanup = []
        got = {
            (r.host, r.surt): r.cum_retry_count
            for r in with_host_sequence(
                df, partitions=parts, cleanup=cleanup,
                cumsum_col="retry_count",
            ).collect()
        }
        for c in cleanup:
            c.unpersist()
        assert got == expected, f"cumsum mismatch at partitions={parts}"
