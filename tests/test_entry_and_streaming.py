"""Driver-contract smoke (entry/queries/oracle_sql) + Structured
Streaming ≡ batch equivalence."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "l_returnflag" in df.columns


def test_queries_registry_shape():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 60
    assert set(o) <= set(q)
    # oracle coverage: the vast majority of entries are SQL-checked
    assert len(o) / len(q) > 0.8
    # every §2 operator family is represented
    for prefix in ("s0", "p0", "j0", "a0", "w0", "o0", "f0", "d0", "v0", "t0",
                   "m0", "c0", "st"):
        assert any(k.startswith(prefix) for k in q), prefix


def test_all_queries_run_smoke(spark, sf_dir):
    """Every catalog query executes and yields a stable schema at
    sf0.001 (value-level checks are tools/check_oracle.py at sf0.01)."""
    skip_slow = {"c01_crawl_fetch_log", "c02_crawl_round_metrics"}
    for name, fn in entrymod.queries().items():
        if name in skip_slow:
            continue
        df = fn(spark, sf_dir)
        n = df.count()
        assert n >= 0, name


def test_streaming_equals_batch(spark, sf_dir):
    from common_crawl___autumn_2025_spark.plans.catalog import QUERIES
    from common_crawl___autumn_2025_spark.streaming.rounds import (
        stream_events_windowed,
    )

    streamed = {
        (r.window_start, r.event_type): r.n
        for r in stream_events_windowed(spark, sf_dir).collect()
    }
    batch = {
        (r.window_start, r.event_type): r.n
        for r in QUERIES["st01_tumbling_window"](spark, sf_dir).collect()
    }
    assert streamed == batch


def test_crawl_catalog_queries(spark, sf_dir):
    from common_crawl___autumn_2025_spark.plans.catalog import QUERIES

    log = QUERIES["c01_crawl_fetch_log"](spark, sf_dir)
    rows = log.collect()
    assert len(rows) > 0
    # per-host seq dense from 1
    by_host = {}
    for r in rows:
        by_host.setdefault((r.round, r.host), []).append(r.seq)
    for seqs in by_host.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))
    metrics = QUERIES["c02_crawl_round_metrics"](spark, sf_dir).collect()
    assert metrics[0].frontier_in > 0


def test_approx_distinct_within_bound(spark, sf_dir):
    from common_crawl___autumn_2025_spark.plans.catalog import QUERIES

    row = QUERIES["a16_approx_distinct"](spark, sf_dir).collect()[0]
    assert abs(row.approx_parts - row.exact_parts) / row.exact_parts < 0.05


def test_stateful_sessionization_equals_batch(spark, sf_dir):
    """applyInPandasWithState sessionization across 3 time-split
    micro-batches == the batch window sessionization (st02): per-user
    state genuinely carries over batch boundaries."""
    from common_crawl___autumn_2025_spark.plans.catalog import QUERIES
    from common_crawl___autumn_2025_spark.streaming.rounds import (
        stream_sessionize_stateful,
    )

    got = {
        (r.user_id, r.event_id): r.session_id
        for r in stream_sessionize_stateful(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.event_id): r.session_id
        for r in QUERIES["st02_sessionization"](spark, sf_dir).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_streaming_record_decode_equals_batch(spark):
    """st04: decoding the binary record stream per micro-batch must
    produce the identical per-format aggregate as the batch pipeline
    over the same deterministic records."""
    from pyspark.sql import functions as F

    from common_crawl___autumn_2025_spark import synthetic as syn
    from common_crawl___autumn_2025_spark.operators.multimodal import (
        decode_verify,
    )
    from common_crawl___autumn_2025_spark.streaming.rounds import (
        stream_records_decode,
    )

    streamed = {
        tuple(r)
        for r in stream_records_decode(
            spark, "", n_records=60, n_files=3, seed=9
        ).collect()
    }
    batch = {
        tuple(r)
        for r in decode_verify(
            syn.records_df(spark, 60, seed=9), ref_seed=9
        )
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("decode_ok").cast("long")).alias("n_ok"),
            F.sum(F.col("phash_match").cast("long")).alias("n_phash_ok"),
            F.sum("caption_tokens").alias("caption_tokens"),
        )
        .collect()
    }
    assert streamed == batch and len(streamed) >= 2
    # every payload decoded clean through the stream
    assert all(n == ok for _, n, ok, _, _ in streamed)
