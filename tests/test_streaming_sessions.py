"""st06 streaming session windows: TRUE Structured Streaming (3
event-time-ordered micro-batches, session_window state merged across
them, watermark-finalized append output + sentinel flush) must equal
the batch session_window rollup (w07) — engine ≡ the shared DuckDB
gaps-and-islands oracle, plus batch equality and a planted session
that SPANS micro-batch boundaries."""

import datetime as dt

import duckdb

from common_crawl___autumn_2025_spark.plans.retrieval import (
    _W07_ORACLE,
    w07_session_window_native,
)
from common_crawl___autumn_2025_spark.streaming.rounds import (
    stream_session_windows,
)


def test_st06_stream_equals_oracle(spark, sf_dir):
    engine = sorted(
        tuple(r) for r in stream_session_windows(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    oracle = sorted(tuple(r) for r in con.sql(_W07_ORACLE).fetchall())
    assert engine == oracle
    assert len(engine) > 0


def test_st06_stream_equals_batch_twin(spark, sf_dir):
    """Stream == w07, the batch spelling of the same operator: every
    merge the batch session_window performs must also happen in the
    streaming state store, and every session must be emitted exactly
    once (append mode + the sentinel flush)."""
    got = sorted(
        tuple(r) for r in stream_session_windows(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in w07_session_window_native(spark, sf_dir).collect()
    )
    assert got == want


def test_st06_planted_cross_batch_session_merge(spark, tmp_path):
    """A session whose events land in DIFFERENT micro-batches must
    come out as ONE session: user 1 emits one event per minute for 12
    minutes (14 staged events -> 3 batches, so the run spans all
    three), user 2 has a 50-minute gap (two sessions). The sentinel
    flush event must not leak into the result."""
    base = dt.datetime(2024, 6, 1, 9, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, 1.0) for i in range(12)
    ]
    rows += [
        (100, base, 2, 5.0),
        (101, base + dt.timedelta(minutes=50), 2, 7.0),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).write.parquet(sf + "/events.parquet")

    out = sorted(
        stream_session_windows(spark, sf).collect(),
        key=lambda r: (r.user_id, r.session_start),
    )
    assert [r.user_id for r in out] == [1, 2, 2]
    u1 = out[0]
    assert u1.n_events == 12 and u1.first_event == 0
    assert u1.session_start == base
    assert u1.session_end == base + dt.timedelta(minutes=11 + 30)
    assert out[1].n_events == 1 and out[1].total_value == 5.0
    assert out[2].n_events == 1 and out[2].total_value == 7.0
    # no sentinel leakage
    assert all(r.user_id >= 0 for r in out)
