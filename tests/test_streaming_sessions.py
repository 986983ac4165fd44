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

def _run_session_stream(spark, files):
    """Stage ``files`` (list of row-lists) as one parquet file each,
    ascending mtime, and drain a session_window stream (30-min gap,
    10-min watermark, append) over them. Returns (rows, progress)."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    import pyspark.sql.functions as F

    stage = tempfile.mkdtemp(prefix="late_sess_")
    work = tempfile.mkdtemp(prefix="late_sess_w_")
    name = f"late_sess_sink_{uuid.uuid4().hex[:8]}"
    try:
        now = time.time()
        for i, rows in enumerate(files, start=1):
            part = os.path.join(work, f"b{i}")
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, value double",
            ).coalesce(1).write.mode("overwrite").parquet(part)
            src = next(
                f for f in os.listdir(part) if f.endswith(".parquet")
            )
            dst = os.path.join(stage, f"{i:03d}.parquet")
            shutil.copyfile(os.path.join(part, src), dst)
            os.utime(dst, (now + i, now + i))

        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(stage)
        )
        sessions = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(
                F.session_window("ts", "30 minutes").alias("sw"), "user_id"
            )
            .agg(F.count("*").alias("n_events"))
            .select("user_id", "n_events")
        )
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        progress = list(q.recentProgress)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)
    return spark.sql(f"SELECT * FROM {name}").collect(), progress


def test_session_window_late_row_merges_while_state_alive(spark):
    """Late-data semantics, phase 1 — what the ordered-staging oracle
    deliberately avoids: eviction lags the watermark by one batch
    (the watermark a batch RUNS with is the previous batch's), so a
    row that is behind the watermark but whose session is STILL
    BUFFERED merges into it — no duplicate emission, because the
    session had not been finalized yet."""
    import datetime as dt

    base = dt.datetime(2024, 7, 1, 9, 0, 0)
    out, progress = _run_session_stream(
        spark,
        [
            [(0, base, 1, 1.0)],
            # advances max event time to 13:00; the NEXT batch runs
            # with watermark 12:50
            [(1, base + dt.timedelta(hours=4), 2, 2.0)],
            # behind the watermark, but user 1's session is still in
            # state (eviction with 12:50 happens in THIS batch, after
            # merging its input)
            [(2, base + dt.timedelta(minutes=5), 1, 4.0)],
        ],
    )
    assert len(progress) == 3  # genuinely three micro-batches
    got = {r.user_id: r.n_events for r in out}
    assert got.get(1) == 2  # merged, emitted once with both events


def test_session_window_late_row_dropped_after_finalize(spark):
    """Late-data semantics, phase 2: once the watermark has passed a
    session's end and the session was EMITTED, a late row for it is
    dropped by the watermark filter — it neither re-opens the session
    nor appends a duplicate row (exactly-once append output)."""
    import datetime as dt

    base = dt.datetime(2024, 7, 1, 9, 0, 0)
    out, progress = _run_session_stream(
        spark,
        [
            [(0, base, 1, 1.0)],
            [(1, base + dt.timedelta(hours=4), 2, 2.0)],
            # this batch runs with watermark 12:50 -> finalizes and
            # emits user 1's 1-event session
            [(2, base + dt.timedelta(hours=5), 3, 3.0)],
            # late row for the already-emitted session
            [(3, base + dt.timedelta(minutes=5), 1, 4.0)],
        ],
    )
    assert len(progress) == 4
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in progress
        if p["stateOperators"]
    )
    assert dropped == 1  # the late row, counted by the state operator
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.n_events)
    assert by_user.get(1) == [1]  # emitted once, WITHOUT the late row
    assert by_user.get(2) == [1]
