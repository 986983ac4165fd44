"""st05 streaming first-occurrence dedup: TRUE Structured Streaming
(3 event-time-ordered micro-batches, dedup state carried across them
by dropDuplicates' state store) must equal the batch first-occurrence
(min ts, event_id per key) — engine ≡ DuckDB oracle, plus batch
equality and a planted cross-batch duplicate."""

import duckdb

from common_crawl___autumn_2025_spark.streaming.rounds import (
    _ST05_ORACLE,
    stream_first_occurrence_dedup,
)


def test_st05_stream_equals_oracle(spark, sf_dir):
    engine = [
        tuple(r) for r in stream_first_occurrence_dedup(spark, sf_dir).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    oracle = [tuple(r) for r in con.sql(_ST05_ORACLE).fetchall()]
    assert engine == oracle
    assert len(engine) > 0
    keys = [(u, t) for u, t, _, _ in engine]
    assert len(keys) == len(set(keys))  # one survivor per key


def test_st05_stream_equals_batch(spark, sf_dir):
    """Stream == the batch formulation of the same semantics: the
    state store across micro-batches must not lose or double-emit."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from common_crawl___autumn_2025_spark.plans import load

    got = sorted(
        tuple(r) for r in stream_first_occurrence_dedup(spark, sf_dir).collect()
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    want = sorted(
        tuple(r)
        for r in load(spark, sf_dir, "events")
        .select("user_id", "event_type", "event_id", "ts")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .drop("rn")
        .collect()
    )
    assert got == want


def test_st05_planted_cross_batch_duplicate(spark, tmp_path):
    """A key whose duplicate arrives in a LATER micro-batch than its
    first occurrence must keep only the first — the state genuinely
    spans batch boundaries (12 events, 3 batches of 4: key (1,'a')
    appears in batches 1, 2 and 3)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for minute in range(12):  # one event per minute; ntile(3) -> 4 each
        user, etype = (1, "a") if minute % 4 == 0 else (2 + minute, "b")
        rows.append((eid, base + dt.timedelta(minutes=minute), user, etype))
        eid += 1
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.parquet(sf + "/events.parquet")
    got = {
        (r.user_id, r.event_type): r.event_id
        for r in stream_first_occurrence_dedup(spark, sf).collect()
    }
    assert got[(1, "a")] == 0  # batch-1 occurrence wins over 2 and 3
    assert len(got) == 10  # 12 events, (1,'a') seen 3 times -> 10 keys
