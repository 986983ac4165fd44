"""st09 foreachBatch exactly-once sink: engine ≡ oracle, per-batch
directory layout, and the exactly-once property itself — replaying a
drained micro-batch through the writer (Spark's behavior after a
failure between sink write and checkpoint commit) leaves the sink's
row multiset unchanged instead of appending duplicates."""

import os

from common_crawl___autumn_2025_spark.streaming.rounds import (
    stream_exactly_once_sink,
    write_batch_idempotent,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _read_sink(spark, out):
    return (
        spark.read.option("basePath", out)
        .parquet(os.path.join(out, "batch_id=*"))
        .select("event_id", "user_id", "value")
    )


def test_st09_matches_batch_and_layout(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sink")
    got = _rows(stream_exactly_once_sink(spark, sf_dir, out_dir=out))
    expected = _rows(
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where("event_type = 'purchase'")
        .selectExpr("event_id", "user_id", "round(value, 4) AS value")
    )
    assert got == expected and len(got) > 0
    batch_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("batch_id=")
    )
    assert batch_dirs == ["batch_id=0", "batch_id=1", "batch_id=2"]
    # every batch directory is non-degenerate: the union IS the total
    per_batch = [
        spark.read.parquet(os.path.join(out, d)).count() for d in batch_dirs
    ]
    assert sum(per_batch) == len(got)


def test_st09_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sink")
    stream_exactly_once_sink(spark, sf_dir, out_dir=out)
    before = _rows(_read_sink(spark, out))
    # replay batch 0 with the same batch_id and the same data — the
    # stable (batch_id, data) pairing is what Spark's checkpoint WAL
    # guarantees; an append-mode sink would now hold duplicates
    replayed_rows = _rows(
        spark.read.parquet(os.path.join(out, "batch_id=0")).select(
            "event_id", "user_id", "value"
        )
    )
    assert len(replayed_rows) > 0
    replayed = spark.createDataFrame(
        replayed_rows, "event_id long, user_id long, value double"
    )
    write_batch_idempotent(out)(replayed, 0)
    after = _rows(_read_sink(spark, out))
    assert after == before


def test_st09_reprocessed_batch_overwrites(spark, sf_dir, tmp_path):
    """Writing a CORRECTED batch 0 replaces that batch's rows only —
    reprocessing one batch is an O(1) surgical operation, the other
    batch directories are untouched."""
    out = str(tmp_path / "sink")
    stream_exactly_once_sink(spark, sf_dir, out_dir=out)
    b1_before = _rows(spark.read.parquet(os.path.join(out, "batch_id=1")))
    corrected_rows = _rows(
        spark.read.parquet(os.path.join(out, "batch_id=0"))
        .select("event_id", "user_id", "value")
        .limit(5)
    )
    corrected = spark.createDataFrame(
        corrected_rows, "event_id long, user_id long, value double"
    )
    write_batch_idempotent(out)(corrected, 0)
    assert (
        _rows(spark.read.parquet(os.path.join(out, "batch_id=0"))
              .select("event_id", "user_id", "value"))
        == _rows(corrected)
    )
    assert _rows(spark.read.parquet(os.path.join(out, "batch_id=1"))) == b1_before
