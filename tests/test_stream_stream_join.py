"""st08 stream-stream interval join: the streaming attribution join
(clicks x views, watermark-bounded state) must equal the batch
interval self-join — engine ≡ DuckDB oracle on the sf corpus, plus a
planted corpus pinning cross-micro-batch matching and the exact
horizon boundary at microsecond precision."""

import datetime as dt

import duckdb

from common_crawl___autumn_2025_spark.streaming.rounds import (
    _ST08_ORACLE,
    stream_stream_attribution,
)


def test_st08_stream_equals_oracle(spark, sf_dir):
    engine = sorted(
        tuple(r) for r in stream_stream_attribution(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS "
            f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
        )
        oracle = sorted(tuple(r) for r in con.sql(_ST08_ORACLE).fetchall())
    finally:
        con.close()
    assert engine == oracle
    assert len(engine) > 0


def test_st08_cross_batch_and_boundary(spark, tmp_path):
    """A view in micro-batch 1 must match a click arriving two
    batches later (buffered state survives triggers); a click exactly
    at view.ts + 4 h is IN, at + 4 h + 1 µs is OUT; a click BEFORE
    its view never matches; users never cross."""
    base = dt.datetime(2024, 3, 1, 6, 0, 0)
    h4 = dt.timedelta(hours=4)
    rows = [
        # user 1: view early, matching clicks much later (cross-batch)
        (0, base, 1, "view"),
        (1, base + dt.timedelta(minutes=90), 1, "click"),   # in
        (2, base + h4, 1, "click"),                          # boundary in
        (3, base + h4 + dt.timedelta(microseconds=1), 1, "click"),  # out
        # user 2: click precedes its view -> no match
        (4, base + dt.timedelta(minutes=10), 2, "click"),
        (5, base + dt.timedelta(minutes=20), 2, "view"),
        # user 3: view with no click; filler spreading the batches
        (6, base + dt.timedelta(hours=5), 3, "view"),
        (7, base + dt.timedelta(hours=6), 3, "error"),
        (8, base + dt.timedelta(hours=7), 3, "purchase"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.parquet(sf + "/events.parquet")

    out = sorted(
        stream_stream_attribution(spark, sf).collect(),
        key=lambda r: r.click_id,
    )
    assert [(r.click_id, r.view_id, r.user_id) for r in out] == [
        (1, 0, 1),
        (2, 0, 1),
    ]
    assert out[0].lag_s == 90 * 60
    assert out[1].lag_s == 4 * 3600
