"""st07 stream-static join: the streaming enrichment must equal the
batch equi join row for row (stateless, append mode, exactly-once),
including when matches are partial, and each micro-batch must join
against the SAME static snapshot."""

import duckdb

from common_crawl___autumn_2025_spark.streaming.rounds import (
    _ST07_ORACLE,
    stream_static_enrich,
)


def test_st07_stream_equals_oracle(spark, sf_dir):
    engine = sorted(
        tuple(r) for r in stream_static_enrich(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    try:
        for t in ("events", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        oracle = sorted(tuple(r) for r in con.sql(_ST07_ORACLE).fetchall())
    finally:
        con.close()
    assert engine == oracle
    assert len(engine) > 0


def test_st07_unmatched_events_drop(spark, tmp_path):
    """Inner-join semantics: events whose user has no dim row are
    dropped in every micro-batch, matched ones enriched exactly
    once."""
    import datetime as dt

    base = dt.datetime(2024, 5, 1, 8, 0, 0)
    events = [
        # 9 events over 3 files; users 0,1 exist in the dim, 99 not
        (i, base + dt.timedelta(minutes=i), [0, 1, 99][i % 3], float(i))
        for i in range(9)
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        events, "event_id long, ts timestamp, user_id long, value double"
    ).write.parquet(sf + "/events.parquet")
    spark.createDataFrame(
        [(0, "n0", 10, "SEG_A", 100.0), (1, "n1", 11, "SEG_B", -5.125)],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_mktsegment string, c_acctbal double",
    ).write.parquet(sf + "/customer.parquet")

    out = sorted(
        stream_static_enrich(spark, sf).collect(), key=lambda r: r.event_id
    )
    assert [r.event_id for r in out] == [0, 1, 3, 4, 6, 7]  # user 99 gone
    by_user = {r.user_id for r in out}
    assert by_user == {0, 1}
    segs = {r.user_id: r.segment for r in out}
    assert segs == {0: "SEG_A", 1: "SEG_B"}
    # rounding contract
    assert all(
        r.acctbal in (100.0, -5.13) for r in out
    )
