"""j08 as-of join, j09 bucketed range join, a19 exact quantiles:
engine ≡ DuckDB oracle on the sf corpus (two genuinely different
algorithms agreeing — DuckDB plans native ASOF JOIN / IEJoin where
the engine runs a union-window pass / bucketed equi join), plus
planted corpora pinning the boundary semantics the sf data might not
exercise: the <= tie at identical timestamps, clicks with no prior
view, same-(user, ts) view dedup, bucket-boundary membership at
microsecond precision, and closed-form quantile interpolation."""

import datetime as dt
import os

import duckdb

from common_crawl___autumn_2025_spark.plans.temporal import (
    _A19_ORACLE,
    _J08_ORACLE,
    _J09_ORACLE,
    a19_exact_quantiles,
    j08_asof_join,
    j09_range_join_bucketed,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _oracle_rows(sql, views):
    con = duckdb.connect()
    for name, path in views.items():
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')"
        )
    try:
        return sorted(
            tuple(r) for r in con.sql(sql).fetchall()
        )
    finally:
        con.close()


def _engine_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _write_events(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    ).write.parquet(f"{sf}/events.parquet")
    return sf


def test_j08_matches_oracle_on_sf(spark, sf_dir):
    engine = _engine_rows(j08_asof_join(spark, sf_dir))
    oracle = _oracle_rows(_J08_ORACLE, {"events": f"{sf_dir}/events.parquet"})
    assert engine == oracle
    assert len(engine) > 0


def test_j08_planted_semantics(spark, tmp_path):
    s = dt.timedelta(seconds=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: view@0, view@10 -> click@5 sees view@0; click@10
        # (EQUAL ts) sees view@10 (the <= convention); click@10+1us
        # also view@10.
        (100, T0, 1, "view", 1.0),
        (101, T0 + 10 * s, 1, "view", 2.0),
        (200, T0 + 5 * s, 1, "click", 0.0),
        (201, T0 + 10 * s, 1, "click", 0.0),
        (202, T0 + 10 * s + us, 1, "click", 0.0),
        # user 2: click BEFORE any view -> NULL match; later click
        # matches.
        (300, T0 + 60 * s, 2, "view", 3.0),
        (400, T0, 2, "click", 0.0),
        (401, T0 + 61 * s, 2, "click", 0.0),
        # user 3: two views at the SAME (user, ts) -> max event_id
        # (501) and its value win.
        (500, T0, 3, "view", 5.0),
        (501, T0, 3, "view", 7.0),
        (600, T0 + s, 3, "click", 0.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r.click_event_id: r for r in j08_asof_join(spark, sf).collect()}
    assert out[200].view_event_id == 100 and out[200].gap_us == 5_000_000
    assert out[201].view_event_id == 101 and out[201].gap_us == 0
    assert out[202].view_event_id == 101 and out[202].gap_us == 1
    assert out[400].view_event_id is None and out[400].gap_us is None
    assert out[401].view_event_id == 300 and out[401].view_value == 3.0
    assert out[600].view_event_id == 501 and out[600].view_value == 7.0
    # the planted corpus agrees with DuckDB's native ASOF JOIN too
    assert _engine_rows(j08_asof_join(spark, sf)) == _oracle_rows(
        _J08_ORACLE, {"events": f"{sf}/events.parquet"}
    )


def test_j09_matches_oracle_on_sf(spark, sf_dir):
    engine = _engine_rows(j09_range_join_bucketed(spark, sf_dir))
    oracle = _oracle_rows(_J09_ORACLE, {"events": f"{sf_dir}/events.parquet"})
    assert engine == oracle
    assert len(engine) > 0


def test_j09_planted_boundaries(spark, tmp_path):
    """Interval membership is [start, end): an event exactly at
    start counts, exactly at end (start + 90 min) does not, end - 1us
    does — across bucket boundaries (the 30-min bucket grain means
    the 90-min interval spans 4 buckets when not aligned)."""
    m = dt.timedelta(minutes=1)
    us = dt.timedelta(microseconds=1)
    # user 1 is the busiest (5 events) -> its first-90-min window
    # [T0+7min, T0+97min) is an interval; plant probes from user 9.
    rows = [
        (1, T0 + 7 * m, 1, "view", 1.0),
        (2, T0 + 8 * m, 1, "view", 1.0),
        (3, T0 + 9 * m, 1, "view", 1.0),
        (4, T0 + 10 * m, 1, "view", 1.0),
        (5, T0 + 11 * m, 1, "view", 1.0),
        # probes (any user qualifies — the join has no user key):
        (10, T0 + 7 * m, 9, "click", 10.0),          # == start: in
        (11, T0 + 97 * m, 9, "click", 100.0),        # == end: OUT
        (12, T0 + 97 * m - us, 9, "click", 1000.0),  # end - 1us: in
        (13, T0 + 6 * m, 9, "click", 10000.0),       # before: OUT
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = j09_range_join_bucketed(spark, sf).collect()
    by_user = {r.interval_user: r for r in out}
    # user 1's interval: its own 5 events + probes 10 and 12
    assert by_user[1].n_events == 7
    assert by_user[1].sum_value == 5 * 1.0 + 10.0 + 1000.0
    assert _engine_rows(j09_range_join_bucketed(spark, sf)) == _oracle_rows(
        _J09_ORACLE, {"events": f"{sf}/events.parquet"}
    )


def test_a19_matches_oracle_on_sf(spark, sf_dir):
    engine = _engine_rows(a19_exact_quantiles(spark, sf_dir))
    oracle = _oracle_rows(_A19_ORACLE, {"events": f"{sf_dir}/events.parquet"})
    assert engine == oracle
    assert len(engine) > 0


def test_a19_closed_form_interpolation(spark, tmp_path):
    """values 10,20,30,40 -> p50 = 25 (linear interpolation between
    the 2nd and 3rd order statistics), p90 = 37, p99 = 39.7."""
    s = dt.timedelta(seconds=1)
    rows = [
        (i, T0 + i * s, 1, "view", float(v))
        for i, v in enumerate([10, 20, 30, 40])
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = a19_exact_quantiles(spark, sf).collect()[0]
    assert (r.p50, r.p90, r.p99, r.mean_value) == (25.0, 37.0, 39.7, 25.0)


def test_a19_anchors_the_approx_sketch(spark, sf_dir):
    """The 100 TB form of a19 swaps `percentile` for
    `approx_percentile` (mergeable sketch, map-side partial agg);
    a19's exact output is the accuracy anchor. The sketch guarantees
    RANK error (<= 1/accuracy), not value error — it returns an
    observed value, so in a sparse tail adjacent ranks can be far
    apart in value. The anchor check is therefore rank-based: the
    returned value's rank fraction within its group must sit within
    1/accuracy (+ one-row slack) of the requested quantile."""
    from pyspark.sql import functions as F

    from common_crawl___autumn_2025_spark.plans import load

    ev = load(spark, sf_dir, "events")
    acc = 10000
    approx = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_percentile("value", F.lit(0.5), F.lit(acc)).alias("p50"),
            F.approx_percentile("value", F.lit(0.9), F.lit(acc)).alias("p90"),
            F.approx_percentile("value", F.lit(0.99), F.lit(acc)).alias("p99"),
        )
        .collect()
    }
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    assert set(approx) == set(vals) and len(approx) > 0
    for et, ap in approx.items():
        v = sorted(vals[et])
        n = len(v)
        tol = 1.0 / acc + 1.0 / n
        for q, target in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            x = getattr(ap, q)
            frac_lt = sum(1 for y in v if y < x) / n
            frac_le = sum(1 for y in v if y <= x) / n
            assert frac_lt <= target + tol, (et, q)
            assert frac_le >= target - tol, (et, q)


def test_j08_parallelism_invariance(spark, sf_dir):
    base = _engine_rows(j08_asof_join(spark, sf_dir))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        assert _engine_rows(j08_asof_join(spark, sf_dir)) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
