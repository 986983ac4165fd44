"""Randomized cross-engine checks for the temporal family (r6
verdict "Next round" #8, same harness as test_randomized_oracles):
j08/j09 must agree with their DuckDB oracles on ARBITRARY small
event tables aimed at the painful edges — equal-ts ties (view and
click of the same user at the identical microsecond), timestamps
exactly on / one microsecond either side of the 30-min bucket grain
and the 90-min interval end, duplicate rows, and single-user
corpora. The DuckDB side runs genuinely different algorithms
(native ASOF JOIN; IEJoin), so agreement cross-checks two
independent implementations, not one spelling against itself.
Values are exact binary fractions so float-summation order cannot
produce spurious diffs."""

import datetime as dt

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from common_crawl___autumn_2025_spark.plans.temporal import (
    _J08_ORACLE,
    _J09_ORACLE,
    j08_asof_join,
    j09_range_join_bucketed,
)

_BASE = dt.datetime(2024, 1, 1)
_MIN_US = 60 * 1_000_000
_BUCKET = 30 * _MIN_US  # j09's bucket grain
_IVL = 90 * _MIN_US     # j09's interval length

# offsets cluster on the j09 bucket/interval edges and j08 tie points
_OFFSETS = [
    0,
    1,
    7 * _MIN_US,
    _BUCKET - 1,
    _BUCKET,
    _BUCKET + 1,
    2 * _BUCKET,
    _IVL - 1,
    _IVL,
    _IVL + 1,
    3 * _BUCKET + 17,
    5 * _BUCKET + 123_456,
]
_ROW = st.tuples(
    st.integers(min_value=0, max_value=2),            # user_id
    st.sampled_from(_OFFSETS),                        # ts offset (us)
    st.sampled_from(["view", "click", "scroll"]),     # event_type
    st.sampled_from([0.0, 0.25, 1.5, -2.75, 10.25]),  # exact values
)
_EVENTS = st.lists(_ROW, min_size=1, max_size=20)


def _run_both(spark, tmp_path, rows, engine_fn, oracle_sql):
    sf = str(tmp_path / "sf")
    data = [
        (i, _BASE + dt.timedelta(microseconds=off), user, etype, val, "{}")
        for i, (user, off, etype, val) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(sf + "/events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    engine = sorted(repr(tuple(r)) for r in engine_fn(spark, sf).collect())
    oracle = sorted(repr(tuple(r)) for r in con.sql(oracle_sql).fetchall())
    return engine, oracle


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_EVENTS)
def test_j08_randomized_events_match_native_asof(spark, tmp_path, rows):
    # always include an equal-ts view/click tie (the <= visibility
    # convention) and a click with no view at all (the LEFT edge)
    rows = list(rows) + [
        (0, _BUCKET, "view", 1.5),
        (0, _BUCKET, "click", 0.25),
        (2, 0, "click", 0.0),
    ]
    engine, oracle = _run_both(
        spark, tmp_path, rows, j08_asof_join, _J08_ORACLE
    )
    assert engine == oracle


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_EVENTS)
def test_j09_randomized_events_match_iejoin(spark, tmp_path, rows):
    # pin one user's interval start to t0 so the generated edge
    # offsets (interval end, end±1us, bucket boundaries) actually
    # straddle ITS [start, start+90min) window
    rows = [(1, 0, "view", 0.25)] + list(rows)
    engine, oracle = _run_both(
        spark, tmp_path, rows, j09_range_join_bucketed, _J09_ORACLE
    )
    assert engine == oracle
