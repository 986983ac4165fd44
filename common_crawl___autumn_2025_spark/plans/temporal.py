"""Temporal joins + exact quantiles (round-6 additions).

Three engine-new operators that round out the join/agg surface with
the two classic time-series shapes Spark has no native operator for,
plus exact grouped percentiles:

- ``j08_asof_join`` — the as-of join (each click matched to the most
  recent view at-or-before it, per user). Spark has no ASOF JOIN;
  the naive spelling is an inequality join (BNLJ — forbidden by this
  repo's audit gate outside v01's labeled baseline). Implemented as
  the single-pass union trick: tag both sides, ONE window over
  (user, ts) carrying the last-seen view forward — one shuffle on
  the user key, zero row explosion, O(n log n) within partitions.
  The DuckDB oracle uses DuckDB's NATIVE ``ASOF LEFT JOIN`` — a
  genuinely independent algorithm (binary-search merge), so value
  equality here cross-checks two different as-of implementations.
- ``j09_range_join_bucketed`` — point-in-interval join with NO equi
  key (events falling inside the busiest users' first-90-minute
  windows, regardless of user). The naive plan is a cartesian range
  filter; the scale spelling buckets time (30-min grain), explodes
  each interval into the buckets it spans (<= 4), and equi-joins on
  the bucket before the exact range filter — every (event, interval)
  pair meets in exactly one bucket, so no dedup pass is needed. The
  DuckDB oracle runs the plain inequality join (DuckDB plans IEJoin)
  — again an independent algorithm agreeing on values.
- ``a19_exact_quantiles`` — exact p50/p90/p99 per event type
  (``F.percentile``, linear interpolation) vs DuckDB
  ``quantile_cont``. Exact percentiles need the full value
  multiset per group; at 100 TB the same query shape swaps in
  ``approx_percentile`` (t-digest-style sketch, mergeable map-side)
  — the exact form is the correctness anchor the sketch is judged
  against (a16's HLL-vs-exact pattern).

Reference parity: the reference joins scrape rounds to the most
recent prior snapshot by date (Matching_with_recursion.py's
latest-date pick) — j08 is that operation's general form; j09
generalizes its date-range filtering (P3) to arbitrary intervals.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load, register

# -- j08: as-of join -----------------------------------------------------------

_J08_ORACLE = """
    WITH v AS (
      SELECT user_id, ts,
             max(event_id) AS view_event_id,
             arg_max(value, event_id) AS view_value
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ),
    c AS (
      SELECT user_id, event_id AS click_event_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    )
    SELECT c.click_event_id, c.user_id, c.click_ts,
           v.view_event_id,
           round(v.view_value, 4) AS view_value,
           date_diff('microsecond', v.ts, c.click_ts) AS gap_us
    FROM c ASOF LEFT JOIN v
      ON c.user_id = v.user_id AND c.click_ts >= v.ts
    """


@register("j08_asof_join", _J08_ORACLE)
def j08_asof_join(spark, sf_dir):
    """As-of join: for every click, the same user's most recent view
    at-or-before the click timestamp (ties at identical ts resolved
    deterministically: views are pre-reduced to one row per
    (user, ts) keeping the max event_id, and a same-ts view IS
    visible to the click — the <= convention DuckDB's ASOF JOIN
    uses).

    100 TB shape: ONE shuffle on user_id; both sides union into a
    single relation and a single window pass carries the last view
    forward (last(ignorenulls) over rows-unbounded-preceding), so
    there is no inequality join, no BNLJ, no candidate explosion —
    the exchange carries |clicks| + |distinct views| rows exactly
    once. The naive `c JOIN v ON user AND v.ts <= c.ts` + argmax
    spelling shuffles O(clicks x views-per-user) pairs."""
    ev = load(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("view_event_id"),
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    tagged = views.select(
        "user_id",
        F.col("ts"),
        F.lit(0).alias("kind"),  # views sort before clicks at equal ts
        "view_event_id",
        "view_value",
        F.lit(None).cast("long").alias("click_event_id"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.col("click_ts").alias("ts"),
            F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("view_event_id"),
            F.lit(None).cast("double").alias("view_value"),
            "click_event_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "v_eid", F.last("view_event_id", ignorenulls=True).over(w)
        )
        .withColumn("v_val", F.last("view_value", ignorenulls=True).over(w))
        .withColumn(
            "v_us",
            F.last(
                F.when(
                    F.col("kind") == 0,
                    F.unix_micros(F.col("ts").cast("timestamp")),
                ),
                ignorenulls=True,
            ).over(w),
        )
        .where(F.col("kind") == 1)
        .select(
            "click_event_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("v_eid").alias("view_event_id"),
            F.round("v_val", 4).alias("view_value"),
            (
                F.unix_micros(F.col("ts").cast("timestamp")) - F.col("v_us")
            ).alias("gap_us"),
        )
    )


# -- j09: bucketed range join --------------------------------------------------

_N_INTERVALS = 8
_INTERVAL_MIN = 90
_BUCKET_US = 30 * 60 * 1_000_000  # 30-minute buckets

_J09_ORACLE = f"""
    WITH top AS (
      SELECT user_id AS interval_user,
             min(ts) AS start_ts,
             min(ts) + INTERVAL {_INTERVAL_MIN} MINUTE AS end_ts
      FROM events
      GROUP BY user_id
      ORDER BY count(*) DESC, user_id
      LIMIT {_N_INTERVALS}
    )
    SELECT t.interval_user, t.start_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 4) AS sum_value
    FROM events e
    JOIN top t ON e.ts >= t.start_ts AND e.ts < t.end_ts
    GROUP BY t.interval_user, t.start_ts
    """


@register("j09_range_join_bucketed", _J09_ORACLE)
def j09_range_join_bucketed(spark, sf_dir):
    """Point-in-interval range join WITHOUT an equi key: count every
    event (any user) falling inside each of the 8 busiest users'
    first-90-minute windows.

    100 TB shape: a range join has no natural hash key, so the naive
    plan is a cartesian filter (BNLJ — audit-forbidden). The scale
    spelling manufactures the key: time is bucketed at a grain (30
    min) <= the interval length, each interval explodes into the <= 4
    buckets it spans, events map to exactly one bucket, and the join
    is a plain equi join on the bucket followed by the exact range
    filter. Every qualifying (event, interval) pair meets in exactly
    one bucket (the event's own), so no distinct pass is needed. The
    interval side here is 8 x 4 rows (broadcast); were it large, the
    identical plan degrades to a shuffled equi join on the bucket —
    never a BNLJ. Top-k interval selection is TakeOrderedAndProject
    (orderBy+limit over the aggregated per-user relation), with a
    total (count DESC, user_id) order so ties are deterministic.

    The DuckDB oracle states the SAME semantics as the bare
    inequality join (DuckDB plans IEJoin) — an independent range-join
    algorithm agreeing on values."""
    ev = load(spark, sf_dir, "events")
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_ev"), F.min("ts").alias("start_ts"))
        .orderBy(F.desc("n_ev"), F.asc("user_id"))
        .limit(_N_INTERVALS)
        .select(
            F.col("user_id").alias("interval_user"),
            "start_ts",
            F.expr(f"start_ts + INTERVAL {_INTERVAL_MIN} MINUTES").alias(
                "end_ts"
            ),
        )
    )
    intervals = top.withColumn(
        "b",
        F.explode(
            F.sequence(
                F.floor(
                    F.unix_micros(F.col("start_ts").cast("timestamp"))
                    / F.lit(_BUCKET_US)
                ),
                F.floor(
                    (F.unix_micros(F.col("end_ts").cast("timestamp")) - 1)
                    / F.lit(_BUCKET_US)
                ),
            )
        ),
    )
    events_b = ev.select("ts", "value").withColumn(
        "b",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(_BUCKET_US)
        ),
    )
    return (
        events_b.join(F.broadcast(intervals), on="b")
        .where(
            (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts"))
        )
        .groupBy("interval_user", "start_ts")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


# -- a19: exact grouped quantiles ----------------------------------------------

_A19_ORACLE = """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99,
           round(avg(value), 4) AS mean_value
    FROM events
    GROUP BY event_type
    """


@register("a19_exact_quantiles", _A19_ORACLE)
def a19_exact_quantiles(spark, sf_dir):
    """Exact per-group percentiles (linear interpolation — Spark
    ``percentile`` == ANSI percentile_cont == DuckDB quantile_cont).

    Exactness requires the full value multiset per group, so this is
    the CORRECTNESS ANCHOR, not the 100 TB plan: at corpus scale the
    same query swaps ``percentile`` for ``approx_percentile`` (a
    mergeable sketch that partial-aggregates map-side), and this
    exact form is what the sketch's error is measured against —
    the a16 HLL-vs-a06-exact pattern (tests pin the approx form
    within tolerance of this one)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
            F.round(F.avg("value"), 4).alias("mean_value"),
        )
    )


# -- a20: approx grouped quantiles (the mergeable sketch) ------------------------

A20_ACCURACY = 10_000


@register("a20_approx_quantiles")  # rows-only: sketch result has no oracle twin
def a20_approx_quantiles(spark, sf_dir):
    """``approx_percentile`` — the 100 TB form a19's docstring
    promises: a mergeable Greenwald-Khanna sketch that
    partial-aggregates map-side, so each group costs O(accuracy)
    state per partition instead of shipping the full value multiset
    to one reducer. The rank error is bounded by n/accuracy, but the
    merged summary depends on partition merge order, so the entry is
    rows-only (a16's HLL pattern) and carries its own anchor: the
    exact a19 percentiles sit in the same row, and pytest pins every
    approx value inside the exact [p-1/accuracy, p+1/accuracy]
    value envelope at two parallelism levels."""
    acc = F.lit(A20_ACCURACY)
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_percentile("value", F.lit(0.5), acc).alias("ap50"),
            F.approx_percentile("value", F.lit(0.9), acc).alias("ap90"),
            F.approx_percentile("value", F.lit(0.99), acc).alias("ap99"),
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
            F.count("*").alias("n_events"),
        )
    )
