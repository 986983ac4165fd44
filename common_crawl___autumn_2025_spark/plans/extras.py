"""Coverage extras: multi-dimensional aggregates, pivot, approximate
distinct, and the SURT canonicalizer surfaced as oracle-checked
queries. These go beyond the reference's single-key groupings —
engine-new surface a corpus-analytics user expects."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, register
from ..canonical import registered_domain_udf, surt_udf


@register(
    "a14_rollup",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def a14_rollup(spark, sf_dir):
    """Hierarchical rollup (status → priority → grand total). NULL
    grouping markers coalesced to 'ALL' on both sides so the value
    hash is unambiguous."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "cnt",
            "total",
        )
    )


@register(
    "a15_pivot",
    """
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS status_o,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS status_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a15_pivot(spark, sf_dir):
    """Pivot on line status — Spark `pivot` vs the oracle's FILTER
    aggregation (same relation, two spellings)."""
    out = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .count()
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
    )


@register("a16_approx_distinct")  # rows-only: HLL sketch has no oracle twin
def a16_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL) — the 10^10-scale replacement for
    exact distinct counts (A6). tests assert the estimate is within
    5% of exact."""
    return load(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register(
    "u09_surt_canonicalize",
    """
    SELECT doc_id,
           'uk,co,example,' || source || ')/path/' || CAST(doc_id AS VARCHAR)
             AS surt,
           'example.co.uk' AS reg_domain
    FROM documents
    """,
)
def u09_surt_canonicalize(spark, sf_dir):
    """U9/F8: the SURT + registered-domain Arrow UDFs, checked against
    an oracle that derives the expected values by construction (the
    synthesized URLs have a known canonical form: label reversal on a
    public-suffix host, www stripped, scheme dropped)."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.co.uk/path/"),
        F.col("doc_id").cast("string"),
    )
    return docs.select(
        "doc_id",
        surt_udf(url).alias("surt"),
        registered_domain_udf(
            F.concat(F.lit("www."), F.col("source"), F.lit(".example.co.uk"))
        ).alias("reg_domain"),
    )


@register(
    "a17_grouping_sets",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS cnt,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def a17_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (disjoint single-key groupings in one
    pass) — the multi-dimensional-report shape ROLLUP (a14) cannot
    express. Spark spells it via SQL on a temp view; one aggregate,
    map-side partial."""
    load(spark, sf_dir, "orders").createOrReplaceTempView(
        "__a17_orders"
    )
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(count(*) AS BIGINT) AS cnt,
               round(avg(o_totalprice), 4) AS avg_price
        FROM __a17_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "w06_event_gap",
    """
    SELECT event_id, user_id,
           round(
             CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS DOUBLE)
             / 1000000.0, 3) AS gap_s,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
    """,
)
def w06_event_gap(spark, sf_dir):
    """lag/lead session analysis: per-user inter-event gap seconds
    and next event type — the sessionization primitive (crawl analog:
    per-host inter-fetch gap audit, the politeness invariant). One
    window, both functions share the frame."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                )
                / 1e6,
                3,
            ).alias("gap_s"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("event_id")
    )


@register(
    "a18_arg_extremes",
    """
    SELECT o_custkey,
           CAST(arg_max(o_orderkey, o_totalprice) AS BIGINT)
             AS priciest_order,
           CAST(arg_min(o_orderkey, o_totalprice) AS BIGINT)
             AS cheapest_order,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 8
    """,
)
def a18_arg_extremes(spark, sf_dir):
    """Per-group argmax/argmin (max_by/min_by): which ROW holds the
    extreme, not the extreme itself — the per-host 'slowest fetch' /
    per-seed 'best-scoring page' shape a crawl dashboard lives on.
    One partial-aggregated groupBy; DuckDB spells it arg_max.
    Determinism note: o_totalprice is unique per custkey group in
    this data, so the argmax is well-defined in both engines."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.count("*").alias("n_orders"),
        )
        .where(F.col("n_orders") >= 8)
    )


# -- a21: heavy hitters (Misra-Gries sketch + exact confirm) -------------------

MG_CAPACITY = 64


def mg_candidates(df, key_col: str, capacity: int = MG_CAPACITY):
    """Misra-Gries candidate keys, one bounded sketch per partition.

    Each partition keeps at most ``capacity`` counters; merging a
    batch adds its (vectorized) value_counts, then one decrement step
    subtracts the (capacity+1)-th largest counter value from all and
    drops the non-positives — the batched MG merge (Agarwal et al.,
    "Mergeable Summaries"), undercount ≤ n_p/(capacity+1) per
    partition. Any key with GLOBAL frequency > n/(capacity+1) must
    exceed the per-partition threshold somewhere (averaging), so the
    union of partition survivors is a SUPERSET of the true heavy
    hitters — pytest-pinned. Python touches only per-batch UNIQUE
    keys and a ≤capacity dict, never rows."""
    import pandas as pd

    def sketch(batches):
        counters: dict = {}
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - cut for k, v in counters.items() if v > cut
                }
        yield pd.DataFrame({key_col: list(counters.keys())})

    return (
        df.select(key_col).mapInPandas(sketch, f"{key_col} bigint").distinct()
    )


def heavy_hitters(
    df, key_col: str, k: int, capacity: int = MG_CAPACITY
):
    """Top-k frequent keys at unbounded key cardinality: MG sketch
    proposes ≤ capacity×partitions candidates, ONE exact counting
    pass over the broadcast candidate set confirms true counts, top-k
    orders on (count DESC, key). The confirm step is what makes the
    output exact and parallelism-invariant — the sketch only bounds
    which keys are worth counting, the shuffle carries candidate keys
    only (a06's distinct-count problem never materializes)."""
    cands = mg_candidates(df, key_col, capacity)
    return (
        df.join(F.broadcast(cands), on=key_col)
        .groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), key_col)
        .limit(k)
    )


_A21_ORACLE = """
    SELECT hot_key, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN user_id % 7 = 0 THEN user_id % 5
             ELSE user_id END AS hot_key
      FROM events
    ) GROUP BY hot_key ORDER BY n DESC, hot_key LIMIT 5
"""


@register("a21_heavy_hitters", _A21_ORACLE)
def a21_heavy_hitters(spark, sf_dir):
    """Heavy hitters over a planted-skew key (every 7th event
    collapses onto 5 hot keys — the hot-host shape a crawl frontier
    fights): Misra-Gries candidates + exact confirm + top-5. The
    ORACLE is the direct exact top-5 — the value match proves the
    sketch pipeline finds exactly the true heavy hitters, legitimate
    because each hot key's frequency (~n/35) clears the MG guarantee
    threshold n/(capacity+1) = n/65, so the candidate superset
    provably contains the answer and the confirm pass makes the
    counts exact. At 10^10 rows the exact a04-style groupBy over ALL
    keys shuffles every key once; this shape shuffles only candidate
    keys, and the sketch pass is one scan with O(capacity) state."""
    ev = load(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 7 == 0, F.col("user_id") % 5)
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("hot_key")
    )
    return heavy_hitters(ev, "hot_key", k=5)
