"""Relational operator catalog — SURVEY.md §2 inventory over the
driver's TPC-H-ish testdata tables.

Each query cites the reference operator it re-expresses (SURVEY §2
ids / reference file:line) and is written Spark-first: declarative
DataFrame/SQL, built-in functions only, letting Catalyst handle
pushdown/pruning/join selection. No Python UDFs anywhere in this
module.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load, maybe_broadcast, register

ASOF = "2000-01-01"  # pinned "today" (vs reference's nondeterministic
                     # Timestamp.today(), Companies_House_EDA.py:44)


# ---------------------------------------------------------------------------
# S. scans / projections pushed to the parquet reader
# ---------------------------------------------------------------------------

@register(
    "s02_scan_project_filter",
    """
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_discount > 0.05
    """,
)
def s02_scan_project_filter(spark, sf_dir):
    """S2/P11: column projection + predicate, both pushed to the scan
    (ref usecols, Scrape_Utils.py:383,473). `.explain` shows
    PushedFilters + 3-column ReadSchema."""
    return (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_discount") > 0.05)
        .select("l_orderkey", "l_extendedprice")
    )


@register(
    "s03_limit_pushdown",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 5
    """,
)
def s03_limit_pushdown(spark, sf_dir):
    """S3/P14: deterministic head (ref nrows=5, Companies_House_EDA.py:7)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(5)
    )


@register(
    "s06_json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def s06_json_extract(spark, sf_dir):
    """S6/F23: semi-structured JSON-in-string payloads (ref
    Matching_P1.py:147-162, scraper_results JSON)."""
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        )
        .where(F.col("prop_k").isNotNull())
    )


# ---------------------------------------------------------------------------
# P. filters / predicates
# ---------------------------------------------------------------------------

@register(
    "p01_null_drop",
    "SELECT doc_id FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL",
)
def p01_null_drop(spark, sf_dir):
    """P1: dropna(subset=[...]) (ref Common_Crawl_EDA.py:18)."""
    return (
        load(spark, sf_dir, "documents")
        .na.drop(subset=["text", "lang"])
        .select("doc_id")
    )


@register(
    "p02_equality_filter",
    "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'",
)
def p02_equality_filter(spark, sf_dir):
    """P2: status equality (ref CompanyStatus == 'Active',
    Companies_House_EDA.py:41)."""
    return (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey")
    )


@register(
    "p03_date_range",
    f"""
    SELECT o_orderkey, o_orderdate FROM orders
    WHERE o_orderdate >= TIMESTAMP '{ASOF} 00:00:00' - INTERVAL 12 MONTH
      AND o_orderdate <  TIMESTAMP '{ASOF} 00:00:00'
    """,
)
def p03_date_range(spark, sf_dir):
    """P3/F21: accounts-filed-within-last-year (ref
    Companies_House_EDA.py:44-48), 'today' pinned to ASOF."""
    asof = F.lit(ASOF).cast("timestamp")
    return (
        load(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.add_months(asof, -12).cast("timestamp"))
            & (F.col("o_orderdate") < asof)
        )
        .select("o_orderkey", "o_orderdate")
    )


@register(
    "p04_semi_join_notnull",
    """
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def p04_semi_join_notnull(spark, sf_dir):
    """P4: merged[key].notnull() match-count pattern as a semi join
    (ref combine_trustpilot_with_CH.py:18)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey")


@register(
    "p05_derived_predicate",
    """
    SELECT doc_id FROM documents
    WHERE len(string_split(text, ' ')) < 50
    """,
)
def p05_derived_predicate(spark, sf_dir):
    """P5/F13: short pages = word count < 50 (ref
    Common_Crawl_EDA.py:41, Visuals.py:131)."""
    return (
        load(spark, sf_dir, "documents")
        .where(F.size(F.split("text", " ")) < 50)
        .select("doc_id")
    )


@register(
    "p06_suffix_exclusion",
    """
    SELECT doc_id, source FROM documents
    WHERE NOT ends_with(source, '3') AND NOT ends_with(source, '7')
    """,
)
def p06_suffix_exclusion(spark, sf_dir):
    """P6: domain-suffix exclusion (ref .gov.uk skip,
    Scrape_Utils.py:136-145) — same endswith predicate shape."""
    return (
        load(spark, sf_dir, "documents")
        .where(~F.col("source").endswith("3") & ~F.col("source").endswith("7"))
        .select("doc_id", "source")
    )


@register(
    "p07_blacklist_anti",
    """
    SELECT doc_id, source FROM documents
    WHERE source NOT IN ('src0', 'src1', 'src2')
    """,
)
def p07_blacklist_anti(spark, sf_dir):
    """P7: blacklist anti-filter (ref aggregator domains,
    Scrape_Utils.py:24-27; Matching_P1.py:190-194) — broadcast
    left_anti against the (tiny) blacklist table."""
    docs = load(spark, sf_dir, "documents")
    blacklist = spark.createDataFrame(
        [("src0",), ("src1",), ("src2",)], "source string"
    )
    return docs.join(F.broadcast(blacklist), on=["source"], how="left_anti").select(
        "doc_id", "source"
    )


@register(
    "p08_same_netloc_suppression",
    """
    SELECT event_id,
           'h' || CAST(user_id % 50 AS VARCHAR) AS page_host,
           'h' || CAST(event_id % 50 AS VARCHAR) AS link_host
    FROM events
    WHERE (user_id % 50) != (event_id % 50)
    """,
)
def p08_same_netloc_suppression(spark, sf_dir):
    """P8: never-recurse-within-the-same-netloc suppression (ref
    Scrape_Utils.py:20-22 — the matching-recursion pipeline only
    follows outward links). Predicate shape: derived page/link hosts,
    keep only off-host pairs. The crawl engine's selectable
    scope_mode='exclude_same_netloc' is the production form (replay
    test pins it to the oracle)."""
    ev = load(spark, sf_dir, "events")
    page_host = F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string"))
    link_host = F.concat(F.lit("h"), (F.col("event_id") % 50).cast("string"))
    return (
        ev.select(
            "event_id",
            page_host.alias("page_host"),
            link_host.alias("link_host"),
        )
        .where(F.col("page_host") != F.col("link_host"))
    )


@register(
    "p10_keyword_filter",
    """
    SELECT doc_id FROM documents
    WHERE contains(lower(text), 'join') OR contains(lower(text), 'scan')
       OR contains(lower(text), 'merge')
    """,
)
def p10_keyword_filter(spark, sf_dir):
    """P10: href-keyword admission filter shape (ref
    company_number_scrape.py:34-38) — exists() over a literal array."""
    kws = F.array(*[F.lit(k) for k in ("join", "scan", "merge")])
    return (
        load(spark, sf_dir, "documents")
        .where(F.exists(kws, lambda k: F.contains(F.lower("text"), k)))
        .select("doc_id")
    )


@register(
    "p12_flag_filter",
    "SELECT event_id, user_id FROM events WHERE event_type = 'click'",
)
def p12_flag_filter(spark, sf_dir):
    """P12 (ref llm_is_entity1_website == True, Matching_P1.py:361)."""
    return (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select("event_id", "user_id")
    )


@register(
    "p13_payload_truncation",
    """
    SELECT doc_id, substring(text, 1, 100) AS excerpt FROM documents
    """,
)
def p13_payload_truncation(spark, sf_dir):
    """P13: prompt-payload cap (ref scraped_content[:15000],
    Matching_P1.py:240)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 100).alias("excerpt")
    )


@register(
    "p14_head_slice",
    """
    SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 200
    """,
)
def p14_head_slice(spark, sf_dir):
    """P14 (ref websites[:1000], company_number_scrape.py:43)."""
    return (
        load(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .select("doc_id", "n_chars")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# J. joins
# ---------------------------------------------------------------------------

@register(
    "j01_left_join_padded_key",
    """
    SELECT o.o_orderkey,
           lpad(CAST(o.o_custkey AS VARCHAR), 8, '0') AS cust_code,
           c.c_name
    FROM orders o
    LEFT JOIN customer c
      ON lpad(CAST(o.o_custkey AS VARCHAR), 8, '0')
       = lpad(CAST(c.c_custkey AS VARCHAR), 8, '0')
    """,
)
def j01_left_join_padded_key(spark, sf_dir):
    """J1+J2: left outer equi join on zero-padded normalized keys
    (ref combine_trustpilot_with_CH.py:11-15, zfill(8)). Small dim →
    broadcast hash join."""
    # NOTE (r7): a probe-side repartition was A/B-measured here and
    # REVERTED — the pad+join work is too cheap for the extra shuffle
    # to pay (interleaved A/B at sf1.0: 0.91 s plain vs 1.16 s spread)
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    pad = lambda c: F.lpad(F.col(c).cast("string"), 8, "0")  # noqa: E731
    return (
        orders.withColumn("cust_code", pad("o_custkey"))
        .join(
            F.broadcast(customer.withColumn("cust_code", pad("c_custkey"))),
            on=["cust_code"],
            how="left",
        )
        .select("o_orderkey", "cust_code", "c_name")
    )


@register(
    "j03_fuzzy_similarity_join",
    """
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE (length(a.p_name) + length(b.p_name) - levenshtein(a.p_name, b.p_name)) * 10
          >= 9 * (length(a.p_name) + length(b.p_name))
    """,
)
def j03_fuzzy_similarity_join(spark, sf_dir):
    """J3/F4: Levenshtein-ratio >= 0.9 fuzzy join with a blocking key
    (ref URL_similarity_match, Matching_P1.py:43-91; blocking concept
    Data Exploration/README.md:8). Threshold is a cross-multiplied
    integer comparison — no FP in the predicate.

    r7 shape: the ratio predicate depends ONLY on the two names, and
    name cardinality is far below row cardinality (the part vocabulary
    repeats; 64 distinct names over 2·10^5 rows at sf1.0), so the
    quadratic levenshtein work runs once per DISTINCT (brand, name_a,
    name_b) combination — |names|² per brand instead of |rows|² per
    brand — and the verdicts are expanded back to partkey pairs with
    two equi joins (52.7 s -> ~1 s at sf1.0; identical pair set: every
    (row_a, row_b) pair maps to exactly one directed name pair, and
    the diagonal name pair covers identical-name rows). With an
    all-distinct vocabulary this degrades gracefully to the original
    per-pair join plus one cheap distinct. Broadcast hints stay gated
    on the on-disk size (maybe_broadcast) exactly as before."""
    part = load(spark, sf_dir, "part")
    names = part.select("p_brand", "p_name").distinct()
    x = names.alias("x")
    y = maybe_broadcast(names.alias("y"), sf_dir, "part")
    la = F.length("x.p_name")
    lb = F.length("y.p_name")
    lev = F.levenshtein(F.col("x.p_name"), F.col("y.p_name"))
    # directed verdict table: every (name_a, name_b) ordered pair
    # (diagonal included) whose levenshtein ratio passes — tiny
    matches = (
        x.join(y, F.col("x.p_brand") == F.col("y.p_brand"))
        .where((la + lb - lev) * 10 >= 9 * (la + lb))
        .select(
            F.col("x.p_brand").alias("p_brand"),
            F.col("x.p_name").alias("name_a"),
            F.col("y.p_name").alias("name_b"),
        )
    )
    # probe side spread across all cores (single small parquet file =
    # one input split otherwise; the expansion multiplies rows ~250x)
    a = part.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("p_partkey").alias("part_a"), "p_brand",
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_partkey").alias("part_b"), "p_brand",
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(maybe_broadcast(matches, sf_dir, "part"),
               on=["p_brand", "name_a"])
        .join(maybe_broadcast(b, sf_dir, "part"), on=["p_brand", "name_b"])
        .where(F.col("part_a") < F.col("part_b"))
        .select("part_a", "part_b")
    )


@register(
    "j04_containment_semi_join",
    """
    SELECT d.doc_id, m.marker
    FROM documents d
    JOIN (VALUES ('scan'), ('merge'), ('hash')) AS m(marker)
      ON contains(lower(d.text), lower(m.marker))
    """,
)
def j04_containment_semi_join(spark, sf_dir):
    """J4/F19: substring-containment theta join against a small
    entity table (ref check_md_match — content contains company name
    or number, Matching_P1.py:185-194). Small side broadcast →
    BroadcastNestedLoopJoin; at scale, block first (J3 note)."""
    docs = load(spark, sf_dir, "documents")
    markers = spark.createDataFrame(
        [("scan",), ("merge",), ("hash",)], "marker string"
    )
    return docs.join(
        F.broadcast(markers),
        F.contains(F.lower("text"), F.lower("marker")),
    ).select("doc_id", "marker")


@register(
    "j05_anti_join_seen",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def j05_anti_join_seen(spark, sf_dir):
    """J5: the URL-seen anti join — frontier rows minus already-seen
    keys (ref recursion_depth gate, Matching_with_recursion.py:480-515).
    'Seen' here = customers with a >400k order, so the result is
    non-trivial on this data."""
    customer = load(spark, sf_dir, "customer")
    seen = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_custkey")
    )
    return customer.join(
        seen, customer.c_custkey == seen.o_custkey, "left_anti"
    ).select("c_custkey")


@register(
    "j06_first_match_early_exit",
    """
    SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def j06_first_match_early_exit(spark, sf_dir):
    """J6/W3: first-match-wins per entity (ref break-on-first-hit,
    company_number_scrape.py:50-53,61-64)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").alias("first_date"),
        )
    )


@register(
    "j07_equi_join_derived_key",
    """
    SELECT o.o_orderkey, c.c_mktsegment, n.n_name
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def j07_equi_join_derived_key(spark, sf_dir):
    """J7: multi-hop equi join chain (ref exact-URL equality join,
    Matching_with_recursion.py:434-435). Catalyst reorders. nation is
    a bounded dimension (always broadcast); customer is NOT — its
    hint is size-conditional, since forcing a broadcast that is right
    at sf0.1 would OOM executors at 100x."""
    orders = load(spark, sf_dir, "orders")
    customer = maybe_broadcast(
        load(spark, sf_dir, "customer"), sf_dir, "customer"
    )
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("o_orderkey", "c_mktsegment", "n_name")
    )


# ---------------------------------------------------------------------------
# A. aggregations
# ---------------------------------------------------------------------------

@register("a01_count_star", "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem")
def a01_count_star(spark, sf_dir):
    """A1 (ref len(df), Common_Crawl_EDA.py:21)."""
    return load(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@register(
    "a02_sum_avg_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a02_sum_avg_pricing(spark, sf_dir):
    """A2/A3: the flagship pricing-summary aggregate (TPC-H Q1 shape;
    ref word/char sum+avg, Common_Crawl_EDA.py:22-25). Partial
    (map-side) aggregation + final agg — one shuffle of 6 groups."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "a04_topk_group_count",
    """
    SELECT p_brand, CAST(count(*) AS BIGINT) AS cnt
    FROM part GROUP BY p_brand
    ORDER BY cnt DESC, p_brand LIMIT 10
    """,
)
def a04_topk_group_count(spark, sf_dir):
    """A4: value_counts top-k (ref top-10 domains,
    Common_Crawl_EDA.py:29). TakeOrderedAndProject, no global sort."""
    return (
        load(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("p_brand"))
        .limit(10)
    )


@register(
    "a05_duplicate_count",
    """
    SELECT CAST(count(*) - count(DISTINCT l_orderkey) AS BIGINT) AS n_dup_rows
    FROM lineitem
    """,
)
def a05_duplicate_count(spark, sf_dir):
    """A5 (ref df.duplicated().sum(), Common_Crawl_EDA.py:32)."""
    return (
        load(spark, sf_dir, "lineitem")
        .agg(
            (F.count("*") - F.countDistinct("l_orderkey")).alias("n_dup_rows")
        )
    )


@register(
    "a06_distinct_count",
    """
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem
    """,
)
def a06_distinct_count(spark, sf_dir):
    """A6 (ref nunique, Common_Crawl_EDA.py:35). Exact here; at
    10^10-row scale swap to approx_count_distinct (HLL) — documented
    scale path."""
    return load(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "a07_count_if",
    """
    SELECT CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big
    FROM orders
    """,
)
def a07_count_if(spark, sf_dir):
    """A7: boolean-sum counting (ref is_info_page.sum(),
    Common_Crawl_EDA.py:38,41)."""
    return load(spark, sf_dir, "orders").agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_f"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
    )


@register(
    "a08_group_size_stats",
    """
    SELECT CAST(max(cnt) AS BIGINT) AS max_cnt,
           CAST(min(cnt) AS BIGINT) AS min_cnt,
           round(avg(cnt), 4) AS avg_cnt,
           round(quantile_cont(cnt, 0.5), 4) AS median_cnt
    FROM (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey)
    """,
)
def a08_group_size_stats(spark, sf_dir):
    """A8: pages-per-site distribution stats (ref
    Common_Crawl_EDA.py:44-50) — two-level aggregation; exact
    interpolated median on the (small) group-count relation."""
    sizes = (
        load(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    )
    return sizes.agg(
        F.max("cnt").alias("max_cnt"),
        F.min("cnt").alias("min_cnt"),
        F.round(F.avg("cnt"), 4).alias("avg_cnt"),
        F.round(F.expr("percentile(cnt, 0.5)"), 4).alias("median_cnt"),
    )


@register(
    "a09_null_counts",
    """
    SELECT CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_name,
           CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_acctbal,
           CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_mktsegment
    FROM customer
    """,
)
def a09_null_counts(spark, sf_dir):
    """A9: per-column NULL audit (ref df.isnull().sum(),
    Companies_House_EDA.py:30)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        *[
            F.sum(F.col(col).isNull().cast("long")).alias(col)
            for col in ("c_name", "c_acctbal", "c_mktsegment")
        ]
    )


@register(
    "a10_conditional_distinct_recall",
    """
    SELECT CAST(count(DISTINCT CASE WHEN o_totalprice > 300000
                                    THEN o_custkey END) AS BIGINT) AS matched,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS total,
           round(count(DISTINCT CASE WHEN o_totalprice > 300000 THEN o_custkey END)
                 * 1.0 / count(DISTINCT o_custkey), 4) AS recall
    FROM orders
    """,
)
def a10_conditional_distinct_recall(spark, sf_dir):
    """A10: the reference's headline recall metric (entities with ≥1
    match / total — Matching_P1.py:358-364)."""
    o = load(spark, sf_dir, "orders")
    matched = F.countDistinct(
        F.when(F.col("o_totalprice") > 300000, F.col("o_custkey"))
    )
    total = F.countDistinct("o_custkey")
    return o.agg(
        matched.alias("matched"),
        total.alias("total"),
        F.round(matched * 1.0 / total, 4).alias("recall"),
    )


@register(
    "a11_histogram_bins",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
)
def a11_histogram_bins(spark, sf_dir):
    """A11: histogram binning (ref sns.histplot bins, Visuals.py:61)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


@register(
    "a12_year_rollup",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(count(*) AS BIGINT) AS cnt
    FROM orders GROUP BY yr ORDER BY yr
    """,
)
def a12_year_rollup(spark, sf_dir):
    """A12 (ref .dt.year value_counts, Visuals.py:81-84)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# W. windows
# ---------------------------------------------------------------------------

@register(
    "w01_row_number_position",
    """
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT) AS position
    FROM events
    """,
)
def w01_row_number_position(spark, sf_dir):
    """W1: result position within group (ref enumerate(top_results),
    Scrape_Utils.py:125-128)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.row_number().over(w).cast("long").alias("position"),
        )
    )


@register(
    "w02_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def w02_topk_per_group(spark, sf_dir):
    """W2: per-group top-k (ref top-3 organic results,
    Scrape_Utils.py:116)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "w04_politeness_schedule",
    """
    SELECT event_id, user_id,
           round((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  - 1) * 1.5, 4) AS ts_offset,
           CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  - 1) * 1.5 / 60.0) AS INT) AS batch_id
    FROM events
    """,
)
def w04_politeness_schedule(spark, sf_dir):
    """W4: the politeness-sequencing window in relational form —
    per-key ordered rank → delay offset → batch id (engine-critical;
    ref sequential per-site loop + 60s backoff, Matching_P1.py:303-327)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = F.row_number().over(w)
    off = (seq - 1) * 1.5
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(off, 4).alias("ts_offset"),
        F.floor(off / 60.0).cast("int").alias("batch_id"),
    )


@register(
    "w05_running_sum",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
    FROM events
    """,
)
def w05_running_sum(spark, sf_dir):
    """Frame-spec window (engine-new; completes the window surface)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


# ---------------------------------------------------------------------------
# O. sorts / set ops
# ---------------------------------------------------------------------------

@register(
    "o01_global_sort_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def o01_global_sort_topk(spark, sf_dir):
    """§2.6: orderBy desc + limit → TakeOrderedAndProject (ref
    value_counts head, Visuals.py:73)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(20)
    )


@register(
    "o02_distinct",
    "SELECT DISTINCT c_mktsegment FROM customer",
)
def o02_distinct(spark, sf_dir):
    """§2.7 distinct (ref unique().tolist(), company_number_scrape.py:13)."""
    return load(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@register(
    "o03_union_distinct",
    """
    SELECT n_nationkey AS nationkey FROM customer c JOIN nation n
      ON c.c_nationkey = n.n_nationkey
    UNION
    SELECT n_nationkey FROM supplier s JOIN nation n
      ON s.s_nationkey = n.n_nationkey
    """,
)
def o03_union_distinct(spark, sf_dir):
    """§2.7 union semantics (engine uses unionByName for frontier merge)."""
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select(F.col("n_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select(F.col("n_nationkey").alias("nationkey"))
    return cust.unionByName(supp).distinct()


@register(
    "o04_except",
    """
    SELECT DISTINCT p_brand, p_type FROM part
    EXCEPT
    SELECT DISTINCT p_brand, p_type FROM part WHERE p_size > 45
    """,
)
def o04_except(spark, sf_dir):
    """§2.7 except-semantics = the frontier-vs-seen anti join in set
    form (J5): (brand, type) combos that never appear above size 45."""
    part = load(spark, sf_dir, "part")
    all_combos = part.select("p_brand", "p_type").distinct()
    big_combos = part.where(F.col("p_size") > 45).select("p_brand", "p_type").distinct()
    return all_combos.subtract(big_combos)
