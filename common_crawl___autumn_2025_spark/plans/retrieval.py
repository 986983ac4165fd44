"""Lexical retrieval + native session windows (round-6 additions).

Two engine-new operators a corpus-curation user expects next to the
vector ANN family (operators/similarity.py):

- ``t11_bm25_topk`` — BM25 ranked retrieval over ``documents``. The
  reference scores pages by a keyword probe (``Scrape_Utils.py`` link
  keyword filter; our P10/j04); BM25 is the standard corpus-scale
  generalization. The plan is Spark-first: the tiny query-term
  relation broadcasts into the token stream BEFORE the tf shuffle, so
  the only wide shuffle carries query-term postings (|terms| << |vocab|),
  never the full token explosion.
- ``w07_session_window_native`` — per-session rollups via Spark's
  built-in ``session_window`` (dynamic gap-merged event-time windows),
  complementing st02/st03 which build the same sessions manually with
  lag + running sum. The oracle mirrors the merge rule exactly: a new
  session starts when the microsecond gap is STRICTLY GREATER than
  the 30-minute gap (measured on this Spark build and pinned by
  ``test_w07_gap_boundary_semantics``: session_window merges an event
  iff ts <= last_ts + gap — the window extent is closed at its end,
  so an exactly-1800 s gap still merges and 1800 s + 1 us splits).

Both carry full DuckDB value oracles; float outputs are rounded on
both sides (round-6 precedent: plans/graph.py g02) and ordering uses
the ROUNDED score so rank is well-defined under last-ulp drift.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load, register, spread_if_large

# BM25 constants (Robertson/Sparck Jones defaults).
_K1 = 1.2
_B = 0.75
_TOPK = 10

# Deterministic query workload: three multi-term queries over the
# documents vocabulary (query terms are a tiny constant relation —
# the broadcast side of every join below).
_BM25_QUERIES: list[tuple[str, list[str]]] = [
    ("q1", ["vector", "window", "merge"]),
    ("q2", ["customer", "filter", "slow"]),
    ("q3", ["spark", "hash", "scan"]),
]

_QUERY_VALUES = ", ".join(
    f"('{qid}', '{t}')" for qid, terms in _BM25_QUERIES for t in terms
)

_BM25_ORACLE = f"""
    WITH q(query_id, term) AS (VALUES {_QUERY_VALUES}),
    d AS (
      SELECT doc_id,
             list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               x -> x <> ''
             ) AS toks
      FROM documents
    ),
    dl AS (SELECT doc_id, len(toks) AS dl FROM d),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM d)
      WHERE term IN (SELECT DISTINCT term FROM q)
      GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({_K1} + 1.0))
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS score
      FROM tf
      JOIN df USING (term)
      JOIN q USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY q.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {_TOPK}
    ORDER BY query_id, rank
    """


@register("t11_bm25_topk", _BM25_ORACLE)
def t11_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval (k1=1.2, b=0.75) for a constant query set.

    100 TB shape: the query-term gate is applied inside the token
    array BEFORE explode, so the corpus token stream is never
    materialized as rows — explode emits (doc_id, query_term)
    postings only, and the wide agg keys are those postings — a tiny
    fraction of the token stream. Corpus stats (N, avgdl) are one scalar
    aggregate broadcast-hash-joined back on a derived constant key
    (never a BNLJ); df is a window count over the already-filtered
    postings (|terms| partitions), computed in the SAME pass. No Python
    stages; ln/tf math is whole-stage-codegen'd. Rank uses the ROUNDED
    score (6 dp) so Spark/DuckDB last-ulp drift cannot flip ordering.
    """
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id string, term string",
    )
    # ONE tokenization pass (r7): the corpus-wide regex split is the
    # dominant cost of this query, and `stats` (needs every doc's dl)
    # and `tf` (needs the gated tokens) would otherwise each tokenize
    # the full corpus. Reduce the scan to (doc_id, dl, gated tokens) —
    # a few bytes per doc once the query-term gate has dropped ≈ the
    # whole token stream — and pin it; both consumers read the pinned
    # relation. The query-term gate stays INSIDE the array, before
    # explode, so non-matching tokens never materialize as rows.
    # For a runtime-dynamic query set the same shape holds with the
    # broadcast semi join placed directly after the explode instead.
    all_terms = sorted({t for _, ts in _BM25_QUERIES for t in ts})
    gated = (
        # scale-adaptive spread BEFORE the regex tokenize — a small
        # parquet file arrives as ONE input split and the tokenize
        # pass is this query's dominant cost (d02's pattern); below
        # ~1024 docs/core the exchange is skipped (r7)
        spread_if_large(
            load(spark, sf_dir, "documents"), sf_dir, "documents",
            key="doc_id",
        )
        .select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != ""
            ).alias("toks"),
        )
        .select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.filter(F.col("toks"), lambda t: t.isin(all_terms)).alias(
                "qtoks"
            ),
        )
        .localCheckpoint(eager=True)
    )
    stats = gated.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # dl rides along with the postings (one scan, no doc_id re-join).
    tf = (
        gated.select("doc_id", "dl", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    contrib = (
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * (F.col("tf") * (_K1 + 1.0))
        / (
            F.col("tf")
            + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
        )
    )
    # df = postings count per term, as a window agg over tf — the
    # postings relation is computed ONCE (a df self-join would plan
    # the tf aggregate twice). The scalar stats row joins on a
    # column-derived always-0 key (e03's pattern,
    # plans/matching_pipeline.py) so Catalyst plans a
    # BroadcastHashJoin, not a BroadcastNestedLoopJoin — a literal
    # key would constant-fold out and degenerate back to a BNLJ.
    scored = (
        tf.withColumn(
            "df", F.count("*").over(Window.partitionBy("term")).cast("double")
        )
        .join(F.broadcast(qterms), "term")
        .withColumn("__k", F.pmod(F.col("tf"), F.lit(1.0)).cast("int"))
        .join(
            F.broadcast(
                stats.withColumn(
                    "__k", F.pmod(F.col("n_docs"), F.lit(1.0)).cast("int")
                )
            ),
            "__k",
        )
        .drop("__k")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank") <= _TOPK)
        .orderBy("query_id", "rank")
    )


_W07_ORACLE = """
    WITH g AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > 1800000000 THEN 1
                  ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS sid
      FROM g
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value,
           CAST(min(event_id) AS BIGINT) AS first_event
    FROM s
    GROUP BY user_id, sid
    """


@register("w07_session_window_native", _W07_ORACLE)
def w07_session_window_native(spark, sf_dir):
    """Per-session rollups via Spark's NATIVE ``session_window`` (gap-
    merged dynamic event-time windows, 30-minute gap) — the built-in
    operator behind streaming session aggregation, exercised here in
    batch against a gaps-and-islands oracle at full microsecond
    precision (st02's manual construction truncates to seconds; the
    native operator does not, so its oracle must not either).

    100 TB shape: one shuffle on user_id, sessions merged within each
    partition by the native operator — identical cost profile to the
    window-function spelling but with the window assignment fused into
    the aggregation."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.min("event_id").cast("long").alias("first_event"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
            "first_event",
        )
    )


# -- w08: sliding event-time windows ------------------------------------------

_W08_ORACLE = """
    WITH k AS (SELECT unnest([0, 1, 2, 3]) AS k),
    w AS (
      SELECT time_bucket(INTERVAL 15 MINUTE, e.ts)
               - k.k * INTERVAL 15 MINUTE AS window_start,
             e.event_type, e.value
      FROM events e, k
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total_value
    FROM w
    GROUP BY window_start, event_type
"""


@register("w08_sliding_window", _W08_ORACLE)
def w08_sliding_window(spark, sf_dir):
    """SLIDING event-time windows via the native ``F.window(ts, '1
    hour', '15 minutes')`` — each event lands in exactly
    window/slide = 4 overlapping windows (the rate/trend shape:
    hourly metrics refreshed every 15 minutes). Complements st01's
    tumbling spelling; the same operator runs unchanged under
    readStream with a watermark.

    100 TB shape: Spark expands each row to its 4 window assignments
    BEFORE the exchange, then partial-aggregates map-side — the
    shuffle carries (window, type) partial sums, not the 4x event
    stream, so slide granularity changes output cardinality, not
    shuffle volume. The DuckDB oracle mirrors the expansion
    explicitly (a 4-row offset relation against 15-minute
    time_buckets; DuckDB's time_bucket origin 2000-01-03 and Spark's
    epoch origin agree at 15-minute granularity)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            F.col("win.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
