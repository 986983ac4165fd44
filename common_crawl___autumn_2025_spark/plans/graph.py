"""Link-graph analytics over the crawl's document corpus.

A production frontier scheduler prioritizes URLs by link-graph
signals (in-link counts, PageRank-style authority); the reference's
crawl walks exactly such a graph (admitted links,
``company_number_scrape.py:38-40``) but never analyzes it. These
operators supply that layer, engine-side.

The sandbox's parquet tables carry no link columns, so the edge set
is derived DETERMINISTICALLY from ``documents.doc_id`` (dense
0..N-1) by affine-modular rules — the same arithmetic is expressed
in both Spark and the DuckDB oracle, which is what makes a *graph*
operator fully value-checkable here. The operators themselves are
edge-table-agnostic: point ``_edges`` at a real (src, dst) relation
(e.g. the crawl's exploded ``admitted`` column) and nothing else
changes.

Edge rules (self-loops kept — dropping them could zero a node's
out-degree; keeping them needs no dangling-mass term):

- ``dst = (src*17 + 1)  % N``  for every src;
- ``dst = (src*31 + 7)  % N``  when ``src % 3 != 0``;
- ``dst = (src*53 + 11) % N``  when ``src % 5 != 0``.

Every node therefore has out-degree 1-3 (no dangling nodes) and the
graph has skewed in-degrees — the shape that makes top-k/PageRank
non-trivial.

Scale notes: both operators are shuffle-on-key relational plans —
in-degree is one partial-aggregated groupBy; each PageRank iteration
is one equi-join (rank × out-degree) plus one groupBy(dst), i.e.
O(E) shuffled per iteration with map-side combine, never an
adjacency matrix. At 10^10 edges the join keys are the natural hash
partitioning; iteration count is fixed (3) so the lineage stays
bounded (no per-iteration driver materialization needed below
~10 iterations; checkpoint every ~10 for longer runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import load, register

_EDGE_SQL = """
    WITH nn AS (SELECT count(*) AS n FROM documents),
    e AS (
        SELECT doc_id AS src, (doc_id * 17 + 1) % nn.n AS dst
        FROM documents, nn
        UNION ALL
        SELECT doc_id, (doc_id * 31 + 7) % nn.n
        FROM documents, nn WHERE doc_id % 3 <> 0
        UNION ALL
        SELECT doc_id, (doc_id * 53 + 11) % nn.n
        FROM documents, nn WHERE doc_id % 5 <> 0
    )
"""


def _edges(spark, sf_dir: str) -> tuple[DataFrame, int]:
    """(edge DataFrame (src, dst), node count). The count is a
    parquet-footer scalar (no data scan) needed because the modular
    rule is a plan-time literal on the Spark side."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    # max(n, 1): an empty table must yield an empty edge set, not a
    # modulo-by-zero (the literal is never applied to any row then)
    n = max(docs.count(), 1)
    src = F.col("doc_id")
    e = docs.select(
        src.alias("src"),
        F.explode(
            F.array_compact(
                F.array(
                    (src * 17 + 1) % n,
                    F.when(src % 3 != 0, (src * 31 + 7) % n),
                    F.when(src % 5 != 0, (src * 53 + 11) % n),
                )
            )
        ).alias("dst"),
    )
    return e, n


@register(
    "g01_link_indegree",
    _EDGE_SQL
    + """
    SELECT dst AS doc_id, CAST(count(*) AS BIGINT) AS indegree
    FROM e
    GROUP BY dst
    ORDER BY indegree DESC, doc_id ASC
    LIMIT 25
    """,
)
def g01_link_indegree(spark, sf_dir):
    """Top in-linked pages — the cheapest authority signal a frontier
    prioritizer uses. One partial-aggregated groupBy over the edge
    relation + TakeOrderedAndProject (no global sort)."""
    e, _ = _edges(spark, sf_dir)
    return (
        e.groupBy(F.col("dst").alias("doc_id"))
        .agg(F.count("*").alias("indegree"))
        .orderBy(F.desc("indegree"), F.asc("doc_id"))
        .limit(25)
    )


def pagerank_ranks(
    spark, sf_dir: str, iterations: int = 3, damping: float = 0.85
) -> DataFrame:
    """Full (id, rank) relation after ``iterations`` power steps —
    the computation behind g02, un-truncated so tests can check
    global invariants (mass conservation)."""
    e, n = _edges(spark, sf_dir)
    nodes = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(deg, on="src")  # (src, dst, deg): static across iterations
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed.src == ranks.id)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .select(
                "id",
                (
                    F.lit((1 - damping) / n)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


@register(
    "g02_pagerank",
    _EDGE_SQL
    + """
    , deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    r0 AS (SELECT doc_id AS id, 1.0 / nn.n AS rank FROM documents, nn),
    r1 AS (
        SELECT d.doc_id AS id,
               0.15 / (SELECT n FROM nn)
               + 0.85 * COALESCE(SUM(r.rank / deg.deg), 0) AS rank
        FROM documents d
        LEFT JOIN e ON e.dst = d.doc_id
        LEFT JOIN deg ON deg.src = e.src
        LEFT JOIN r0 r ON r.id = e.src
        GROUP BY d.doc_id
    ),
    r2 AS (
        SELECT d.doc_id AS id,
               0.15 / (SELECT n FROM nn)
               + 0.85 * COALESCE(SUM(r.rank / deg.deg), 0) AS rank
        FROM documents d
        LEFT JOIN e ON e.dst = d.doc_id
        LEFT JOIN deg ON deg.src = e.src
        LEFT JOIN r1 r ON r.id = e.src
        GROUP BY d.doc_id
    ),
    r3 AS (
        SELECT d.doc_id AS id,
               0.15 / (SELECT n FROM nn)
               + 0.85 * COALESCE(SUM(r.rank / deg.deg), 0) AS rank
        FROM documents d
        LEFT JOIN e ON e.dst = d.doc_id
        LEFT JOIN deg ON deg.src = e.src
        LEFT JOIN r2 r ON r.id = e.src
        GROUP BY d.doc_id
    )
    SELECT id AS doc_id, round(rank, 6) AS pagerank
    FROM r3
    ORDER BY pagerank DESC, doc_id ASC
    LIMIT 25
    """,
)
def g02_pagerank(spark, sf_dir):
    """PageRank, 3 fixed power iterations, damping 0.85 — the
    iterative-relational authority score (Page et al. 1999; the
    oracle unrolls the same three iterations as nested aggregates,
    which is how a fixed-depth iterative algorithm becomes
    SQL-checkable). No dangling nodes by construction, so mass is
    conserved without a redistribution term (pytest pins sum==1).

    Per iteration: one equi-join of ranks onto edges (by src, with
    out-degree) and one groupBy(dst) partial-agg — O(E) shuffle,
    never an N x N structure. Ordering/limit use the ROUNDED rank so
    the cutoff is engine-invariant."""
    return (
        pagerank_ranks(spark, sf_dir).select(
            F.col("id").alias("doc_id"),
            F.round("rank", 6).alias("pagerank"),
        )
        .orderBy(F.desc("pagerank"), F.asc("doc_id"))
        .limit(25)
    )
