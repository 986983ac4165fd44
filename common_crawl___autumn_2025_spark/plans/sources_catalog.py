"""Source/sink roundtrip queries + seeded sampling + urljoin — the
ingestion/egress surface (SURVEY.md §2.1) as driver-checkable oracle
rows.

Each roundtrip query WRITES a slice of a testdata table through an
engine sink into a temp directory, reads it back through the typed
reader surface, and returns a result the DuckDB oracle derives
directly from the source table — so a value that does not survive the
write→read roundtrip (padded keys, trimmed whitespace, double
precision) fails the hash comparison.

Reference provenance: the reference's ``to_csv`` sink
(``company_number_scrape.py:66``), dtype-override CSV read
(``combine_trustpilot_with_CH.py:7``), DictReader normalization loop
(``Scrape_Utils.py:252-272``), ``urljoin`` resolution
(``company_number_scrape.py:38``), and ``random``-based trial
sampling (``Scrape_Utils.py:431-519`` — made order-stable and
distributed here via hash ordering).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canonical import urljoin_udf
from ..sources.readers import read_csv_normalized
from ..sources.writers import write_csv, write_json, write_parquet
from . import load, register


def _tmp(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=prefix)


@register(
    "s01_csv_roundtrip_dirty",
    """
    SELECT doc_id,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_key,
           source AS source_clean,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents WHERE doc_id < 200
    """,
)
def s01_csv_roundtrip_dirty(spark, sf_dir):
    """S1/S4/S5/S9/F25: write a deliberately dirty CSV (zero-padded
    join key, whitespace-wrapped strings) through the CSV sink, read
    it back with an EXPLICIT schema — the padded key as STRING, never
    inferred (inference would strip the zeros: the reference's one
    dtype override, combine_trustpilot_with_CH.py:7) — trim-normalize,
    and rename. The oracle never sees the CSV: a value that does not
    survive the roundtrip fails the hash."""
    out = _tmp("s01_csv_")
    dirty = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_key"),
            F.concat(F.lit("  "), F.col("source"), F.lit(" ")).alias(
                "messy_source"
            ),
            "n_chars",
        )
    )
    write_csv(dirty, out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("padded_key", T.StringType()),  # S4: no inference
            T.StructField("messy_source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = read_csv_normalized(
        spark, out, schema, trim_columns=["messy_source"]
    )
    return back.select(
        "doc_id",
        "padded_key",
        F.col("messy_source").alias("source_clean"),  # F25 rename
        "n_chars",
    )


@register(
    "s08_parquet_roundtrip",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey % 7 = 0
    GROUP BY o_orderstatus
    """,
)
def s08_parquet_roundtrip(spark, sf_dir):
    """S8: partitioned parquet sink -> read-back -> aggregate. The
    write partitions by status (at 100 TB an unpartitioned table is a
    file-listing bomb); the read-back aggregate must equal the
    oracle's direct aggregate over the source table."""
    out = os.path.join(_tmp("s08_pq_"), "orders")
    slice_ = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    write_parquet(slice_, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "s10_json_roundtrip",
    """
    SELECT event_id, event_type, user_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events WHERE event_id < 500
    """,
)
def s10_json_roundtrip(spark, sf_dir):
    """S10 + S6: JSON-lines sink -> explicit-schema read-back -> the
    nested JSON-in-string payload still parses identically."""
    out = _tmp("s10_json_")
    slice_ = (
        load(spark, sf_dir, "events")
        .where(F.col("event_id") < 500)
        .select("event_id", "event_type", "user_id", "props")
    )
    write_json(slice_, out)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    back = spark.read.schema(schema).json(out)
    return back.select(
        "event_id",
        "event_type",
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


@register(
    "f09_urljoin_resolution",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 'https://other.org/x'
             WHEN 1 THEN 'http://www.' || source || '.com/about'
             WHEN 2 THEN 'http://www.' || source || '.com/dir/img/'
                         || lang || '.png'
             ELSE 'http://cdn.example.com/lib.js'
           END AS resolved
    FROM documents
    """,
)
def f09_urljoin_resolution(spark, sf_dir):
    """F9: relative-href resolution against a base URL (reference
    urljoin, company_number_scrape.py:38) via the Arrow-batched
    canonicalizing UDF. Cases: absolute, root-relative, relative,
    protocol-relative; inputs are constructed pre-normalized so the
    SQL twin is exact string algebra."""
    docs = load(spark, sf_dir, "documents")
    base = F.concat(F.lit("http://www."), F.col("source"), F.lit(".com/dir/page.html"))
    href = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("https://other.org/x"))
        .when(F.col("doc_id") % 4 == 1, F.lit("/about"))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("img/"), F.col("lang"), F.lit(".png")),
        )
        .otherwise(F.lit("//cdn.example.com/lib.js"))
    )
    return docs.select(
        "doc_id", urljoin_udf(base, href).alias("resolved")
    )


@register(
    "o05_seeded_sample",
    """
    SELECT doc_id, source FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':seed42'), doc_id
    LIMIT 100
    """,
)
def o05_seeded_sample(spark, sf_dir):
    """E2: seeded ORDER-STABLE sampling — the distributed replacement
    for the reference's random trial extraction (Scrape_Utils.py:487
    random.randint): rank by a keyed cryptographic hash and take the
    top-n. Same seed -> same sample at any parallelism, on any
    engine (md5 is engine-portable, unlike rand())."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .orderBy(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":seed42"))),
            "doc_id",
        )
        .limit(100)
    )


@register("s14_warc_roundtrip")  # rows-only: no DuckDB WARC reader
def s14_warc_roundtrip(spark, sf_dir):
    """WARC sink + source (sources/warc.py): archive the canonical
    image+caption record table as Common-Crawl-layout member-gzip
    WARC/1.0 resource records (one task per partition, payload bytes
    never on the driver), read it back per-file, and verify the
    round trip field by field. Scalar verification columns per
    format group; the byte-exact equality itself is pytest-pinned
    (tests/test_warc.py)."""
    import tempfile

    from ..sources.warc import read_warc, write_warc
    from .. import synthetic as syn

    root = tempfile.mkdtemp(prefix="cat_warc_")
    recs = syn.records_df(spark, 120, partitions=8).localCheckpoint(
        eager=True
    )
    n_written = write_warc(recs, root)
    back = read_warc(spark, root)
    joined = recs.alias("a").join(
        back.alias("b"), on=["image_id"], how="inner"
    )
    return (
        joined.groupBy(F.col("a.fmt").alias("fmt"))
        .agg(
            F.count("*").alias("n_records"),
            F.sum(
                (
                    (F.col("a.bytes") == F.col("b.bytes"))
                    & (F.col("a.caption") == F.col("b.caption"))
                    & (F.col("a.phash") == F.col("b.phash"))
                    & (F.col("a.w") == F.col("b.w"))
                    & (F.col("a.h") == F.col("b.h"))
                ).cast("long")
            ).alias("n_exact"),
            F.lit(n_written).alias("n_written"),
        )
        .orderBy("fmt")
    )


@register("s12_search_source")  # rows-only: blake2b-ranked synthetic
def s12_search_source(spark, sf_dir):
    """S12: the search-API source, end to end — a deterministic query
    batch run through ``crawl/search.py:search_source`` against the
    synthetic backend with the reference's top-3 slice
    (``Search_scrape_P1.py:118``). Rows-only: the ranking hash is
    blake2b (no DuckDB twin, like the rest of the synthetic-web
    family); the live POST path is pytest-gated against a loopback
    server (``tests/test_search_source.py``), replay-equal to this
    synthetic run."""
    from ..crawl.search import SyntheticSearchClient, search_source

    queries = spark.createDataFrame(
        [(f"company {i:03d} ltd",) for i in range(20)], "query string"
    )
    return search_source(
        queries, SyntheticSearchClient(), top_k=3
    ).orderBy("query", "position")


_S13_ORACLE = """
    SELECT * FROM (
      SELECT 'crawl_word_count_distribution' AS figure, 'bar' AS kind,
             (SELECT CAST(count(*) AS INT) FROM (
                SELECT DISTINCT
                  least(CAST(len(string_split(text, ' ')) AS INT) // 20, 19)
                FROM documents)) AS n_points
      UNION ALL
      SELECT 'events_top_types', 'bar',
             (SELECT CAST(least(count(DISTINCT event_type), 10) AS INT)
              FROM events)
      UNION ALL
      SELECT 'orders_year_series', 'line',
             (SELECT CAST(count(DISTINCT year(o_orderdate)) AS INT)
              FROM orders)
    ) ORDER BY figure
"""


@register("s13_figure_sink", _S13_ORACLE)
def s13_figure_sink(spark, sf_dir):
    """S13 figure sink (ref Visuals.py:31-34 savefig + the chart
    cells): render the reference's three chart shapes — word-count
    histogram (histplot, Visuals.py:121-129), top-k category bars
    (value_counts().head().plot(kind='bar'), Visuals.py:150-158),
    and a year count series (sort_index().plot(), Visuals.py:81-88)
    — over the engine's tables, as deterministic SVG files
    (``sources/figures.py``; matplotlib does not ship here and the
    semantics are 'persist a figure artifact of an aggregate', not
    'rasterize').

    100 TB shape: each figure consumes a DISTRIBUTIVELY computed
    aggregate (histogram bins / top-k counts / year rollup — a11,
    a04, a12's plan shapes) and only the reduced relation is ever
    collected, guarded by ``MAX_POINTS``. Returns the manifest the
    sink wrote, which IS value-oracled (chart point counts are pure
    SQL); byte-level determinism of the SVGs is pytest-pinned
    (tests/test_figures.py)."""
    import tempfile

    from ..sources.figures import save_figure

    out_dir = tempfile.mkdtemp(prefix="figures_")
    docs = load(spark, sf_dir, "documents")
    wc_bins = (
        docs.select(
            F.least(
                (F.size(F.split("text", " ")) / 20).cast("int"), F.lit(19)
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
        .withColumn("label", (F.col("bin") * 20).cast("string"))
        .orderBy("bin")
    )
    top_types = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "event_type")
        .limit(10)
    )
    years = (
        load(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("yr")
    )
    rows = [
        save_figure(
            wc_bins, "bar", "label", "cnt",
            "Crawl word count distribution",
            f"{out_dir}/crawl_word_count_distribution.svg",
        ),
        save_figure(
            top_types, "bar", "event_type", "cnt",
            "Top event types",
            f"{out_dir}/events_top_types.svg",
        ),
        save_figure(
            years, "line", "yr", "cnt",
            "Orders per year",
            f"{out_dir}/orders_year_series.svg",
        ),
    ]
    return spark.createDataFrame(
        [(r["figure"], r["kind"], r["n_points"]) for r in rows],
        "figure string, kind string, n_points int",
    ).orderBy("figure")
