"""a21 heavy hitters: the Misra-Gries superset guarantee (every key
with frequency > n/(capacity+1) appears among the sketch candidates),
exactness of the confirmed output, and parallelism invariance."""

from pyspark.sql import functions as F

from common_crawl___autumn_2025_spark.plans.extras import (
    MG_CAPACITY,
    a21_heavy_hitters,
    heavy_hitters,
    mg_candidates,
)


def _hot_keyed(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.when(F.col("user_id") % 7 == 0, F.col("user_id") % 5)
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("hot_key")
    )


def test_a21_candidates_superset_of_true_heavy(spark, sf_dir):
    df = _hot_keyed(spark, sf_dir)
    n = df.count()
    threshold = n / (MG_CAPACITY + 1)
    true_heavy = {
        r.hot_key
        for r in df.groupBy("hot_key")
        .count()
        .where(F.col("count") > threshold)
        .collect()
    }
    assert true_heavy  # the plant guarantees ~n/35 > n/65 per hot key
    cands = {r.hot_key for r in mg_candidates(df, "hot_key").collect()}
    assert true_heavy <= cands


def test_a21_output_is_exact_top5(spark, sf_dir):
    got = [tuple(r) for r in a21_heavy_hitters(spark, sf_dir).collect()]
    exact = [
        tuple(r)
        for r in _hot_keyed(spark, sf_dir)
        .groupBy("hot_key")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "hot_key")
        .limit(5)
        .collect()
    ]
    assert got == exact and len(got) == 5
    # counts strictly clear the 5th/6th boundary (no tie ambiguity)
    all_counts = sorted(
        (
            r.n
            for r in _hot_keyed(spark, sf_dir)
            .groupBy("hot_key")
            .agg(F.count("*").alias("n"))
            .collect()
        ),
        reverse=True,
    )
    if len(all_counts) > 5:
        assert all_counts[4] > all_counts[5]


def test_a21_parallelism_invariance(spark, sf_dir):
    base = [tuple(r) for r in a21_heavy_hitters(spark, sf_dir).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        df = _hot_keyed(spark, sf_dir).repartition(2)
        assert [
            tuple(r) for r in heavy_hitters(df, "hot_key", k=5).collect()
        ] == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_a21_planted_zipf(spark):
    """A synthetic Zipf-ish corpus with a known answer: key i
    replicated 2^(10-i) times for i in 0..9 over a 1000-key tail of
    singletons — top-5 must be keys 0..4 with exact counts."""
    rows = []
    for i in range(10):
        rows += [(i,)] * (2 ** (10 - i))
    rows += [(1000 + j,) for j in range(1000)]
    df = spark.createDataFrame(rows, "hot_key long").repartition(8)
    got = [tuple(r) for r in heavy_hitters(df, "hot_key", k=5).collect()]
    assert got == [(i, 2 ** (10 - i)) for i in range(5)]
