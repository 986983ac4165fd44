"""a20 approx quantiles: the mergeable approx_percentile sketch is
pinned inside the exact-percentile value envelope (a19 is the anchor),
at two parallelism levels — the sketch's merged result may vary with
partition order, but the rank-error bound must hold either way."""

from pyspark.sql import functions as F

from common_crawl___autumn_2025_spark.plans.temporal import (
    a19_exact_quantiles,
    a20_approx_quantiles,
)

PTILES = (0.5, 0.9, 0.99)
EPS = 0.01  # generous vs the sketch's 1/A20_ACCURACY = 1e-4 rank error


def _envelopes(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    aggs = []
    for p in PTILES:
        tag = int(p * 100)
        aggs.append(
            F.percentile("value", F.lit(max(0.0, p - EPS))).alias(f"lo{tag}")
        )
        aggs.append(
            F.percentile("value", F.lit(min(1.0, p + EPS))).alias(f"hi{tag}")
        )
    return {r["event_type"]: r for r in ev.groupBy("event_type").agg(*aggs).collect()}


def _check_envelope(spark, sf_dir):
    env = _envelopes(spark, sf_dir)
    rows = a20_approx_quantiles(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        bounds = env[r["event_type"]]
        for p in PTILES:
            tag = int(p * 100)
            ap = r[f"ap{tag}"]
            assert bounds[f"lo{tag}"] <= ap <= bounds[f"hi{tag}"], (
                r["event_type"],
                p,
                ap,
                bounds[f"lo{tag}"],
                bounds[f"hi{tag}"],
            )


def test_a20_within_exact_envelope(spark, sf_dir):
    _check_envelope(spark, sf_dir)


def test_a20_envelope_holds_at_low_parallelism(spark, sf_dir):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        _check_envelope(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_a20_exact_columns_agree_with_a19(spark, sf_dir):
    """The anchor columns a20 carries are a19's values verbatim."""
    a19 = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in a19_exact_quantiles(spark, sf_dir).collect()
    }
    for r in a20_approx_quantiles(spark, sf_dir).collect():
        assert (r["p50"], r["p90"], r["p99"]) == a19[r["event_type"]]
