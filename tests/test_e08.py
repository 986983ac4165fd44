"""e08 corpus datasheet: every statistic must agree with the
standalone operator that owns its rule (t01 language, t02 quality,
t03 tokens, d01-style duplication), plus a planted corpus with
closed-form rates and parallelism invariance."""

from pyspark.sql import functions as F

from common_crawl___autumn_2025_spark.plans.matching_pipeline import (
    e08_corpus_datasheet,
)
from common_crawl___autumn_2025_spark.operators.textquality import (
    t01_language_id,
    t02_quality_score,
    t03_token_count,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_e08_agrees_with_standalone_operators(spark, sf_dir):
    sheet = {r.predicted_lang: r for r in e08_corpus_datasheet(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    # language counts == t01 grouped (over non-null text docs)
    t01 = {
        r.predicted_lang: r.n
        for r in t01_language_id(spark, sf_dir)
        .join(docs.select("doc_id"), on="doc_id")
        .groupBy("predicted_lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {k: v.n_docs for k, v in sheet.items()} == t01
    # total quality passes == t02's gate summed
    total_pass = (
        t02_quality_score(spark, sf_dir)
        .join(docs.select("doc_id"), on="doc_id")
        .where("passes_quality")
        .count()
    )
    assert sum(v.quality_pass for v in sheet.values()) == total_pass
    # total tokens == t03's ws_tokens summed
    total_tokens = (
        t03_token_count(spark, sf_dir)
        .join(docs.select("doc_id"), on="doc_id")
        .agg(F.sum("ws_tokens"))
        .collect()[0][0]
    )
    assert sum(v.total_ws_tokens for v in sheet.values()) == total_tokens


def test_e08_planted_rates(spark, tmp_path):
    good = "the " + " ".join(f"word{i}" for i in range(25))  # en, passes gate
    short = "the cat"                                         # en, fails (len)
    es = "el " + " ".join(f"palabra{i}" for i in range(25)) + " los"
    docs = [
        (0, good, "en", "web"),
        (1, good, "en", "web"),     # exact dup of 0
        (2, short, "en", "web"),
        (3, es, "es", "web"),
        (4, None, "zz", "web"),     # NULL: excluded entirely
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.parquet(f"{sf}/documents.parquet")
    sheet = {r.predicted_lang: r for r in e08_corpus_datasheet(spark, sf).collect()}
    assert set(sheet) == {"en", "es"}
    en = sheet["en"]
    assert (en.n_docs, en.quality_pass, en.dup_docs) == (3, 2, 2)
    assert en.quality_rate == round(2 / 3, 4)
    assert en.dup_rate == round(2 / 3, 4)
    es_row = sheet["es"]
    assert (es_row.n_docs, es_row.quality_pass, es_row.dup_docs) == (1, 1, 0)
    assert es_row.dup_rate == 0.0


def test_e08_parallelism_invariance(spark, sf_dir):
    base = _rows(e08_corpus_datasheet(spark, sf_dir))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        assert _rows(e08_corpus_datasheet(spark, sf_dir)) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
