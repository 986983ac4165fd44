"""d10 incremental near-dup: engine ≡ oracle, the exact-copy
guarantee (identical signatures collide on every band), variant
detection on a planted corpus, cross-corpus-only pairs, and
parallelism invariance."""

import os

import duckdb
from pyspark.sql import functions as F

from common_crawl___autumn_2025_spark.operators.dedup import (
    _D09_PLANT,
    _d10_oracle_sql,
    d10_incremental_neardup,
    lsh_candidates_cross,
    minhash_signatures,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _oracle_rows(sf):
    con = duckdb.connect()
    path = f"{sf}/documents.parquet"
    pat = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pat}')"
    )
    try:
        return sorted(tuple(r) for r in con.sql(_d10_oracle_sql()).fetchall())
    finally:
        con.close()


def test_d10_matches_oracle_on_sf(spark, sf_dir):
    got = _rows(d10_incremental_neardup(spark, sf_dir))
    assert got == _oracle_rows(sf_dir)
    assert len(got) > 0


def test_d10_exact_copies_always_detected(spark, sf_dir):
    """A planted exact copy has the identical MinHash signature, so
    every band collides — detection is guaranteed, not probabilistic."""
    pairs = set(_rows(d10_incremental_neardup(spark, sf_dir)))
    planted = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(
            (F.col("doc_id") % 2 == 0)
            & (F.col("doc_id") < _D09_PLANT)
            & F.col("text").isNotNull()
        )
        .collect()
    ]
    assert planted
    for d in planted:
        assert (2000000 + d, d) in pairs, d
    # output pairs are strictly cross-corpus: batch left, history right
    for batch_doc, hist_doc in pairs:
        assert batch_doc % 2 == 1 or batch_doc >= 2000000
        assert hist_doc % 2 == 0 and hist_doc < 2000000


def test_d10_planted_variant_and_nonmatch(spark, tmp_path):
    """A long doc's first-token-dropped variant in the batch pairs
    with its history original; an unrelated batch doc pairs with
    nothing."""
    base = " ".join(f"tok{i}" for i in range(40))
    variant = " ".join(f"tok{i}" for i in range(1, 40))
    other = " ".join(f"zz{i}" for i in range(40))
    docs = [
        (0, base),      # history
        (1, variant),   # batch: near-dup of 0
        (3, other),     # batch: unrelated
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    pairs = set(_rows(d10_incremental_neardup(spark, sf)))
    assert (1, 0) in pairs
    assert not any(b == 3 for b, _ in pairs)
    # engine ≡ oracle on the planted corpus too
    assert sorted(pairs) == _oracle_rows(sf)


def test_d10_parallelism_invariance(spark, sf_dir):
    base = _rows(d10_incremental_neardup(spark, sf_dir))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        assert _rows(d10_incremental_neardup(spark, sf_dir)) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
