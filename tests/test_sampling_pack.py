"""t06 hash-gate stratified sampling + t07 sequence packing: engine
vs DuckDB oracle value equality, rate accuracy, and pack-shape
properties."""

import duckdb
import pytest

from common_crawl___autumn_2025_spark.operators.textquality import (
    PACK_BUDGET_TOKENS,
    SAMPLE_DEFAULT_BP,
    SAMPLE_RATES_BP,
    _t06_oracle_sql,
    _t07_oracle_sql,
    t06_stratified_sample,
    t07_sequence_pack,
)

@pytest.fixture()
def ducks(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


def test_t06_engine_matches_oracle(spark, ducks, sf_dir):
    engine = [
        (r.doc_id, r.lang) for r in t06_stratified_sample(spark, sf_dir).collect()
    ]
    oracle = ducks.sql(_t06_oracle_sql()).fetchall()
    assert engine == [(d, lang) for d, lang in oracle]
    assert len(engine) > 0


def test_t06_rates_converge():
    """On a 40k-doc synthetic corpus every stratum's sampled fraction
    lands within 2 points of its configured rate — the gate hash is
    uniform enough to use as a sampler."""
    con = duckdb.connect()
    langs = list(SAMPLE_RATES_BP) + ["xx"]  # xx -> default rate
    con.execute(
        "CREATE TABLE documents AS "
        "SELECT i AS doc_id, ['"
        + "','".join(langs)
        + "'][i % "
        + str(len(langs))
        + " + 1] AS lang, '' AS text FROM range(40000) t(i)"
    )
    got = dict(
        con.sql(
            f"SELECT lang, count(*) FROM ({_t06_oracle_sql()}) GROUP BY lang"
        ).fetchall()
    )
    per_stratum = 40000 / len(langs)
    for lang in langs:
        want_bp = SAMPLE_RATES_BP.get(lang, SAMPLE_DEFAULT_BP)
        frac = got.get(lang, 0) / per_stratum
        assert abs(frac - want_bp / 10000) < 0.02, (lang, frac, want_bp)


def test_t07_engine_matches_oracle(spark, ducks, sf_dir):
    engine = [
        (r.doc_id, r.bucket, r.pack_id, r.n_tokens)
        for r in t07_sequence_pack(spark, sf_dir).collect()
    ]
    oracle = [tuple(r) for r in ducks.sql(_t07_oracle_sql()).fetchall()]
    assert engine == oracle
    assert len(engine) == 500  # every document is packed exactly once


def test_t07_pack_shape(spark, sf_dir):
    rows = t07_sequence_pack(spark, sf_dir).collect()
    max_doc = max(r.n_tokens for r in rows)
    by_bucket: dict = {}
    sums: dict = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, set()).add(r.pack_id)
        sums[(r.bucket, r.pack_id)] = (
            sums.get((r.bucket, r.pack_id), 0) + r.n_tokens
        )
    for bucket, packs in by_bucket.items():
        # packs are contiguous 0..max (concat-then-chunk leaves no gaps)
        assert packs == set(range(max(packs) + 1)), bucket
    for (bucket, pack), total in sums.items():
        # a pack only holds docs whose stream offset starts inside its
        # budget window, so it can overhang by at most one document
        assert total < PACK_BUDGET_TOKENS + max_doc, (bucket, pack, total)
        if pack < max(by_bucket[bucket]):
            # every non-final pack's window is fully covered
            assert total > PACK_BUDGET_TOKENS - max_doc, (bucket, pack, total)


def test_t08_repetition_filter_semantics(spark, tmp_path):
    """Planted docs pin the signal math: an all-same-token doc is
    maximally repetitive (rejected), a fully-distinct doc is clean
    (kept), a single-token doc gets bigram fraction 0, and the
    engine equals the DuckDB oracle bit-for-bit on all of them."""
    from common_crawl___autumn_2025_spark.operators.textquality import (
        _t08_oracle_sql,
        t08_repetition_filter,
    )

    rows = [
        (0, "spam spam spam spam spam spam spam spam"),
        (1, " ".join(f"w{i}" for i in range(30))),
        (2, "solo"),
        (3, "x y x y x y x y"),
        (4, None),
    ]
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        sf_dir + "/documents.parquet"
    )
    got = {r.doc_id: r.asDict() for r in t08_repetition_filter(
        spark, sf_dir).collect()}
    assert 4 not in got  # NULL text excluded
    assert got[0]["dup_token_frac"] == 1.0 - 1.0 / 8
    assert got[0]["top_token_frac"] == 1.0
    assert got[0]["top_bigram_frac"] == 1.0
    assert got[0]["keep"] is False
    assert got[1]["dup_token_frac"] == 0.0
    assert got[1]["top_token_frac"] == 1.0 / 30
    assert got[1]["keep"] is True
    assert got[2]["n_tokens"] == 1
    assert got[2]["top_bigram_frac"] == 0.0
    # "x y" appears 4x among 7 bigrams
    assert got[3]["top_bigram_frac"] == 4.0 / 7
    assert got[3]["keep"] is False

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = {
        r[0]: r for r in con.sql(_t08_oracle_sql()).fetchall()
    }
    for d, row in got.items():
        assert oracle[d] == (
            d, row["n_tokens"], row["dup_token_frac"],
            row["top_token_frac"], row["top_bigram_frac"], row["keep"],
        )
