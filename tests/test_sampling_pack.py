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

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def ducks():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def test_t06_engine_matches_oracle(spark, ducks):
    engine = [
        (r.doc_id, r.lang) for r in t06_stratified_sample(spark, SF_DIR).collect()
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


def test_t07_engine_matches_oracle(spark, ducks):
    engine = [
        (r.doc_id, r.bucket, r.pack_id, r.n_tokens)
        for r in t07_sequence_pack(spark, SF_DIR).collect()
    ]
    oracle = [tuple(r) for r in ducks.sql(_t07_oracle_sql()).fetchall()]
    assert engine == oracle
    assert len(engine) == 500  # every document is packed exactly once


def test_t07_pack_shape(spark):
    rows = t07_sequence_pack(spark, SF_DIR).collect()
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
