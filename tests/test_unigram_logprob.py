"""t12 unigram-LM quality scoring: engine ≡ DuckDB oracle on the sf
corpus, plus a planted corpus where the model is hand-computable —
common-token docs must outscore rare/OOV gibberish, OOV ratios are
exact, and the vocab cap's (count DESC, token ASC) tie-break is
pinned."""

import math

import duckdb

from common_crawl___autumn_2025_spark.operators.textquality import (
    _T12_ORACLE,
    T12_VOCAB_K,
    t12_unigram_logprob,
)


def _oracle_rows(sql, docs_path):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{docs_path}')"
        )
        return sorted(tuple(r) for r in con.sql(sql).fetchall())
    finally:
        con.close()


def test_t12_matches_oracle_on_sf(spark, sf_dir):
    engine = sorted(
        tuple(r) for r in t12_unigram_logprob(spark, sf_dir).collect()
    )
    oracle = _oracle_rows(_T12_ORACLE, f"{sf_dir}/documents.parquet")
    assert engine == oracle
    assert len(engine) > 0


def _write_docs(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        sf + "/documents.parquet"
    )
    return sf


def test_t12_planted_model_is_exact(spark, tmp_path):
    """A corpus small enough to fit the model by hand: 'a' appears 6
    times, 'b' 3, 'c' 1 (N=10, all in the top-16 vocab so no OOV).
    Scores must equal the closed-form mean log-probabilities."""
    rows = [
        (0, "a a a b"),       # lp = (3 ln .6 + ln .3) / 4
        (1, "a a a b b c"),   # lp = (3 ln .6 + 2 ln .3 + ln .1) / 6
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r.doc_id: r for r in t12_unigram_logprob(spark, sf).collect()}
    exp0 = (3 * math.log(0.6) + math.log(0.3)) / 4
    exp1 = (3 * math.log(0.6) + 2 * math.log(0.3) + math.log(0.1)) / 6
    assert got[0].n_toks == 4 and got[1].n_toks == 6
    assert abs(got[0].logprob_avg - round(exp0, 4)) < 1e-9
    assert abs(got[1].logprob_avg - round(exp1, 4)) < 1e-9
    assert got[0].oov_ratio == 0.0 and got[1].oov_ratio == 0.0


def test_t12_oov_floor_and_quality_ordering(spark, tmp_path):
    """More vocab types than the cap: the tail scores the OOV floor
    ln(1/N). A doc of common tokens must outscore a doc of pure
    gibberish (the quality-filter property), and OOV ratios are
    exact. Also pins the tie-break: at equal count the vocab keeps
    the lexicographically smaller token."""
    # T12_VOCAB_K singleton tokens + 'the' everywhere: vocab is 'the'
    # plus the 15 smallest singletons; the rest are OOV.
    common = [(i, "the the the the") for i in range(8)]
    single = [(100 + j, f"tok{j:03d}") for j in range(T12_VOCAB_K + 4)]
    gibberish = [(900, "zzz1 zzz2 zzz3 zzz4")]
    sf = _write_docs(spark, tmp_path, common + single + gibberish)
    out = {r.doc_id: r for r in t12_unigram_logprob(spark, sf).collect()}

    # engine ≡ oracle on the planted corpus too
    oracle = _oracle_rows(
        _T12_ORACLE, f"{sf}/documents.parquet/*.parquet"
    )
    engine = sorted(tuple(r) for r in t12_unigram_logprob(spark, sf).collect())
    assert engine == oracle

    # quality ordering: common-token doc ≫ gibberish doc
    assert out[0].logprob_avg > out[900].logprob_avg
    # gibberish is all-OOV (zzz* sort after tok* at equal count)
    assert out[900].oov_ratio == 1.0
    assert out[0].oov_ratio == 0.0
    # tie-break: singleton tok000..tok014 are in-vocab (15 slots after
    # 'the'), tok015+ fall out
    assert out[100].oov_ratio == 0.0
    assert out[100 + T12_VOCAB_K - 1].oov_ratio == 1.0


def test_t12_parallelism_invariance(spark, tmp_path):
    """Same corpus at 1 and 8 partitions → identical scores (the
    vocab top-K and the rounded averages must not depend on the
    physical plan)."""
    rows = [
        (i, " ".join(f"w{(i * 7 + k) % 23}" for k in range(12)))
        for i in range(60)
    ]
    sf1 = str(tmp_path / "p1")
    sf8 = str(tmp_path / "p8")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(sf1 + "/documents.parquet")
    df.repartition(8).write.parquet(sf8 + "/documents.parquet")
    a = sorted(tuple(r) for r in t12_unigram_logprob(spark, sf1).collect())
    b = sorted(tuple(r) for r in t12_unigram_logprob(spark, sf8).collect())
    assert a == b
