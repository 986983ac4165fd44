"""t13 contamination attribution: engine ≡ oracle on sf and planted
corpora, closed-form overlap fractions, the exact integer-ratio flag
boundary (2*shared >= n), multi-eval attribution, and parallelism
invariance."""

import os

import duckdb

from common_crawl___autumn_2025_spark.operators.textquality import (
    _T13_ORACLE,
    t13_contamination_pairs,
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
        return sorted(tuple(r) for r in con.sql(_T13_ORACLE).fetchall())
    finally:
        con.close()


def test_t13_matches_oracle_on_sf(spark, sf_dir):
    got = _rows(t13_contamination_pairs(spark, sf_dir))
    assert got == _oracle_rows(sf_dir)
    assert len(got) > 0


def _write(spark, tmp_path, docs):
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_t13_planted_attribution(spark, tmp_path):
    a = [f"a{i}" for i in range(11)]   # eval doc 0 material
    h = [f"h{i}" for i in range(9)]    # eval doc 1 material
    b = [f"b{i}" for i in range(7)]    # train-only filler
    docs = [
        (0, " ".join(a), "en", "eval"),
        (1, " ".join(h), "en", "eval"),
        # full copy of eval 0: overlap_frac 1.0, flagged
        (20, " ".join(a), "en", "web"),
        # 11 eval-0 tokens + 7 filler = 18 tokens -> 14 grams,
        # 7 shared -> exactly 2*7 >= 14: flagged at the boundary
        (21, " ".join(a + b), "en", "web"),
        # 10 eval-0 tokens + 8 filler = 18 tokens -> 14 grams,
        # 6 shared -> 12 < 14: NOT flagged
        (22, " ".join(a[:10] + [f"c{i}" for i in range(8)]), "en", "web"),
        # overlaps BOTH eval docs: two attribution rows
        (23, " ".join(a[:5] + ["x0"] + h[:5]), "en", "web"),
        # no overlap: absent from the output
        (24, " ".join(f"z{i}" for i in range(10)), "en", "web"),
    ]
    sf = _write(spark, tmp_path, docs)
    got = {
        (r.train_doc, r.eval_doc): r
        for r in t13_contamination_pairs(spark, sf).collect()
    }
    assert got[(20, 0)].overlap_frac == 1.0 and got[(20, 0)].flagged
    r21 = got[(21, 0)]
    assert (r21.shared_grams, r21.flagged) == (7, True)
    assert abs(r21.overlap_frac - round(7 / 14, 4)) < 1e-9
    r22 = got[(22, 0)]
    assert (r22.shared_grams, r22.flagged) == (6, False)
    assert (23, 0) in got and (23, 1) in got
    assert got[(23, 0)].shared_grams == 1 and got[(23, 1)].shared_grams == 1
    assert not any(t == 24 for t, _ in got)
    # engine ≡ oracle on the planted corpus too
    assert _rows(t13_contamination_pairs(spark, sf)) == _oracle_rows(sf)


def test_t13_parallelism_invariance(spark, sf_dir):
    base = _rows(t13_contamination_pairs(spark, sf_dir))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        assert _rows(t13_contamination_pairs(spark, sf_dir)) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
