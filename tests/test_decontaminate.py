"""t09 benchmark decontamination: n-gram overlap against an eval split.

Engine ≡ DuckDB oracle on sf testdata, plus a planted corpus where the
contamination structure is known by construction.
"""

import duckdb

from common_crawl___autumn_2025_spark.operators.textquality import (
    _T09_ORACLE,
    EVAL_MAX_ID,
    NGRAM,
    t09_decontaminate,
)


def test_t09_engine_matches_oracle(spark, sf_dir):
    engine = [tuple(r) for r in t09_decontaminate(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    oracle = [tuple(r) for r in con.sql(_T09_ORACLE).fetchall()]
    assert engine == oracle
    # the sf corpora contain incidental eval/train n-gram overlap —
    # the operator must surface it
    assert any(r[3] for r in engine)
    assert all(r[1] >= r[2] for r in engine)  # hit_grams <= n_grams
    assert all(r[0] >= EVAL_MAX_ID for r in engine)  # eval never output


def test_t09_planted_contamination(spark, tmp_path):
    """Known structure: doc 100 copies eval doc 0 verbatim (every gram
    hits), doc 101 embeds one eval 5-gram inside unique text (exactly
    one hit), doc 102 is fully unique (zero hits), doc 103 is shorter
    than one gram (excluded), eval docs never appear in the output."""
    ev = "e0 e1 e2 e3 e4 e5 e6 e7"  # eval doc: 4 distinct 5-grams
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    rows = [
        (0, ev),
        (1, uniq("z", 12)),
        (100, ev),                                         # verbatim copy
        (101, uniq("a", 6) + " e0 e1 e2 e3 e4 " + uniq("b", 6)),
        (102, uniq("c", 20)),
        (103, "too short"),
        (104, None),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        sf + "/documents.parquet"
    )
    got = {r.doc_id: r for r in t09_decontaminate(spark, sf).collect()}
    assert set(got) == {100, 101, 102}
    assert got[100].n_grams == 4 and got[100].hit_grams == 4
    assert got[100].contaminated
    assert got[101].n_grams == 6 + 5 + 6 - NGRAM + 1
    assert got[101].hit_grams == 1 and got[101].contaminated
    assert got[102].hit_grams == 0 and not got[102].contaminated
    # engine ≡ oracle on the planted corpus too
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    oracle = [tuple(r) for r in con.sql(_T09_ORACLE).fetchall()]
    engine = [tuple(r) for r in t09_decontaminate(spark, sf).collect()]
    assert engine == oracle
