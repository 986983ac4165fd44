"""e06 pretraining keep-set: the composed repetition/decontamination/
exact-substring verdict table must equal the composed DuckDB oracle
and agree gate-by-gate with the component operators it reuses."""

import duckdb

from common_crawl___autumn_2025_spark.plans.matching_pipeline import (
    _e06_oracle,
    e06_pretraining_keepset,
)


def test_e06_engine_matches_oracle(spark, sf_dir):
    engine = [tuple(r) for r in e06_pretraining_keepset(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    oracle = [tuple(r) for r in con.sql(_e06_oracle()).fetchall()]
    assert engine == oracle
    # verdict algebra: keep is exactly the conjunction of the gates
    assert all(k == (r and d and s) for _, r, d, s, k in engine)
    # each gate must genuinely fire on the sf corpora (the component
    # operators' planted tests pin their semantics; this pins that
    # the composition preserves their signal)
    assert any(not r for _, r, _, _, _ in engine)
    assert any(not d for _, _, d, _, _ in engine)
    assert any(not s for _, _, _, s, _ in engine)
    assert any(k for *_, k in engine)


def test_e06_gates_agree_with_components(spark, sf_dir):
    from common_crawl___autumn_2025_spark.operators.dedup import (
        d08_exact_substring,
    )
    from common_crawl___autumn_2025_spark.operators.textquality import (
        t08_repetition_filter,
        t09_decontaminate,
    )

    rows = {r.doc_id: r for r in e06_pretraining_keepset(spark, sf_dir).collect()}
    rep = {r.doc_id: r.keep for r in t08_repetition_filter(spark, sf_dir).collect()}
    dec = {
        r.doc_id: not r.contaminated
        for r in t09_decontaminate(spark, sf_dir).collect()
    }
    sub = {r.doc_id: r.keep for r in d08_exact_substring(spark, sf_dir).collect()}
    assert set(rows) == set(dec)  # base = the train docs t09 covers
    for doc_id, r in rows.items():
        assert r.repetition_ok == rep.get(doc_id, True)
        assert r.decontaminated_ok == dec[doc_id]
        assert r.substring_ok == sub.get(doc_id, True)
