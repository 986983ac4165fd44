"""e07 ship gate: per-doc verdict table (quality ∧ repetition ∧
decontamination ∧ substring → keep) plus the t10-redacted text.

Checked two ways: engine ≡ composed DuckDB oracle on a planted corpus
where each gate fails in isolation (and on the sf corpus via the
catalog mirror), and gate-by-gate AGREEMENT — every verdict column in
e07 must equal the standalone registered operator's verdict for the
same doc, so the composition cannot drift from its components.
"""

import duckdb

from pyspark.sql import functions as F

from common_crawl___autumn_2025_spark.operators.dedup import (
    CHUNK,
    d08_exact_substring,
)
from common_crawl___autumn_2025_spark.operators.textquality import (
    EVAL_MAX_ID,
    t02_quality_score,
    t08_repetition_filter,
    t09_decontaminate,
    t10_pii_redaction,
)
from common_crawl___autumn_2025_spark.plans.matching_pipeline import (
    _e07_oracle,
    e07_ship_gate,
)


def _uniq(tag, n):
    return " ".join(f"{tag}{i}" for i in range(n))


def _planted(spark, tmp_path):
    """One doc per failure mode, each failing EXACTLY one gate:

    - 20: eval doc (excluded from output; its grams contaminate 103)
    - 100: passes every gate, carries an email + phone (redacted)
    - 101: fails ONLY quality (punctuation-heavy; tokens distinct)
    - 102: fails ONLY repetition (one token >12% of a 30-token doc)
    - 103: fails ONLY decontamination (repeats 20's leading grams)
    - 104/105: fail ONLY substring (all/most chunks shared)
    """
    ev = _uniq("eval", 24)
    shared = _uniq("sh", 2 * CHUNK)
    rows = [
        (5, ev, "en", "wiki"),
        (100, _uniq("ok", 30) + " contact bob@example.com or 555-123-4567 now",
         "en", "web"),
        (101, " ".join(f"p{i}!!!" for i in range(25)), "en", "web"),
        (102, " ".join(x for i in range(10) for x in ("spam", f"u{i}", f"v{i}")),
         "en", "web"),
        (103, " ".join(ev.split()[:8]) + " " + _uniq("tail", 16), "en", "web"),
        (104, shared, "en", "crawl"),
        (105, shared + " " + _uniq("extra", CHUNK), "en", "crawl"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(sf + "/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    return sf, con


def test_e07_planted_engine_matches_oracle_and_semantics(spark, tmp_path):
    sf, con = _planted(spark, tmp_path)
    engine = [tuple(r) for r in e07_ship_gate(spark, sf).collect()]
    oracle = [tuple(r) for r in con.sql(_e07_oracle()).fetchall()]
    assert engine == oracle
    got = {r[0]: r for r in e07_ship_gate(spark, sf).collect()}
    assert set(got) == {100, 101, 102, 103, 104, 105}  # eval doc out
    gates = ("quality_ok", "repetition_ok", "decontaminated_ok",
             "substring_ok")
    expect_fail = {101: "quality_ok", 102: "repetition_ok",
                   103: "decontaminated_ok", 104: "substring_ok",
                   105: "substring_ok"}
    for doc, failing in expect_fail.items():
        r = got[doc]
        for g in gates:
            assert r[g] == (g != failing), (doc, g, r)
        assert not r["keep"]
    ok = got[100]
    assert all(ok[g] for g in gates) and ok["keep"]
    # redaction payload: placeholders in, PII out
    assert ok["redacted"]
    assert "<EMAIL>" in ok["clean_text"] and "<PHONE>" in ok["clean_text"]
    assert "bob@example.com" not in ok["clean_text"]
    assert "555-123-4567" not in ok["clean_text"]
    assert not got[101]["redacted"]


def test_e07_gate_agreement_with_components(spark, tmp_path):
    """Each e07 verdict column equals the standalone operator's
    verdict; clean_text/redacted equal t10's output."""
    sf, _ = _planted(spark, tmp_path)
    e07 = {r.doc_id: r for r in e07_ship_gate(spark, sf).collect()}
    t02 = {r.doc_id: r.passes_quality
           for r in t02_quality_score(spark, sf).collect()}
    t08 = {r.doc_id: r.keep for r in t08_repetition_filter(spark, sf).collect()}
    t09 = {r.doc_id: not r.contaminated
           for r in t09_decontaminate(spark, sf).collect()}
    d08 = {r.doc_id: r.keep for r in d08_exact_substring(spark, sf).collect()}
    t10 = {r.doc_id: r for r in t10_pii_redaction(spark, sf).collect()}
    for doc, r in e07.items():
        assert r.quality_ok == t02[doc]
        assert r.repetition_ok == t08.get(doc, True)
        assert r.decontaminated_ok == t09.get(doc, True)
        assert r.substring_ok == d08.get(doc, True)
        assert r.clean_text == t10[doc].clean_text
        assert r.redacted == ((t10[doc].n_emails + t10[doc].n_phones) > 0)
        assert r.keep == (r.quality_ok and r.repetition_ok
                          and r.decontaminated_ok and r.substring_ok)


def test_e07_sf_gates_split_the_corpus(spark, sf_dir):
    """On the sf corpus the composed gate is non-degenerate: some
    docs kept, some dropped, and the quality gate does real work
    beyond e06's three gates."""
    agg = (
        e07_ship_gate(spark, sf_dir)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("int")).alias("kept"),
            F.sum(F.col("quality_ok").cast("int")).alias("q_ok"),
        )
        .collect()[0]
    )
    assert 0 < agg.kept < agg.n
    assert 0 < agg.q_ok < agg.n
