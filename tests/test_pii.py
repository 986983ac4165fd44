"""t10 PII redaction: planted emails/phones must be scrubbed with
exact counts, engine ≡ DuckDB oracle on both the sf corpus (regex
DIALECT agreement on real text) and the planted corpus (semantics)."""

import duckdb

from common_crawl___autumn_2025_spark.operators.textquality import (
    _T10_ORACLE,
    t10_pii_redaction,
)


def _oracle(sf):
    import os

    path = f"{sf}/documents.parquet"
    if os.path.isdir(path):  # Spark-written directory vs single file
        path += "/*.parquet"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    return [tuple(r) for r in con.sql(_T10_ORACLE).fetchall()]


def test_t10_engine_matches_oracle_on_sf(spark, sf_dir):
    engine = [tuple(r) for r in t10_pii_redaction(spark, sf_dir).collect()]
    assert engine == _oracle(sf_dir)
    # sf word-soup has no PII: the pass must be a verified no-op there
    assert all(not r[4] and r[2] == 0 and r[3] == 0 for r in engine)


def test_t10_planted_pii(spark, tmp_path):
    rows = [
        (0, "contact me at a.b+c@ex-ample.co.uk or x@y.io today"),
        (1, "call 555-123-4567 or 555 987 6543 now"),
        (2, "no pii here"),
        (3, "edge a@b.c @ not@an"),  # sub-TLD and bare @ never match
        (4, None),
        (5, "mixed bob@corp.org and 111-222-3333"),
        # overlapping spans: counts must equal the placeholders EMITTED
        (6, "a1@b.co555-123-4567"),        # phone abuts the email match
        (7, "555-123-4567@example.com"),   # phone-shaped span inside email
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        sf + "/documents.parquet"
    )
    got = {r.doc_id: r for r in t10_pii_redaction(spark, sf).collect()}
    assert set(got) == {0, 1, 2, 3, 5, 6, 7}  # NULL text excluded
    assert got[0].clean_text == "contact me at <EMAIL> or <EMAIL> today"
    assert (got[0].n_emails, got[0].n_phones, got[0].redacted) == (2, 0, True)
    assert got[1].clean_text == "call <PHONE> or <PHONE> now"
    assert (got[1].n_emails, got[1].n_phones) == (0, 2)
    assert got[2].clean_text == "no pii here" and not got[2].redacted
    assert got[3].clean_text == rows[3][1] and not got[3].redacted
    assert got[5].clean_text == "mixed <EMAIL> and <PHONE>"
    # the email match is 'a1@b.co'; the abutting phone IS redacted in
    # the second pass and counted there (counts == placeholders)
    assert got[6].clean_text == "<EMAIL><PHONE>"
    assert (got[6].n_emails, got[6].n_phones) == (1, 1)
    # the whole string is one email (digit local part); no phone
    # placeholder is emitted, so no phone is counted
    assert got[7].clean_text == "<EMAIL>"
    assert (got[7].n_emails, got[7].n_phones) == (1, 0)
    # engine ≡ oracle on the planted corpus too (dialect agreement on
    # strings that actually exercise the patterns)
    engine = [tuple(r) for r in t10_pii_redaction(spark, sf).collect()]
    assert engine == _oracle(sf)
