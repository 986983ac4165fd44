"""Non-ASCII corpora through the xxh64-backed oracles (r5 verdict
item #4).

Through round 5 the XXH64 SQL unroll read bytes as ``unicode(char)``,
exact only for ASCII — a real multilingual corpus would silently
diverge. The unroll now extracts true UTF-8 bytes (hex(encode(s))),
so engine ≡ oracle must hold on accented/CJK/emoji text. Pinned
three ways: the unit hash against the Python mirror (hypothesis over
arbitrary unicode), and the full d03 / d08 / t09 operators against
their DuckDB oracles on a planted multilingual corpus.
"""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from common_crawl___autumn_2025_spark.crawl.hashing import xxh64_str
from common_crawl___autumn_2025_spark.functions.xxh64_sql import xxh64_ctes
from common_crawl___autumn_2025_spark.operators.dedup import (
    _D08_ORACLE,
    CHUNK,
    _d03_oracle_sql,
    d03_minhash_lsh,
    d08_exact_substring,
)
from common_crawl___autumn_2025_spark.operators.textquality import (
    _T09_ORACLE,
    NGRAM,
    t09_decontaminate,
)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            # printable unicode incl. accents/CJK/emoji; exclude
            # surrogates (not encodable) — everything else is fair
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_duckdb_xxh64_utf8_matches_python_hypothesis(strs):
    """SQL-unrolled XXH64 == Python mirror (itself Spark-pinned) for
    ARBITRARY unicode, not just ASCII."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(sid INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(strs)))
    ctes, final = xxh64_ctes("hu", "t", ["sid"])
    rows = con.sql(f"WITH {ctes} SELECT sid, h FROM {final} ORDER BY sid").fetchall()
    assert len(rows) == len(strs)
    for sid, h in rows:
        assert int(h) == xxh64_str(strs[sid]), repr(strs[sid])


def _write_docs(spark, tmp_path, rows):
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


def _multilingual_rows():
    """Docs long enough for d03 shingles (>=3 tokens), d08 chunks
    (>=CHUNK tokens) and t09 grams (>=NGRAM tokens), with planted
    cross-doc duplication so the operators emit non-trivial output.
    Tokens are accented/CJK/Cyrillic/emoji — every shingle the
    oracles hash is multi-byte."""
    cjk = "漢字 渋谷 寿司 東京 大阪 こんにちは 世界 平和 未来 技術".split()
    acc = "café naïve déjà-vu fiancée Zürich übermäßig São niño".split()
    cyr = "привет мир данные поток модель обучение корпус".split()
    emo = "☕ 🌍 🚀 ✨".split()
    docs = []
    # eval split (doc_id < EVAL_MAX_ID=10): CJK text whose grams will
    # contaminate train doc 20
    docs.append((0, " ".join(cjk), "zh", "wiki"))
    docs.append((1, " ".join(acc + cyr[:3]), "fr", "web"))
    # train docs: 20 repeats doc 0's gram run (contaminated), 21/22
    # share an exact CHUNK-token chunk (d08 duplicates), 23 is unique
    docs.append((20, " ".join(cjk[: NGRAM + 2]) + " " + " ".join(emo), "zh", "web"))
    shared = (cyr + acc + cjk)[:CHUNK]
    assert len(shared) == CHUNK
    docs.append((21, " ".join(shared) + " " + " ".join(f"уник{i}" for i in range(CHUNK)), "ru", "web"))
    docs.append((22, " ".join(f"тишина{i}" for i in range(CHUNK)) + " " + " ".join(shared), "ru", "crawl"))
    docs.append((23, " ".join(f"独自{i}" for i in range(3 * CHUNK)), "zh", "crawl"))
    # near-duplicate pair for d03 (one token differs)
    base = acc + cjk + cyr
    docs.append((24, " ".join(base), "mul", "web"))
    swapped = list(base)
    swapped[5] = "ðifferent"
    docs.append((25, " ".join(swapped), "mul", "web"))
    return docs


def test_d08_nonascii_engine_matches_oracle(spark, tmp_path):
    sf, con = _write_docs(spark, tmp_path, _multilingual_rows())
    engine = [tuple(r) for r in d08_exact_substring(spark, sf).collect()]
    oracle = [tuple(r) for r in con.sql(_D08_ORACLE).fetchall()]
    assert engine == oracle
    got = {r[0]: r for r in engine}
    # the planted shared chunk is found (docs 21 and 22 each have >=1
    # duplicated chunk)
    assert got[21][2] >= 1 and got[22][2] >= 1


def test_t09_nonascii_engine_matches_oracle(spark, tmp_path):
    sf, con = _write_docs(spark, tmp_path, _multilingual_rows())
    engine = [tuple(r) for r in t09_decontaminate(spark, sf).collect()]
    oracle = [tuple(r) for r in con.sql(_T09_ORACLE).fetchall()]
    assert engine == oracle
    got = {r[0]: r for r in engine}
    assert got[20][3] is True        # planted CJK contamination found
    assert got[23][3] is False       # unique doc is clean


def test_d10_nonascii_engine_matches_oracle(spark, tmp_path):
    """The incremental cross-corpus LSH inherits the same UTF-8
    byte-exact oracle chain as d03: history = even docs (0, 20, 22,
    24), batch = odd docs + the planted copies/variants of even ids
    < 40 — the near-dup pair (24 history, 25 batch) must surface as
    a cross-corpus candidate, and the planted exact copy of doc 24
    is guaranteed-detected."""
    from common_crawl___autumn_2025_spark.operators.dedup import (
        _d10_oracle_sql,
        d10_incremental_neardup,
    )

    sf, con = _write_docs(spark, tmp_path, _multilingual_rows())
    engine = sorted(
        tuple(r) for r in d10_incremental_neardup(spark, sf).collect()
    )
    oracle = sorted(tuple(r) for r in con.sql(_d10_oracle_sql()).fetchall())
    assert engine == oracle
    pairs = set(engine)
    assert (25, 24) in pairs          # multilingual near-dup, cross-corpus
    assert (2000024, 24) in pairs     # exact copy: all bands collide


def test_d03_nonascii_engine_matches_oracle(spark, tmp_path):
    sf, con = _write_docs(spark, tmp_path, _multilingual_rows())
    engine = sorted(
        tuple(r) for r in d03_minhash_lsh(spark, sf).collect()
    )
    oracle = sorted(tuple(r) for r in con.sql(_d03_oracle_sql()).fetchall())
    assert engine == oracle
    # the planted near-dup pair (24, 25) is an LSH candidate
    assert any(r[0] == 24 and r[1] == 25 for r in engine), engine
