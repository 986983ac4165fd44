"""Randomized cross-engine checks (hypothesis): d08 and t09 must
agree with their DuckDB oracles on ARBITRARY small corpora, not just
the sf testdata and the hand-planted cases — the generator aims at
tokenization edges (repeated/multi-space runs, empty tokens, single
tokens, shared fragments, NULLs, exact copies)."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from common_crawl___autumn_2025_spark.operators.dedup import (
    _D08_ORACLE,
    d08_exact_substring,
)
from common_crawl___autumn_2025_spark.operators.textquality import (
    _T09_ORACLE,
    t09_decontaminate,
)

# a small shared vocabulary makes cross-doc chunk/gram collisions
# likely; '' (from double spaces) exercises the empty-token edge
_WORD = st.sampled_from(["aa", "bb", "cc", "dd", "the", "x9", ""])
_DOC = st.lists(_WORD, min_size=0, max_size=30).map(" ".join)
_CORPUS = st.lists(
    st.one_of(st.none(), _DOC), min_size=1, max_size=14
)


def _run_both(spark, tmp_path, texts, engine_fn, oracle_sql):
    sf = str(tmp_path / "sf")
    rows = list(enumerate(texts))
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(sf + "/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    engine = [tuple(r) for r in engine_fn(spark, sf).collect()]
    oracle = [tuple(r) for r in con.sql(oracle_sql).fetchall()]
    return engine, oracle


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_d08_randomized_corpus_matches_oracle(spark, tmp_path, texts):
    # duplicate one doc verbatim so cross-doc duplication often fires
    texts = list(texts) + [texts[0]]
    engine, oracle = _run_both(
        spark, tmp_path, texts, d08_exact_substring, _D08_ORACLE
    )
    assert engine == oracle


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_t09_randomized_corpus_matches_oracle(spark, tmp_path, texts):
    # EVAL side (ids 0..9): the generated corpus, cycled; TRAIN side:
    # two pinned tokenizable docs (ids 10, 11 — so a short or all-NULL
    # generation cannot make the test vacuous) FOLLOWED by the whole
    # generated corpus again (ids 12+), so the randomized edge cases
    # (NULL text, empty tokens, multi-space runs) exercise the
    # train-side gram/scoring path too, not just the eval side
    texts = (
        [texts[i % len(texts)] for i in range(10)]
        + ["aa bb cc dd the x9", "the the cc dd aa bb aa"]
        + list(texts)
    )
    engine, oracle = _run_both(
        spark, tmp_path, texts, t09_decontaminate, _T09_ORACLE
    )
    assert engine == oracle
    assert len(engine) >= 2  # the pinned train docs are always scored


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_t12_randomized_corpus_matches_oracle(spark, tmp_path, texts):
    """t12's model fit (top-K with tie-break), OOV floor, and rounded
    averages must agree with DuckDB on arbitrary corpora — including
    all-empty docs (zero tokens -> no output row), NULLs, and vocab
    smaller than the cap."""
    from common_crawl___autumn_2025_spark.operators.textquality import (
        _T12_ORACLE,
        t12_unigram_logprob,
    )

    engine, oracle = _run_both(
        spark, tmp_path, texts, t12_unigram_logprob, _T12_ORACLE
    )
    assert sorted(engine) == sorted(oracle)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_d09_randomized_corpus_matches_oracle(spark, tmp_path, texts):
    """Incremental dedup's parity split + planted copies must agree
    with DuckDB on arbitrary corpora — duplicated docs across the
    parity boundary exercise both dup_history and dup_batch."""
    from common_crawl___autumn_2025_spark.operators.dedup import (
        _D09_ORACLE,
        d09_incremental_dedup,
    )

    texts = list(texts) + [texts[0], texts[0]]
    engine, oracle = _run_both(
        spark, tmp_path, texts, d09_incremental_dedup, _D09_ORACLE
    )
    assert sorted(engine) == sorted(oracle)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_d10_randomized_corpus_matches_oracle(spark, tmp_path, texts):
    """Cross-corpus LSH (shingles -> signatures -> bands -> join)
    must agree with the SQL chain on arbitrary corpora, including
    empty tokens, NULLs, and sub-shingle docs."""
    from common_crawl___autumn_2025_spark.operators.dedup import (
        _d10_oracle_sql,
        d10_incremental_neardup,
    )

    texts = list(texts) + [texts[0]]
    engine, oracle = _run_both(
        spark, tmp_path, texts, d10_incremental_neardup, _d10_oracle_sql()
    )
    assert sorted(engine) == sorted(oracle)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_t13_randomized_corpus_matches_oracle(spark, tmp_path, texts):
    """Per-pair contamination attribution ≡ oracle on arbitrary
    corpora; pinned tokenizable train docs keep the test non-vacuous
    (t09's harness shape)."""
    from common_crawl___autumn_2025_spark.operators.textquality import (
        _T13_ORACLE,
        t13_contamination_pairs,
    )

    texts = (
        [texts[i % len(texts)] for i in range(10)]
        + ["aa bb cc dd the x9", "the the cc dd aa bb aa"]
        + list(texts)
    )
    engine, oracle = _run_both(
        spark, tmp_path, texts, t13_contamination_pairs, _T13_ORACLE
    )
    assert sorted(engine) == sorted(oracle)
