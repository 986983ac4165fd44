"""t11 BM25 + w07 native session windows: engine ≡ DuckDB oracle on
the sf corpus, plus planted corpora pinning the semantics the sf data
might not exercise (exact 30-minute gap boundaries at microsecond
precision; BM25 ranking monotonicity)."""

import datetime as dt

import duckdb
import pytest

from common_crawl___autumn_2025_spark.plans.retrieval import (
    _BM25_ORACLE,
    _W07_ORACLE,
    t11_bm25_topk,
    w07_session_window_native,
)


def _oracle_rows(sql, views):
    con = duckdb.connect()
    for name, path in views.items():
        # testdata tables are flat files; Spark-written ones are dirs
        import os

        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')"
        )
    try:
        return sorted(tuple(r) for r in con.sql(sql).fetchall())
    finally:
        con.close()


def _engine_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_t11_matches_oracle_on_sf(spark, sf_dir):
    engine = _engine_rows(t11_bm25_topk(spark, sf_dir))
    oracle = _oracle_rows(
        _BM25_ORACLE, {"documents": f"{sf_dir}/documents.parquet"}
    )
    assert engine == oracle
    assert len(engine) > 0


def test_w07_matches_oracle_on_sf(spark, sf_dir):
    engine = _engine_rows(w07_session_window_native(spark, sf_dir))
    oracle = _oracle_rows(
        _W07_ORACLE, {"events": f"{sf_dir}/events.parquet"}
    )
    assert engine == oracle
    assert len(engine) > 0


def test_t11_ranking_is_sane(spark, tmp_path):
    # doc 0: saturated in q1 terms; doc 1: one q1 term; doc 2: none.
    texts = [
        (0, "vector window merge vector window merge vector"),
        (1, "vector table table table"),
        (2, "customer filter slow"),
        (3, "the quick brown fox"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(texts, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = t11_bm25_topk(spark, sf)
    rows = {
        (r.query_id, r.doc_id): (r.score, r.rank) for r in out.collect()
    }
    # q1 hits docs 0 and 1 only, doc 0 first; doc 3 appears nowhere
    assert rows[("q1", 0)][1] == 1
    assert rows[("q1", 1)][1] == 2
    assert ("q1", 2) not in rows and ("q1", 3) not in rows
    assert rows[("q2", 2)][1] == 1
    # engine ≡ oracle on the planted corpus too
    assert _engine_rows(out) == _oracle_rows(
        _BM25_ORACLE, {"documents": f"{sf}/documents.parquet"}
    )


@pytest.fixture()
def boundary_events(spark, tmp_path):
    """Three users around the 30-min gap at microsecond precision:
    u1 gap exactly 1800 s (merges — session_window's extent is closed
    at its end), u2 gap 1799.999999 s (merges), u3 gap 1800.000001 s
    (new session)."""
    t0 = dt.datetime(2025, 3, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, 1.0),
        (2, t0 + dt.timedelta(seconds=1800), 1, 2.0),
        (3, t0, 2, 1.0),
        (4, t0 + dt.timedelta(seconds=1800, microseconds=-1), 2, 2.0),
        (5, t0, 3, 1.0),
        (6, t0 + dt.timedelta(seconds=1800, microseconds=1), 3, 2.0),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).write.parquet(f"{sf}/events.parquet")
    return sf


def test_w07_gap_boundary_semantics(spark, boundary_events):
    sf = boundary_events
    out = _engine_rows(w07_session_window_native(spark, sf))
    sessions_per_user = {}
    for row in out:
        sessions_per_user[row[0]] = sessions_per_user.get(row[0], 0) + 1
    # only the strictly-greater 1800+1us gap splits; exactly-1800
    # and 1800-1us merge (Spark merges ts <= last_ts + gap)
    assert sessions_per_user == {1: 1, 2: 1, 3: 2}
    assert out == _oracle_rows(
        _W07_ORACLE, {"events": f"{sf}/events.parquet"}
    )


def test_w08_sliding_window_semantics(spark, tmp_path):
    """Every event lands in EXACTLY window/slide = 4 windows; an
    event precisely on a slide boundary starts its own window
    (end-exclusive: it does NOT appear in the window ending at its
    timestamp)."""
    import datetime as dt

    base = dt.datetime(2024, 4, 1, 12, 0, 0)  # exact 15-min boundary
    rows = [
        (0, base, 1, "click", 1.0, None),
        (1, base + dt.timedelta(minutes=7), 1, "click", 2.0, None),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(sf + "/events.parquet")

    from common_crawl___autumn_2025_spark.plans.retrieval import (
        w08_sliding_window,
    )

    out = w08_sliding_window(spark, sf).collect()
    # 2 events x 4 windows, but they share 12:00/11:45-started windows
    assert sum(r.n for r in out) == 8
    starts_with_both = [r for r in out if r.n == 2]
    assert len(starts_with_both) == 4  # the 4 shared windows
    # end-exclusive: no window ENDING at 12:00 contains the base event
    for r in out:
        assert r.window_end > base
    # the latest window containing base starts exactly at 12:00
    assert max(r.window_start for r in out) == base
