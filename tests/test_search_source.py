"""S12 search-API source: the synthetic client's determinism and
slice/filter semantics, and the LIVE path — HttpSearchClient POSTing
through the real requests stack to a loopback server from inside
executor workers — replay-equal to the synthetic run."""

import json
import threading

import pytest

from common_crawl___autumn_2025_spark.crawl.search import (
    HttpSearchClient,
    SyntheticSearchClient,
    search_source,
)

QUERIES = [(f"company {i:03d} ltd",) for i in range(8)]


@pytest.fixture(scope="module")
def search_server():
    """Loopback POST endpoint speaking the client's contract:
    ``{"q": query}`` in, ``{"organic": [...]}`` out, computed with the
    SAME synthetic backend so live == synthetic is checkable. /err
    returns 500, /slow hangs past the client timeout."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    backend = SyntheticSearchClient()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 — stdlib naming
            n = int(self.headers.get("Content-Length", 0))
            q = json.loads(self.rfile.read(n))["q"]
            if self.path == "/err":
                self.send_response(500)
                self.end_headers()
                return
            if self.path == "/slow":
                import time

                time.sleep(2.0)
            body = json.dumps({"organic": backend.search(q)}).encode()
            try:
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except BrokenPipeError:
                pass  # /slow: the timed-out client already hung up

        def log_message(self, *a):
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_synthetic_search_deterministic_topk(spark):
    q = spark.createDataFrame(QUERIES, "query string")
    out1 = search_source(q, SyntheticSearchClient(), top_k=3).collect()
    out2 = search_source(q, SyntheticSearchClient(), top_k=3).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    per_q = {}
    for r in out1:
        per_q.setdefault(r.query, []).append(r.position)
    assert set(per_q) == {t[0] for t in QUERIES}
    for positions in per_q.values():
        assert sorted(positions) == [1, 2, 3]  # the reference's slice


def test_exclude_suffix_gate(spark):
    """Domain-label-boundary exclusion: 'gov.uk' drops gov.uk and
    *.gov.uk, keeps notgov.uk (no mid-label match) and keeps rows
    whose link has no parseable host (the gate only excludes hosts it
    positively matched)."""

    class FixedClient:
        def search(self, query):
            links = [
                "https://a.gov.uk/x",      # excluded: label boundary
                "https://gov.uk/",         # excluded: apex
                "https://A.GOV.UK/y",      # excluded: case-insensitive
                "https://gov.uk./z",       # excluded: trailing-dot FQDN
                "https://notgov.uk/",      # kept: mid-label non-match
                "https://ok.example/",     # kept
                "no-scheme-malformed",     # kept: host unparseable
            ]
            return [
                {"position": i + 1, "title": "t", "link": lk}
                for i, lk in enumerate(links)
            ]

    kept = [
        "https://notgov.uk/",
        "https://ok.example/",
        "no-scheme-malformed",
    ]
    q = spark.createDataFrame([("q1",)], "query string")
    # every spelling of the exclusion — bare, leading-dot, trailing-
    # dot, uppercase — must gate identically
    for spelling in ("gov.uk", ".gov.uk", "gov.uk.", "GOV.UK"):
        gated = search_source(
            q, FixedClient(), top_k=7, exclude_suffixes=(spelling,)
        ).collect()
        assert sorted(r.link for r in gated) == kept, spelling


def test_live_post_replay_equals_synthetic(spark, search_server):
    """Executor Python workers POST to the loopback server through the
    real requests stack; the distributed result must equal the
    synthetic client's run row-for-row."""
    q = spark.createDataFrame(QUERIES, "query string").repartition(4)
    live = sorted(
        map(
            tuple,
            search_source(
                q, HttpSearchClient(endpoint=search_server), top_k=3
            ).collect(),
        )
    )
    synth = sorted(
        map(
            tuple,
            search_source(q, SyntheticSearchClient(), top_k=3).collect(),
        )
    )
    assert live == synth and len(live) == len(QUERIES) * 3


def test_live_error_and_timeout_drop_queries(spark, search_server):
    q = spark.createDataFrame(QUERIES[:3], "query string")
    err = search_source(
        q, HttpSearchClient(endpoint=search_server + "/err"), top_k=3
    ).collect()
    assert err == []  # 500 -> dropped, never raises
    slow = search_source(
        q,
        HttpSearchClient(endpoint=search_server + "/slow", timeout_s=0.3),
        top_k=3,
    ).collect()
    assert slow == []  # read timeout -> dropped, never raises
