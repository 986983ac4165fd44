"""Loopback-HTTP integration: the LIVE fetch paths (HttpFetcher and
build_robots_table through the real ``requests`` stack — sockets,
timeouts, charsets, binary payloads) against a stdlib ``http.server``
on 127.0.0.1, replay-equal to the same crawl run through the fake
transport seam (VERDICT r4 "Next round" #7: both live paths were
previously verified only against fake transports)."""

from __future__ import annotations

import shutil
import tempfile
import threading
import time

import numpy as np
import pytest

from common_crawl___autumn_2025_spark.codecs import (
    decode_image,
    encode_png,
    phash64,
)
from common_crawl___autumn_2025_spark.crawl.fetchers import HttpFetcher
from common_crawl___autumn_2025_spark.crawl.robots import build_robots_table

pytestmark = pytest.mark.usefixtures("spark")

IMG_PIXELS = np.arange(16 * 12 * 3, dtype=np.uint8).reshape(16, 12, 3)
IMG_BYTES = encode_png(IMG_PIXELS)

ROBOTS_BODY = b"User-agent: *\nDisallow: /private\nCrawl-delay: 0.25\n"

# path -> (status, content-type, body). One page is latin-1 with an
# explicit charset (requests must decode it per header), the rest are
# utf-8; /img.png is a real PNG payload; /slow sleeps past timeouts.
SITE: dict[str, tuple[int, str, bytes]] = {
    "/robots.txt": (200, "text/plain; charset=utf-8", ROBOTS_BODY),
    "/": (
        200,
        "text/html; charset=utf-8",
        b"<html><body>home"
        b'<a href="/contact">contact</a>'
        b'<a href="/about">about</a>'
        b'<a href="/misc">misc</a>'  # no keyword: admission drops it
        b"</body></html>",
    ),
    "/contact": (
        200,
        "text/html; charset=iso-8859-1",
        "<html><body>bureau caf\xe9 Company Number 12345678"
        '<img src="/img.png" alt="lobby photo"></body></html>'.encode(
            "iso-8859-1"
        ),
    ),
    "/about": (
        200,
        "text/html; charset=utf-8",
        b'<html><body>about us<img src="/broken.png" alt="x"></body></html>',
    ),
    "/img.png": (200, "image/png", IMG_BYTES),
    "/broken.png": (404, "text/plain; charset=utf-8", b"gone"),
    "/err": (500, "text/plain; charset=utf-8", b"boom"),
}


@pytest.fixture(scope="module")
def server():
    """ThreadingHTTPServer on an ephemeral 127.0.0.1 port serving
    SITE; yields the netloc (host:port)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — stdlib naming
            path = self.path.split("?", 1)[0]
            if path == "/slow":
                time.sleep(1.5)
                path = "/"
            status, ctype, body = SITE.get(
                path, (404, "text/plain; charset=utf-8", b"not found")
            )
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence per-request stderr spam
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        yield f"127.0.0.1:{httpd.server_address[1]}"
    finally:
        httpd.shutdown()
        httpd.server_close()


def FakeSiteTransport(netloc: str):
    """The fake-transport twin of the loopback server: same SITE dict,
    requests-compatible response surface, timeout simulation for
    /slow. Defined INSIDE a factory so cloudpickle serializes the
    class by VALUE — executors cannot import the test module, so a
    module-level class would fail to unpickle in the fetch closure."""
    site = dict(SITE)

    class _Transport:
        def __call__(self, url: str, timeout=None, headers=None):
            path = url.split(netloc, 1)[1] or "/"
            path = path.split("?", 1)[0]
            if path == "/slow":
                raise TimeoutError("simulated read timeout")
            status, ctype, body = site.get(
                path, (404, "text/plain; charset=utf-8", b"not found")
            )
            charset = (
                ctype.split("charset=", 1)[1]
                if "charset=" in ctype
                else "iso-8859-1"
            )

            class _Resp:
                status_code = status
                content = body
                text = body.decode(charset, errors="replace")

            return _Resp()

    return _Transport()


def _page_tuple(p):
    return (
        p.status, p.html, p.target_number, tuple(p.hrefs or ()),
        p.image_bytes, p.image_fmt, p.caption, p.w, p.h, p.phash,
    )


def test_http_fetcher_real_socket_equals_fake_transport(server):
    """Every SITE page fetched through the real requests stack equals
    the fake-transport fetch field-for-field — including the latin-1
    charset decode and the real PNG payload round-trip."""
    real = HttpFetcher(timeout_s=5.0)
    fake = HttpFetcher(transport=FakeSiteTransport(server))
    for path in ("/", "/contact", "/about", "/err", "/nope"):
        url = f"http://{server}{path}"
        a, b = real.fetch(url), fake.fetch(url)
        assert _page_tuple(a) == _page_tuple(b), path
    page = real.fetch(f"http://{server}/contact")
    assert page.target_number == "12345678"
    assert "caf\xe9" in page.html  # charset honored by real decode
    assert page.image_bytes == IMG_BYTES and page.image_fmt == "png"
    assert page.caption == "lobby photo"
    assert (page.h, page.w) == IMG_PIXELS.shape[:2]
    assert page.phash == phash64(decode_image(IMG_BYTES, "png"))
    # broken image link: page fetched, record imageless
    about = real.fetch(f"http://{server}/about")
    assert about.status == 200 and not about.image_bytes


def test_http_fetcher_real_timeout_drops(server):
    """A genuine socket read timeout maps to status 0 (drop, never
    raise) — the reference's transport-error semantics, now exercised
    through a real stuck socket."""
    real = HttpFetcher(timeout_s=0.2)
    page = real.fetch(f"http://{server}/slow")
    assert page.status == 0 and page.html == ""


def test_build_robots_table_real_socket(spark, server):
    """Live robots ingestion through real requests == fake transport,
    and the parsed rules match the served body."""
    hosts = spark.createDataFrame([(server,)], "host string")
    real_rows = build_robots_table(spark, hosts).collect()
    fake_rows = build_robots_table(
        spark, hosts, transport=FakeSiteTransport(server)
    ).collect()
    assert [tuple(r) for r in real_rows] == [tuple(r) for r in fake_rows]
    [r] = real_rows
    assert r.disallow == ["/private"] and r.crawl_delay == 0.25


def test_live_crawl_replay_equals_fake_transport(spark, server):
    """Full CrawlEngine rounds fetching from the loopback server via
    the REAL requests stack inside executor Python workers, replay-
    equal (fetch log + records) to the fake-transport run, with the
    live-built robots table driving politeness."""
    from common_crawl___autumn_2025_spark.crawl.frontier import (
        CrawlEngine,
        CrawlSpec,
    )

    host = server.split(":", 1)[0]  # frontier host column drops the port
    hosts = spark.createDataFrame([(server,)], "host string")
    robots_df = (
        build_robots_table(spark, hosts)
        .toPandas()
        .assign(host=host)
    )
    robots_df = spark.createDataFrame(
        robots_df, "host string, disallow array<string>, crawl_delay double"
    )
    spec = CrawlSpec(max_depth=1, max_rounds=2)
    seeds = [f"http://{server}/"]

    def run(fetcher):
        root = tempfile.mkdtemp(prefix="live_crawl_")
        try:
            eng = CrawlEngine(
                spark, spec, root, robots=robots_df, partitions=2,
                fetcher=fetcher,
            )
            eng.run(seeds)
            log = sorted(
                (row.round, row.host, row.seq, row.surt, row.status,
                 row.fetch_ts_offset, row.target_number)
                for r in range(eng.store.latest_round() + 1)
                for row in eng.store.read_table(r, "fetch_log").collect()
            )
            recs = sorted(
                (row.image_id, bytes(row.bytes), row.fmt, row.caption,
                 row.w, row.h, row.phash)
                for r in range(eng.store.latest_round() + 1)
                for row in eng.store.read_table(r, "records").collect()
            )
            return log, recs
        finally:
            shutil.rmtree(root, ignore_errors=True)

    live_log, live_recs = run(HttpFetcher(timeout_s=5.0))
    fake_log, fake_recs = run(HttpFetcher(transport=FakeSiteTransport(server)))
    assert live_log == fake_log
    assert live_recs == fake_recs
    # shape: round 0 = seed homepage; round 1 = /about + /contact
    # (keyword-admitted links), 0.25s crawl-delay spacing
    assert len(live_log) == 3
    assert [r[0] for r in live_log] == [0, 1, 1]
    round1 = [r for r in live_log if r[0] == 1]
    assert {r[5] for r in round1} == {0.0, 0.25}
    assert {r[6] for r in live_log if r[6]} == {"12345678"}
    # exactly one record carries a payload: /contact's PNG + caption
    # (every 200-page gets a record row; imageless ones are empty)
    [(img_id, data, fmt, caption, w, h, ph)] = [
        r for r in live_recs if r[1]
    ]
    assert data == IMG_BYTES and fmt == "png" and caption == "lobby photo"
