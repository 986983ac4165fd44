"""Deterministic synthetic web + image/caption record generation.

There is no network in this environment (and the reference's live
``requests.get`` fetches — ``company_number_scrape.py:17-25``,
``Scrape_Utils.py:51-57`` — are nondeterministic anyway), so the
engine models the web as a *pure function of the URL*: every page's
status, HTML, links, caption, and image payload derive from a
keyed blake2b hash of (config seed, url). Consequences:

- the single-threaded oracle crawler and the distributed Spark fetch
  stage compute byte-identical content with zero shared state,
- fetching is embarrassingly parallel at any scale (the 10^10-URL
  design point needs no driver-held graph),
- tests can replay any crawl trace exactly.

The record generator emits the engine's canonical input table
(``BASELINE.json:input_hint``):
``image_id STRING, bytes BINARY, w INT, h INT, fmt STRING,
caption STRING, phash BIGINT``.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .canonical import canonicalize, host_of, surt
from .codecs import encode_image, phash64

# ---------------------------------------------------------------------------
# keyed deterministic randomness
# ---------------------------------------------------------------------------

def h64(*parts: object) -> int:
    """Stable 64-bit hash of the joined parts (blake2b, seed-free)."""
    key = "\x1f".join(str(p) for p in parts).encode("utf-8")
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")


def rng(*parts: object) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(h64(*parts)))


VOCAB = (
    "analytics crawl frontier spark parquet arrow shuffle partition broadcast "
    "filter lambda tungsten catalyst iceberg snapshot lineage manifest bloom "
    "cuckoo politeness robots delay budget host domain registered suffix "
    "caption image pixel channel gradient texture contrast entropy histogram "
    "company limited registered kingdom street postcode accounts incorporation "
    "quality language token shingle jaccard cosine minhash simhash duplicate "
    "vector embedding cluster bucket probe scan predicate pushdown codegen"
).split()

KEYWORDS = ("about", "contact", "legal", "imprint", "terms", "privacy")
TLDS = ("com", "co.uk", "org", "net", "org.uk", "io")
AGGREGATOR_HOSTS = (
    "www.directory-hub.com",
    "www.biz-listings.co.uk",
    "www.company-index.org",
)
GOV_HOSTS = ("www.stats.gov.uk", "www.registry.gov.uk")


# ---------------------------------------------------------------------------
# image + caption payloads
# ---------------------------------------------------------------------------

def make_smooth_image(key: int, min_side: int = 16, max_side: int = 48) -> np.ndarray:
    """Deterministic low-frequency RGB image — realistic content for
    chroma-subsampled JPEG paths. ``make_image``'s per-pixel Gaussian
    noise and saturated high-frequency chroma are exactly what 4:2:0
    discards by design (any encoder, libjpeg included, lands ~20 dB
    on it), so the subsampled-codec invariants verify on content
    whose chroma a web image actually has: smooth, low-frequency."""
    g = np.random.Generator(np.random.PCG64(key))
    h = int(g.integers(min_side, max_side + 1))
    w = int(g.integers(min_side, max_side + 1))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 127.5 + 80.0 * np.sin(
        2 * np.pi * (0.08 * xx + 0.05 * yy) + g.uniform(0, 2 * np.pi)
    )
    img = np.zeros((h, w, 3), dtype=np.float64)
    for c in range(3):
        fx, fy = g.uniform(0.01, 0.05, size=2)
        tint = 127.5 + 70.0 * np.sin(
            2 * np.pi * (fx * xx + fy * yy) + g.uniform(0, 2 * np.pi)
        )
        img[:, :, c] = 0.6 * base + 0.4 * tint
    return np.clip(img, 0, 255).astype(np.uint8)


def make_image(key: int, min_side: int = 8, max_side: int = 32) -> np.ndarray:
    """Deterministic smooth-ish RGB test image for a 64-bit key."""
    g = np.random.Generator(np.random.PCG64(key))
    h = int(g.integers(min_side, max_side + 1))
    w = int(g.integers(min_side, max_side + 1))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3), dtype=np.float64)
    for c in range(3):
        fx, fy = g.uniform(0.05, 0.6, size=2)
        phase = g.uniform(0, 2 * np.pi)
        base = 127.5 + 90.0 * np.sin(2 * np.pi * (fx * xx + fy * yy) + phase)
        img[:, :, c] = base + g.normal(0, 12.0, size=(h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def make_caption(key: int, min_words: int = 5, max_words: int = 12) -> str:
    g = np.random.Generator(np.random.PCG64(key))
    n = int(g.integers(min_words, max_words + 1))
    return " ".join(VOCAB[int(i)] for i in g.integers(0, len(VOCAB), size=n))


DEFAULT_FMTS = ("png", "ppm")


def record_for_key(
    image_id: str, key: int, fmts: tuple[str, ...] = DEFAULT_FMTS
) -> dict:
    """One canonical record row (input_hint schema) for a stable key.

    ``fmts`` is the encoding cycle (``fmts[key % len]``); the default
    keeps the historical png/ppm parity so existing traces and bench
    inputs are unchanged, while ``("png", "ppm", "jpeg")`` exercises
    the lossy path."""
    pixels = make_image(key)
    fmt = fmts[key % len(fmts)]
    return {
        "image_id": image_id,
        "bytes": encode_image(pixels, fmt),
        "w": int(pixels.shape[1]),
        "h": int(pixels.shape[0]),
        "fmt": fmt,
        "caption": make_caption(key ^ 0x5DEECE66D),
        "phash": phash64(pixels),
    }


RECORD_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def records_pandas(
    n: int, seed: int = 42, fmts: tuple[str, ...] = DEFAULT_FMTS
) -> pd.DataFrame:
    rows = [
        record_for_key(f"img{i:09d}", h64(seed, "record", i), fmts=fmts)
        for i in range(n)
    ]
    return pd.DataFrame(rows)


def records_df(
    spark,
    n: int,
    seed: int = 42,
    partitions: int | None = None,
    fmts: tuple[str, ...] = DEFAULT_FMTS,
):
    """Distributed canonical-record table: spark.range -> mapInPandas.

    Each row is generated independently from (seed, id), so this
    scales linearly with executors — no driver-side materialization.
    """
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [
                record_for_key(
                    f"img{int(i):09d}", h64(seed, "record", int(i)), fmts=fmts
                )
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# synthetic web
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WebConfig:
    """Parameters of the deterministic synthetic web."""

    seed: int = 42
    n_hosts: int = 100
    zipf_max_pages: int = 60      # filler pages on the biggest host (Zipf skew)
    zipf_alpha: float = 0.9
    homepage_target_rate: float = 0.15   # P(company number on homepage)
    subpage_target_rate: float = 0.35
    fetch_failure_rate: float = 0.02
    image_min: int = 8
    image_max: int = 32


@dataclass
class Page:
    """One fetched page: everything the fetch stage emits."""

    url: str
    surt: str
    host: str
    status: int
    html: str = ""
    caption: str = ""
    image_bytes: bytes = b""
    image_fmt: str = ""
    w: int = 0
    h: int = 0
    phash: int = 0
    target_number: str = ""      # 8-digit marker if present ('' otherwise)
    hrefs: list[str] = field(default_factory=list)


def host_name(cfg: WebConfig, i: int) -> str:
    tld = TLDS[h64(cfg.seed, "tld", i) % len(TLDS)]
    return f"www.acme{i:04d}.{tld}"


def n_filler_pages(cfg: WebConfig, i: int) -> int:
    # Zipfian pages-per-host: host rank 1 gets zipf_max_pages, the
    # tail gets ~1 — reproduces the parent-site skew the reference's
    # own EDA measures (Common_Crawl_EDA.py:44-50).
    return max(1, int(cfg.zipf_max_pages / (i + 1) ** cfg.zipf_alpha))


def host_keyword_pages(cfg: WebConfig, host: str) -> list[str]:
    g = rng(cfg.seed, "kw", host)
    k = int(g.integers(2, len(KEYWORDS) + 1))
    idx = sorted(g.choice(len(KEYWORDS), size=k, replace=False).tolist())
    return [KEYWORDS[i] for i in idx]


def seed_urls(cfg: WebConfig, n_seeds: int) -> list[str]:
    """Ordered seed list (order is part of the crawl contract —
    reference iterates seeds in list order, company_number_scrape.py:43).
    Mix of scheme-less / http / https forms to exercise canonicalization.
    """
    out = []
    for i in range(min(n_seeds, cfg.n_hosts)):
        host = host_name(cfg, i)
        style = h64(cfg.seed, "seedstyle", i) % 3
        if style == 0:
            out.append(host)  # scheme-less (reference defaults http://, :44)
        elif style == 1:
            out.append(f"http://{host}/")
        else:
            out.append(f"https://{host}")
    return out


def _host_index(cfg: WebConfig, host: str) -> int | None:
    # invert host_name: acme{i:04d} (4-digit zero-pad below 10000,
    # naturally longer above — parse all digits, not a fixed slice)
    h = host.lower()
    if h.startswith("www."):
        h = h[4:]
    m = re.match(r"acme(\d+)\.", h)
    if not m:
        return None
    i = int(m.group(1))
    if 0 <= i < cfg.n_hosts and host_name(cfg, i).endswith(h):
        return i
    return None


def page_target_number(cfg: WebConfig, url_surt: str, is_home: bool) -> str:
    rate = cfg.homepage_target_rate if is_home else cfg.subpage_target_rate
    if (h64(cfg.seed, "target", url_surt) % 10_000) < rate * 10_000:
        return f"{h64(cfg.seed, 'num', url_surt) % 100_000_000:08d}"
    return ""


def _page_hrefs(cfg: WebConfig, host: str, path: str, i_host: int) -> list[str]:
    """Deterministic outlinks. Homepage links the keyword pages plus
    noise; subpages mostly link noise + a couple of fillers."""
    g = rng(cfg.seed, "links", host, path)
    hrefs: list[str] = []
    is_home = path == "/"
    keyword_pages = host_keyword_pages(cfg, host)
    if is_home:
        for kw in keyword_pages:
            # relative and absolute forms both appear (urljoin fixture)
            if g.integers(0, 2) == 0:
                hrefs.append(f"/{kw}")
            else:
                hrefs.append(f"http://{host}/{kw}")
        # a keyword link that is OFF the registered domain (must be
        # rejected by the same-registered-domain scope filter, P9)
        other = host_name(cfg, (i_host + 7) % cfg.n_hosts)
        hrefs.append(f"http://{other}/about")
    elif path.lstrip("/") in keyword_pages:
        # keyword pages cross-link each other (re-discoveries the
        # seen-set must dedup) and link a depth-2 detail page (new
        # work for depth>1 crawls; href contains the keyword so the
        # admission filter passes)
        for kw in keyword_pages:
            if f"/{kw}" != path and g.integers(0, 2) == 0:
                hrefs.append(f"/{kw}")
        if g.integers(0, 2) == 0:
            hrefs.append(f"{path}/details")
    # same-domain non-keyword fillers (rejected by keyword filter P10)
    for _ in range(int(g.integers(1, 4))):
        hrefs.append(f"/page/{int(g.integers(0, max(1, n_filler_pages(cfg, i_host))))}")
    # robots-disallowed area
    if g.integers(0, 3) == 0:
        hrefs.append("/private/area")
    # .gov.uk (scope-excluded, P6) and aggregator/blacklist (P7) noise
    if g.integers(0, 2) == 0:
        hrefs.append(f"https://{GOV_HOSTS[int(g.integers(0, len(GOV_HOSTS)))]}/data")
    if g.integers(0, 2) == 0:
        agg = AGGREGATOR_HOSTS[int(g.integers(0, len(AGGREGATOR_HOSTS)))]
        hrefs.append(f"http://{agg}/listing/{host}")
    return hrefs


def fetch_page(cfg: WebConfig, url: str, attempt: int = 0) -> Page:
    """THE synthetic fetcher: pure function (cfg, url, attempt) -> Page.

    Plays the role of the reference's ``get_html``
    (``company_number_scrape.py:17-25``): returns status 200 + HTML,
    404 for nonexistent pages, or 503 for the deterministic failure
    fraction (the reference drops failures after 3 backoff retries,
    ``Matching_P1.py:298-327``). ``attempt`` models transient
    failures: the failure draw re-rolls per attempt (attempt 0 keeps
    the historical hash so existing traces are unchanged), while page
    CONTENT is attempt-independent — a retry that succeeds sees the
    same page the first attempt would have.
    """
    cu = canonicalize(url)
    s = surt(cu)
    host = host_of(cu)
    i_host = _host_index(cfg, host)
    page = Page(url=cu, surt=s, host=host, status=404)
    if i_host is None:
        return page
    from urllib.parse import urlparse

    path = urlparse(cu).path or "/"
    keyword_pages = host_keyword_pages(cfg, host)
    valid = (
        path == "/"
        or path.lstrip("/") in keyword_pages
        or any(path == f"/{kw}/details" for kw in keyword_pages)
        or (
            path.startswith("/page/")
            and path[6:].isdigit()
            and int(path[6:]) < n_filler_pages(cfg, i_host)
        )
        or path == "/private/area"
    )
    if not valid:
        return page
    fail_key = (
        h64(cfg.seed, "fail", s)
        if attempt == 0
        else h64(cfg.seed, "fail", s, attempt)
    )
    if (fail_key % 10_000) < cfg.fetch_failure_rate * 10_000:
        page.status = 503
        return page

    is_home = path == "/"
    key = h64(cfg.seed, "page", s)
    caption = make_caption(key ^ 0xCA9710)
    target = page_target_number(cfg, s, is_home)
    hrefs = _page_hrefs(cfg, host, path, i_host)
    pixels = make_image(key, cfg.image_min, cfg.image_max)
    fmt = "png" if key % 2 == 0 else "ppm"

    body = [f"<html><head><title>acme {i_host} {path}</title></head><body>"]
    body.append(f"<p>{caption}</p>")
    if target:
        body.append(f"<p>Company Number {target} registered in the UK.</p>")
    for href in hrefs:
        body.append(f'<a href="{href}">link {href}</a>')
    body.append(f'<img src="/img/{h64(key):x}.{fmt}">')
    body.append("</body></html>")

    page.status = 200
    page.html = "\n".join(body)
    page.caption = caption
    page.image_bytes = encode_image(pixels, fmt)
    page.image_fmt = fmt
    page.w = int(pixels.shape[1])
    page.h = int(pixels.shape[0])
    page.phash = phash64(pixels)
    page.target_number = target
    page.hrefs = hrefs
    return page


def robots_for_host(cfg: WebConfig, host: str) -> tuple[list[str], float]:
    """(disallow prefixes, crawl_delay seconds) — deterministic per host.

    Engine-new politeness config; the reference's analog is its
    sequential per-site loop + 60 s backoff (Matching_P1.py:317-327).
    """
    g = rng(cfg.seed, "robots", host)
    delays = (0.25, 0.5, 1.0, 2.0)
    delay = delays[int(g.integers(0, len(delays)))]
    disallow = ["/private"]
    if g.integers(0, 5) == 0:
        disallow.append("/legal")
    return disallow, delay


def robots_pandas(cfg: WebConfig, n_hosts: int | None = None) -> pd.DataFrame:
    rows = []
    for i in range(n_hosts or cfg.n_hosts):
        host = host_name(cfg, i)
        disallow, delay = robots_for_host(cfg, host)
        rows.append({"host": host, "disallow": disallow, "crawl_delay": delay})
    return pd.DataFrame(rows)


def extract_links(html: str) -> list[str]:
    """href extraction from the synthetic HTML (regex — our HTML is
    regular by construction; reference uses BeautifulSoup,
    ``company_number_scrape.py:31-37``)."""
    import re

    return re.findall(r'<a href="([^"]+)"', html or "")


TARGET_RE = r"Company Number (\d{8})"


def find_target(html: str) -> str:
    """The reference's company-number regex probe
    (``company_number_scrape.py:10,27-29``)."""
    import re

    m = re.search(TARGET_RE, html or "")
    return m.group(1) if m else ""
