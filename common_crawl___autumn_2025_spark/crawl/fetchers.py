"""Injectable fetcher seam for the crawl fetch stage.

The engine's fetch ``mapInPandas`` calls a *fetcher object* instead of
the synthetic web directly, so the same distributed loop can run
against a real network by swapping one constructor argument:

- ``SyntheticFetcher`` (default): the deterministic synthetic web —
  a pure function of (config, url, attempt), exactly replayable, no
  I/O. This is what every test and bench uses.
- ``HttpFetcher``: a ``requests``-backed fetcher mirroring the
  reference's semantics (``company_number_scrape.py:17-25``: GET with
  a hard timeout, any transport error -> drop the page, never raise;
  the target probe is the same regex, ``:27-29``). The environment
  ships no network or ``requests`` package, so the import is deferred
  to the first fetch; the class is unit-tested against a fake
  transport.

Fetchers must be picklable (they ship to executors inside the fetch
closure) and pure per call w.r.t. their constructor state — retries
and speculative tasks may re-invoke them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .. import synthetic as syn
from ..canonical import canonicalize, host_of, surt

_IMG_TAG_RE = re.compile(r"<img\b[^>]*>", re.IGNORECASE)
_SRC_ATTR_RE = re.compile(r"\bsrc=[\"']([^\"']+)", re.IGNORECASE)
_ALT_ATTR_RE = re.compile(r"\balt=[\"']([^\"']*)", re.IGNORECASE)


def sniff_image_fmt(data: bytes) -> str:
    """Container sniff by magic bytes — the crawl trusts payloads,
    not URLs or Content-Type headers."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    return ""


@dataclass(frozen=True)
class SyntheticFetcher:
    """Deterministic fetcher over the synthetic web (pure function of
    the URL — see ``synthetic.fetch_page``)."""

    web: syn.WebConfig = field(default_factory=syn.WebConfig)

    def fetch(self, url: str, attempt: int = 0) -> syn.Page:
        return syn.fetch_page(self.web, url, attempt=attempt)

    def extract_links(self, page: syn.Page) -> list[str]:
        return syn.extract_links(page.html)


@dataclass(frozen=True)
class HttpFetcher:
    """Live-network fetcher with the reference's timeout/drop
    semantics: one GET per URL with a hard timeout; a transport error
    (timeout, DNS, connection reset) yields status 0 and the page is
    simply not expanded — the crawl never crashes on a bad host
    (reference: the bare ``except: return None`` drop,
    ``company_number_scrape.py:17-25``). Image payload extraction is
    out of scope here (a real pipeline fetches ``<img>`` targets in a
    second pass); the page carries html/target/links only.
    """

    timeout_s: float = 10.0
    user_agent: str = "spark-crawl-engine/0.3 (+research crawler)"
    # injectable transport: any callable (url, timeout, headers) ->
    # object with .status_code, .text and (for binaries) .content.
    # Defaults to requests.get, imported lazily (package absent in
    # this environment).
    transport: object = None
    # fill the input_hint record fields (bytes/fmt/w/h/phash/caption)
    # from the page's first <img>: one extra GET per 200-page, payload
    # sniffed by magic bytes and decoded with the engine's own codecs
    # (png/ppm/baseline-jpeg); an undecodable payload keeps its bytes
    # with w=h=0 (decode_verify flags it downstream, never crashes)
    fetch_images: bool = True

    def _get(self, url: str):
        if self.transport is not None:
            return self.transport(
                url,
                timeout=self.timeout_s,
                headers={"User-Agent": self.user_agent},
            )
        import requests  # deferred: not installed in this sandbox

        return requests.get(
            url,
            timeout=self.timeout_s,
            headers={"User-Agent": self.user_agent},
        )

    def fetch(self, url: str, attempt: int = 0) -> syn.Page:
        cu = canonicalize(url)
        page = syn.Page(url=cu, surt=surt(cu), host=host_of(cu), status=0)
        try:
            resp = self._get(cu)
        except Exception:  # noqa: BLE001 — transport errors drop the page
            return page
        page.status = int(resp.status_code)
        if page.status == 200:
            page.html = resp.text or ""
            page.target_number = syn.find_target(page.html)
            page.hrefs = syn.extract_links(page.html)
            if self.fetch_images:
                self._attach_image(page)
        return page

    def _attach_image(self, page: syn.Page) -> None:
        """Fetch + decode the page's first <img> into the input_hint
        record fields. Any failure (transport, bad payload) leaves
        the page imageless — the record row is simply absent/flagged,
        the crawl never stops for a broken image."""
        # src and alt are taken from the SAME tag: the first <img>
        # that actually has a src (pairing the first src with the
        # first alt anywhere in the document would caption image A
        # with image B's text)
        src = alt = None
        for tag_m in _IMG_TAG_RE.finditer(page.html):
            sm = _SRC_ATTR_RE.search(tag_m.group(0))
            if sm:
                src = sm.group(1)
                am = _ALT_ATTR_RE.search(tag_m.group(0))
                alt = am.group(1) if am else ""
                break
        if src is None:
            return
        img_url = canonicalize(src, base=page.url)
        if not img_url:
            return
        try:
            resp = self._get(img_url)
        except Exception:  # noqa: BLE001 — image errors never propagate
            return
        if int(resp.status_code) != 200:
            return
        data = getattr(resp, "content", b"") or b""
        fmt = sniff_image_fmt(data)
        if not fmt:
            return
        page.image_bytes = data
        page.image_fmt = fmt
        page.caption = alt or ""
        try:
            from ..codecs import decode_image, phash64

            px = decode_image(data, fmt)
            page.h, page.w = int(px.shape[0]), int(px.shape[1])
            page.phash = phash64(px)
        except Exception:  # noqa: BLE001 — undecodable: keep bytes, flag later
            page.w = page.h = 0
            page.phash = 0

    def extract_links(self, page: syn.Page) -> list[str]:
        return syn.extract_links(page.html)
