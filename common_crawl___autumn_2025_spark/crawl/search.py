"""Injectable search-API source (SURVEY §2.1-S12).

The reference's search stage POSTs a query to a search API and gets
structured JSON back — ranked results with position/title/link — then
keeps the top 3 and domain-filters them before scraping
(``Scrape_Utils.py:204-248`` for the POST, ``Search_scrape_P1.py:118``
for the top-k slice, ``:141`` for the ``.gov.uk`` domain gate). This
module is that source with the same seam discipline as the fetch
stage (``crawl/fetchers.py``): a *client object* the distributed scan
calls, so the identical plan runs against the deterministic synthetic
backend in tests and a real endpoint in production by swapping one
constructor argument.

Clients must be picklable (they ship to executors inside the scan
closure) and pure per call w.r.t. constructor state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import synthetic as syn

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query", T.StringType()),
        T.StructField("position", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("link", T.StringType()),
    ]
)


@dataclass(frozen=True)
class SyntheticSearchClient:
    """Deterministic ranked results as a pure function of the query
    (the same replayability discipline as ``SyntheticFetcher``): each
    position's host is drawn from the synthetic web by a stable hash
    of (seed, query, position) — no I/O, exactly replayable."""

    web: syn.WebConfig = field(default_factory=syn.WebConfig)
    n_results: int = 10

    def search(self, query: str) -> list[dict]:
        out = []
        for pos in range(1, self.n_results + 1):
            i = syn.h64(self.web.seed, "search", query, pos) % self.web.n_hosts
            host = syn.host_name(self.web, i)
            out.append(
                {
                    "position": pos,
                    "title": f"{host} result {pos} for {query}",
                    "link": f"https://{host}/",
                }
            )
        return out


@dataclass(frozen=True)
class HttpSearchClient:
    """Live search client mirroring the reference's semantics
    (``Scrape_Utils.py:204-248``): one JSON POST per query with a hard
    timeout; the response body is ``{"organic": [{position, title,
    link}, ...]}``; any transport error or malformed body yields an
    EMPTY result list — the pipeline drops the query rather than
    crash, exactly like the fetch stage's status-0 drop."""

    endpoint: str = ""
    timeout_s: float = 10.0
    # injectable transport: callable (url, json, timeout, headers) ->
    # object with .status_code and .json(). Defaults to requests.post,
    # imported lazily.
    transport: object = None

    def _post(self, query: str):
        headers = {"Content-Type": "application/json"}
        if self.transport is not None:
            return self.transport(
                self.endpoint,
                json={"q": query},
                timeout=self.timeout_s,
                headers=headers,
            )
        import requests  # deferred: not installed in this sandbox

        return requests.post(
            self.endpoint,
            json={"q": query},
            timeout=self.timeout_s,
            headers=headers,
        )

    def search(self, query: str) -> list[dict]:
        try:
            resp = self._post(query)
            if int(resp.status_code) != 200:
                return []
            organic = resp.json().get("organic", [])
            return [
                {
                    "position": int(r["position"]),
                    "title": str(r.get("title", "")),
                    "link": str(r["link"]),
                }
                for r in organic
            ]
        except Exception:  # noqa: BLE001 — transport errors drop the query
            return []


def search_source(
    queries: DataFrame,
    client,
    top_k: int = 3,
    exclude_suffixes: tuple[str, ...] = (),
    query_col: str = "query",
) -> DataFrame:
    """Distributed search-results source: one client call per query
    row, executed inside the scan (``mapInPandas`` — Arrow-batched,
    client shipped in the closure like the fetch stage's fetcher),
    returning the exploded ``(query, position, title, link)`` table
    with the reference's top-k slice applied per query and optional
    host-suffix exclusion (``Search_scrape_P1.py:118,141``).

    Scale shape: queries partition freely (each row is independent),
    results explode executor-side — no collect, no shuffle; the
    downstream join against entities is the consumer's choice."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for q in pdf[query_col]:
                for r in client.search(q)[:top_k]:
                    rows.append((q, r["position"], r["title"], r["link"]))
            yield pd.DataFrame(
                rows, columns=["query", "position", "title", "link"]
            )

    out = queries.select(query_col).mapInPandas(run, RESULT_SCHEMA)
    if exclude_suffixes:
        # JVM-side host extraction (parse_url) — the domain gate stays
        # inside codegen, no Python stage. Matching is on DOMAIN-LABEL
        # boundaries over the NORMALIZED host (lowercased, trailing
        # FQDN dot stripped — hostnames are case-insensitive, so
        # A.GOV.UK and gov.uk. must not leak past a gov.uk exclusion):
        # "gov.uk" excludes gov.uk and *.gov.uk but never notgov.uk
        # (bare endswith over-matches mid-label). This deliberately
        # GENERALIZES the reference's `endswith(".gov.uk")`
        # (Search_scrape_P1.py:141), which keeps the apex host — the
        # crawl admission path (`frontier.py:admit_link` P6) preserves
        # that exact rule for oracle-replay parity; this source has no
        # parity constraint and takes the strict gate. A malformed
        # link whose host cannot be parsed is KEPT — the gate only
        # excludes hosts it positively matched, so enabling an
        # unrelated exclusion cannot silently drop unparseable rows.
        host = F.expr("trim(TRAILING '.' FROM lower(parse_url(link, 'HOST')))")
        excluded = F.lit(False)
        for suf in exclude_suffixes:
            # strip BOTH ends: the host side is normalized dotless, so
            # a trailing-dot-spelled suffix ('gov.uk.') must be too or
            # it would match nothing at all
            s = suf.strip(".").lower()
            excluded = excluded | (host == s) | host.endswith("." + s)
        out = out.where(host.isNull() | ~excluded)
    return out
