"""Live robots.txt ingestion — builds the politeness robots table.

``politeness.schedule`` consumes a robots *table* ``(host STRING,
disallow ARRAY<STRING>, crawl_delay DOUBLE)``; until round 4 that
table was synthetic or caller-supplied, so a fully live crawl had no
way to derive it from real ``/robots.txt`` responses. This module
closes that gap: ``build_robots_table`` fetches ``/robots.txt`` once
per distinct host inside ``mapInPandas`` (one GET per host — the
politeness problem does not apply to the politeness file itself) and
parses Disallow/Crawl-delay into the existing schema.

Error semantics follow the reference crawler: any transport error or
non-200 response DROPS the rules and proceeds unrestricted with the
default crawl delay (the reference's bare ``except: return None``
GET wrapper, ``company_number_scrape.py:17-25`` — it never lets a
bad host stop the run). Note this deviates from RFC 9309's
"unreachable after retries => full disallow" recommendation for 5xx;
the engine mirrors the reference because matching its crawl behavior
is the north-rule contract. Flip ``strict_5xx=True`` for the RFC
posture (5xx => disallow everything).

Parsing implements the practical RFC 9309 subset the table schema
can express: User-agent group selection (most-specific product-token
match, ``*`` fallback, adjacent User-agent lines share a group,
same-specificity groups merge), ``Disallow`` path prefixes and
``Crawl-delay``. ``Allow`` lines are ignored BY DEFAULT — the
reference-matching posture, strictly MORE conservative (never
fetches something robots forbids). Pass ``allow_directives=True``
(parse_robots / build_robots_table) for RFC 9309 longest-match
semantics: Allow rules are encoded into the same ``disallow`` array
with a ``!`` prefix (path patterns always start with ``/``, so the
marker is unambiguous and the table schema is unchanged), and every
consumer — ``robots_decision`` (Python probe path),
``robots_allowed_expr`` (declarative join path) — resolves a path
against the LONGEST matching rule, Allow winning ties (RFC 9309
§2.2.2 "least restrictive"). Wildcards (``*``/``$``) are not
implemented; patterns are literal prefixes, as before.

The transport seam is the same injectable callable as
``fetchers.HttpFetcher`` (``(url, timeout=..., headers=...) ->
response``), so tests run against a fake server and a real crawl
passes nothing (deferred ``requests`` import).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_SCHEMA = "host string, disallow array<string>, crawl_delay double"

DEFAULT_AGENT = "spark-crawl-engine"


def robots_decision(rules, path: str) -> bool:
    """True if ``path`` is fetchable under an encoded rule array
    (plain entries = Disallow prefixes, ``!``-prefixed = Allow).
    RFC 9309 longest-match: the longest matching rule decides; a tie
    goes to Allow (least restrictive); no matching Disallow = allow.
    For an allow-free array this reduces exactly to the historical
    ``not any(path.startswith(d))`` check, so it is safe as the
    single decision function on every probe path."""
    best_dis = -1
    best_alw = -1
    for r in rules or ():
        if r.startswith("!"):
            p = r[1:]
            if path.startswith(p) and len(p) > best_alw:
                best_alw = len(p)
        elif path.startswith(r) and len(r) > best_dis:
            best_dis = len(r)
    return best_dis < 0 or best_alw >= best_dis


def robots_allowed_expr(rules_col, path_col):
    """``robots_decision`` as a pure Catalyst expression over an
    encoded rules ARRAY column — the declarative twin used by the
    politeness join path (no Python worker). NULL rules = allow."""
    dis = F.filter(
        rules_col,
        lambda d: (~F.startswith(d, F.lit("!")))
        & F.startswith(path_col, d),
    )
    alw = F.filter(
        rules_col,
        lambda d: F.startswith(d, F.lit("!"))
        & F.startswith(path_col, F.substring(d, 2, 1 << 30)),
    )
    best_dis = F.array_max(F.transform(dis, lambda d: F.length(d)))
    best_alw = F.array_max(F.transform(alw, lambda d: F.length(d) - 1))
    return (
        rules_col.isNull()
        | best_dis.isNull()
        | (best_alw.isNotNull() & (best_alw >= best_dis))
    )


def parse_robots(
    text: str,
    user_agent: str = DEFAULT_AGENT,
    allow_directives: bool = False,
) -> tuple[list[str], float | None]:
    """(rule prefixes, crawl_delay | None) for ``user_agent``.

    Group selection: the group whose User-agent token is the longest
    match against our product token wins; ``*`` matches with the
    lowest specificity; groups with equal specificity merge (RFC 9309
    combinability). An unmatched agent, or an empty/malformed file,
    yields ([], None) — no restrictions, default delay.

    ``allow_directives=True`` additionally records Allow lines as
    ``!``-prefixed entries for ``robots_decision`` longest-match;
    the default keeps the historical ignore-Allow posture."""
    agent = user_agent.split("/", 1)[0].strip().lower()
    records: list[tuple[list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_delay: float | None = None
    in_rules = False

    def close_group():
        nonlocal cur_agents, cur_dis, cur_delay, in_rules
        if cur_agents:
            records.append((cur_agents, cur_dis, cur_delay))
        cur_agents, cur_dis, cur_delay, in_rules = [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:  # a new group starts after any rule line
                close_group()
            cur_agents.append(val.lower())
        elif key == "disallow":
            in_rules = True
            if cur_agents and val:  # empty Disallow: == allow all
                cur_dis.append(val)
        elif key == "allow":
            in_rules = True  # ignored unless allow_directives
            # a path pattern starts with "/" (RFC 9309 §2.2.2), which
            # keeps the "!" encoding collision-free
            if allow_directives and cur_agents and val.startswith("/"):
                cur_dis.append("!" + val)
        elif key == "crawl-delay":
            in_rules = True
            if cur_agents:
                try:
                    cur_delay = float(val)
                except ValueError:
                    pass
        # other keys (Sitemap, Host, ...) are group-transparent
    close_group()

    best_spec = -1
    dis: list[str] = []
    delay: float | None = None
    for agents, d, cd in records:
        spec = max(
            (
                0 if a == "*" else len(a)
                for a in agents
                if a == "*" or agent.startswith(a) or a in agent
            ),
            default=-1,
        )
        if spec < 0:
            continue
        if spec > best_spec:
            best_spec, dis, delay = spec, list(d), cd
        elif spec == best_spec:
            dis.extend(d)
            delay = cd if delay is None else delay
    return dis, delay


def build_robots_table(
    spark,
    hosts: DataFrame,
    transport=None,
    scheme: str = "http",
    timeout_s: float = 10.0,
    user_agent: str = DEFAULT_AGENT,
    strict_5xx: bool = False,
    allow_directives: bool = False,
) -> DataFrame:
    """Distributed robots table from live ``/robots.txt`` fetches.

    ``hosts``: any DataFrame with a ``host`` column (deduped here).
    Returns ``(host, disallow, crawl_delay)`` ready for
    ``politeness.schedule`` / ``CrawlEngine(robots=...)``: a host
    whose robots fetch failed gets NULL rules (allow-all + default
    delay — the reference's drop semantics), unless ``strict_5xx``
    maps server errors to a full disallow per RFC 9309."""
    hosts_df = (
        hosts.select("host").where(F.col("host").isNotNull()).distinct()
    )

    def fetch_parse(batches):
        for pdf in batches:
            rows = []
            for host in pdf["host"]:
                url = f"{scheme}://{host}/robots.txt"
                status, text = 0, None
                try:
                    if transport is not None:
                        resp = transport(
                            url,
                            timeout=timeout_s,
                            headers={"User-Agent": user_agent},
                        )
                    else:
                        import requests  # deferred: absent in sandbox

                        resp = requests.get(
                            url,
                            timeout=timeout_s,
                            headers={"User-Agent": user_agent},
                        )
                    status = int(resp.status_code)
                    if status == 200:
                        text = resp.text or ""
                except Exception:  # noqa: BLE001 — drop semantics
                    pass
                if text is not None:
                    dis, delay = parse_robots(
                        text, user_agent, allow_directives=allow_directives
                    )
                    rows.append(
                        {"host": host, "disallow": dis, "crawl_delay": delay}
                    )
                elif strict_5xx and status >= 500:
                    rows.append(
                        {"host": host, "disallow": ["/"], "crawl_delay": None}
                    )
                else:
                    rows.append(
                        {"host": host, "disallow": None, "crawl_delay": None}
                    )
            yield pd.DataFrame(
                rows, columns=["host", "disallow", "crawl_delay"]
            )

    return hosts_df.mapInPandas(fetch_parse, schema=ROBOTS_SCHEMA)


class SyntheticRobotsTransport:
    """Picklable fake transport serving each synthetic host's
    ``robots_for_host`` rules as a real robots.txt body — the
    replay-equality fixture for tests and the c05 catalog row (the
    sandbox has no network; the builder's fetch/parse path is
    exercised against this deterministic server)."""

    def __init__(self, seed: int = 42):
        self.seed = seed

    def __call__(self, url: str, timeout=None, headers=None):
        from .. import synthetic as syn

        host = url.split("://", 1)[1].split("/", 1)[0]
        dis, delay = syn.robots_for_host(syn.WebConfig(seed=self.seed), host)

        class _Resp:
            status_code = 200

            def __init__(self, text):
                self.text = text

        return _Resp(render_robots(dis, delay))


def render_robots(disallow: list[str], crawl_delay: float | None) -> str:
    """Serialize rules as a robots.txt body (the synthetic robots
    server in tests round-trips ``synthetic.robots_for_host`` through
    this and ``parse_robots``). ``!``-encoded entries render as
    Allow lines, so encoded rule arrays round-trip too."""
    lines = ["User-agent: *"]
    lines += [
        f"Allow: {d[1:]}" if d.startswith("!") else f"Disallow: {d}"
        for d in disallow
    ]
    if crawl_delay is not None:
        lines.append(f"Crawl-delay: {crawl_delay}")
    return "\n".join(lines) + "\n"
