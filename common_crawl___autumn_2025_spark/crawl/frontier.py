"""The crawl round driver: frontier → dedup → schedule → fetch → admit.

Generalizes the reference's sequential crawl loop
(``company_number_scrape.py:43-64``: seed list → fetch homepage →
regex probe → early exit → keyword/same-domain link extraction →
depth-1 fetches, plus the URL-seen / visit-budget gate of
``Matching_with_recursion.py:480-515``) into deterministic,
distributed micro-batch rounds (Structured-Streaming-style
``foreachBatch`` semantics driven by a plain loop — state is our own
checkpointed tables, which is what makes runs exactly resumable).

Canonical-order contract (the tests' oracle implements the identical
rules single-threaded):

- round 0 = canonicalized seeds at depth 0, priority 0;
- per round: dedup candidates by surt keeping the min
  ``(priority, seed_id, parent_url)`` attribution; drop rows already
  in the seen set; drop rows of already-satisfied seeds (early
  exit); everything surviving is *attempted* → enters the seen set;
  robots-disallowed rows are then excluded from fetching;
- per-host fetch order = rank by ``(priority, surt)`` (reference
  order is homepage-then-links per seed; our canonical tiebreak is
  documented in SURVEY.md §2.6), fetch time offsets spaced by the
  host's crawl delay;
- a seed is satisfied by its canonically-first fetched page whose
  content matches the target predicate (reference regex probe
  ``company_number_scrape.py:27-29,50-53``);
- links expand only from status-200 pages of seeds still unsatisfied
  at round end, ``depth < max_depth``, through the admission filters
  (same registered domain P9, keyword in href P10, no excluded
  suffix P6, no blacklisted aggregator host P7).
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import asdict, dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import synthetic as syn
from ..canonical import canonicalize, host_of, registered_domain, surt
from ..codecs import phash64
from .checkpoints import CheckpointStore
from .politeness import schedule
from .seen import SeenSet

FRONTIER_SCHEMA = (
    "round int, url string, surt string, host string, depth int, "
    "priority double, parent_url string, seed_id long"
)

FETCHED_SCHEMA = FRONTIER_SCHEMA + (
    ", seq long, fetch_ts_offset double, batch_id int, status int, "
    "target_number string, caption string, image_id string, bytes binary, "
    "w int, h int, fmt string, phash long, hrefs array<string>"
)

MATCH_SCHEMA = "seed_id long, url string, surt string, target_number string, round int"


@dataclass(frozen=True)
class CrawlSpec:
    """Everything that defines a crawl's semantics (hashed into the
    checkpoint manifest so resume refuses a mismatched config)."""

    web: syn.WebConfig = field(default_factory=syn.WebConfig)
    max_depth: int = 1
    max_rounds: int = 8
    early_exit: bool = True
    keywords: tuple[str, ...] = syn.KEYWORDS
    excluded_suffixes: tuple[str, ...] = (".gov.uk",)
    blacklist_domains: tuple[str, ...] = tuple(
        registered_domain(h) for h in syn.AGGREGATOR_HOSTS
    )
    round_budget_s: float = 3600.0
    seen_shards: int = 16
    seen_bits_per_shard: int = 1 << 20

    def config_hash(self) -> str:
        """Hash of the fields that define crawl SEMANTICS / state
        layout. ``max_rounds`` is an execution budget, not semantics —
        resuming a 1-round run with a larger budget is legal and
        common, so it stays out of the hash."""
        d = asdict(self)
        d.pop("max_rounds")
        return hashlib.blake2b(
            json.dumps(d, sort_keys=True, default=str).encode(),
            digest_size=8,
        ).hexdigest()


def image_id_for(surt_key: str) -> str:
    """Safe-filename slug of the surt (reference analog:
    ``Scrape_Utils.py:155-158``)."""
    return re.sub(r"[^a-zA-Z0-9]", "_", surt_key)


def admit_link(spec: CrawlSpec, page_url: str, page_host: str, href: str) -> str | None:
    """Admission decision for one extracted href; returns the
    canonical absolute URL if admitted, else None. Pure — shared
    verbatim by the oracle crawler."""
    absolute = canonicalize(href, base=page_url)
    if not absolute:
        return None
    link_host = host_of(absolute)
    if not link_host:
        return None
    if any(link_host.endswith(sfx) for sfx in spec.excluded_suffixes):  # P6
        return None
    link_dom = registered_domain(link_host)
    if link_dom in spec.blacklist_domains:  # P7
        return None
    if link_dom != registered_domain(page_host):  # P9
        return None
    if not any(kw in href.lower() for kw in spec.keywords):  # P10
        return None
    if surt(absolute) == surt(page_url):  # self-link
        return None
    return absolute


def seeds_frontier(spark: SparkSession, seeds: list[str]) -> DataFrame:
    """Round-0 frontier from an ordered seed list (order is the
    reference's contract — ``company_number_scrape.py:13,43``)."""
    rows = []
    for i, s in enumerate(seeds):
        cu = canonicalize(s)
        rows.append((0, cu, surt(cu), host_of(cu), 0, 0.0, None, i))
    return spark.createDataFrame(rows, FRONTIER_SCHEMA)


def _fetch_map(spec: CrawlSpec):
    """mapInPandas fetch stage: scheduled frontier batch in, fetched
    pages out. The synthetic fetcher is a pure function of the URL,
    so this scales with executors and is exactly replayable."""

    def fetch(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                page = syn.fetch_page(spec.web, row.url)
                out.append(
                    {
                        **{c: getattr(row, c) for c in pdf.columns},
                        "status": page.status,
                        "target_number": page.target_number,
                        "caption": page.caption,
                        "image_id": image_id_for(row.surt) if page.status == 200 else None,
                        "bytes": page.image_bytes if page.status == 200 else None,
                        "w": page.w,
                        "h": page.h,
                        "fmt": page.image_fmt if page.status == 200 else None,
                        "phash": page.phash,
                        "hrefs": syn.extract_links(page.html),
                    }
                )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                columns=pdf.columns.tolist()
                + ["status", "target_number", "caption", "image_id", "bytes",
                   "w", "h", "fmt", "phash", "hrefs"]
            )

    return fetch


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        spec: CrawlSpec,
        checkpoint_root: str,
        robots: DataFrame | None = None,
        partitions: int | None = None,
    ):
        self.spark = spark
        self.spec = spec
        self.store = CheckpointStore(spark, checkpoint_root)
        self.seen = SeenSet(
            spark,
            checkpoint_root + "/seen",
            n_shards=spec.seen_shards,
            bits_per_shard=spec.seen_bits_per_shard,
        )
        self.partitions = partitions or spark.sparkContext.defaultParallelism
        if robots is None:
            robots = spark.createDataFrame(
                syn.robots_pandas(spec.web),
                "host string, disallow array<string>, crawl_delay double",
            )
        self.robots = robots

    # -- one round -------------------------------------------------------

    def run_round(
        self,
        round_no: int,
        frontier: DataFrame,
        matches: DataFrame,
        frontier_count: int | None = None,
    ) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, dict]:
        """Returns (next_frontier, fetched, new_matches_cum, records,
        metrics). Job economy: the only counted relations are the
        deduped-unseen delta (inside ``seen.add``, on cached data);
        fetch/match totals come from checkpoint parquet footers, and
        ``frontier_count`` is passed from the previous round's
        manifest (or len(seeds)) instead of re-counting."""
        spec = self.spec
        n_frontier = frontier.count() if frontier_count is None else frontier_count

        # 1. in-round dedup by surt, canonical attribution tiebreak
        dedup_w = Window.partitionBy("surt").orderBy(
            "priority", "seed_id", F.coalesce("parent_url", F.lit(""))
        )
        cand = (
            frontier.withColumn("__rn", F.row_number().over(dedup_w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

        # 2. seen-set anti join (Bloom prefilter + exact confirm)
        unseen = self.seen.filter_unseen(cand)

        # 3. early-exit: drop rows of already-satisfied seeds
        if spec.early_exit:
            unseen = unseen.join(
                F.broadcast(matches.select("seed_id").distinct()),
                on=["seed_id"],
                how="left_anti",
            )
        # CRITICAL: truncate lineage BEFORE updating the seen set.
        # unseen's plan scans the seen-exact parquet path; the append
        # in seen.add() triggers Spark's recacheByPath on that path,
        # which RECOMPUTES any cached plan reading it — the round's
        # own candidates then anti-join against themselves and vanish.
        # An eager localCheckpoint freezes the rows and removes the
        # path scan from the lineage entirely.
        unseen = unseen.localCheckpoint(eager=True)

        # 4. everything surviving counts as attempted -> seen (surts
        # are unique post-dedup, so added == attempted)
        n_attempted = self.seen.add(unseen.select("surt"), round_no)

        # 5. robots + politeness scheduling (ordered per-host batches)
        sched_cleanup: list = []
        scheduled = schedule(
            unseen,
            self.robots,
            partitions=self.partitions,
            round_budget_s=spec.round_budget_s,
            cleanup=sched_cleanup,
        )

        # 6. fetch (Arrow-batched; pure function of URL). The result is
        # localCheckpoint'ed EAGERLY: this truncates the lineage, so
        # the commit writes can never recompute through the
        # politeness/seen pipeline (whose ordered-rank construction is
        # only deterministic for a single materialization — recompute
        # divergence here silently dropped whole hosts; see
        # tests/test_crawl_replay.py::test_larger_web_fetch_set_identical
        # and test_seen_resume.py::test_shard_partitioned_probe_path).
        fetched = scheduled.mapInPandas(
            _fetch_map(spec), schema=FETCHED_SCHEMA
        ).localCheckpoint(eager=True)
        self._pending_cleanup = sched_cleanup

        # 7. new matches: canonically-first target hit per seed
        hit_w = Window.partitionBy("seed_id").orderBy("priority", "surt")
        new_matches = (
            fetched.where((F.col("status") == 200) & (F.col("target_number") != ""))
            .withColumn("__rn", F.row_number().over(hit_w))
            .where(F.col("__rn") == 1)
            .select(
                "seed_id", "url", "surt", "target_number",
                F.lit(round_no).cast("int").alias("round"),
            )
        )
        if spec.early_exit:
            new_matches = new_matches.join(
                F.broadcast(matches.select("seed_id").distinct()),
                on=["seed_id"],
                how="left_anti",
            )
        matches_cum = matches.unionByName(new_matches).persist()

        # 8. link expansion from unsatisfied seeds' 200-pages
        expandable = fetched.where(
            (F.col("status") == 200) & (F.col("depth") < spec.max_depth)
        )
        if spec.early_exit:
            expandable = expandable.join(
                F.broadcast(matches_cum.select("seed_id").distinct()),
                on=["seed_id"],
                how="left_anti",
            )

        def expand(batches):
            for pdf in batches:
                rows = []
                for row in pdf.itertuples(index=False):
                    hrefs = [] if row.hrefs is None else list(row.hrefs)
                    for href in hrefs:
                        absolute = admit_link(spec, row.url, row.host, href)
                        if absolute is None:
                            continue
                        rows.append(
                            {
                                "round": round_no + 1,
                                "url": absolute,
                                "surt": surt(absolute),
                                "host": host_of(absolute),
                                "depth": row.depth + 1,
                                "priority": float(row.depth + 1),
                                "parent_url": row.url,
                                "seed_id": row.seed_id,
                            }
                        )
                yield pd.DataFrame(
                    rows,
                    columns=["round", "url", "surt", "host", "depth",
                             "priority", "parent_url", "seed_id"],
                )

        next_frontier = expandable.select(
            "url", "surt", "host", "depth", "priority", "seed_id", "hrefs"
        ).mapInPandas(expand, schema=FRONTIER_SCHEMA)

        # 9. canonical record table rows (input_hint schema)
        records = fetched.where(F.col("status") == 200).select(
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
        )

        metrics = {
            "frontier_in": n_frontier,
            "deduped_attempted": n_attempted,
            # fetched / matches_total are filled by CheckpointStore.commit
            # from the committed tables' parquet footers
        }
        return next_frontier, fetched, matches_cum, records, metrics

    # -- full crawl --------------------------------------------------------

    def run(self, seeds: list[str], resume: bool = False) -> dict:
        spark, spec = self.spark, self.spec
        empty_matches = spark.createDataFrame([], MATCH_SCHEMA)
        start_round = 0
        frontier = seeds_frontier(spark, seeds)
        matches = empty_matches

        latest = self.store.latest_round()
        if resume and latest is not None:
            m = self.store.read_manifest(latest)
            if m["config_hash"] != spec.config_hash():
                raise ValueError("checkpoint config mismatch — refusing to resume")
            frontier = self.store.read_table(latest, "frontier")
            matches = self.store.read_table(latest, "matches")
            start_round = latest + 1
            self.seen.rollback(latest)

        summary = {"rounds": [], "config_hash": spec.config_hash()}
        frontier_count = len(seeds) if start_round == 0 else None
        if start_round > 0:
            frontier_count = self.store.read_manifest(start_round - 1)["tables"][
                "frontier"
            ]["rows"]
        for round_no in range(start_round, spec.max_rounds):
            if frontier_count == 0:
                break
            nxt, fetched, matches, records, metrics = self.run_round(
                round_no, frontier, matches, frontier_count=frontier_count
            )
            fetch_log = fetched.drop("bytes", "hrefs", "caption")
            manifest = self.store.commit(
                round_no,
                {
                    "frontier": nxt,
                    "fetch_log": fetch_log,
                    "matches": matches,
                    "records": records,
                },
                metrics,
                spec.config_hash(),
            )
            fetched.unpersist()
            for df in getattr(self, "_pending_cleanup", []):
                df.unpersist()
            self._pending_cleanup = []
            summary["rounds"].append({**manifest["metrics"], "round": round_no,
                                      "snapshot_id": manifest["snapshot_id"]})
            matches.unpersist()
            frontier = self.store.read_table(round_no, "frontier")
            matches = self.store.read_table(round_no, "matches")
            frontier_count = manifest["tables"]["frontier"]["rows"]
        return summary
