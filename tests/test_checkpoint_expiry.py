"""Snapshot expiry (Iceberg-style retention): compacted matches
base, bounded storage, crash safety, resume-after-expiry."""

import shutil
import tempfile

import pytest

from common_crawl___autumn_2025_spark import synthetic as syn
from common_crawl___autumn_2025_spark.crawl import checkpoints as ckpt_mod
from common_crawl___autumn_2025_spark.crawl.frontier import (
    CrawlEngine,
    CrawlSpec,
)


@pytest.fixture(scope="module")
def deep_spec():
    return CrawlSpec(web=syn.WebConfig(n_hosts=12), max_depth=2, max_rounds=3)


def _cum_matches(eng, upto=None):
    return sorted(
        (r.seed_id, r.surt, r.target_number, r.round)
        for r in eng.read_matches_cum(upto).collect()
    )


def _crawl(spark, spec, seeds):
    root = tempfile.mkdtemp(prefix="ck_exp_")
    eng = CrawlEngine(spark, spec, root, partitions=4)
    eng.run(seeds)
    return eng, root


def test_delta_paths_below_first_commit_without_expiry(spark, deep_spec):
    """On a store expire_snapshots never touched, an upto below the
    oldest committed round has no deltas — the answer is empty, not a
    claim that the round 'was expired' (ADVICE r4). After a real
    expiry, the same call IS the explicit error."""
    seeds = syn.seed_urls(deep_spec.web, 6)
    eng, root = _crawl(spark, deep_spec, seeds)
    try:
        assert eng.store.delta_table_paths("matches", upto=-1) == []
        assert eng.read_matches_cum(-1).count() == 0
        eng.store.expire_snapshots(keep_last=1)
        with pytest.raises(ValueError, match="expired"):
            eng.store.delta_table_paths("matches", upto=0)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_expire_keeps_cumulative_matches_exact(spark, deep_spec):
    seeds = syn.seed_urls(deep_spec.web, 10)
    eng, root = _crawl(spark, deep_spec, seeds)
    try:
        latest = eng.store.latest_round()
        assert latest >= 2  # three committed rounds: 0, 1, 2
        before = _cum_matches(eng)
        assert before  # the synthetic web plants matches

        out = eng.store.expire_snapshots(keep_last=1)
        assert out["expired"] == list(range(latest))
        assert eng.store._committed_rounds() == [latest]
        # cumulative matches unchanged through the compacted base
        assert _cum_matches(eng) == before
        assert _cum_matches(eng, upto=latest) == before
        # retained snapshot's tables still read
        assert eng.store.read_table(latest, "frontier").count() >= 0
        assert eng.store.read_table(latest, "fetch_log").count() > 0
        # lineage now ends at the base (no dangling parent walk)
        chain = eng.store.lineage()
        assert len(chain) == 1 and chain[0]["parent_round"] is None
        assert chain[0]["expired_parents"] == list(range(latest))
        # time travel below the base is an explicit error
        with pytest.raises(ValueError, match="expired"):
            eng.read_matches_cum(0)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_repeated_expiry_compacts_prior_base(spark, deep_spec):
    """Expire in two steps (keep 2, then keep 1): the second
    compaction folds the first base into the new one and the
    cumulative set never changes."""
    seeds = syn.seed_urls(deep_spec.web, 10)
    eng, root = _crawl(spark, deep_spec, seeds)
    try:
        latest = eng.store.latest_round()
        before = _cum_matches(eng)
        eng.store.expire_snapshots(keep_last=2)
        assert _cum_matches(eng) == before
        out = eng.store.expire_snapshots(keep_last=1)
        assert out["retained"] == [latest]
        assert _cum_matches(eng) == before
        # nothing left to expire: no-op
        assert eng.store.expire_snapshots(keep_last=1)["expired"] == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_expiry_crash_before_cleanup_never_double_counts(
    spark, deep_spec, monkeypatch
):
    """Crash window between the manifest publish (step 2) and the
    directory deletes (step 3): expired delta dirs linger on disk but
    the base cut in delta_table_paths must exclude them."""
    seeds = syn.seed_urls(deep_spec.web, 10)
    eng, root = _crawl(spark, deep_spec, seeds)
    try:
        before = _cum_matches(eng)
        latest = eng.store.latest_round()
        monkeypatch.setattr(
            ckpt_mod.shutil, "rmtree", lambda *a, **k: None
        )
        eng.store.expire_snapshots(keep_last=1)
        monkeypatch.undo()
        # expired round dirs still present on disk...
        import os

        assert os.path.isdir(eng.store._round_dir(0))
        # ...but excluded from the cumulative scan (no double count)
        assert _cum_matches(eng) == before
        # a later expiry re-runs the cleanup
        eng.store.expire_snapshots(keep_last=1)
        assert eng.store._committed_rounds() == [latest]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_resume_after_expiry_equals_uninterrupted(spark, deep_spec):
    """Expire everything but the latest round mid-crawl, then resume:
    the remaining rounds' fetch logs and final matches equal the
    uninterrupted run's."""
    import dataclasses

    seeds = syn.seed_urls(deep_spec.web, 10)
    full_eng, full_root = _crawl(spark, deep_spec, seeds)
    two_spec = dataclasses.replace(deep_spec, max_rounds=2)
    part_eng, part_root = _crawl(spark, two_spec, seeds)
    try:
        part_eng.store.expire_snapshots(keep_last=1)
        resumed = CrawlEngine(spark, deep_spec, part_root, partitions=4)
        resumed.run(seeds, resume=True)
        latest = full_eng.store.latest_round()
        assert resumed.store.latest_round() == latest
        want = sorted(
            (r.host, r.seq, r.surt, r.status)
            for r in full_eng.store.read_table(latest, "fetch_log").collect()
        )
        got = sorted(
            (r.host, r.seq, r.surt, r.status)
            for r in resumed.store.read_table(latest, "fetch_log").collect()
        )
        assert got == want
        assert _cum_matches(resumed) == _cum_matches(full_eng)
    finally:
        shutil.rmtree(full_root, ignore_errors=True)
        shutil.rmtree(part_root, ignore_errors=True)


def test_noop_expiry_sweeps_orphaned_generations(spark, deep_spec):
    """A crash between the compacted-dir rename and the manifest
    publish leaves a generation directory the pointer never adopted;
    the next expiry call — even with nothing to expire — collects
    it (and never touches the live pointer's directory)."""
    import os

    seeds = syn.seed_urls(deep_spec.web, 10)
    eng, root = _crawl(spark, deep_spec, seeds)
    try:
        before = _cum_matches(eng)
        eng.store.expire_snapshots(keep_last=1)
        latest = eng.store.latest_round()
        rd = eng.store._round_dir(latest)
        live = eng.store.read_manifest(latest)["tables"]["matches"]["path"]
        orphan = os.path.join(rd, f"matches.base-upto{latest}-g7")
        os.makedirs(orphan)
        open(os.path.join(orphan, "junk.parquet"), "wb").close()
        stale_tmp = os.path.join(rd, "_tmp.matches.base-upto9-g0")
        os.makedirs(stale_tmp)

        # ...and a half-deleted expired round whose manifest.json was
        # already unlinked (cleanup crashed mid-rmtree): data subdirs
        # remain but the round is no longer "committed"
        half = eng.store._round_dir(0)
        os.makedirs(os.path.join(half, "fetch_log"))
        open(os.path.join(half, "fetch_log", "leak.parquet"), "wb").close()

        out = eng.store.expire_snapshots(keep_last=1)
        assert out["expired"] == []
        assert not os.path.exists(orphan)
        assert not os.path.exists(stale_tmp)
        assert not os.path.exists(half)  # manifest-less leftover swept
        assert os.path.isdir(os.path.join(rd, live))
        assert _cum_matches(eng) == before
    finally:
        shutil.rmtree(root, ignore_errors=True)
