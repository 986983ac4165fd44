"""Round snapshots: Iceberg-layout checkpoints with lineage + metrics.

The reference has no persistence at all — a crash loses the whole
crawl (its only sink is a final ``to_csv``,
``company_number_scrape.py:66``). The north rule requires exact
resumability with per-partition lineage + metrics. No Iceberg/Delta
jars exist in this runtime (verified), so the engine implements the
same *semantics* directly on the filesystem:

    <root>/round=<N>/frontier/        parquet (next round's input)
    <root>/round=<N>/fetch_log/       parquet (this round's fetches)
    <root>/round=<N>/matches/         parquet (cumulative seed matches)
    <root>/round=<N>/manifest.json    snapshot metadata

``manifest.json`` carries: round number, parent snapshot id, a
content id, per-table row counts and per-partition file metrics
(the Iceberg manifest analog), config hash, and aggregate
fetch/dedup counters. Commits are atomic: everything is written
under ``_tmp.round=<N>`` and ``os.rename``d into place last, so a
partially-written snapshot is never visible and resume always finds
a consistent latest round. Time travel = read any ``round=K``.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def _dir_metrics(path: str) -> list[dict]:
    """Per-file (≈ per-partition) row/size metrics for a table
    directory, read from parquet footers — no Spark job."""
    import pyarrow.parquet as pq

    out = []
    for base, _, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                p = os.path.join(base, f)
                out.append(
                    {
                        "file": os.path.relpath(p, path),
                        "bytes": os.path.getsize(p),
                        "rows": pq.ParquetFile(p).metadata.num_rows,
                    }
                )
    return out


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _round_dir(self, round_no: int) -> str:
        return os.path.join(self.root, f"round={round_no}")

    # metric name -> table whose committed row count supplies it
    # (footer-derived — avoids one Spark count job per metric per round)
    ROW_METRICS = {"fetched": "fetch_log", "matches_total": "matches"}

    def commit(
        self,
        round_no: int,
        tables: dict[str, DataFrame],
        metrics: dict,
        config_hash: str,
    ) -> dict:
        """Write a snapshot for ``round_no`` atomically; return manifest."""
        tmp = os.path.join(self.root, f"_tmp.round={round_no}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        table_meta = {}
        for name, df in tables.items():
            path = os.path.join(tmp, name)
            df.write.mode("overwrite").parquet(path)
            parts = _dir_metrics(path)  # footer metadata, no extra job
            table_meta[name] = {
                "rows": sum(p["rows"] for p in parts),
                "partitions": parts,
            }
        metrics = dict(metrics)
        for metric, table in self.ROW_METRICS.items():
            if metric not in metrics and table in table_meta:
                metrics[metric] = table_meta[table]["rows"]
        parent = self.latest_round()
        manifest = {
            "round": round_no,
            "parent_round": parent,
            "committed_at": time.time(),
            "config_hash": config_hash,
            "tables": table_meta,
            "metrics": metrics,
        }
        manifest["snapshot_id"] = hashlib.blake2b(
            json.dumps(
                {k: manifest[k] for k in ("round", "parent_round", "config_hash", "tables")},
                sort_keys=True,
            ).encode(),
            digest_size=8,
        ).hexdigest()
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        final = self._round_dir(round_no)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)  # atomic publish
        return manifest

    def latest_round(self) -> int | None:
        rounds = []
        if os.path.exists(self.root):
            for d in os.listdir(self.root):
                if d.startswith("round=") and os.path.exists(
                    os.path.join(self.root, d, "manifest.json")
                ):
                    rounds.append(int(d.split("=", 1)[1]))
        return max(rounds) if rounds else None

    def read_manifest(self, round_no: int) -> dict:
        with open(os.path.join(self._round_dir(round_no), "manifest.json")) as f:
            return json.load(f)

    def read_table(self, round_no: int, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._round_dir(round_no), name))

    def lineage(self, round_no: int | None = None) -> list[dict]:
        """Manifest chain from the given (default latest) round back to 0."""
        cur = self.latest_round() if round_no is None else round_no
        chain = []
        while cur is not None:
            m = self.read_manifest(cur)
            chain.append(m)
            cur = m["parent_round"]
        return chain
