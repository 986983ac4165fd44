"""d09/d10 history-independence evidence (r6 verdict "What's
missing" #4): fixed batch, stored history index at 1x vs 10x, time
ONLY the incremental step. NOT part of the driver contract —
bench.py stays frozen; this is builder-side evidence like
bench_extra.py.

What is timed (per the operators' production contracts):

- d09 step: batch -> md5 digests -> join against the STORED distinct
  history-digest table -> first-occurrence verdict window (the same
  join+window shape as d09_incremental_dedup; the digest table is
  read from parquet, exactly the stored state d09's docstring
  names).
- d10 step: batch -> MinHash signatures -> band table -> equi join
  against the STORED history band table on (band, bucket) ->
  distinct candidate pairs (lsh_candidates_cross's join, with the
  history side as the parquet band index d10's docstring names).

History is NEVER re-shingled / re-hashed inside the timed region —
building the stored index happens once, outside. The residual
history dependence is the stored index SCAN (16-byte digests /
24-byte band rows), which is the claim's honest fine print.

Usage: python bench_history.py  [batch_docs [hist_docs [mult]]]
Defaults: 4000 batch, 20000 history, 10x multiplier. Trials are
interleaved (1x, 10x, 1x, 10x, ...) so both arms share the host's
load conditions; per-arm min over 3 trials. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from common_crawl___autumn_2025_spark.session import get_spark  # noqa: E402
from common_crawl___autumn_2025_spark.operators.dedup import (  # noqa: E402
    band_table,
    minhash_signatures,
)

VOCAB = 1000
DOC_TOKENS = 30


def _text_expr(id_col):
    """Deterministic ~30-token text as a pure JVM expression of the
    given id column — the same id always yields the same text, so a
    'copy of history doc h' is just the text expression over h."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(id_col * 31 + i.cast("long")), F.lit(VOCAB)),
            ),
        ),
        " ",
    )


def _docs(spark, start: int, n: int, src_offset: int | None = None):
    """(doc_id, text) for ids [start, start+n); text derives from
    doc_id - src_offset when given (planted copies of another range)."""
    base = spark.range(start, start + n).select(
        F.col("id").cast("long").alias("doc_id")
    )
    src = (
        F.col("doc_id") if src_offset is None else F.col("doc_id") - src_offset
    )
    return base.select("doc_id", _text_expr(src).alias("text"))


def _drop_first_token(text_col="text"):
    toks = F.split(F.col(text_col), " ")
    return F.array_join(
        F.slice(toks, 2, F.greatest(F.size(toks) - F.lit(1), F.lit(0))), " "
    )


def build_history(spark, n_hist: int, root: str) -> dict:
    """Materialize the stored indexes once (outside the timed region):
    distinct digest table (d09) and band table (d10)."""
    hist = _docs(spark, 0, n_hist)
    digest_path = os.path.join(root, f"digests_{n_hist}")
    band_path = os.path.join(root, f"bands_{n_hist}")
    (
        hist.select(F.md5("text").alias("digest"))
        .distinct()
        .withColumn("in_hist", F.lit(1))
        .write.mode("overwrite")
        .parquet(digest_path)
    )
    sigs = minhash_signatures(hist)
    band_table(sigs).write.mode("overwrite").parquet(band_path)
    return {"digests": digest_path, "bands": band_path}


def make_batch(spark, n_batch: int, n_hist: int) -> DataFrame:
    """Fixed-size batch regardless of history size: half genuinely
    new docs, a quarter exact copies of history docs, a quarter
    near variants (first token dropped) — so both the dup-hit and
    the no-hit paths are exercised."""
    new_n = n_batch // 2
    copy_n = n_batch // 4
    var_n = n_batch - new_n - copy_n
    base = 10_000_000
    new = _docs(spark, base, new_n)
    copies = _docs(spark, base + 1_000_000, copy_n,
                   src_offset=base + 1_000_000)
    variants = _docs(spark, base + 2_000_000, var_n,
                     src_offset=base + 2_000_000).select(
        "doc_id", _drop_first_token().alias("text")
    )
    return new.unionByName(copies).unionByName(variants)


def time_d09_step(spark, batch: DataFrame, digest_path: str) -> float:
    hist_digests = spark.read.parquet(digest_path)
    t0 = time.time()
    b = batch.select("doc_id", F.md5("text").alias("digest"))
    joined = b.join(hist_digests, on="digest", how="left")
    from pyspark.sql import Window

    w = Window.partitionBy("digest").orderBy("doc_id")
    verdict = joined.select(
        "doc_id",
        F.when(F.col("in_hist").isNotNull(), "dup_history")
        .when(F.row_number().over(w) > 1, "dup_batch")
        .otherwise("keep")
        .alias("verdict"),
    )
    verdict.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def time_d10_step(spark, batch: DataFrame, band_path: str) -> float:
    hist_bands = spark.read.parquet(band_path).alias("y")
    t0 = time.time()
    bx = band_table(minhash_signatures(batch)).alias("x")
    pairs = (
        bx.join(
            hist_bands,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket")),
        )
        .select(
            F.col("x.doc_id").alias("batch_doc"),
            F.col("y.doc_id").alias("hist_doc"),
        )
        .distinct()
    )
    pairs.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    n_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_hist = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    spark = get_spark("bench_history", cores=cpus, shuffle_partitions=cpus)
    root = tempfile.mkdtemp(prefix="bench_history_")
    try:
        arms = {"1x": n_hist, f"{mult}x": n_hist * mult}
        stored = {k: build_history(spark, n, root) for k, n in arms.items()}
        batch = make_batch(spark, n_batch, n_hist).localCheckpoint(eager=True)
        secs = {op: {k: [] for k in arms} for op in ("d09_step", "d10_step")}
        for _ in range(trials):
            for k in arms:  # interleave arms so they share load windows
                spark.sparkContext.setJobDescription(f"d09_step {k}")
                secs["d09_step"][k].append(
                    round(time_d09_step(spark, batch, stored[k]["digests"]), 3)
                )
                spark.sparkContext.setJobDescription(f"d10_step {k}")
                secs["d10_step"][k].append(
                    round(time_d10_step(spark, batch, stored[k]["bands"]), 3)
                )
        out = {
            "metric": "incremental_dedup_history_independence",
            "batch_docs": n_batch,
            "hist_docs": {k: n for k, n in arms.items()},
            "trials": secs,
            "min": {
                op: {k: min(v) for k, v in arms_d.items()}
                for op, arms_d in secs.items()
            },
            "ratio_10x_over_1x": {
                op: round(
                    min(arms_d[f"{mult}x"]) / min(arms_d["1x"]), 3
                )
                for op, arms_d in secs.items()
            },
            "cpus": cpus,
            "loadavg": [round(x, 2) for x in os.getloadavg()],
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
