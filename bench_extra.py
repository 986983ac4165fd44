"""Extra benchmarks (guide §1.4): per-query noop-sink isolation.

NOT part of the driver contract — bench.py stays frozen. Usage:
    python bench_extra.py <sf_dir> <query> [query ...]
Each query runs N trials (SPARK_GRAFT_BENCH_TRIALS, default 3) after
one warmup, materialized via the noop sink; prints per-trial seconds.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common_crawl___autumn_2025_spark.session import get_spark  # noqa: E402
from common_crawl___autumn_2025_spark.plans.catalog import QUERIES  # noqa: E402


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    QUERIES["a01_count_star"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()  # warmup
    for name in names:
        secs = []
        for _ in range(trials):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            secs.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(secs)} trials={secs}")
    spark.stop()


if __name__ == "__main__":
    main()
