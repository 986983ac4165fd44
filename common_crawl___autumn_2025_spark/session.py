"""SparkSession factory.

Single place where session-level tuning lives so that every entry
point (tests, bench, driver contract) runs with the same, scale-aware
configuration:

- Arrow on (all Python boundaries are Arrow-batched; the engine has
  no row-at-a-time Python UDFs),
- AQE on (runtime coalesce + skew-join splitting supplements our own
  explicit salting),
- fixed ``spark.sql.shuffle.partitions`` for deterministic plans at
  test scale (AQE coalesces down when partitions are small),
- UTC session timezone so timestamp semantics match the DuckDB
  oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "common_crawl_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or
    all local cores. On a real cluster the master/resource settings
    come from spark-submit; everything set here is master-agnostic
    except the ``local[N]`` fallback.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # parquet scan sizing: at 100 TB this is the lever that keeps
        # input splits ~128MB regardless of file layout
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    # Only force a master when none is configured (spark-submit on a
    # cluster supplies its own).
    if not os.environ.get("SPARK_GRAFT_NO_LOCAL_MASTER"):
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
