"""SparkSession factory tuned for the frontier workload.

Design notes (100 TB scale):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting.
  The frontier has exactly 3 hot hosts (registry.npmjs.org,
  cdn.jsdelivr.net, api.github.com) so skew is structural; we salt
  explicitly (frontier.py) and let AQE mop up residual imbalance.
- Arrow on: every per-document transform is a vectorized pandas UDF;
  maxRecordsPerBatch bounds UDF batch memory (the reference's analogue
  is the 127-name downloads batch, src/npm/index.ts:175-239).
- shuffle.partitions defaults to cores on local mode; on a real cluster
  set it to ~2-3x total cores via spark-submit conf (never hardcoded).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "npm-search-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores``/``shuffle_partitions`` are for local testing; a production
    deployment passes master/conf through spark-submit and this function
    only applies the workload-specific SQL configs.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_GRAFT_SUBMITTED"):
        # local test mode; spark-submit deployments set master themselves
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
