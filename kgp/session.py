"""SparkSession builder with the engine's physical-execution defaults.

Everything here is cluster-portable: on a real 1000-executor cluster the
same conf applies (master comes from spark-submit, not from here).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Physical-execution defaults (SURVEY.md §4):
# - Arrow for all pandas UDF exchange (vectorized, no per-row pickling)
# - AQE: runtime shuffle-partition coalescing + skew-join splitting
# - bounded Arrow batches so giant pages don't blow executor memory
ENGINE_CONF: dict[str, str] = {
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # At 100 TB this is set per-job by the submitter; local default keeps
    # one shuffle partition per core.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB splits
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "kgp",
    cores: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` only matters in local mode; under spark-submit on a real
    cluster the master/executors come from the submit conf.
    """
    n = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{n}]" if n else "local[*]"
    builder = SparkSession.builder.appName(app_name)
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(master)
    for k, v in {**ENGINE_CONF, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
