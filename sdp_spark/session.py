"""SparkSession factory tuned for the engine.

Scale notes (100 TB design target):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting, and
  SMJ->BHJ demotion replace any hand-scheduling (SURVEY.md §4 `config` rows).
- Shuffle partitions default to the local core count here; on a real cluster
  this is overridden (e.g. 2-3x total cores) and AQE coalesces down.
- Arrow on: every pandas_udf / toPandas crossing is Arrow-batched.
- Session timezone pinned to UTC so temporal functions are deterministic and
  agree with the DuckDB oracle regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sdp_spark", cpus: int | str | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession with the engine's tuned defaults."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    return builder.getOrCreate()
