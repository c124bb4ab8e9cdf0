"""SparkSession factory tuned for this engine.

Single place that encodes the scale posture: AQE on (runtime re-planning +
skew-join mitigation), Arrow transfers for the vectorized geometry UDFs,
bounded Arrow batches (polygon rings are 100+ points each), and a shuffle
partition count sized for the local harness but overridable for clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "openaip-yaixm-to-geojson-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    # master="cluster": leave the master to the launcher (spark-submit
    # --master / cluster manager); anything else pins it here.
    if master != "cluster":
        builder = builder.master(master or f"local[{cpus}]")
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # The streaming<->batch sessionization contract (epoch arithmetic on
        # Arrow-delivered timestamps) assumes UTC; enforce it rather than
        # inheriting the host JVM timezone, which would shift session bounds
        # (and distort gaps across DST) on non-UTC hosts.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
