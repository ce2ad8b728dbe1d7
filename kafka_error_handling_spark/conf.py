"""Cluster-scale configuration profile.

One place for the Spark confs this engine assumes at 100 TB, with the
reasoning attached.  Call :func:`configure_for_scale` right after session
creation (idempotent; every knob is a public Spark conf).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["SCALE_CONFS", "configure_for_scale"]

SCALE_CONFS: dict[str, str] = {
    # AQE: runtime re-planning — coalesces small shuffle partitions, splits
    # skewed ones, switches SMJ→broadcast when a side turns out tiny.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for every pandas UDF in the capture layer; batch size
    # bounds Python-worker memory per batch (rows, not bytes).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Scan parallelism: 128 MiB splits keep per-task memory flat however
    # large the table is; openCostInBytes biases against tiny-file tasks.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.files.openCostInBytes": "4194304",
    # Deterministic timestamp rendering vs timezone-less oracles/sinks.
    "spark.sql.session.timeZone": "UTC",
    # Nanosecond parquet timestamps read as longs (normalized by
    # sources.files.load_table) instead of failing the scan.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def configure_for_scale(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply :data:`SCALE_CONFS`; ``shuffle_partitions`` defaults to
    2× default parallelism (the AQE coalescer shrinks over-provisioned
    partitions for free; under-provisioning causes spill)."""
    for k, v in SCALE_CONFS.items():
        spark.conf.set(k, v)
    if shuffle_partitions is None:
        shuffle_partitions = spark.sparkContext.defaultParallelism * 2
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark
