"""Scale-layout artifacts: partition pruning, scale conf profile, rate source."""

import contextlib
import io

from pyspark.sql import functions as F

from kafka_error_handling_spark.conf import SCALE_CONFS, configure_for_scale
from kafka_error_handling_spark.sources.files import load_table, write_partitioned


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(e, path, ["day"])

    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "2024-01-02" in plan
    # pruned read only touches that day's rows
    expected = e.filter(F.col("day") == "2024-01-02").count()
    assert back.count() == expected > 0


def test_configure_for_scale_applies_profile(spark):
    configure_for_scale(spark, shuffle_partitions=16)
    for k, v in SCALE_CONFS.items():
        assert spark.conf.get(k) == v, k
    assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
    spark.conf.set("spark.sql.shuffle.partitions", "4")  # restore test default


def test_rate_source_smoke(spark, tmp_path):
    """Streaming source variety: the rate source drives a capture pipeline."""
    import kafka_error_handling_spark as keh
    from pyspark.sql.types import LongType

    stream = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
    p = keh.capture_map_values(
        stream, lambda v: v * 2, LongType(), value_col="value"
    )
    rows = []
    q = (
        keh.values(p)
        .writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    import time

    deadline = time.time() + 20
    while not rows and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert rows and all(r.result == r.value * 2 for r in rows)


def test_dynamic_partition_overwrite_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running a partitioned batch write must not duplicate data: with
    dynamic partitionOverwriteMode, a re-run (or a backfill of one day)
    replaces exactly the partitions it produces and leaves the rest —
    the idempotent-sink contract a checkpointed batch pipeline needs."""
    from kafka_error_handling_spark.sources.files import load_table
    from pyspark.sql import functions as F

    out = str(tmp_path / "part_out")
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        e.write.partitionBy("day").mode("overwrite").parquet(out)
        n1 = spark.read.parquet(out).count()
        # re-run the identical job (simulates a retry after failure)
        e.write.partitionBy("day").mode("overwrite").parquet(out)
        n2 = spark.read.parquet(out).count()
        assert n1 == n2 == e.count()
        # backfill ONE day: only that partition is replaced, others intact
        one_day = e.filter(F.col("day") == e.select(F.min("day")).collect()[0][0])
        one_day.write.partitionBy("day").mode("overwrite").parquet(out)
        assert spark.read.parquet(out).count() == n1
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
