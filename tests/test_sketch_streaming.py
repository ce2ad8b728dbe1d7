"""Streaming mergeability parity for the sketch family.

Each sketch module documents a mergeability claim that is the whole
reason sketches work at 100 TB: CMS cells are SUMS (merge = cell-wise
add), HLL registers are MAXES (merge = element-wise max), KMV is a
min-k semigroup (merge = keep the k smallest of the union).  These
tests prove the claims operationally, the same way the dedup/SLO/as-of
families do: the sketch accumulated over foreachBatch micro-batches
must equal the one-shot batch sketch over the union of all batches —
for ANY batch boundary placement, which is exactly what a streaming
ingest gives you no control over.
"""

import json

from pyspark.sql import functions as F


def _write_batches(tmp_path, batches):
    src = tmp_path / "events"
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for uid in rows:
                f.write(json.dumps({"user_id": uid}) + "\n")
    return src


def _stream(spark, src, absorb):
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream.writeStream.foreachBatch(absorb).trigger(availableNow=True).start()
    q.awaitTermination(120)


_BATCHES = [
    [1, 2, 3, 4, 5, 1, 1, 2],
    [6, 7, 8, 1, 2, 9, 10, 10],
    [11, 12, 1, 13, 3, 3, 14, 15],
    [16, 1, 17, 18, 19, 20, 2, 2],
]


def test_cms_cells_merge_by_addition(spark, tmp_path):
    from kafka_error_handling_spark.plans.stats import sketch_countmin

    src = _write_batches(tmp_path, _BATCHES)
    acc: dict = {}

    def absorb(batch_df, _bid):
        for r in sketch_countmin(batch_df, F.col("user_id")).collect():
            k = (r["depth"], r["col"])
            acc[k] = acc.get(k, 0) + r["cnt"]

    _stream(spark, src, absorb)

    union = spark.createDataFrame(
        [(u,) for b in _BATCHES for u in b], "user_id long"
    )
    want = {
        (r["depth"], r["col"]): r["cnt"]
        for r in sketch_countmin(union, F.col("user_id")).collect()
    }
    assert acc == want


def test_hll_registers_merge_by_max(spark, tmp_path):
    from kafka_error_handling_spark.plans.stats import hll_registers

    src = _write_batches(tmp_path, _BATCHES)
    acc: dict = {}

    def absorb(batch_df, _bid):
        for r in hll_registers(batch_df, F.col("user_id")).collect():
            b = r["bucket"]
            acc[b] = max(acc.get(b, 0), r["register"])

    _stream(spark, src, absorb)

    union = spark.createDataFrame(
        [(u,) for b in _BATCHES for u in b], "user_id long"
    )
    want = {
        r["bucket"]: r["register"]
        for r in hll_registers(union, F.col("user_id")).collect()
    }
    # hll_registers emits the full 64-bucket spine with 0 for untouched
    # buckets; the accumulator only ever saw touched buckets
    want_touched = {b: v for b, v in want.items() if v != 0}
    acc_touched = {b: v for b, v in acc.items() if v != 0}
    assert acc_touched == want_touched


def test_kmv_min_k_is_a_semigroup(spark, tmp_path):
    from kafka_error_handling_spark.plans.stats import KMV_K

    src = _write_batches(tmp_path, _BATCHES)
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    kept: set = set()

    def absorb(batch_df, _bid):
        nonlocal kept
        local = {
            r["h"]
            for r in batch_df.select(h.alias("h"))
            .distinct()
            .orderBy(F.asc("h"))
            .limit(KMV_K)
            .collect()
        }
        kept = set(sorted(kept | local)[:KMV_K])

    _stream(spark, src, absorb)

    union = spark.createDataFrame(
        [(u,) for b in _BATCHES for u in b], "user_id long"
    )
    want = {
        r["h"]
        for r in union.select(h.alias("h"))
        .distinct()
        .orderBy(F.asc("h"))
        .limit(KMV_K)
        .collect()
    }
    assert kept == want
