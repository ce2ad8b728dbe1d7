"""End-to-end test of the reference's flagship README topology
(SURVEY.md §3.1, ``README.md:72-84``) on Kafka-shaped frames:

    kafka source schema (binary key/value + headers)
      → serde edge (from_json)
      → captureErrors(map)
      → success split → output sink frame
      → error split → DeadLetterProcessor → Avro DLQ + error headers
      → kafka sink contract (binary key/value + topic + headers)

No broker: the source frame is constructed with the exact Kafka source
schema; the sink side is validated against the Kafka sink contract.
"""

import json

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

import kafka_error_handling_spark as keh
from kafka_error_handling_spark.formats.avro_format import (
    decode_dead_letter,
    to_avro_dead_letter,
)
from kafka_error_handling_spark.functions import headers as H
from kafka_error_handling_spark.sources.kafka import (
    KAFKA_SOURCE_SCHEMA,
    to_sink_frame,
)


def _kafka_frame(spark):
    rows = []
    for offset, (k, payload) in enumerate(
        [(b"k1", {"amount": 10}), (b"k2", {"amount": 0}), (b"k3", {"amount": 4})]
    ):
        rows.append(
            Row(
                key=k,
                value=json.dumps(payload).encode(),
                topic="in-topic",
                partition=0,
                offset=offset,
                timestamp=None,
                timestampType=0,
                headers=[Row(key="trace", value=b"abc")],
            )
        )
    return spark.createDataFrame(rows, KAFKA_SOURCE_SCHEMA)


def test_readme_topology_end_to_end(spark):
    src = _kafka_frame(spark)

    # serde edge: bytes → parsed value (stays alongside the raw columns)
    parsed = src.withColumn(
        "amount",
        F.get_json_object(F.col("value").cast("string"), "$.amount").cast("int"),
    )

    # the wrapped user function: fails on amount == 0
    p = keh.capture_map_values(
        parsed, lambda a: 100 // a, IntegerType(), value_col="amount"
    )

    # success branch → output topic sink frame
    ok = keh.values(p)
    out = to_sink_frame(
        ok,
        key=F.col("key").cast("string"),
        value=F.col("result").cast("string"),
        topic="out-topic",
    )
    got = {bytes(r.key): bytes(r.value) for r in out.collect()}
    assert got == {b"k1": b"10", b"k3": b"25"}
    assert out.schema["value"].dataType.simpleString() == "binary"

    # error branch → dead letter with source metadata + avro bytes + headers
    errs = keh.errors(p)
    dlq = keh.dead_letters(
        errs,
        "amount pipeline",
        key_cols=["key"],
        topic_col="topic",
        partition_col="partition",
        offset_col="offset",
    )
    with_avro = dlq.withColumn("payload", to_avro_dead_letter(F.col("dead_letter")))
    row = with_avro.collect()[0]
    decoded = decode_dead_letter(bytes(row.payload))
    assert decoded["description"] == "amount pipeline"
    assert decoded["topic"] == "in-topic"
    assert decoded["partition"] == 0 and decoded["offset"] == 1
    assert decoded["cause"]["error_class"] == "ZeroDivisionError"

    # headers path: attach __streams.errors.* next to the existing trace header
    hdr = H.with_error_headers(
        errs, "amount pipeline", topic_col="topic", partition_col="partition",
        offset_col="offset",
    )
    hrow = hdr.collect()[0]
    keys = [h.key for h in hrow.headers]
    assert "trace" in keys  # pre-existing header preserved
    assert H.HEADER_TOPIC in keys and H.HEADER_OFFSET in keys
    hmap = {h.key: h.value for h in hrow.headers}
    assert bytes(hmap[H.HEADER_TOPIC]) == b"in-topic"
    assert bytes(hmap[H.HEADER_OFFSET]) == b"1"
    # sink contract with headers column
    sink = to_sink_frame(
        hdr, key=F.col("key").cast("string"), value=F.col("value"),
        topic="dlq-topic", headers=F.col("headers"),
    )
    assert set(sink.columns) == {"key", "value", "topic", "headers"}
