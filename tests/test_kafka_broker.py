"""Executable broker-gap tests (VERDICT r3 #4).

Two layers:

1. **Contract pins (always run)** — the Kafka reader/writer option wiring
   (``sources/kafka.py``) and the transactional-producer dual-topic
   protocol (``streaming/txn_sink.py:KafkaTransactionalDualSink``) are
   asserted as *code*: option names/values Spark's Kafka source actually
   consumes, EOS producer settings the reference pins
   (``ErrorCaptureTopologyTest.java:56-59``), stable fencing identity.

2. **Round-trip smokes (skip without a broker)** — the day an environment
   provides a broker (``KAFKA_TEST_BOOTSTRAP``, default localhost:9092),
   these run unmodified: batch write incl. headers → batch read back →
   byte-for-byte key/value/headers comparison, plus the
   ``__streams.errors.*`` header path end-to-end.  They skip cleanly
   (distinct reasons) when the broker is unreachable or the
   spark-sql-kafka connector jar is absent.
"""

import os
import socket
import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_error_handling_spark.sources.kafka import (
    read_batch,
    read_stream,
    to_sink_frame,
    write_stream,
)
from kafka_error_handling_spark.streaming.txn_sink import (
    KafkaTransactionalDualSink,
)

BROKER = os.environ.get("KAFKA_TEST_BOOTSTRAP", "localhost:9092")


def _broker_reachable() -> bool:
    host, _, port = BROKER.partition(":")
    try:
        with socket.create_connection((host, int(port or "9092")), timeout=1.0):
            return True
    except OSError:
        return False


def _connector_available(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BROKER
        ).option("subscribe", "_probe").load()
        return True
    except Exception as exc:  # noqa: BLE001
        return "Failed to find data source: kafka" not in str(exc)


needs_broker = pytest.mark.skipif(
    not _broker_reachable(), reason=f"no Kafka broker reachable at {BROKER}"
)


# ---------------------------------------------------------------------------
# layer 1: contract pins — run everywhere, no broker needed
# ---------------------------------------------------------------------------


class _RecordingReader:
    """Stands in for spark.readStream: records format + options so the
    helper's wiring is pinned under the exact names the Kafka source
    consumes (Spark silently ignores misspelled options — this is the bug
    class a broker-less test CAN catch)."""

    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        return self


def test_reader_option_wiring():
    from types import SimpleNamespace

    rec = _RecordingReader()
    read_stream(
        SimpleNamespace(readStream=rec),
        bootstrap_servers=BROKER,
        topics="t",
        starting_offsets="earliest",
        include_headers=True,
        max_offsets_per_trigger=1000,
        fail_on_data_loss=True,
    )
    assert rec.fmt == "kafka"
    assert rec.opts == {
        "kafka.bootstrap.servers": BROKER,
        "subscribe": "t",
        "startingOffsets": "earliest",
        "includeHeaders": "true",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "1000",
    }


def test_sink_frame_contract(spark):
    df = spark.createDataFrame(
        [Row(k="a", v="payload", hk="trace", hv=b"t1")]
    )
    out = to_sink_frame(
        df,
        key=F.col("k"),
        value=F.col("v"),
        topic="out-topic",
        headers=F.array(
            F.struct(F.col("hk").alias("key"), F.col("hv").alias("value"))
        ),
    )
    # the Kafka sink requires binary key/value, string topic, and
    # array<struct<key:string,value:binary>> headers — exactly these names
    ddl = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert ddl == {
        "key": "binary",
        "value": "binary",
        "topic": "string",
        "headers": "array<struct<key:string,value:binary>>",
    }
    row = out.collect()[0]
    assert bytes(row.key) == b"a" and bytes(row.value) == b"payload"
    assert row.headers[0].key == "trace" and bytes(row.headers[0].value) == b"t1"


def test_transactional_producer_contract():
    sink = KafkaTransactionalDualSink(BROKER, "ok-topic", "dlq-topic", app_id="app1")
    cfg = sink.producer_config("q1")
    # EOS v2 producer half — the settings the reference pins
    # (ErrorCaptureTopologyTest.java:56-59)
    assert cfg["enable.idempotence"] == "true"
    assert cfg["acks"] == "all"
    assert cfg["max.in.flight.requests.per.connection"] == "1"
    # fencing identity: STABLE across restarts (pure function of app+query)
    assert cfg["transactional.id"] == sink.producer_config("q1")["transactional.id"]
    assert (
        KafkaTransactionalDualSink(BROKER, "ok", "dlq", app_id="app1")
        .producer_config("q1")["transactional.id"]
        == cfg["transactional.id"]
    )
    # distinct queries get distinct transactional ids (no cross-fencing)
    assert cfg["transactional.id"] != sink.producer_config("q2")["transactional.id"]
    # read side must not observe aborted transactions
    ropts = sink.reader_options()
    assert ropts["kafka.isolation.level"] == "read_committed"
    assert "ok-topic" in ropts["subscribe"] and "dlq-topic" in ropts["subscribe"]


def test_transactional_kafka_sink_raises_without_broker():
    sink = KafkaTransactionalDualSink(BROKER, "ok", "dlq")
    with pytest.raises(NotImplementedError):
        sink.write_values(None, 0)
    with pytest.raises(NotImplementedError):
        sink.write_errors(None, 0)


# ---------------------------------------------------------------------------
# layer 2: round-trip smokes — run when a broker exists
# ---------------------------------------------------------------------------


@needs_broker
def test_batch_roundtrip_with_headers(spark):
    if not _connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")
    topic = f"keh-test-{uuid.uuid4().hex[:12]}"
    src = spark.createDataFrame(
        [
            Row(k="k1", v='{"a": 1}', hv=b"h1"),
            Row(k="k2", v='{"a": 2}', hv=b"h2"),
        ]
    )
    frame = to_sink_frame(
        src,
        key=F.col("k"),
        value=F.col("v"),
        topic=topic,
        headers=F.array(
            F.struct(F.lit("trace").alias("key"), F.col("hv").alias("value"))
        ),
    )
    (
        frame.write.format("kafka")
        .option("kafka.bootstrap.servers", BROKER)
        .option("includeHeaders", "true")
        .save()
    )
    back = (
        read_batch(spark, BROKER, topic)
        .select(
            F.col("key").cast("string").alias("k"),
            F.col("value").cast("string").alias("v"),
            F.expr("headers[0].key").alias("hk"),
            F.expr("headers[0].value").alias("hv"),
        )
        .orderBy("k")
        .collect()
    )
    assert [(r.k, r.v, r.hk, bytes(r.hv)) for r in back] == [
        ("k1", '{"a": 1}', "trace", b"h1"),
        ("k2", '{"a": 2}', "trace", b"h2"),
    ]


@needs_broker
def test_stream_write_error_headers_roundtrip(spark, tmp_path):
    """Capture errors → __streams.errors.* headers → Kafka sink → read back
    (the full §2.4 header path against a real broker)."""
    if not _connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")
    from kafka_error_handling_spark.functions.headers import with_error_headers

    topic = f"keh-dlq-{uuid.uuid4().hex[:12]}"
    errs = spark.createDataFrame(
        [Row(key=b"k1", value=b"bad", topic="in", partition=0, offset=7)]
    ).withColumn(
        "error",
        F.struct(
            F.lit("bad").alias("input_value"),
            F.lit("ValueError").alias("error_class"),
            F.lit("boom").alias("message"),
            F.lit("trace").alias("stack_trace"),
        ),
    )
    framed = with_error_headers(
        errs, description="test dlq", topic_col="topic",
        partition_col="partition", offset_col="offset",
    )
    sink = to_sink_frame(
        framed, key=F.col("key"), value=F.col("value"), topic=topic,
        headers=F.col("headers"),
    )
    (
        sink.write.format("kafka")
        .option("kafka.bootstrap.servers", BROKER)
        .option("includeHeaders", "true")
        .save()
    )
    back = read_batch(spark, BROKER, topic).collect()
    assert len(back) == 1
    hdrs = {h.key: bytes(h.value) for h in back[0].headers}
    assert hdrs["__streams.errors.description"] == b"test dlq"
    assert hdrs["__streams.errors.exception.class.name"] == b"ValueError"


@needs_broker
def test_streaming_read_smoke(spark, tmp_path):
    if not _connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")
    topic = f"keh-stream-{uuid.uuid4().hex[:12]}"
    spark.createDataFrame([Row(v="x")]).select(
        F.col("v").cast("binary").alias("value")
    ).write.format("kafka").option("kafka.bootstrap.servers", BROKER).option(
        "topic", topic
    ).save()
    stream = read_stream(
        spark, BROKER, topic, starting_offsets="earliest",
        max_offsets_per_trigger=10,
    )
    q = (
        write_stream(
            stream.select(F.col("value")),
            BROKER,
            topic + "-out",
            checkpoint=str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = read_batch(spark, BROKER, topic + "-out").collect()
    assert len(out) == 1 and bytes(out[0].value) == b"x"
