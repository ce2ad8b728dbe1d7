"""Streaming runtime tests: single-pass dual-sink runner, exactly-once-per-
record UDF execution, and the FilteringExceptionHandler analog (SURVEY.md
§2.5, §3.3, §4).

Uses in-memory rate/file streams — no broker needed; the Kafka wiring is
covered by sink-frame shape tests.
"""

import os
import tempfile
import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

import kafka_error_handling_spark as keh
from kafka_error_handling_spark.sources.kafka import to_sink_frame
from kafka_error_handling_spark.streaming.runner import (
    FilteringExceptionHandler,
    run_captured,
)



def test_run_captured_dual_sink(spark, tmp_path):
    # file stream of json rows
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        '{"key": 1, "value": "10"}\n{"key": 2, "value": "oops"}\n{"key": 3, "value": "7"}\n'
    )
    stream = (
        spark.readStream.schema("key int, value string")
        .json(str(src))
    )
    got = {"values": [], "errors": []}

    def transform(df):
        return keh.capture_map_values(df, lambda v: int(v) * 2, IntegerType())

    q = run_captured(
        stream,
        transform,
        write_values=lambda df, bid: got["values"].extend(df.collect()),
        write_errors=lambda df, bid: got["errors"].extend(df.collect()),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    assert sorted((r.key, r.result) for r in got["values"]) == [(1, 20), (3, 14)]
    assert [(r.key, r.error.error_class) for r in got["errors"]] == [(2, "ValueError")]


def test_wrapped_fn_runs_exactly_once_per_record(spark, tmp_path):
    """The §4 invariant: one UDF execution per record even with two sinks
    consuming the captured frame (persist inside run_captured)."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text('{"key": 1, "value": "5"}\n{"key": 2, "value": "6"}\n')
    stream = spark.readStream.schema("key int, value string").json(str(src))

    call_log = str(tmp_path / "calls.txt")  # closure-captured fixed path

    def _counting_fn(v, _path=call_log):
        # executor-side side-effect file: one line per invocation
        with open(_path, "a") as f:
            f.write(f"{v}\n")
        return int(v)

    def transform(df):
        return keh.capture_map_values(df, _counting_fn, IntegerType())

    q = run_captured(
        stream,
        transform,
        write_values=lambda df, bid: df.collect(),
        write_errors=lambda df, bid: df.collect(),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    with open(call_log) as f:
        calls = f.read().splitlines()
    assert sorted(calls) == ["5", "6"]  # exactly once each, not once per sink


def test_filtering_exception_handler_resume_and_fail(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text('{"key": 1, "value": "x"}\n')
    raw_dlq = []

    handler = FilteringExceptionHandler(
        write_raw_dlq=lambda df, bid, exc: raw_dlq.extend(df.collect())
    )

    def broken_transform(df):
        raise RuntimeError("whole-batch failure")

    stream = spark.readStream.schema("key int, value string").json(str(src))
    q = run_captured(
        stream,
        broken_transform,
        write_values=lambda df, bid: None,
        write_errors=lambda df, bid: None,
        checkpoint=str(tmp_path / "ckpt1"),
        handler=handler,
    )
    q.processAllAvailable()
    q.stop()
    # resume path: batch routed to raw DLQ with context headers, query alive
    assert len(raw_dlq) == 1
    hdrs = {h.key for h in raw_dlq[0].headers}
    assert "__streams.errors.processor.node.id" in hdrs
    assert "__streams.errors.task.id" in hdrs
    assert handler.handled and handler.handled[0][1] == "RuntimeError"

    # fail path: recoverable → query must die
    handler2 = FilteringExceptionHandler(
        write_raw_dlq=lambda df, bid, exc: None,
        error_filter=lambda exc: True,
    )
    stream2 = spark.readStream.schema("key int, value string").json(str(src))
    q2 = run_captured(
        stream2,
        broken_transform,
        write_values=lambda df, bid: None,
        write_errors=lambda df, bid: None,
        checkpoint=str(tmp_path / "ckpt2"),
        handler=handler2,
    )
    with pytest.raises(Exception):
        q2.processAllAvailable()
        q2.awaitTermination(10)
    q2.stop()


def test_kafka_sink_frame_shape(spark):
    df = spark.createDataFrame([(1, "v")], "key int, value string")
    out = to_sink_frame(
        df, key=F.col("key").cast("string"), value=F.col("value"), topic="out"
    )
    assert [f.dataType.simpleString() for f in out.schema.fields[:2]] == [
        "binary",
        "binary",
    ]
    assert out.collect()[0].topic == "out"


def test_streaming_windowed_agg_with_watermark(spark, tmp_path):
    """Stock streaming op under our runner: watermark + tumbling window."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        '{"ts": "2024-01-01T00:00:10", "v": 1.0}\n'
        '{"ts": "2024-01-01T00:00:50", "v": 2.0}\n'
        '{"ts": "2024-01-01T00:01:10", "v": 3.0}\n'
    )
    stream = (
        spark.readStream.schema("ts timestamp, v double").json(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute"))
        .agg(F.sum("v").alias("total"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    rows = {r.window.start.isoformat(): r.total for r in spark.sql("select * from win_test").collect()}
    q.stop()
    assert rows["2024-01-01T00:00:00"] == 3.0
    assert rows["2024-01-01T00:01:00"] == 3.0


def test_handler_from_config_loads_filter():
    from kafka_error_handling_spark.streaming.runner import handler_from_config

    h = handler_from_config(
        {
            "error.handling.filter": "kafka_error_handling_spark.model:is_recoverable",
            "errors.dead.letter.queue.node.id": "my-node",
        },
        write_raw_dlq=lambda df, bid, exc: None,
    )
    assert h._error_filter(ConnectionError()) is True  # loaded the real filter
    assert h._error_filter(ValueError()) is False
    assert h._node_id == "my-node"

    default = handler_from_config({}, write_raw_dlq=lambda df, bid, exc: None)
    assert default._error_filter(ConnectionError()) is False  # nothing recoverable


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join (SURVEY.md §2.7 joins row): two file
    streams, both watermarked, joined on key + event-time range — the
    state-bounded shape that survives unbounded streams at scale (state
    eviction is driven by the watermark + range condition)."""
    left = tmp_path / "left"
    right = tmp_path / "right"
    left.mkdir(); right.mkdir()
    (left / "a.json").write_text(
        '{"k": 1, "lts": "2024-01-01T00:00:10", "lv": "a"}\n'
        '{"k": 2, "lts": "2024-01-01T00:00:20", "lv": "b"}\n'
    )
    (right / "a.json").write_text(
        '{"k": 1, "rts": "2024-01-01T00:00:15", "rv": "x"}\n'
        '{"k": 2, "rts": "2024-01-01T00:09:00", "rv": "y"}\n'  # outside range
    )
    ls = (
        spark.readStream.schema("k int, lts timestamp, lv string")
        .json(str(left)).withWatermark("lts", "1 minute")
    )
    rs = (
        spark.readStream.schema("k int, rts timestamp, rv string")
        .json(str(right)).withWatermark("rts", "1 minute")
    )
    j = ls.join(
        rs,
        (ls.k == rs.k)
        & (rs.rts >= ls.lts)
        & (rs.rts <= ls.lts + F.expr("INTERVAL 5 MINUTES")),
    ).select(ls.k, "lv", "rv")
    q = (
        j.writeStream.format("memory").queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .start()
    )
    q.processAllAvailable()
    rows = [(r.k, r.lv, r.rv) for r in spark.sql("select * from ss_join").collect()]
    q.stop()
    assert rows == [(1, "a", "x")]  # k=2 pair is outside the 5-minute range


def test_restart_from_checkpoint_skips_committed_batches(spark, tmp_path):
    """Stop/restart with the same checkpoint resumes from committed
    offsets: records processed before the stop are NOT re-emitted (the
    engine analog of Kafka Streams' committed-offset restart,
    SURVEY.md §3.1 step 2 / §4 at-least-once row)."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text('{"key": 1, "value": "10"}\n')
    got = []

    def transform(df):
        return keh.capture_map_values(df, lambda v: int(v) * 2, IntegerType())

    def run_once():
        stream = spark.readStream.schema("key int, value string").json(str(src))
        q = run_captured(
            stream,
            transform,
            write_values=lambda df, bid: got.extend(df.collect()),
            write_errors=lambda df, bid: None,
            checkpoint=str(tmp_path / "ckpt_restart"),
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert [(r.key, r.result) for r in got] == [(1, 20)]

    (src / "b.json").write_text('{"key": 2, "value": "21"}\n')
    run_once()  # same checkpoint: only the new file is processed
    assert sorted((r.key, r.result) for r in got) == [(1, 20), (2, 42)]


def test_streaming_exact_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup: the first occurrence of a content digest is
    emitted, later duplicates inside the watermark horizon are dropped —
    including duplicates arriving in a LATER micro-batch (cross-batch
    state), which is what distinguishes dropDuplicatesWithinWatermark
    from a per-batch distinct."""
    from kafka_error_handling_spark.datapipe.dedup import exact_dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text(
        '{"doc_id": 1, "text": "alpha", "ts": "2026-01-01T00:00:00"}\n'
        '{"doc_id": 2, "text": "alpha", "ts": "2026-01-01T00:00:30"}\n'
        '{"doc_id": 3, "text": "beta",  "ts": "2026-01-01T00:01:00"}\n'
    )
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").json(
        str(src)
    )
    out = exact_dedup_stream(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # second batch: one duplicate of 'alpha' (must be dropped via state),
    # one new doc (must pass)
    (src / "b1.json").write_text(
        '{"doc_id": 4, "text": "alpha", "ts": "2026-01-01T00:02:00"}\n'
        '{"doc_id": 5, "text": "gamma", "ts": "2026-01-01T00:03:00"}\n'
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT doc_id, text FROM dedup_stream_out").collect()
    got = sorted((r.doc_id, r.text) for r in rows)
    assert got == [(1, "alpha"), (3, "beta"), (5, "gamma")]


def test_stream_static_enrichment_join_under_capture(spark, tmp_path):
    """Stream-static join: a streaming fact enriched against a batch dim
    inside the same foreachBatch pass as capture — the standard streaming
    enrichment topology (dim is re-read per micro-batch, no watermark
    needed on the static side)."""
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "basic")], "cust_id int, tier string"
    )
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        '{"cust_id": 1, "amount": "10"}\n'
        '{"cust_id": 2, "amount": "bad"}\n'
        '{"cust_id": 3, "amount": "5"}\n'
    )
    stream = spark.readStream.schema("cust_id int, amount string").json(str(src))

    got = {"values": [], "errors": []}

    def transform(df):
        captured = keh.capture_map_values(
            df, lambda v: int(v) * 2, IntegerType(), value_col="amount"
        )
        return captured.join(dim, "cust_id", "left")

    q = run_captured(
        stream,
        transform,
        write_values=lambda df, bid: got["values"].extend(df.collect()),
        write_errors=lambda df, bid: got["errors"].extend(df.collect()),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    vals = sorted((r.cust_id, r.result, r.tier) for r in got["values"])
    assert vals == [(1, 20, "gold"), (3, 10, None)]  # left join keeps dim-less rows
    assert [(r.cust_id, r.error.error_class) for r in got["errors"]] == [
        (2, "ValueError")
    ]


def test_streaming_sliding_window_agg(spark, tmp_path):
    """Sliding (hopping) windows in streaming mode: 1-minute windows every
    30s, so each event lands in two windows — the streaming twin of the
    batch `sliding_windows` gate query."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        '{"ts": "2024-01-01T00:00:10", "v": 1.0}\n'
        '{"ts": "2024-01-01T00:00:40", "v": 2.0}\n'
    )
    stream = spark.readStream.schema("ts timestamp, v double").json(str(src))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute", "30 seconds"))
        .agg(F.sum("v").alias("total"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    rows = {
        r.window.start.isoformat(): r.total
        for r in spark.sql("select * from slide_test").collect()
    }
    q.stop()
    # event@10 -> windows starting 23:59:30 and 00:00:00
    # event@40 -> windows starting 00:00:00 and 00:00:30
    assert rows["2023-12-31T23:59:30"] == 1.0
    assert rows["2024-01-01T00:00:00"] == 3.0
    assert rows["2024-01-01T00:00:30"] == 2.0


# ---------------------------------------------------------------------------
# Transactional dual sink (VERDICT r2 missing #3: EOS-v2-style atomic
# visibility of the ok + DLQ pair, ErrorCaptureTopologyTest.java:56-59)
# ---------------------------------------------------------------------------


def _mk_stream(spark, tmp_path, payload):
    src = tmp_path / "txsrc"
    src.mkdir(exist_ok=True)
    (src / "a.json").write_text(payload)
    return spark.readStream.schema("key int, value string").json(str(src))


def test_txn_dual_sink_atomic_pair(spark, tmp_path):
    from kafka_error_handling_spark.streaming.txn_sink import TransactionalDualSink

    sink = TransactionalDualSink(str(tmp_path / "out"))
    stream = _mk_stream(
        spark,
        tmp_path,
        '{"key": 1, "value": "10"}\n{"key": 2, "value": "oops"}\n',
    )
    q = run_captured(
        stream,
        lambda df: keh.capture_map_values(df, lambda v: int(v) * 2, IntegerType()),
        sink.write_values,
        sink.write_errors,
        checkpoint=str(tmp_path / "txckpt"),
    )
    q.processAllAvailable()
    q.stop()

    ids = sink.committed_batches()
    assert ids, "batch should be committed"
    vals = sink.read_committed(spark, "values", ids).collect()
    errs = sink.read_committed(spark, "errors", ids).collect()
    assert sorted((r.key, r.result) for r in vals) == [(1, 20)]
    assert [(r.key, r.error.error_class) for r in errs] == [(2, "ValueError")]
    # nothing lingers half-published
    import os

    assert os.listdir(os.path.join(str(tmp_path / "out"), "_staging")) == []


def test_txn_dual_sink_failure_publishes_nothing_then_retry_once(spark, tmp_path):
    """A crash after the values write but before the errors write leaves
    NO reader-visible data; the replayed batch publishes the pair exactly
    once."""
    from kafka_error_handling_spark.streaming.txn_sink import TransactionalDualSink

    sink = TransactionalDualSink(str(tmp_path / "out2"))
    boom = {"armed": True}
    orig_write_errors = sink.write_errors

    def flaky_errors(df, bid):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("simulated sink crash before commit")
        orig_write_errors(df, bid)

    def run(ck):
        stream = _mk_stream(
            spark, tmp_path, '{"key": 1, "value": "10"}\n{"key": 2, "value": "oops"}\n'
        )
        q = run_captured(
            stream,
            lambda df: keh.capture_map_values(df, lambda v: int(v) * 2, IntegerType()),
            sink.write_values,
            flaky_errors,
            checkpoint=ck,
        )
        try:
            q.processAllAvailable()
        except Exception:
            pass  # the injected crash fails the query
        finally:
            q.stop()

    ck = str(tmp_path / "txckpt2")
    run(ck)
    # crashed mid-pair: nothing committed, nothing visible
    assert sink.committed_batches() == []
    assert sink.read_committed(spark, "values") is None

    run(ck)  # restart from the same checkpoint replays the batch
    ids = sink.committed_batches()
    assert len(ids) == 1
    assert [(r.key, r.result) for r in sink.read_committed(spark, "values", ids).collect()] == [(1, 20)]
    assert len(sink.read_committed(spark, "errors", ids).collect()) == 1

    # a THIRD replay of the same batch id is an idempotent no-op
    sink.write_values(None, ids[0])
    sink.write_errors(None, ids[0])
    assert len(sink.read_committed(spark, "values", ids).collect()) == 1


def test_txn_sink_capture_watermark_end_to_end_restart(spark, tmp_path):
    """Composed path: file stream -> capture transform -> transactional
    dual sink, stopped and restarted with MORE data arriving — every
    batch pair lands atomically, nothing duplicates, late rows keep
    flowing through the same checkpoint."""
    from kafka_error_handling_spark.streaming.txn_sink import TransactionalDualSink

    src = tmp_path / "e2esrc"
    src.mkdir()
    ck = str(tmp_path / "e2eck")
    sink = TransactionalDualSink(str(tmp_path / "e2eout"))

    def transform(df):
        return keh.capture_map_values(
            df.withWatermark("ts", "10 minutes"),
            lambda v: int(v) * 10,
            IntegerType(),
        )

    def run_once():
        stream = (
            spark.readStream.schema("key int, value string, ts timestamp")
            .json(str(src))
        )
        q = run_captured(
            stream, transform, sink.write_values, sink.write_errors, checkpoint=ck
        )
        q.processAllAvailable()
        q.stop()

    (src / "a.json").write_text(
        '{"key": 1, "value": "3", "ts": "2024-01-01T00:00:00"}\n'
        '{"key": 2, "value": "bad", "ts": "2024-01-01T00:01:00"}\n'
    )
    run_once()
    # second incarnation of the query: new file, same checkpoint + sink
    (src / "b.json").write_text(
        '{"key": 3, "value": "5", "ts": "2024-01-01T00:02:00"}\n'
    )
    run_once()

    ids = sink.committed_batches()
    vals = sink.read_committed(spark, "values", ids).collect()
    errs = sink.read_committed(spark, "errors", ids).collect()
    assert sorted((r.key, r.result) for r in vals) == [(1, 30), (3, 50)]
    assert [(r.key, r.error.error_class) for r in errs] == [(2, "ValueError")]


def test_truncated_confluent_frame_raises_valueerror():
    """1-4 byte framed buffers must raise the documented ValueError, not
    struct.error (consumers dispatch on error_class == 'ValueError')."""
    import pytest

    from kafka_error_handling_spark.formats.registry import unframe_confluent

    with pytest.raises(ValueError, match="truncated frame"):
        unframe_confluent(b"\x00\x00\x01")


def test_streaming_dlq_replay_lifecycle(spark, tmp_path):
    """The DLQ-reprocessing job as it actually runs in production: a batch
    capture writes a dead-letter directory; a *streaming* replay job reads
    it as a file stream, reprocesses each record's input_value with the
    fixed function, and dual-sinks recovered vs still-dead in one pass."""
    from pyspark.sql.types import DoubleType

    from kafka_error_handling_spark.functions.dead_letter import (
        dead_letters,
        replay_dead_letters,
    )

    def v1(v):
        n = int(v)
        if n < 0:
            raise ValueError("v1 rejects negatives")
        return 10.0 / n

    src = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["5", "-2", "0", "-1"])],
        "id long, payload string",
    )
    p1 = keh.capture_map_values(src, v1, DoubleType(), value_col="payload")
    dlq_dir = str(tmp_path / "dlq")
    dead_letters(keh.errors(p1), "v1", key_cols=["id"]).write.parquet(dlq_dir)

    dlq_schema = spark.read.parquet(dlq_dir).schema
    stream = spark.readStream.schema(dlq_schema).parquet(dlq_dir)
    got = {"recovered": [], "dead": []}
    q = run_captured(
        stream,
        lambda df: replay_dead_letters(df, lambda v: 10.0 / abs(int(v)), DoubleType()),
        write_values=lambda df, bid: got["recovered"].extend(
            df.select("id", "result").collect()
        ),
        write_errors=lambda df, bid: got["dead"].extend(
            df.select("id", "error.error_class").collect()
        ),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    assert sorted((r.id, r.result) for r in got["recovered"]) == [(1, 5.0), (3, 10.0)]
    assert [(r.id, r.error_class) for r in got["dead"]] == [(2, "ZeroDivisionError")]


def test_streaming_error_slo_matches_batch(spark, tmp_path):
    """The error-rate SLO monitor as a STREAMING windowed aggregate: the
    same integer-ppm bucketing runs incrementally over a file stream and
    must agree with the batch computation on the same records."""
    import json as _json

    src = tmp_path / "slo_src"
    src.mkdir()
    rows = []
    for i in range(400):
        rows.append(
            {
                "ts": f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00",
                "event_type": "error" if i % 5 == 0 else "click",
            }
        )
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))

    stream = spark.readStream.schema("ts timestamp, event_type string").json(
        str(src)
    )
    win = F.expr("unix_timestamp(ts) DIV 21600")
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(win.alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("slo_stream")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["b"]: (r["n_total"], r["n_errors"], (r["n_errors"] * 1_000_000) // r["n_total"])
        for r in spark.sql("select * from slo_stream").collect()
    }
    # batch reference over the identical records
    batch = (
        spark.read.schema("ts timestamp, event_type string")
        .json(str(src))
        .groupBy(win.alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        )
        .collect()
    )
    want = {
        r["b"]: (r["n_total"], r["n_errors"], (r["n_errors"] * 1_000_000) // r["n_total"])
        for r in batch
    }
    assert got == want
    assert any(ppm == 200_000 for (_, _, ppm) in got.values())


def test_streaming_log_compaction_matches_batch(spark, tmp_path):
    """Kafka-style log compaction as a STREAMING aggregate: the same
    map-combined max_by winner-per-key runs in complete mode over a file
    stream; after the tombstone filter the compacted state must equal the
    batch log_compact of the same changelog."""
    import json as _json

    from kafka_error_handling_spark.plans.cdc import log_compact

    src = tmp_path / "clog"
    src.mkdir()
    rows = [
        {"k": 1, "ts": 1, "ev": "a", "seq": 1},
        {"k": 1, "ts": 2, "ev": "delete", "seq": 2},
        {"k": 2, "ts": 1, "ev": "delete", "seq": 3},
        {"k": 2, "ts": 2, "ev": "b", "seq": 4},
        {"k": 3, "ts": 5, "ev": "c", "seq": 5},
    ]
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))

    schema = "k long, ts long, ev string, seq long"
    stream = spark.readStream.schema(schema).json(str(src))
    row = F.struct("k", "ts", "ev", "seq")
    agg = stream.groupBy("k").agg(
        F.max_by(row, F.struct("ts", "seq")).alias("w"),
        (F.count(F.lit(1)) - 1).alias("n_superseded"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("clog_compact")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["k"]: (r["w"]["ev"], r["n_superseded"])
        for r in spark.sql("select * from clog_compact").collect()
        if r["w"]["ev"] != "delete"
    }
    batch = log_compact(
        spark.read.schema(schema).json(str(src)),
        ["k"],
        ["ts", "seq"],
        tombstone=lambda r: r["ev"] == "delete",
    )
    want = {r["k"]: (r["ev"], r["n_superseded"]) for r in batch.collect()}
    assert got == want == {2: ("b", 1), 3: ("c", 0)}


def test_streaming_hll_registers_merge_across_batches(spark, tmp_path):
    """HLL registers are a mergeable semigroup: accumulating elementwise
    maxes per micro-batch must equal the one-shot batch sketch over the
    union of the data — the property that lets a stream maintain an
    approximate-distinct dashboard without keeping the key set in state."""
    import json

    from pyspark.sql import functions as F

    from kafka_error_handling_spark.plans.stats import HLL_M, hll_registers

    src = tmp_path / "in"
    src.mkdir()
    # three files -> (with maxFilesPerTrigger=1) three micro-batches
    for i, lo_hi in enumerate([(0, 40), (30, 80), (75, 130)]):
        with open(src / f"b{i}.json", "w") as f:
            for v in range(*lo_hi):
                f.write(json.dumps({"user_id": v}) + "\n")

    merged = {b: 0 for b in range(HLL_M)}

    def absorb(batch_df, _bid):
        for r in hll_registers(batch_df, F.col("user_id")).collect():
            merged[r["bucket"]] = max(merged[r["bucket"]], r["register"])

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream.writeStream.foreachBatch(absorb).trigger(availableNow=True).start()
    q.awaitTermination(120)

    batch = spark.createDataFrame([(v,) for v in range(130)], "user_id long")
    expected = {
        r["bucket"]: r["register"]
        for r in hll_registers(batch, F.col("user_id")).collect()
    }
    assert merged == expected


def test_streaming_incremental_neardup_probe(spark, tmp_path):
    """Per-micro-batch near-dup screening: each batch's banded signature
    keys probe the accumulated history index (the streaming shape of
    dedup_incremental_neardup) — a near-copy arriving in a LATER batch
    must flag, the first copy must not, and the index grows by exactly
    the batch's distinct band keys."""
    import json

    from pyspark.sql import functions as F

    from kafka_error_handling_spark.datapipe.dedup import (
        banded_keys,
        minhash_signature,
    )

    src = tmp_path / "docs"
    src.mkdir()
    base_text = "the quick brown fox jumps over the lazy dog again and again"
    batches = [
        [(1, base_text), (2, "completely different content about spark windows")],
        [(3, base_text + " extra"), (4, "yet another unrelated document body")],
    ]
    for i, docs in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for did, text in docs:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")

    history_keys: set = set()
    flagged: dict = {}

    def probe(batch_df, _bid):
        bk = banded_keys(minhash_signature(batch_df)).collect()
        by_doc: dict = {}
        for r in bk:
            by_doc.setdefault(r["doc_id"], set()).add((r["band"], r["bkey"]))
        for did, keys in sorted(by_doc.items()):
            flagged[did] = bool(keys & history_keys)
            history_keys.update(keys)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream.writeStream.foreachBatch(probe).trigger(availableNow=True).start()
    q.awaitTermination(120)

    # the file source does not guarantee which batch fires first, but the
    # probe contract is order-symmetric: whichever near-copy arrives
    # SECOND flags against the first, the first never flags, and the two
    # unrelated docs never flag
    assert flagged[1] != flagged[3]
    assert flagged[2] is False
    assert flagged[4] is False


def test_streaming_asof_enrichment_parity(spark, tmp_path):
    """Streaming as-of enrichment (VERDICT r6 item 4a): a fact stream
    joined as-of against a dimension table inside foreachBatch must equal
    the one-shot batch as-of join over the union of all micro-batches —
    the property that makes the batch `asof_join` reusable unchanged as
    the streaming enrichment operator.  Holds because a left row's match
    depends only on the (static) right side, never on its own batch's
    other rows; checked for the default backward direction AND the
    tolerance mask, the two modes a streaming enricher actually runs
    (price-as-of-trade, stale-quote suppression)."""
    import json

    from kafka_error_handling_spark.plans.asof import asof_join

    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10.0),
            (1, "2024-01-01 06:00:00", 11.0),
            (2, "2024-01-01 03:00:00", 20.0),
            (3, "2024-01-02 00:00:00", 30.0),
        ],
        "k long, rts string, price double",
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "price")

    src = tmp_path / "facts"
    src.mkdir()
    batches = [
        [(1, "2024-01-01 05:00:00"), (2, "2024-01-01 02:00:00")],
        [(1, "2024-01-01 07:00:00"), (3, "2024-01-01 12:00:00")],
        [(2, "2024-01-01 03:00:00"), (9, "2024-01-01 04:00:00")],
    ]
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for k, ts in rows:
                f.write(json.dumps({"k": k, "lts": ts}) + "\n")

    def enrich(df):
        joined = asof_join(
            df, right, on="k", left_ts="lts", right_ts="rts",
            tolerance="4 hours",
        )
        return {(r["k"], str(r["lts"])): r["asof_price"] for r in joined.collect()}

    got: dict = {}

    def absorb(batch_df, _bid):
        got.update(enrich(batch_df.select("k", F.col("lts").cast("timestamp").alias("lts"))))

    stream = (
        spark.readStream.schema("k long, lts string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream.writeStream.foreachBatch(absorb).trigger(availableNow=True).start()
    q.awaitTermination(120)

    union = spark.createDataFrame(
        [(k, ts) for b in batches for k, ts in b], "k long, lts string"
    ).select("k", F.col("lts").cast("timestamp").alias("lts"))
    want = enrich(union)
    assert got == want
    # spot-pin the semantics, not just self-consistency: k=2's 02:00 event
    # precedes every right row (NULL), the 03:00 event matches exactly;
    # k=3 at 12:00 has its match masked by the 4h tolerance; k=9 never
    # matches; k=1 at 07:00 takes the 06:00 price, not the 00:00 one
    assert want[(2, "2024-01-01 02:00:00")] is None
    assert want[(2, "2024-01-01 03:00:00")] == 20.0
    assert want[(3, "2024-01-01 12:00:00")] is None
    assert want[(9, "2024-01-01 04:00:00")] is None
    assert want[(1, "2024-01-01 07:00:00")] == 11.0


def test_streaming_dlq_replay_parity_with_batch_gate(spark, sf_dir, tmp_path):
    """VERDICT r7 #5: the reference consumes its DLQ from a topic, so the
    replay must be micro-batch-invariant — replaying the gate's v1 DLQ as
    a file stream (one parquet file per trigger) and unioning the
    per-batch recovered/still-dead splits must equal the one-shot batch
    gate `dlq_replay` exactly, for an arbitrary batch-boundary placement.
    Same parity pattern as the sketch/as-of foreachBatch tests."""
    from pyspark.sql.types import DoubleType

    from kafka_error_handling_spark.functions.dead_letter import (
        dead_letters,
        replay_dead_letters,
    )
    from kafka_error_handling_spark.plans.error_queries import (
        _events,
        _parse_rate_v1,
        _parse_rate_v2,
        q_dlq_replay,
    )

    ev = _events(spark, sf_dir)
    p1 = keh.capture_map_values(ev, _parse_rate_v1, DoubleType(), value_col="props")
    dlq = dead_letters(
        keh.errors(p1), "rate pipeline v1", key_cols=["event_id"], timestamp_col="ts"
    )
    dlq_dir = str(tmp_path / "dlq")
    # 4 files -> 4 micro-batches under maxFilesPerTrigger=1: boundaries
    # cut the DLQ at arbitrary (hash-partitioned) places
    dlq.repartition(4).write.parquet(dlq_dir)

    schema = spark.read.parquet(dlq_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dlq_dir)
    )
    acc = []

    def absorb(batch_df, _bid):
        r = F.col("r")
        out = replay_dead_letters(batch_df, _parse_rate_v2, DoubleType()).select(
            "event_id",
            F.when(r["error"].isNull(), F.lit("recovered"))
            .otherwise(F.lit("dead"))
            .alias("replay_status"),
            F.round(r["result"], 4).alias("rate"),
        )
        acc.extend((x.event_id, x.replay_status, x.rate) for x in out.collect())

    q = stream.writeStream.foreachBatch(absorb).trigger(availableNow=True).start()
    q.awaitTermination(180)

    want = sorted(
        (x.event_id, x.replay_status, x.rate)
        for x in q_dlq_replay(spark, sf_dir).collect()
    )
    assert sorted(acc) == want
    assert len(acc) > 0 and {s for _, s, _ in acc} == {"recovered", "dead"}


def test_streaming_lsh_candidate_parity_with_batch_pipeline(spark, sf_dir, tmp_path):
    """VERDICT r8 #5a: the one heavy pipeline without a foreachBatch parity
    test.  The streaming claim behind incremental near-dup dedup is that
    the minhash signature is a PURE per-document map (stateless in the
    stream), so a signature store appended micro-batch by micro-batch is
    batch-boundary-invariant — LSH banding + bucket self-join over the
    accumulated store must equal the one-shot batch candidates over the
    union corpus, for ANY boundary placement.  Same pattern as the
    sketch/as-of/replay parity tests.
    """
    from kafka_error_handling_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )
    from kafka_error_handling_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src_dir = str(tmp_path / "docs_stream")
    # 4 files -> 4 micro-batches under maxFilesPerTrigger=1; hash
    # repartition cuts the corpus at arbitrary places (near-dup pairs DO
    # straddle batch boundaries, which is the point)
    docs.repartition(4).write.parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    store_dir = str(tmp_path / "sig_store")

    def absorb(batch_df, _bid):
        # per-batch work is the stateless signature map; the ONLY state a
        # streaming LSH deduper carries is this appended signature store
        minhash_signature(batch_df).write.mode("append").parquet(store_dir)

    q = stream.writeStream.foreachBatch(absorb).trigger(availableNow=True).start()
    q.awaitTermination(180)

    store = spark.read.parquet(store_dir)
    got = sorted(
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(store).collect()
    )
    want = sorted(
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(minhash_signature(docs)).collect()
    )
    assert got == want
    assert len(got) > 0  # sf0.001 plants real near-dups; empty = broken test
    # the store really accumulated across multiple micro-batches
    assert store.count() == docs.count()


def test_streaming_dsir_distribution_parity_with_batch(spark, sf_dir, tmp_path):
    """The streaming claim behind incremental DSIR data selection: the
    bucket distribution sketch is a plain integer-sum aggregate, so
    per-micro-batch counts appended to a store and re-summed equal the
    one-shot corpus distribution for ANY batch-boundary placement — and
    the selection scored against the merged sketch is identical to the
    batch selection.  Same accumulate-then-merge pattern as the
    sketch/LSH-candidate parity tests."""
    from pyspark.sql import functions as F

    from kafka_error_handling_spark.datapipe.sampling import (
        dsir_bucket_counts,
        dsir_importance,
    )
    from kafka_error_handling_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    src_dir = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    store_dir = str(tmp_path / "dsir_store")

    def absorb(batch_df, _bid):
        dsir_bucket_counts(batch_df).write.mode("append").parquet(store_dir)

    q = stream.writeStream.foreachBatch(absorb).trigger(availableNow=True).start()
    q.awaitTermination(180)

    merged = (
        spark.read.parquet(store_dir)
        .groupBy("bucket")
        .agg(
            F.sum("cnt_tgt").alias("cnt_tgt"),
            F.sum("cnt_pool").alias("cnt_pool"),
        )
    )
    got = [
        (r.doc_id, r.imp_micro)
        for r in dsir_importance(docs, bucket_counts=merged).collect()
    ]
    want = [
        (r.doc_id, r.imp_micro) for r in dsir_importance(docs).collect()
    ]
    assert got == want
    assert len(got) > 0


def test_streaming_semantic_decontam_parity_with_batch(spark, sf_dir, tmp_path):
    """VERDICT r10 #3: the streaming claim behind incremental semantic
    decontamination — the benchmark embedding set is STATIC (the bounded
    broadcast side), and a corpus document's flag depends only on its own
    vector against that set, never on other corpus rows.  So screening
    each micro-batch as it arrives and unioning the per-batch flag sets
    must equal the one-shot batch screen over the union corpus, for ANY
    batch-boundary placement — the same per-row-independence property the
    as-of enrichment parity test pins, on the ingest path this operator
    actually serves (screen documents AS they stream in, before they ever
    reach the training corpus)."""
    from kafka_error_handling_spark.datapipe.text import decontaminate_semantic
    from kafka_error_handling_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 97 == 0)
    corpus = emb.filter(F.col("vec_id") % 97 != 0)

    src_dir = str(tmp_path / "emb_stream")
    # 4 files -> 4 micro-batches under maxFilesPerTrigger=1; hash
    # repartition cuts the corpus at arbitrary places
    corpus.repartition(4).write.parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    acc = []

    def absorb(batch_df, _bid):
        out = decontaminate_semantic(batch_df, bench)
        acc.extend(
            (r.doc_id, r.bench_id, r.max_cos) for r in out.collect()
        )

    q = stream.writeStream.foreachBatch(absorb).trigger(availableNow=True).start()
    q.awaitTermination(180)

    want = sorted(
        (r.doc_id, r.bench_id, r.max_cos)
        for r in decontaminate_semantic(corpus, bench).collect()
    )
    assert sorted(acc) == want
    assert len(acc) > 0  # tau is calibrated to the testdata; empty = broken


def test_streaming_quality_nb_sketch_parity_with_batch(spark, sf_dir, tmp_path):
    """The quality classifier's training sketch is plain integer sums per
    bucket (incl. the bucket -1 prior row), so per-micro-batch sketches
    appended to a store and re-summed equal the one-shot corpus sketch
    for ANY batch-boundary placement — and the selection scored against
    the merged sketch is identical to the batch selection.  The
    dsir_bucket_counts accumulate-then-merge contract, for the trained-
    scorer half of the data-selection pair."""
    from kafka_error_handling_spark.datapipe.sampling import (
        quality_nb_counts,
        quality_nb_select,
    )
    from kafka_error_handling_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    src_dir = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    store_dir = str(tmp_path / "qnb_store")

    def absorb(batch_df, _bid):
        quality_nb_counts(batch_df).write.mode("append").parquet(store_dir)

    q = stream.writeStream.foreachBatch(absorb).trigger(availableNow=True).start()
    q.awaitTermination(180)

    merged = (
        spark.read.parquet(store_dir)
        .groupBy("bucket")
        .agg(
            F.sum("cnt_pass").alias("cnt_pass"),
            F.sum("cnt_fail").alias("cnt_fail"),
        )
    )
    got = [
        (r.doc_id, r.weak_pass, r.nb_micro)
        for r in quality_nb_select(docs, counts=merged).collect()
    ]
    want = [
        (r.doc_id, r.weak_pass, r.nb_micro)
        for r in quality_nb_select(docs).collect()
    ]
    assert got == want
    assert len(got) > 0
