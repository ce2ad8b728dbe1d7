"""Stateful capture wrapper tests: user state must keep working under
decoration (the stores() pass-through contract,
``ErrorCapturingProcessor.java:140-143``)."""

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_error_handling_spark.streaming.stateful import capture_stateful_process

RESULT_T = StructType(
    [
        StructField("value", StringType()),
        StructField("running_count", LongType()),
    ]
)
STATE_T = StructType([StructField("n", LongType())])


def test_stateful_capture_preserves_state_across_errors(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        '{"key": 1, "value": "a"}\n'
        '{"key": 1, "value": "POISON"}\n'
        '{"key": 1, "value": "b"}\n'
        '{"key": 2, "value": "c"}\n'
    )
    stream = spark.readStream.schema("key int, value string").json(str(src))

    def fn(key, rec, state):
        (n,) = state.get if state.exists else (0,)
        if rec["value"] == "POISON":
            raise ValueError("poison pill")
        n += 1
        state.update((n,))
        return [{"value": rec["value"], "running_count": n}]

    out = capture_stateful_process(
        stream,
        ["key"],
        fn,
        RESULT_T,
        STATE_T,
        input_value_col="value",
    )
    rows = []
    q = (
        out.writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    ok = sorted(
        (r.key, r.result.value, r.result.running_count)
        for r in rows
        if r.error is None
    )
    errs = [(r.key, r.error.error_class) for r in rows if r.error is not None]
    # state advanced for a and b despite the poison row in between
    assert (1, "a", 1) in ok and (1, "b", 2) in ok
    assert (2, "c", 1) in ok
    assert errs == [(1, "ValueError")]
    assert all(
        r.error.input_value == "POISON" for r in rows if r.error is not None
    )
