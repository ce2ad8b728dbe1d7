"""Serde round-trip tests per format (SURVEY.md §5 layer 3) + header tests.

Mirrors the reference's AvroDeadLetterConverterTest optional-field
present/absent matrix (``AvroDeadLetterConverterTest.java:39-82``) and
``ErrorHeaderProcessorTest`` semantics.
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType

import kafka_error_handling_spark as keh
from kafka_error_handling_spark.formats.avro_format import (
    decode_dead_letter,
    encode_dead_letter,
    to_avro_dead_letter,
)
from kafka_error_handling_spark.formats.proto_format import (
    decode_proto_dead_letter,
    encode_proto_dead_letter,
)
from kafka_error_handling_spark.functions import headers as H

FULL = {
    "description": "step failed",
    "cause": {
        "message": "oops",
        "stack_trace": "Traceback ...",
        "error_class": "ValueError",
    },
    "input_value": "bad input",
    "topic": "in-topic",
    "partition": 3,
    "offset": 42,
    "input_timestamp": pd.Timestamp("2024-01-02 03:04:05.678"),
}

MINIMAL = {
    "description": "min",
    "cause": {"message": None, "stack_trace": None, "error_class": None},
    "input_value": None,
    "topic": None,
    "partition": None,
    "offset": None,
    "input_timestamp": None,
}


@pytest.mark.parametrize("rec", [FULL, MINIMAL], ids=["full", "minimal"])
def test_avro_round_trip(rec):
    buf = encode_dead_letter(rec)
    out = decode_dead_letter(buf)
    assert out["description"] == rec["description"]
    assert out["cause"] == rec["cause"]
    for k in ("input_value", "topic", "partition", "offset"):
        assert out[k] == rec[k]
    if rec["input_timestamp"] is None:
        assert out["input_timestamp"] is None
    else:  # millis precision by schema (timestamp-millis logical type)
        assert out["input_timestamp"] == rec["input_timestamp"]


@pytest.mark.parametrize("rec", [FULL, MINIMAL], ids=["full", "minimal"])
def test_proto_round_trip(rec):
    buf = encode_proto_dead_letter(rec)
    out = decode_proto_dead_letter(buf)
    assert out["description"] == rec["description"]
    assert out["cause"] == rec["cause"]
    for k in ("input_value", "topic", "partition", "offset"):
        assert out[k] == rec[k]
    if rec["input_timestamp"] is None:
        assert out["input_timestamp"] is None
    else:
        assert out["input_timestamp"] == rec["input_timestamp"]


def test_avro_known_bytes():
    # hand-checked encoding: union branch indices + zigzag + utf8 lengths
    buf = encode_dead_letter(MINIMAL)
    # input_value null(0), topic null(0), partition null(0), offset null(0),
    # "min" = len 3 + bytes, cause 3x null, ts null
    assert buf == bytes([0, 0, 0, 0, 6]) + b"min" + bytes([0, 0, 0, 0])


def test_proto_negative_int_varint():
    rec = dict(FULL, partition=-1, offset=-5)
    out = decode_proto_dead_letter(encode_proto_dead_letter(rec))
    assert out["partition"] == -1 and out["offset"] == -5


def test_avro_column_converter(spark):
    df = spark.createDataFrame([(1, "bad")], "key int, value string")
    p = keh.capture_map_values(df, lambda v: int(v), IntegerType())
    dlq = keh.dead_letters(keh.errors(p), "conv test", key_cols=["key"])
    out = dlq.select(
        "key", to_avro_dead_letter(F.col("dead_letter")).alias("avro")
    ).collect()
    decoded = decode_dead_letter(bytes(out[0].avro))
    assert decoded["description"] == "conv test"
    assert decoded["cause"]["error_class"] == "ValueError"
    assert decoded["input_value"] == "bad"


def test_error_headers_attached_and_replaced(spark):
    df = spark.createDataFrame([(1, "x")], "key int, value string")
    p = keh.capture_map_values(df, lambda v: int(v), IntegerType())
    errs = keh.errors(p)
    # pre-existing colliding header must be replaced, foreign header kept
    errs = errs.withColumn(
        "headers",
        F.array(
            F.struct(
                F.lit(H.HEADER_DESCRIPTION).alias("key"),
                F.encode(F.lit("stale"), "UTF-8").alias("value"),
            ),
            F.struct(
                F.lit("user.header").alias("key"),
                F.encode(F.lit("keep"), "UTF-8").alias("value"),
            ),
        ),
    )
    out = H.with_error_headers(errs, "hdr test").collect()[0]
    hdrs = {h.key: (bytes(h.value).decode() if h.value else None) for h in out.headers}
    assert hdrs["user.header"] == "keep"
    assert hdrs[H.HEADER_DESCRIPTION] == "hdr test"  # replaced, not duplicated
    assert hdrs[H.HEADER_EXCEPTION_CLASS_NAME] == "ValueError"
    assert "invalid literal" in hdrs[H.HEADER_EXCEPTION_MESSAGE]
    assert "ValueError" in hdrs[H.HEADER_EXCEPTION_STACK_TRACE]
    n_desc = sum(1 for h in out.headers if h.key == H.HEADER_DESCRIPTION)
    assert n_desc == 1
    # original value forwarded unchanged (ErrorHeaderProcessor contract)
    assert out.value == "x"
