"""Round-trip every batch format with a schema contract (SURVEY §2.7
sources/sinks: the engine exposes Spark's full source matrix, not just
the reference's Kafka edge)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_error_handling_spark.sources.files import (
    FORMATS,
    read_table,
    write_table,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)

ROWS = [(1, "alpha", 0.5), (2, "beta", -1.25), (3, None, 2.0)]


@pytest.mark.parametrize("fmt", FORMATS)
def test_round_trip(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / f"t_{fmt}")
    write_table(df, path, fmt)
    back = read_table(spark, path, fmt, schema=SCHEMA)
    assert back.schema == SCHEMA
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == sorted(ROWS)


def test_text_formats_require_schema(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "t_json_noschema")
    write_table(df, path, "json")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, path, "json")


def test_csv_null_vs_empty_string_round_trip(spark, tmp_path):
    """CSV cannot distinguish NULL from '' without an explicit nullValue
    marker — pin the engine convention (explicit nullValue sentinel,
    default quoted emptyValue) so the round-trip is lossless."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "id long, s string"
    )
    path = str(tmp_path / "t_csv_nulls")
    write_table(df, path, "csv", nullValue="\\N")
    back = read_table(spark, path, "csv", schema="id long, s string", nullValue="\\N")
    assert {r.id: r.s for r in back.collect()} == {1: None, 2: "", 3: "x"}
