"""Dead-letter formatting & routing (SURVEY.md §2.4).

The reference's ``DeadLetterProcessor`` (``DeadLetterProcessor.java:77-111``)
builds a ``DeadLetterDescription`` from a ``ProcessingError`` + record
metadata, converts it via a pluggable ``DeadLetterConverter``
(``DeadLetterConverter.java:32-41``), and re-stamps the output timestamp to
wall clock (``DeadLetterProcessor.java:108``).

In Spark this whole processor is a **pure projection** — no UDF, fully
JVM-side, whole-stage-codegen friendly:

    errs → select(key, dead_letter_struct(...), current_timestamp())

Converters are ``Column → Column`` functions: identity keeps the struct,
:mod:`..formats.avro_format` / :mod:`..formats.proto_format` render the
byte-compatible Avro / proto3 encodings of the reference's schemas.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model import DEAD_LETTER_SCHEMA

__all__ = [
    "dead_letter_struct",
    "dead_letters",
    "replay_dead_letters",
    "DEAD_LETTER_SCHEMA",
]


def dead_letter_struct(
    description: str,
    error_col: str = "error",
    topic: Optional[Column] = None,
    partition: Optional[Column] = None,
    offset: Optional[Column] = None,
    input_timestamp: Optional[Column] = None,
) -> Column:
    """Build the ``DeadLetterDescription`` struct column
    (``DeadLetterProcessor.java:88-104``; schema ``DeadLetterDescription.java:39-60``).

    ``error_col`` must hold an :data:`~kafka_error_handling_spark.model.ERROR_SCHEMA`
    struct (from ``operators.capture.errors``).  Metadata columns default to
    NULL — batch file sources have no topic/partition/offset, exactly like
    the reference when ``recordMetadata()`` is absent
    (``DeadLetterProcessor.java:91,100-102`` uses Optional metadata).
    """
    e = F.col(error_col)
    null_s = F.lit(None).cast("string")
    return F.struct(
        F.lit(description).alias("description"),
        F.struct(
            e["message"].alias("message"),
            e["stack_trace"].alias("stack_trace"),
            e["error_class"].alias("error_class"),
        ).alias("cause"),
        e["input_value"].alias("input_value"),
        (topic if topic is not None else null_s).cast("string").alias("topic"),
        (partition if partition is not None else F.lit(None)).cast("int").alias("partition"),
        (offset if offset is not None else F.lit(None)).cast("long").alias("offset"),
        (input_timestamp if input_timestamp is not None else F.lit(None))
        .cast("timestamp")
        .alias("input_timestamp"),
    )


def dead_letters(
    errs: DataFrame,
    description: str,
    error_col: str = "error",
    key_cols: Optional[list] = None,
    topic_col: Optional[str] = None,
    partition_col: Optional[str] = None,
    offset_col: Optional[str] = None,
    timestamp_col: Optional[str] = None,
    dead_letter_col: str = "dead_letter",
) -> DataFrame:
    """``DeadLetterProcessor.create(description, converter)`` as a transform
    (``DeadLetterProcessor.java:77-80``).

    Input: the error branch from ``operators.capture.errors``.  Output: the
    original key columns (old key preserved, ``ProcessedKeyValue.java:64-67``),
    the dead-letter struct, and ``processing_timestamp = current_timestamp()``
    — the reference re-stamps dead letters to wall clock
    (``DeadLetterProcessor.java:108``); DLQ time ≠ event time by design.
    """
    cols = []
    for k in key_cols or []:
        cols.append(F.col(k))
    cols.append(
        dead_letter_struct(
            description,
            error_col,
            topic=F.col(topic_col) if topic_col else None,
            partition=F.col(partition_col) if partition_col else None,
            offset=F.col(offset_col) if offset_col else None,
            input_timestamp=F.col(timestamp_col) if timestamp_col else None,
        ).alias(dead_letter_col)
    )
    cols.append(F.current_timestamp().alias("processing_timestamp"))
    return errs.select(*cols)


def replay_dead_letters(
    dlq: DataFrame,
    fn,
    result_type,
    dead_letter_col: str = "dead_letter",
    error_filter=None,
    processed_col: str = "r",
):
    """Reprocess a dead-letter frame with a (presumably fixed) function —
    the standard DLQ-consumer lifecycle around the reference library: a
    repaired deployment re-reads the dead-letter topic and replays each
    record (the reference keeps the full original value in the dead letter
    for exactly this, ``DeadLetterDescription.java:52`` ``inputValue``).

    The function receives ``dead_letter.input_value`` — the stringified
    original value, which is all a DLQ consumer has.  Returns the captured
    frame: split with ``operators.capture.values`` / ``errors`` (recovered
    vs still-dead), or project the sum-type struct directly for a one-pass
    consumer.  Records that fail *again* keep full error metadata, so a
    replay's own DLQ is well-formed — replays compose.
    """
    from ..operators.capture import capture_map_values

    tmp = "__replay_input"
    replay_in = dlq.withColumn(tmp, F.col(f"{dead_letter_col}.input_value"))
    out = capture_map_values(
        replay_in,
        fn,
        result_type,
        value_col=tmp,
        error_filter=error_filter,
        processed_col=processed_col,
    )
    return out.drop(tmp)
