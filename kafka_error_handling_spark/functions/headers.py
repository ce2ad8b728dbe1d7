"""Kafka-header error metadata (SURVEY.md §2.4, ``ErrorHeaderProcessor``).

The reference's ``ErrorHeaderProcessor`` forwards the **original value**
unchanged and attaches error metadata as record headers, replacing any
pre-existing header of the same key (``ErrorHeaderProcessor.java:113-116,
124-140``).  Header names reproduced from ``ErrorHeaderProcessor.java:63-95``.

Spark mapping: the Kafka sink's ``headers`` column is
``array<struct<key:string, value:binary>>`` (written with
``kafka.includeHeaders=true``).  This is a pure column transform: filter out
colliding keys from the existing array, concat the error headers.  On
non-Kafka sinks the same column simply persists as data (documented
divergence, SURVEY.md §7).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "HEADER_PREFIX",
    "HEADER_TOPIC",
    "HEADER_PARTITION",
    "HEADER_OFFSET",
    "HEADER_DESCRIPTION",
    "HEADER_EXCEPTION_CLASS_NAME",
    "HEADER_EXCEPTION_MESSAGE",
    "HEADER_EXCEPTION_STACK_TRACE",
    "error_headers",
    "with_error_headers",
]

# names from ErrorHeaderProcessor.java:63-95
HEADER_PREFIX = "__streams.errors."
HEADER_TOPIC = HEADER_PREFIX + "topic"
HEADER_PARTITION = HEADER_PREFIX + "partition"
HEADER_OFFSET = HEADER_PREFIX + "offset"
HEADER_DESCRIPTION = HEADER_PREFIX + "description"
EXCEPTION_PREFIX = HEADER_PREFIX + "exception."
HEADER_EXCEPTION_CLASS_NAME = EXCEPTION_PREFIX + "class.name"
HEADER_EXCEPTION_MESSAGE = EXCEPTION_PREFIX + "message"
HEADER_EXCEPTION_STACK_TRACE = EXCEPTION_PREFIX + "stack_trace"


def _hdr(name: str, value: Column) -> Column:
    """One header struct; value UTF-8 encoded like the reference
    (``ErrorHeaderProcessor.java:125``: ``String.valueOf`` → bytes)."""
    return F.struct(
        F.lit(name).alias("key"),
        F.encode(value.cast("string"), "UTF-8").alias("value"),
    )


def error_headers(
    description: str,
    error_col: str = "error",
    topic: Optional[Column] = None,
    partition: Optional[Column] = None,
    offset: Optional[Column] = None,
) -> Column:
    """Build the ``__streams.errors.*`` header array for an error row.

    All seven keys are ALWAYS present, matching the reference exactly:
    absent record metadata yields a header with a null byte value
    (``ErrorHeaderProcessor.java:113-115``: ``addHeader(key, null, ...)``
    via ``metadata.map(...).orElse(null)`` — Kafka allows null header
    values).
    """
    e = F.col(error_col)
    null_bytes = F.lit(None).cast("binary")

    def _meta(name: str, col: Optional[Column]) -> Column:
        if col is None:
            return F.struct(
                F.lit(name).alias("key"), null_bytes.alias("value")
            )
        return _hdr(name, col)

    headers = [
        _meta(HEADER_TOPIC, topic),
        _meta(HEADER_PARTITION, partition),
        _meta(HEADER_OFFSET, offset),
    ]
    headers += [
        _hdr(HEADER_DESCRIPTION, F.lit(description)),
        _hdr(HEADER_EXCEPTION_CLASS_NAME, e["error_class"]),
        _hdr(HEADER_EXCEPTION_MESSAGE, e["message"]),
        _hdr(HEADER_EXCEPTION_STACK_TRACE, e["stack_trace"]),
    ]
    return F.array(*headers)


def with_error_headers(
    errs: DataFrame,
    description: str,
    error_col: str = "error",
    headers_col: str = "headers",
    topic_col: Optional[str] = None,
    partition_col: Optional[str] = None,
    offset_col: Optional[str] = None,
) -> DataFrame:
    """``withErrorHeaders(description)`` (``ErrorHeaderProcessor.java:108-111``):
    forward the original columns unchanged, attach/replace error headers.

    If ``headers_col`` already exists (Kafka source with
    ``includeHeaders=true``), same-key headers are removed first —
    the add-or-replace contract of ``ErrorHeaderProcessor.java:113-116``.
    """
    new = error_headers(
        description,
        error_col,
        topic=F.col(topic_col) if topic_col else None,
        partition=F.col(partition_col) if partition_col else None,
        offset=F.col(offset_col) if offset_col else None,
    )
    ours = [
        HEADER_TOPIC,
        HEADER_PARTITION,
        HEADER_OFFSET,
        HEADER_DESCRIPTION,
        HEADER_EXCEPTION_CLASS_NAME,
        HEADER_EXCEPTION_MESSAGE,
        HEADER_EXCEPTION_STACK_TRACE,
    ]
    if headers_col in errs.columns:
        kept = F.filter(
            F.col(headers_col), lambda h: ~h["key"].isin(*ours)
        )
        return errs.withColumn(headers_col, F.concat(kept, new))
    return errs.withColumn(headers_col, new)
