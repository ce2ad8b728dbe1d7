"""Avro binary rendering of the dead-letter struct, byte-compatible with the
reference's generated ``DeadLetter`` class
(``error-handling-avro/src/main/avro/DeadLetter.avsc``).

The spark-avro SQL module is not bundled in this environment, so the
encoder is a minimal, self-contained implementation of the *public* Avro
binary encoding spec (zig-zag varint longs, length-prefixed UTF-8 strings,
union branch indices) specialized to the DeadLetter schema — ~60 lines,
deterministic, round-trip tested by our own decoder.  On a cluster with
spark-avro available, ``to_avro(struct, DEAD_LETTER_AVSC)`` is a drop-in
replacement; field order below matches the .avsc exactly:

    input_value?, topic?, partition?, offset?, description,
    cause{error_class?, message?, stack_trace?}, input_timestamp?(millis)

Runs as an Arrow-batched pandas UDF over the dead-letter struct column —
encoding is per-row by nature; Arrow keeps the transfer vectorized.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

__all__ = ["DEAD_LETTER_AVSC", "encode_dead_letter", "decode_dead_letter", "to_avro_dead_letter"]

# The reference schema, reproduced for interop (schema-registry-less writers
# embed nothing; readers need this JSON).
DEAD_LETTER_AVSC = json.dumps(
    {
        "type": "record",
        "name": "DeadLetter",
        "namespace": "com.bakdata.kafka",
        "fields": [
            {"name": "input_value", "type": ["null", "string"]},
            {"name": "topic", "type": ["null", "string"], "default": None},
            {"name": "partition", "type": ["null", "int"], "default": None},
            {"name": "offset", "type": ["null", "long"], "default": None},
            {"name": "description", "type": "string"},
            {
                "name": "cause",
                "type": {
                    "type": "record",
                    "name": "ErrorDescription",
                    "fields": [
                        {"name": "error_class", "type": ["null", "string"], "default": None},
                        {"name": "message", "type": ["null", "string"]},
                        {"name": "stack_trace", "type": ["null", "string"]},
                    ],
                },
            },
            {
                "name": "input_timestamp",
                "type": ["null", {"type": "long", "logicalType": "timestamp-millis"}],
                "default": None,
            },
        ],
    }
)


def _zigzag(n: int) -> bytes:
    """Avro long: zig-zag + base-128 varint (public Avro spec)."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zigzag(len(raw)) + raw


def _opt_string(s: Optional[str]) -> bytes:
    return _zigzag(0) if s is None else _zigzag(1) + _string(s)


def _opt_long(v: Optional[int]) -> bytes:
    return _zigzag(0) if v is None else _zigzag(1) + _zigzag(int(v))


def _denan(v):
    """pandas null sentinels (NaN/NaT) → None (nullable ints arrive as NaN)."""
    return None if v is None or v != v else v


def encode_dead_letter(d: dict) -> bytes:
    """dict (DEAD_LETTER_SCHEMA shape) → Avro binary, .avsc field order."""
    d = {k: _denan(v) for k, v in d.items()}
    cause = {k: _denan(v) for k, v in (d.get("cause") or {}).items()}
    ts = d.get("input_timestamp")
    millis = None
    if ts is not None:
        millis = int(pd.Timestamp(ts).value // 1_000_000)
    return b"".join(
        [
            _opt_string(d.get("input_value")),
            _opt_string(d.get("topic")),
            _opt_long(d.get("partition")),
            _opt_long(d.get("offset")),
            _string(d["description"]),
            _opt_string(cause.get("error_class")),
            _opt_string(cause.get("message")),
            _opt_string(cause.get("stack_trace")),
            _opt_long(millis),
        ]
    )


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def decode_dead_letter(buf: bytes) -> dict:
    """Inverse of :func:`encode_dead_letter` (round-trip testing / consumers)."""

    def rd_opt_str(pos):
        branch, pos = _read_long(buf, pos)
        if branch == 0:
            return None, pos
        n, pos = _read_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n

    def rd_opt_long(pos):
        branch, pos = _read_long(buf, pos)
        if branch == 0:
            return None, pos
        return _read_long(buf, pos)

    pos = 0
    out: dict[str, Any] = {}
    out["input_value"], pos = rd_opt_str(pos)
    out["topic"], pos = rd_opt_str(pos)
    out["partition"], pos = rd_opt_long(pos)
    out["offset"], pos = rd_opt_long(pos)
    n, pos = _read_long(buf, pos)
    out["description"] = buf[pos : pos + n].decode("utf-8")
    pos += n
    cause = {}
    cause["error_class"], pos = rd_opt_str(pos)
    cause["message"], pos = rd_opt_str(pos)
    cause["stack_trace"], pos = rd_opt_str(pos)
    out["cause"] = cause
    millis, pos = rd_opt_long(pos)
    out["input_timestamp"] = (
        None if millis is None else pd.Timestamp(millis, unit="ms")
    )
    return out


def to_avro_dead_letter(dead_letter: Column) -> Column:
    """Column converter: dead-letter struct → Avro binary bytes
    (the ``AvroDeadLetterConverter`` analog, ``AvroDeadLetterConverter.java:34-49``)."""

    @pandas_udf(BinaryType())
    def _enc(s: pd.DataFrame) -> pd.Series:
        # struct columns arrive as a pd.DataFrame (one column per field)
        recs = s.to_dict("records") if isinstance(s, pd.DataFrame) else list(s)
        return pd.Series(
            [None if d is None else encode_dead_letter(d) for d in recs]
        )

    return _enc(dead_letter)
