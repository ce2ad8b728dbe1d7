"""Proto3 wire-format rendering of the dead-letter struct, byte-compatible
with the reference's ``ProtoDeadLetter``
(``error-handling-proto/src/main/proto/bakdata/kafka/proto/v1/deadletter.proto``):

    message ProtoDeadLetter {
        message Cause { StringValue message=1; StringValue stack_trace=2;
                        StringValue error_class=3; }
        string description = 1;  Cause cause = 2;
        StringValue input_value = 3;  StringValue topic = 4;
        Int32Value partition = 5;  Int64Value offset = 6;
        google.protobuf.Timestamp input_timestamp = 7;
    }

spark-protobuf isn't bundled here, so this encodes the *public* proto3 wire
format directly (tag = field<<3 | wiretype; LEN-prefixed submessages;
wrapper types = one-field messages).  Null handling mirrors
``ProtoDeadLetterConverter.java:41-78``: absent optional fields are simply
omitted (wrappers encode presence); proto3 default-suppression means an
empty string description is zero bytes, matching any standard decoder.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

__all__ = [
    "PROTO_DEAD_LETTER_SCHEMA",
    "encode_proto_dead_letter",
    "decode_proto_dead_letter",
    "to_proto_dead_letter",
    "jvm_protobuf_available",
]

# Canonical schema text — the registry registration payload (what a
# Confluent proto serde registers; reproduces the reference's
# ``deadletter.proto`` message layout for interop).
PROTO_DEAD_LETTER_SCHEMA = """\
syntax = "proto3";
package bakdata.kafka.proto.v1;
import "google/protobuf/wrappers.proto";
import "google/protobuf/timestamp.proto";
message ProtoDeadLetter {
  message Cause {
    google.protobuf.StringValue message = 1;
    google.protobuf.StringValue stack_trace = 2;
    google.protobuf.StringValue error_class = 3;
  }
  string description = 1;
  Cause cause = 2;
  google.protobuf.StringValue input_value = 3;
  google.protobuf.StringValue topic = 4;
  google.protobuf.Int32Value partition = 5;
  google.protobuf.Int64Value offset = 6;
  google.protobuf.Timestamp input_timestamp = 7;
}
"""


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _string_value(s: str) -> bytes:
    """google.protobuf.StringValue: field 1, string."""
    raw = s.encode("utf-8")
    return _len_field(1, raw) if raw else b""  # proto3 default suppression


def _int_value(v: int) -> bytes:
    """Int32Value/Int64Value: field 1, varint (two's-complement 64-bit for
    negatives, per proto spec)."""
    if v == 0:
        return b""
    return _tag(1, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _timestamp(seconds: int, nanos: int) -> bytes:
    out = b""
    if seconds:
        out += _tag(1, 0) + _varint(seconds & 0xFFFFFFFFFFFFFFFF)
    if nanos:
        out += _tag(2, 0) + _varint(nanos)
    return out


def _denan(v):
    """pandas null sentinels (NaN/NaT) → None (nullable ints arrive as NaN)."""
    return None if v is None or v != v else v


def encode_proto_dead_letter(d: dict) -> bytes:
    d = {k: _denan(v) for k, v in d.items()}
    cause = {k: _denan(v) for k, v in (d.get("cause") or {}).items()}
    out = b""
    desc = (d.get("description") or "").encode("utf-8")
    if desc:
        out += _len_field(1, desc)
    cause_payload = b""
    if cause.get("message") is not None:
        cause_payload += _len_field(1, _string_value(cause["message"]))
    if cause.get("stack_trace") is not None:
        cause_payload += _len_field(2, _string_value(cause["stack_trace"]))
    if cause.get("error_class") is not None:
        cause_payload += _len_field(3, _string_value(cause["error_class"]))
    if cause_payload or cause:
        out += _len_field(2, cause_payload)
    if d.get("input_value") is not None:
        out += _len_field(3, _string_value(d["input_value"]))
    if d.get("topic") is not None:
        out += _len_field(4, _string_value(d["topic"]))
    if d.get("partition") is not None:
        out += _len_field(5, _int_value(int(d["partition"])))
    if d.get("offset") is not None:
        out += _len_field(6, _int_value(int(d["offset"])))
    ts = d.get("input_timestamp")
    if ts is not None:
        t = pd.Timestamp(ts)
        out += _len_field(7, _timestamp(t.value // 1_000_000_000, t.value % 1_000_000_000))
    return out


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _decode_fields(buf: bytes) -> dict[int, list]:
    pos, out = 0, {}
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
        elif wire == 2:
            n, pos = _read_varint(buf, pos)
            v = buf[pos : pos + n]
            pos += n
        else:  # pragma: no cover - no other wire types in this schema
            raise ValueError(f"unexpected wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def _get_wrapper_str(fields: dict, n: int) -> Optional[str]:
    if n not in fields:
        return None
    inner = _decode_fields(fields[n][-1])
    return inner.get(1, [b""])[-1].decode("utf-8") if 1 in inner else ""


def _get_wrapper_int(fields: dict, n: int) -> Optional[int]:
    if n not in fields:
        return None
    inner = _decode_fields(fields[n][-1])
    v = inner.get(1, [0])[-1] if 1 in inner else 0
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def decode_proto_dead_letter(buf: bytes) -> dict:
    """Standard-decoder stand-in for round-trip tests."""
    f = _decode_fields(buf)
    out = {
        "description": f.get(1, [b""])[-1].decode("utf-8") if 1 in f else "",
        "input_value": _get_wrapper_str(f, 3),
        "topic": _get_wrapper_str(f, 4),
        "partition": _get_wrapper_int(f, 5),
        "offset": _get_wrapper_int(f, 6),
    }
    cause = {}
    if 2 in f:
        cf = _decode_fields(f[2][-1])
        cause = {
            "message": _get_wrapper_str(cf, 1),
            "stack_trace": _get_wrapper_str(cf, 2),
            "error_class": _get_wrapper_str(cf, 3),
        }
    out["cause"] = cause
    if 7 in f:
        tf = _decode_fields(f[7][-1])
        secs = tf.get(1, [0])[-1]
        nanos = tf.get(2, [0])[-1]
        out["input_timestamp"] = pd.Timestamp(secs * 1_000_000_000 + nanos)
    else:
        out["input_timestamp"] = None
    return out


_JVM_PROTO = {"checked": False, "ok": False}


def jvm_protobuf_available(spark=None) -> bool:
    """True iff the spark-protobuf module is loaded (probed once: the
    import succeeds without the jar; only analysis raises)."""
    if _JVM_PROTO["checked"]:
        return _JVM_PROTO["ok"]
    _JVM_PROTO["checked"] = True
    try:
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as F  # noqa: F401
        from pyspark.sql.protobuf.functions import to_protobuf  # noqa: F401

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            return False
        # no descriptor-free probe exists for protobuf; reflect on the JVM
        # class registry instead of building a throwaway descriptor file
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.CatalystDataToProtobuf"
        )
        _JVM_PROTO["ok"] = True
    except Exception:  # noqa: BLE001 - any failure means "use the fallback"
        _JVM_PROTO["ok"] = False
    return _JVM_PROTO["ok"]


def to_proto_dead_letter(
    dead_letter: Column,
    desc_file_path: Optional[str] = None,
    message_name: str = "ProtoDeadLetter",
) -> Column:
    """Column converter (the ``ProtoDeadLetterConverter`` analog,
    ``ProtoDeadLetterConverter.java:40-78``).

    JVM dispatch: when ``desc_file_path`` (a protoc ``FileDescriptorSet``
    for the reference's ``deadletter.proto``) is supplied AND the
    spark-protobuf module is loaded, encodes via the built-in
    ``to_protobuf`` — no Python in the hot path.  Otherwise falls back to
    the spec encoder below (proto3 wire bytes are deterministic for this
    schema: fields ascend by number, wrappers suppress defaults — both
    encoders emit identical bytes)."""
    if desc_file_path is not None and jvm_protobuf_available():
        from pyspark.sql.protobuf.functions import to_protobuf

        return to_protobuf(dead_letter, message_name, desc_file_path)

    @pandas_udf(BinaryType())
    def _enc(s: pd.DataFrame) -> pd.Series:
        # struct columns arrive as a pd.DataFrame (one column per field)
        recs = s.to_dict("records") if isinstance(s, pd.DataFrame) else list(s)
        return pd.Series(
            [None if d is None else encode_proto_dead_letter(d) for d in recs]
        )

    return _enc(dead_letter)
