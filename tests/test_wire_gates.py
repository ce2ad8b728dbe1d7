"""Triangulation tests for the DLQ wire-byte gates (VERDICT r11 #3).

The CORRECTNESS gate compares the ENGINE column path against a DuckDB
oracle that derives the Avro/proto encodings independently in SQL; these
tests add the third edge — the pure-Python spec encoders — so all three
implementations must agree byte-for-byte on the fixture matrix, and a
bug in any one of them breaks a different pair.
"""

import duckdb
import pytest

from kafka_error_handling_spark.plans.wire_formats import (
    _FIXTURES,
    _sql_avro_wire,
    _sql_proto_wire,
    q_dlq_avro_wire,
    q_dlq_proto_wire,
)


def _fixture_dicts():
    out = []
    for cid, iv, tp, pt, of, de, em, es, ec, ts in _FIXTURES:
        out.append(
            (
                cid,
                {
                    "description": de,
                    "cause": {
                        "message": em,
                        "stack_trace": es,
                        "error_class": ec,
                    },
                    "input_value": iv,
                    "topic": tp,
                    "partition": pt,
                    "offset": of,
                    "input_timestamp": ts,
                },
            )
        )
    return out


def _python_hex(encode):
    return {cid: encode(d).hex().upper() for cid, d in _fixture_dicts()}


def test_avro_wire_three_way(spark):
    from kafka_error_handling_spark.formats.avro_format import (
        decode_dead_letter,
        encode_dead_letter,
    )

    want = _python_hex(encode_dead_letter)
    got_spark = {
        r["case_id"]: r["wire_hex"]
        for r in q_dlq_avro_wire(spark, "").collect()
    }
    got_duck = dict(duckdb.sql(_sql_avro_wire()).fetchall())
    assert got_spark == want, "Spark column path != Python spec encoder"
    assert got_duck == want, "DuckDB SQL derivation != Python spec encoder"
    # and the bytes decode back to the fixture fields (null-field parity)
    for cid, d in _fixture_dicts():
        back = decode_dead_letter(bytes.fromhex(want[cid]))
        assert back["input_value"] == d["input_value"], cid
        assert back["topic"] == d["topic"], cid
        assert back["partition"] == d["partition"], cid
        assert back["offset"] == d["offset"], cid
        assert back["description"] == d["description"], cid
        assert back["cause"] == d["cause"], cid


def test_proto_wire_three_way(spark):
    from kafka_error_handling_spark.formats.proto_format import (
        decode_proto_dead_letter,
        encode_proto_dead_letter,
    )

    want = _python_hex(encode_proto_dead_letter)
    got_spark = {
        r["case_id"]: r["wire_hex"]
        for r in q_dlq_proto_wire(spark, "").collect()
    }
    got_duck = dict(duckdb.sql(_sql_proto_wire()).fetchall())
    assert got_spark == want, "Spark column path != Python spec encoder"
    assert got_duck == want, "DuckDB SQL derivation != Python spec encoder"
    for cid, d in _fixture_dicts():
        back = decode_proto_dead_letter(bytes.fromhex(want[cid]))
        # proto3 wrappers distinguish absent (None) from empty ('');
        # plain int wrappers likewise — full field-level parity
        assert back["input_value"] == d["input_value"], cid
        assert back["topic"] == d["topic"], cid
        assert back["partition"] == d["partition"], cid
        assert back["offset"] == d["offset"], cid
        assert back["description"] == (d["description"] or ""), cid
        assert back["cause"] == d["cause"], cid


@pytest.mark.parametrize("sql", [_sql_avro_wire(), _sql_proto_wire()])
def test_wire_oracles_are_duckdb_clean(sql):
    rel = duckdb.sql(sql)
    assert [c.lower() for c in rel.columns] == ["case_id", "wire_hex"]
    rows = rel.fetchall()
    assert len(rows) == len(_FIXTURES)
    assert all(isinstance(h, str) and len(h) % 2 == 0 for _c, h in rows)


def test_wire_oracle_sql_stays_bounded():
    """Regression tripwire for the nested-payload inlining blow-up: the
    first proto oracle draft repeated each payload expression ~27x per
    LEN nesting level, rendered 44 MB of SQL, and stalled DuckDB's
    planner for minutes.  The CTE-layered form is ~40-80 KB; anything
    re-approaching the combinatorial regime fails here long before a
    gate hangs."""
    assert len(_sql_avro_wire()) < 200_000
    assert len(_sql_proto_wire()) < 200_000
