"""Pins for the evidence/stress tooling (no Spark session needed).

The evidence ledger is the hard signal the driver-budget priority is
derived from (VERDICT r5 items 1-2), so its green-row criterion and the
order-insensitive frame hash get the same pin treatment as query
semantics.  Covers the ADVICE-r5 fixes:

- a driver row with ``hash_match=false`` is a VALUE MISMATCH and must
  never be ledgered as verified (the r1/r2 artifacts really contain such
  rows);
- an unknown family argument to ``tools/stress.py`` must error out
  before Spark startup, never silently run every family.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_correctness import _canon, _driver_evidence, frame_hash  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_round(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


def test_driver_evidence_green_criterion(tmp_path):
    _write_round(
        tmp_path,
        1,
        {
            "hash_green": {"rows_match": True, "hash_match": True, "err": None},
            # equal row counts but value hash mismatched — NOT green
            "value_mismatch": {"rows_match": True, "hash_match": False, "err": None},
            # rows-only gate (no oracle SQL): green on rows_match + no err
            "rows_only_green": {"rows_match": True, "hash_match": None, "err": None},
            "rows_only_err": {"rows_match": True, "hash_match": None, "err": "boom"},
            "rows_only_miscount": {"rows_match": False, "hash_match": None, "err": None},
        },
    )
    ev = _driver_evidence(str(tmp_path))
    assert ev == {"hash_green": 1, "rows_only_green": 1}


def test_driver_evidence_newest_round_wins(tmp_path):
    _write_round(tmp_path, 1, {"q": {"rows_match": True, "hash_match": True, "err": None}})
    _write_round(tmp_path, 3, {"q": {"rows_match": True, "hash_match": True, "err": None}})
    # a later RED round does not erase earlier green evidence (the ledger
    # records the newest GREEN row; the driver artifact itself shows the red)
    _write_round(tmp_path, 4, {"q": {"rows_match": True, "hash_match": False, "err": None}})
    assert _driver_evidence(str(tmp_path)) == {"q": 3}


def test_driver_evidence_reads_real_artifacts():
    # the repo's own artifacts: every r5 row was green, so all 50 names
    # must appear with round >= 5
    ev = _driver_evidence(_REPO)
    r5 = json.load(open(os.path.join(_REPO, "CORRECTNESS_r05.json")))
    assert all(ev.get(name, 0) >= 5 for name in r5)


def test_frame_hash_is_column_and_row_order_insensitive():
    h1 = frame_hash(["a", "b"], [(1, "x"), (2, "y")])
    h2 = frame_hash(["b", "a"], [("y", 2), ("x", 1)])  # both orders permuted
    assert h1 == h2
    assert frame_hash(["a", "b"], [(1, "x"), (2, "z")]) != h1


def test_canon_type_faithful():
    # 3 vs 3.0 must NOT collapse (driver hash is type-sensitive)
    assert _canon(3) != _canon(3.0)
    assert _canon(float("nan")) == _canon(None) == "<NULL>"
    assert _canon(True) == "1"  # bool renders as int, not 'True'
    assert _canon(b"\x00\xff") == "00ff"
    assert _canon([1, None]) == "[1,<NULL>]"
    # float canon rounds at 1e-9 so engine ulp noise cannot flip the hash
    assert _canon(0.1 + 0.2) == _canon(0.3)


def test_stress_rejects_unknown_family_before_spark():
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "stress.py"), "10", "grpah"],
        capture_output=True,
        text=True,
        timeout=30,  # Spark startup alone exceeds this if the guard regresses
    )
    assert proc.returncode == 2
    assert "unknown family" in proc.stderr


def test_priority_head_is_the_stale_rows(tmp_path):
    # VERDICT r11 item 4: the r12 priority budget (0-based slices of
    # _PRIORITY; the driver checks [0:50]) is
    #   * [0:6]  — the rows whose CODE is new or changed this round: the
    #     two brand-new wire-byte gates (first-ever CORRECTNESS rows for
    #     the binary DLQ encoders) and the four reworked gates (batched
    #     eval engine, persist-barrier one-shot selection modes);
    #   * [6:11] — the five r6 rows rolled from the r11 budget;
    #   * [11:25] — the 14 error-handling-family gates (9 r7
    #     capture/log/describe + 5 r8 DLQ/headers/serde), pulled ahead
    #     of the plain r7 block per the verdict: the flagship semantics
    #     were the ledger's oldest evidence;
    #   * [25:50] — the first 25 of the remaining 36 r7 rows.
    # 6 + 5 + 14 + 25 = 50.  The 11 displaced r7 rows park at [50:61]
    # and roll to the r13 budget; from position 61 the tail is
    # evidence-age-ordered ascending.  Pinned against the r1-r11
    # artifacts only (the evidence the rotation was derived FROM), so
    # later driver rounds cannot invalidate it.
    import shutil

    from kafka_error_handling_spark.plans.registry import _PRIORITY

    changed = [
        "dlq_avro_wire",
        "dlq_proto_wire",
        "search_eval_macro",
        "search_eval_ndcg",
        "sample_dsir_importance",
        "sample_quality_classifier",
    ]
    assert _PRIORITY[:6] == changed
    for rnd in range(1, 12):
        shutil.copy(
            os.path.join(_REPO, f"CORRECTNESS_r{rnd:02d}.json"), str(tmp_path)
        )
    ev = _driver_evidence(str(tmp_path))
    # the two wire gates are brand-new: no driver evidence exists yet
    assert all(n not in ev for n in changed[:2])
    # [6:11]: the rolled r6 block, oldest evidence in the ledger
    assert all(ev.get(n) == 6 for n in _PRIORITY[6:11]), _PRIORITY[6:11]
    # [11:25]: the error-handling family at ages 7 (capture/log/describe)
    # then 8 (DLQ/headers/serde)
    err_gates = _PRIORITY[11:25]
    assert [ev.get(n) for n in err_gates] == [7] * 9 + [8] * 5, [
        (n, ev.get(n)) for n in err_gates
    ]
    assert all(
        ("capture" in n or "describe" in n or "log_errors" in n
         or "dlq" in n or "error" in n or "serde" in n or "validate" in n)
        for n in err_gates
    ), err_gates
    # [25:50]: r7 rows only — the budget closes on the oldest plain block
    assert all(ev.get(n) == 7 for n in _PRIORITY[25:50]), [
        (n, ev.get(n)) for n in _PRIORITY[25:50] if ev.get(n) != 7
    ]
    # the 11 displaced r7 rows sit IMMEDIATELY past the cutoff; no row
    # with evidence <= 7 hides deeper in the tail
    assert all(ev.get(n) == 7 for n in _PRIORITY[50:61]), _PRIORITY[50:61]
    stragglers = [n for n in _PRIORITY[61:] if ev.get(n, 99) <= 7]
    assert not stragglers, stragglers
    ages = [ev[n] for n in _PRIORITY[61:] if n in ev]
    assert ages == sorted(ages), "tail past the rolled block must be age-ordered"
