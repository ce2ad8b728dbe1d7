"""Stateful processing under error-capture decoration (SURVEY.md §2.7
"stateful ops").

The reference's capturing/logging processors forward the wrapped supplier's
``stores()`` so user state keeps working under decoration
(``ErrorCapturingProcessor.java:140-143``, ``ErrorLoggingProcessor.java:134-137``).
The Spark analog: wrap the user's per-record stateful function inside
``applyInPandasWithState`` so that

- the user function sees the **same GroupState handle** it would see
  undecorated (state reads/writes pass straight through), and
- a per-record exception is captured into the error column (or rethrown if
  recoverable) **without poisoning the group's state or the batch**.

Scale: state lives in the state store keyed by group — per-key partition
parallel, no driver involvement; the wrapper adds one try/except per row.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructField, StructType

from ..model import ERROR_SCHEMA, ErrorFilter, error_payload, is_recoverable

__all__ = ["capture_stateful_process"]


def capture_stateful_process(
    df: DataFrame,
    key_cols: list,
    fn: Callable[[tuple, dict, GroupState], Optional[Iterable[dict]]],
    result_type: StructType,
    state_type: StructType,
    error_filter: Optional[ErrorFilter] = None,
    timeout: str = GroupStateTimeout.NoTimeout,
    output_mode: str = "append",
    input_value_col: Optional[str] = None,
) -> DataFrame:
    """``ErrorCapturingProcessor`` for stateful shapes.

    ``fn(key_tuple, row_dict, state)`` may read/update/remove ``state`` and
    forward 0..n result dicts.  Output rows: key columns + ``result``
    (nullable ``result_type`` struct) + ``error`` (nullable) — the
    ``ProcessedKeyValue`` contract with state in the loop.
    """
    flt = error_filter or is_recoverable
    ival = input_value_col
    out_schema = StructType(
        [df.schema[c] for c in key_cols]
        + [
            StructField("result", result_type, True),
            StructField("error", ERROR_SCHEMA, True),
        ]
    )

    def _proc(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        out_rows = []
        base = dict(zip(key_cols, key))
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                try:
                    forwards = fn(key, dict(rec), state)
                except Exception as exc:  # noqa: BLE001
                    if flt(exc):
                        raise
                    row = dict(base)
                    row["result"] = None
                    row["error"] = error_payload(
                        rec.get(ival) if ival else rec, exc
                    )
                    out_rows.append(row)
                    continue
                for fwd in forwards or ():
                    row = dict(base)
                    row["result"] = fwd
                    row["error"] = None
                    out_rows.append(row)
        yield pd.DataFrame(out_rows, columns=key_cols + ["result", "error"])

    return df.groupBy(*key_cols).applyInPandasWithState(
        _proc, out_schema, state_type, output_mode, timeout
    )
