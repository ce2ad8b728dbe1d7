"""Error-describing decorators — fail fast with an enriched message.

Spark-native re-expression of the reference's ``describeErrors`` family
(SURVEY.md §2.3; ``ErrorDescribingKeyValueMapper.java:59,65-71``,
``ErrorDescribingValueMapper.java:57,63-69``,
``ErrorDescribingProcessor.java:101-107``).

Semantics: catch any ``Exception``, rethrow
``ProcessingException("Cannot process ('<key>', '<value>')") from exc``
(``ProcessingException.java:30-39``) — the query still fails, but the Spark
task failure / driver exception now names the exact record that killed it.
No error filter: everything is described.  Non-``Exception`` throwables
pass through untouched.

These wrappers are **type-transparent** (the wrapped return type passes
straight through), so the same three shapes also serve the flat variants —
exactly as in the reference, where the flat tests reuse
``ErrorDescribingKeyValueMapper.describeErrors`` with ``flatMap``
(``ErrorDescribingFlatKeyValueMapperTopologyTest.java:68``).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DataType, StructType

from ..model import ProcessingException

__all__ = [
    "describe_flat_map_values",
    "describe_flat_map",
    "describe_errors",
    "describe_errors_with_key",
    "describe_udf",
    "describe_map_values",
    "describe_map_values_with_key",
    "describe_map",
    "describe_process",
]


def describe_errors(fn: Callable[..., Any]) -> Callable[..., Any]:
    """``ErrorDescribingValueMapper.describeErrors`` — value-only message
    (``ErrorDescribingValueMapper.java:63-69``)."""

    def _wrapped(*args):
        try:
            return fn(*args)
        except Exception as exc:  # noqa: BLE001
            raise ProcessingException.for_value(args[-1], exc) from exc

    return _wrapped


def describe_errors_with_key(fn: Callable[..., Any]) -> Callable[..., Any]:
    """``ErrorDescribingKeyValueMapper`` / ``...ValueMapperWithKey`` —
    key-and-value message (``ErrorDescribingKeyValueMapper.java:65-71``)."""

    def _wrapped(key, value, *rest):
        try:
            return fn(key, value, *rest)
        except Exception as exc:  # noqa: BLE001
            raise ProcessingException.for_key_value(key, value, exc) from exc

    return _wrapped


def describe_udf(
    fn: Callable[..., Any],
    result_type: DataType,
    with_key: bool = False,
):
    """Pandas-UDF wrapper re-raising enriched — the column-level primitive.

    Per-row loop inside an Arrow batch; the first failing record aborts the
    task with a ``ProcessingException`` naming it (fail-fast is the point).

    Struct ``result_type`` (the ``ErrorDescribingKeyValueMapper`` parity
    shape, where results are ``struct<key, value>``) returns a
    ``pd.DataFrame`` keyed by field name — pandas UDFs require a DataFrame,
    not a Series, for struct returns (mirrors ``capture_udf``).
    """
    wrapped = describe_errors_with_key(fn) if with_key else describe_errors(fn)

    if isinstance(result_type, StructType):
        fields = [f.name for f in result_type.fields]

        @pandas_udf(result_type)
        def _describe_struct(*cols: pd.Series) -> pd.DataFrame:
            rows = zip(*[c.tolist() for c in cols])
            out = [wrapped(*row) for row in rows]
            recs = [
                None
                if r is None
                else (r if isinstance(r, dict) else dict(zip(fields, r)))
                for r in out
            ]
            return pd.DataFrame(
                [
                    {f: None for f in fields} if r is None else r
                    for r in recs
                ],
                columns=fields,
            )

        return _describe_struct.asNondeterministic()

    @pandas_udf(result_type)
    def _describe(*cols: pd.Series) -> pd.Series:
        rows = zip(*[c.tolist() for c in cols])
        return pd.Series([wrapped(*row) for row in rows])

    return _describe.asNondeterministic()


def describe_map_values(
    df: DataFrame,
    fn: Callable[[Any], Any],
    result_type: DataType,
    value_col: str = "value",
    result_col: str = "result",
) -> DataFrame:
    """``describeErrors`` over the ``mapValues`` shape (also serves
    ``flatMapValues`` with an array ``result_type`` — type-transparent)."""
    udf = describe_udf(fn, result_type, with_key=False)
    return df.withColumn(result_col, udf(F.col(value_col)))


def describe_map_values_with_key(
    df: DataFrame,
    fn: Callable[[Any, Any], Any],
    result_type: DataType,
    key_col: str = "key",
    value_col: str = "value",
    result_col: str = "result",
) -> DataFrame:
    """``ErrorDescribingValueMapperWithKey`` (``ErrorDescribingValueMapperWithKey.java:58,64-70``)."""
    udf = describe_udf(fn, result_type, with_key=True)
    return df.withColumn(result_col, udf(F.col(key_col), F.col(value_col)))


def describe_map(
    df: DataFrame,
    fn: Callable[[Any, Any], Any],
    result_type: DataType,
    key_col: str = "key",
    value_col: str = "value",
    result_col: str = "result",
) -> DataFrame:
    """``ErrorDescribingKeyValueMapper`` over ``map``/``flatMap``
    (``ErrorDescribingKeyValueMapper.java:59``): ``fn(key, value)`` with the
    key-value message; return type passes through (tuple-shaped results use a
    ``struct<key, value>`` ``result_type``)."""
    udf = describe_udf(fn, result_type, with_key=True)
    return df.withColumn(result_col, udf(F.col(key_col), F.col(value_col)))


def describe_process(
    df: DataFrame,
    processor: Callable[[dict], Optional[Iterable[dict]]],
    result_type: StructType,
    pass_through: Optional[Sequence[str]] = None,
    key_cols: Optional[Sequence[str]] = None,
    value_col: Optional[str] = None,
) -> DataFrame:
    """``ErrorDescribingProcessor`` / ``ErrorDescribingValueProcessor``
    (``ErrorDescribingProcessor.java:64,101-107``): mapInPandas wrapper
    re-raising enriched; multi-forward supported like
    :func:`~kafka_error_handling_spark.operators.capture.capture_process`.
    """
    keep = list(pass_through) if pass_through is not None else list(df.columns)
    vcol = value_col or df.columns[-1]
    kcols = list(key_cols) if key_cols else []
    from pyspark.sql.types import StructField

    out_schema = StructType(
        [df.schema[c] for c in keep] + [StructField("result", result_type, True)]
    )

    def _map(batches):
        for pdf in batches:
            out_rows = []
            for rec in pdf.to_dict("records"):
                try:
                    forwards = processor(dict(rec))
                except Exception as exc:  # noqa: BLE001
                    if kcols:
                        key = tuple(rec.get(k) for k in kcols)
                        key = key[0] if len(key) == 1 else key
                        raise ProcessingException.for_key_value(
                            key, rec.get(vcol), exc
                        ) from exc
                    raise ProcessingException.for_value(rec.get(vcol), exc) from exc
                for fwd in forwards or ():
                    row = {k: rec.get(k) for k in keep}
                    row["result"] = fwd
                    out_rows.append(row)
            yield pd.DataFrame(out_rows, columns=keep + ["result"])

    return df.mapInPandas(_map, out_schema)


# Type-transparent flat aliases — the reference reuses the same describing
# mapper classes for flatMap shapes (ErrorDescribingFlatKeyValueMapperTopologyTest.java:68);
# pass an ArrayType result_type and explode downstream.
describe_flat_map_values = describe_map_values
describe_flat_map = describe_map
