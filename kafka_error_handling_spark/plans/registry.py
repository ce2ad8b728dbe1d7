"""Query registry: aggregates every correctness-gate query across modules.

Structure: each plans/datapipe module exposes ``QUERIES: dict[name,
(callable(spark, sf_dir) -> DataFrame, oracle_sql | None)]``; this module
merges them for ``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from . import advanced, error_queries, relational, stats, subqueries

    mods = [error_queries, relational, advanced, stats, subqueries]
    try:
        from ..datapipe import dedup, sampling, similarity, text

        mods += [text, dedup, similarity, sampling]
    except ImportError:
        pass
    try:
        from ..datapipe import multimodal

        mods.append(multimodal)
    except ImportError:
        pass
    try:
        from . import asof

        mods.append(asof)
    except ImportError:
        pass
    return mods


def _merged() -> dict:
    out = {}
    for mod in _modules():
        for name, pair in getattr(mod, "QUERIES", {}).items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = pair
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _merged().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _merged().items() if sql is not None
    }
