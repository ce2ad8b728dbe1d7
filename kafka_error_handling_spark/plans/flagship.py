"""Flagship end-to-end pipeline: the reference's ``captureErrors`` topology
(SURVEY.md §3.1, ``README.md:72-84``) re-expressed on Spark, run over the
driver's ``events`` table.

Topology: events → capture(map_values parse/transform) → split →
success branch + dead-letter branch (formatted with ``DeadLetterProcessor``
semantics) — all in one pass over the data.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .. import capture_map_values, dead_letters, errors, values


def parse_and_rate(v: str) -> float:
    """The wrapped user function: parse the ``props`` JSON and compute a
    per-event rate.  Fails (ZeroDivisionError / JSON errors) on bad records —
    exactly the flaky-user-function shape the reference exists to decorate.
    """
    k = json.loads(v)["k"]
    return 100.0 / k


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → captured transform → success ∪ dead-letter summary.

    Returns one DataFrame: per-event success results with a nullable
    ``error_class`` column (success rows NULL, captured rows populated) so
    the driver smoke check sees both branches of the split in one stable
    schema.
    """
    from ..conf import configure_for_scale
    from ..sources.files import load_table

    configure_for_scale(spark)
    events = load_table(spark, sf_dir, "events")
    # persist the captured frame before fanning out into two branches —
    # the same move the streaming runner makes (SURVEY.md §4): without it
    # the union re-evaluates the capture UDF once per branch (2 scans,
    # 2 ArrowEvalPython nodes in the plan; verified by .explain)
    p = capture_map_values(
        events, parse_and_rate, DoubleType(), value_col="props"
    ).persist()

    ok = values(p).select(
        "event_id",
        "event_type",
        F.round(F.col("result"), 4).alias("rate"),
        F.lit(None).cast("string").alias("error_class"),
    )
    dlq = dead_letters(
        errors(p),
        "flagship parse_and_rate",
        key_cols=["event_id", "event_type"],
        timestamp_col="ts",
    ).select(
        "event_id",
        "event_type",
        F.lit(None).cast("double").alias("rate"),
        F.col("dead_letter.cause.error_class").alias("error_class"),
    )
    return ok.unionByName(dlq)

