"""Per-query isolation profiler for the optimization rounds (guide §1).

Times registry queries in a bench-identical session (local[$SPARK_GRAFT_CPUS],
shuffle=CPUS, AQE on, 16g driver, UI off), with the bench's own policy:
untimed sf0.001 warmup, System.gc() before every timed run, min-of-N.
The timed action is the bench's ``.count()`` by default; ``--noop`` times the
noop sink instead (guide §1.4 — computes every column, no optimizer pruning).

``--explain DIR`` writes ``DIR/<query>.txt`` with the formatted plan
(committed as plans/r14/<query>_{before,after}.txt per the deliverable).

Usage: python tools/profile_query.py [--noop] [--runs N] [--explain DIR] q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    noop = "--noop" in args
    runs = 3
    explain_dir = None
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--explain" in args:
        i = args.index("--explain")
        explain_dir = args[i + 1]
        del args[i : i + 2]
    names = [a for a in args if not a.startswith("--")]

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("keh-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    jvm_gc = spark.sparkContext._jvm.System.gc

    def action(df):
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        try:
            action(qs[name](spark, warm_dir))
        except Exception as e:
            print(f"warmup {name}: {type(e).__name__}: {e}", file=sys.stderr)
        spark.catalog.clearCache()

    results = {}
    for name in names:
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        ts = []
        for r in range(runs):
            jvm_gc()
            spark.sparkContext.setJobDescription(f"timed:{name}:{r}")
            t0 = time.time()
            action(qs[name](spark, SF_DIR))
            ts.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        results[name] = ts
        print(f"{name}: min={min(ts)} runs={ts}", flush=True)

    print("== summary ==")
    for name, ts in results.items():
        print(f"{min(ts):8.3f}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
