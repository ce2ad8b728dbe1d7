"""Post-execution (AQE-final) plan probe: run a registry query through the
noop sink, then print the FINAL adaptive plan — the one with runtime
exchange/stage reuse resolved — so duplicated-subtree suspicions can be
settled empirically (pre-execution explain shows the unreused tree).

Usage: python tools/postexec_plan.py [--dir DIR] q1 [q2 ...]
Writes DIR/<query>.txt when --dir is given, else prints a summary line:
scans / exchanges / reused nodes in the final plan.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    out_dir = None
    if "--dir" in args:
        i = args.index("--dir")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            raise SystemExit("--dir requires a directory argument")
        out_dir = args[i + 1]
        del args[i : i + 2]
        os.makedirs(out_dir, exist_ok=True)
    unknown_flags = [a for a in args if a.startswith("--")]
    if unknown_flags:
        raise SystemExit(f"unknown flags: {unknown_flags}\n{__doc__}")
    names = list(args)
    if not names:
        raise SystemExit(__doc__)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("keh-postexec-plan")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        spark.stop()
        raise SystemExit(
            f"unknown queries: {missing}\navailable: {', '.join(sorted(qs))}"
        )
    for name in names:
        df = qs[name](spark, SF_DIR)
        # Execute THIS DataFrame's own adaptive plan (a noop write would
        # wrap it in a fresh QueryExecution and leave this one unexecuted):
        # executedPlan() is the AdaptiveSparkPlanExec; .execute() yields its
        # RDD and the count triggers real execution, after which the same
        # node prints isFinalPlan=true with runtime reuse resolved.
        qe = df._jdf.queryExecution()
        qe.executedPlan().execute().count()
        plan = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        scans = len(re.findall(r"Scan parquet", plan))
        reused = len(re.findall(r"ReusedExchange|ReusedSubquery|table cache", plan))
        exch = len(re.findall(r"\) Exchange", plan))
        aqe_reads = len(re.findall(r"AQEShuffleRead", plan))
        final = "isFinalPlan=true" in plan
        print(
            f"{name}: final={final} scans={scans} exchanges={exch} "
            f"reused={reused} aqe_reads={aqe_reads}"
        )
        if out_dir:
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
