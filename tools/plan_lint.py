"""Registry-wide physical-plan lint: the automated half of the plan audit.

Builds every ``__spark_entry__.queries()`` DataFrame (no collect — the
plan is linted, not executed) and scans the formatted physical plan for
the two scale red flags this repo promises are absent:

  * ``CartesianProduct`` — an unbounded all-pairs blowup.  The accepted
    bounded form is ``BroadcastNestedLoopJoin`` over a broadcast-wrapped
    scalar/tiny frame (every crossJoin site in the tree is one).
  * ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan.  All
    Python execution here must ride Arrow batches (``ArrowEvalPython``,
    ``MapInPandas``, ``FlatMapGroupsInPandas*``) or stay JVM-side.

Everything else is recorded as per-plan statistics so plan drift is
visible round-over-round: shuffle-exchange count, broadcast-exchange
count, parquet scans split by pushed-filter presence, whole-stage-codegen
span count, and Arrow-batched Python operator count.

Usage:  python tools/plan_lint.py [sf_dir] [query ...]
Writes ``runs/plan_lint.json`` (one entry per query) and exits nonzero if
any red flag is found.  Mirrors the driver-checker session shape
(``tools/check_correctness.py``) so linted plans match gated plans.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RED_NODES = ("CartesianProduct", "BatchEvalPython")
ARROW_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
)

_NODE_RE = re.compile(r"^\(\d+\)\s+(\S+)", re.MULTILINE)
_CODEGEN_RE = re.compile(r"\[codegen id : (\d+)\]")


def plan_string(df) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def lint_plan(plan: str) -> dict:
    """Node-level stats + red flags for one formatted physical plan."""
    nodes = _NODE_RE.findall(plan)
    red = sorted({n for n in nodes for bad in RED_NODES if n.startswith(bad)})
    # a Scan block ends at the next blank line; pushed-filter presence is
    # per-scan, so split blocks rather than grepping the whole plan
    scans_pushed = scans_unpushed = 0
    for block in plan.split("\n\n"):
        if "Scan parquet" in block and "Location:" in block:
            if re.search(r"PushedFilters: \[.+\]", block):
                scans_pushed += 1
            elif "PushedFilters: []" in block:
                scans_unpushed += 1
            else:  # scan block without a PushedFilters line (e.g. no filters at all)
                scans_unpushed += 1
    return {
        "red": red,
        "shuffles": sum(1 for n in nodes if n == "Exchange"),
        "broadcasts": sum(1 for n in nodes if n == "BroadcastExchange"),
        "scans_pushed": scans_pushed,
        "scans_unpushed": scans_unpushed,
        "codegen_spans": len(set(_CODEGEN_RE.findall(plan))),
        "arrow_python": sum(
            1 for n in nodes if any(n.startswith(a) for a in ARROW_NODES)
        ),
        "nodes": len(nodes),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = {a for a in args if not os.path.isdir(a)}

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("keh-plan-lint")
        .config("spark.sql.shuffle.partitions", "8")
        # lint the STATIC plan: with AQE on, explain shows the initial
        # AdaptiveSparkPlan, which carries no codegen-id annotations and
        # re-plans at runtime; AQE only ever improves on what is linted here
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    n_red = n_err = 0
    t_start = time.time()
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            res = lint_plan(plan_string(df))
        except Exception as e:  # a plan that cannot even build is a finding
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}")
            results[name] = {"err": f"{type(e).__name__}: {str(e)[:200]}"}
            n_err += 1
            continue
        results[name] = res
        if res["red"]:
            n_red += 1
            print(f"RED  {name}: {', '.join(res['red'])}")
        else:
            print(
                f"ok   {name}: shuffles={res['shuffles']} bcast={res['broadcasts']}"
                f" scans={res['scans_pushed']}+{res['scans_unpushed']}p"
                f" codegen={res['codegen_spans']} arrow_py={res['arrow_python']}"
            )

    summary = {
        "queries": len(results),
        "red_flagged": n_red,
        "errors": n_err,
        "total_shuffles": sum(r.get("shuffles", 0) for r in results.values()),
        "total_arrow_python": sum(r.get("arrow_python", 0) for r in results.values()),
        "sf_dir": sf_dir,
        "wall_s": round(time.time() - t_start, 1),
    }
    os.makedirs(os.path.join(_ROOT, "runs"), exist_ok=True)
    with open(os.path.join(_ROOT, "runs", "plan_lint.json"), "w") as f:
        json.dump({"summary": summary, "plans": results}, f, indent=0, sort_keys=True)
    print(f"\n{json.dumps(summary)}")
    spark.stop()
    sys.exit(1 if (n_red or n_err) else 0)


if __name__ == "__main__":
    main()
