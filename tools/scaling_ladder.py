"""Multi-row-group scaling ladder: make core-count scaling measurable.

VERDICT r14 #2: every sf0.1 gate parquet is ONE row group, so every
scan-rooted stage runs as one task regardless of core count and the
driver's 8-vs-32-core PERF block reads ≈1 everywhere — the bench
cannot demonstrate parallel scaling, even though the plans parallelize
fine on real multi-row-group tables.  The guide-§8-correct fix is NOT a
payload repartition in query code (pure cost at 100 TB); it is to give
the MEASUREMENT realistic inputs:

1. rewrite the gate tables into 64 row groups each (pyarrow; identical
   rows, identical order, identical schema — only the row-group layout
   changes, which is what a real multi-file 100 TB table has anyway);
2. run the explode/shingle-heavy queries on the split copy at two core
   counts in fresh bench-identical sessions, with
   ``spark.sql.files.maxPartitionBytes=64k`` / ``openCostInBytes=0`` so
   the scan actually assigns one task per row group (the sweeps
   'splits' regime, which is already proven result-invariant
   registry-wide), min-of-N each;
3. record per-query walls, the high/low-core ratio, and a plan
   fingerprint (Exchange/Generate counts) at both core counts so the
   speedup is attributable to scan parallelism, not a plan change.

Usage: python tools/scaling_ladder.py [--cpus-high 32] [--cpus-low 8]
           [--runs 3] [q1 q2 ...]
Writes runs/scaling_ladder.json.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

N_ROW_GROUPS = 64

# explode/shingle-heavy defaults — the paths whose per-row work dominates
# and which a single-task scan serializes end-to-end
DEFAULT_QUERIES = [
    "dedup_minhash_signature",
    "dedup_minhash_lsh",
    "text_lm_score",
    "text_tfidf_keywords",
    "sample_quality_classifier",
    "text_bigram_counts",
]

_SPLIT_CONF = {
    "spark.sql.files.maxPartitionBytes": "65536",
    "spark.sql.files.openCostInBytes": "0",
}


def split_copy(src_dir: str, dest_dir: str, n_groups: int = N_ROW_GROUPS) -> None:
    """Rewrite every table with ``n_groups`` row groups — identical rows,
    identical order, only the physical layout changes."""
    import pyarrow.parquet as pq

    os.makedirs(dest_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        tbl = pq.read_table(src)
        rg = max(1, (tbl.num_rows + n_groups - 1) // n_groups)
        pq.write_table(tbl, os.path.join(dest_dir, f"{t}.parquet"), row_group_size=rg)


_WORKER = r"""
import json, os, re, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession
import __spark_entry__ as entrymod

cpus = {cpus}
b = (SparkSession.builder.master(f"local[{{cpus}}]")
     .appName("keh-scaling-ladder")
     .config("spark.sql.shuffle.partitions", str(cpus))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.driver.memory", "16g")
     .config("spark.ui.enabled", "false"))
for k, v in {conf!r}.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
jvm_gc = spark.sparkContext._jvm.System.gc
out = {{}}
for name in {names!r}:
    # untimed warmup on the small SF
    try:
        qs[name](spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass
    spark.catalog.clearCache()
    df = qs[name](spark, {sf!r})
    plan = df._jdf.queryExecution().executedPlan().toString()
    fp = {{"exchanges": plan.count("Exchange"), "generates": plan.count("Generate")}}
    ts = []
    for _ in range({runs}):
        jvm_gc()
        t0 = time.time()
        qs[name](spark, {sf!r}).count()
        ts.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    out[name] = {{"runs": ts, "min": min(ts), "plan": fp}}
print("LADDER_JSON:" + json.dumps(out))
spark.stop()
"""


def _leg(cpus: int, names: list[str], sf: str, runs: int) -> dict:
    code = _WORKER.format(
        root=_ROOT, cpus=cpus, conf=_SPLIT_CONF, names=names, sf=sf, runs=runs
    )
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600, cwd=_ROOT,
    )
    for line in p.stdout.splitlines():
        if line.startswith("LADDER_JSON:"):
            return json.loads(line[len("LADDER_JSON:"):])
    raise RuntimeError(
        f"ladder leg cpus={cpus} rc={p.returncode}: {p.stderr[-500:]}"
    )


def main() -> None:
    args = sys.argv[1:]

    def _opt(flag: str, default: int) -> int:
        if flag in args:
            i = args.index(flag)
            v = int(args[i + 1])
            del args[i : i + 2]
            return v
        return default

    cpus_high = _opt("--cpus-high", 32)
    cpus_low = _opt("--cpus-low", 8)
    runs = _opt("--runs", 3)
    names = args or list(DEFAULT_QUERIES)

    tmp = tempfile.mkdtemp(prefix="keh_split_")
    try:
        split_copy(SF_DIR, tmp)
        high = _leg(cpus_high, names, tmp, runs)
        low = _leg(cpus_low, names, tmp, runs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    result = {
        "sf_dir": SF_DIR,
        "n_row_groups": N_ROW_GROUPS,
        "split_conf": _SPLIT_CONF,
        "cpus_high": cpus_high,
        "cpus_low": cpus_low,
        "runs_per_leg": runs,
        "queries": {},
    }
    for n in names:
        h, l = high[n], low[n]
        result["queries"][n] = {
            "high_min_s": h["min"],
            "low_min_s": l["min"],
            "low_over_high": round(l["min"] / h["min"], 2) if h["min"] else None,
            "high_runs": h["runs"],
            "low_runs": l["runs"],
            "plan_high": h["plan"],
            "plan_low": l["plan"],
            "plan_unchanged": h["plan"] == l["plan"],
        }
    out_path = os.path.join(_ROOT, "runs", "scaling_ladder.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    json.dump(result, open(out_path, "w"), indent=1)
    for n, r in result["queries"].items():
        print(
            f"{n}: {cpus_low}c {r['low_min_s']}s / {cpus_high}c {r['high_min_s']}s"
            f" = {r['low_over_high']}x  plan_unchanged={r['plan_unchanged']}"
        )
    print(f"written {out_path}")


if __name__ == "__main__":
    main()
