"""Plan-hygiene gate: no CartesianProduct / row-at-a-time Python UDF.

``tools/plan_lint.py`` lints all 227 registry plans (artifact:
``runs/plan_lint.json``); this test keeps a fast cross-family subset in
the pytest loop so a regression (a join losing its broadcast wrap, a
``F.udf`` slipping into a hot path) fails CI before the full lint runs.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_lint import lint_plan, plan_string  # noqa: E402

# one representative per family; membership frozen for comparability
LINT_SUBSET = [
    "q3_top_revenue_orders",      # relational join+agg+topk
    "window_topk_orders",         # window functions
    "capture_map_values_dlq",     # error-capture (Arrow UDF path)
    "dedup_minhash_lsh",          # banded LSH join
    "embedding_knn_ivf",          # bucketed ANN
    "text_lm_score",              # bigram-LM token joins
    "graph_pagerank",             # iterative graph
    "sample_stratified_exact",    # sampling windows
    "quality_split_leakage",      # governance join matrix
    "multimodal_ahash",           # binary-column pipeline
    "sketch_hll_estimate",        # sketch registers
    "asof_join_nearest",          # as-of join
]


def test_lint_detects_red_nodes():
    fake = (
        "== Physical Plan ==\n"
        "(1) CartesianProduct\n\n"
        "(2) BatchEvalPython\n\n"
        "(3) Project [codegen id : 1]\n"
    )
    res = lint_plan(fake)
    assert res["red"] == ["BatchEvalPython", "CartesianProduct"]


def test_lint_clean_plan_counts():
    fake = (
        "== Physical Plan ==\n"
        "(1) Scan parquet \n"
        "Location: InMemoryFileIndex [file:/x]\n"
        "PushedFilters: [IsNotNull(a)]\n"
        "ReadSchema: struct<a:int>\n\n"
        "(2) Exchange\n\n"
        "(3) BroadcastExchange\n\n"
        "(4) ArrowEvalPython [codegen id : 2]\n"
    )
    res = lint_plan(fake)
    assert res["red"] == []
    assert res["shuffles"] == 1
    assert res["broadcasts"] == 1
    assert res["scans_pushed"] == 1
    assert res["arrow_python"] == 1


@pytest.mark.parametrize("name", LINT_SUBSET)
def test_registry_plan_is_clean(spark, sf_dir, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, sf_dir)
    res = lint_plan(plan_string(df))
    assert res["red"] == [], f"{name}: {res['red']}"
