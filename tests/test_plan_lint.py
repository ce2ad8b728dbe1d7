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

# one representative per family; membership frozen for comparability.
# Values = (max_shuffles, max_arrow_python) measured under the pytest
# session conf — a drift tripwire, not a target: a plan that grows a NEW
# shuffle exchange or a NEW Python operator fails here before the bench
# ever notices the slowdown.  A plan that improves (fewer) passes; move
# the pin down when that happens.
LINT_SUBSET = {
    "q3_top_revenue_orders": (1, 0),    # relational join+agg+topk
    "window_topk_orders": (1, 0),       # window functions
    "capture_map_values_dlq": (0, 1),   # error-capture (Arrow UDF path)
    "dedup_minhash_lsh": (2, 0),        # banded LSH join
    "embedding_knn_ivf": (2, 2),        # bucketed ANN
    "text_lm_score": (5, 0),            # bigram-LM token joins
    "graph_pagerank": (0, 0),           # iterative graph (broadcast ranks)
    "sample_stratified_exact": (1, 0),  # sampling windows
    "quality_split_leakage": (2, 0),    # governance join matrix
    "multimodal_ahash": (0, 1),         # binary-column pipeline
    "sketch_hll_estimate": (4, 0),      # sketch registers
    "asof_join_nearest": (1, 0),        # as-of join
}


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


@pytest.mark.parametrize("name", sorted(LINT_SUBSET))
def test_registry_plan_is_clean(spark, sf_dir, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, sf_dir)
    res = lint_plan(plan_string(df))
    assert res["red"] == [], f"{name}: {res['red']}"
    max_shuffles, max_arrow = LINT_SUBSET[name]
    assert res["shuffles"] <= max_shuffles, (
        f"{name}: plan grew a shuffle ({res['shuffles']} > {max_shuffles})"
    )
    assert res["arrow_python"] <= max_arrow, (
        f"{name}: plan grew a Python operator"
        f" ({res['arrow_python']} > {max_arrow})"
    )
