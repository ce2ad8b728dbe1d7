"""Property-based checks of the converged connected-components operator
against a brute-force union-find model (same one-job-per-example
discipline as test_capture_properties / test_round4_properties).

The operator is the round-7 headline: an iterated fixpoint with
pointer-jumping, a min-neighbor fused init, a broadcast-vs-shuffle
regime switch, and a label-sum convergence test — four moving parts
whose interactions a fixed gate graph cannot fully exercise.  Random
graphs (plus adversarial shapes: long paths for diameter stress, stars,
forests) checked in BOTH regimes pin the full semantic contract:
comp_id(v) == min node id of v's component, for every node that has at
least one edge.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _uf_components(n_nodes, edges):
    """Union-find oracle: {node: min-id of its component} for nodes with
    at least one incident edge (isolated ids never enter the frame —
    the operator's documented domain)."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for a, b in edges:
        touched.add(a)
        touched.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in touched}


def _canonical(edges):
    """Canonical edge list: src < dst, deduped, no self-loops."""
    return sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})


def _run_cc(spark, edges, broadcast_labels):
    from kafka_error_handling_spark.plans.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, broadcast_labels=broadcast_labels)
    return {r["node"]: r["comp_id"] for r in got.collect()}


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=19),
        st.integers(min_value=0, max_value=19),
    ),
    min_size=1,
    max_size=40,
)


@_SETTINGS
@given(raw=_edges, bcast=st.booleans())
def test_cc_matches_union_find(spark, raw, bcast):
    edges = _canonical(raw)
    if not edges:
        return  # all self-loops — empty canonical edge set, nothing to label
    want = _uf_components(20, edges)
    got = _run_cc(spark, edges, broadcast_labels=bcast)
    assert got == want


def test_cc_long_path_converges_in_log_rounds(spark):
    """A 64-node path is the diameter-stress case: plain propagation
    needs ~63 rounds, pointer-jumping O(log n).  max_rounds=16 both
    proves convergence happened via shortcutting AND that the budget
    raise is never hit on the worst natural shape."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run_cc_bounded(spark, edges, max_rounds=16)
    assert got == {v: 0 for v in range(n)}


def test_cc_two_components_and_star(spark):
    # star centered at 5 (min is leaf 1) + disjoint triangle {10,11,12}
    edges = _canonical([(5, 1), (5, 7), (5, 9), (10, 11), (11, 12), (10, 12)])
    got = _run_cc(spark, edges, broadcast_labels=False)
    assert got == {1: 1, 5: 1, 7: 1, 9: 1, 10: 10, 11: 10, 12: 10}


def test_cc_regimes_agree_on_gate_graph(spark, sf_dir):
    """Broadcast and shuffle regimes must be result-identical on the real
    gate graph (the auto-select must be a pure performance decision)."""
    from kafka_error_handling_spark.plans.graph import (
        _sig_edges_for,
        connected_components,
    )

    e = _sig_edges_for(spark, sf_dir)
    a = connected_components(e, broadcast_labels=True)
    b = connected_components(e, broadcast_labels=False)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def _run_cc_bounded(spark, edges, max_rounds):
    from kafka_error_handling_spark.plans.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, broadcast_labels=True, max_rounds=max_rounds)
    return {r["node"]: r["comp_id"] for r in got.collect()}


def test_cc_round_budget_raises_loudly(spark):
    """max_rounds exhaustion must raise, never return a wrong answer."""
    import pytest

    edges = [(i, i + 1) for i in range(31)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _run_cc_bounded(spark, edges, max_rounds=2)
