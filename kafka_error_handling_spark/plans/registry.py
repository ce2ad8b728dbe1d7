"""Query registry: aggregates every correctness-gate query across modules.

Structure: each plans/datapipe module exposes ``QUERIES: dict[name,
(callable(spark, sf_dir) -> DataFrame, oracle_sql | None)]``; this module
merges them for ``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from . import (
        advanced,
        error_queries,
        relational,
        stats,
        subqueries,
        tpch_more,
        tpch_rest,
    )

    mods = [error_queries, relational, advanced, stats, subqueries, tpch_more, tpch_rest]
    try:
        from ..datapipe import (
            chunks,
            clustering,
            dedup,
            ranking,
            sampling,
            similarity,
            text,
        )

        mods += [text, dedup, similarity, sampling, ranking, chunks, clustering]
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
    try:
        from . import cdc, quality

        mods += [cdc, quality]
    except ImportError:
        pass
    return mods


# Names the round-1 driver sweep never reached (its budget cut fell after
# entry 50, exactly on the datapipe tail — VERDICT r1 "what's missing" #1)
# plus the rows fixed this round.  The registry runs these FIRST so a
# budget cut of any kind lands on queries already proven green in r01.
_PRIORITY = [
    # fixed this round (hash FAIL / no_oracle in r01)
    "collection_functions",
    "text_stats",
    "approx_distinct",
    # driver-unverified in r01: dedup / ANN / sampling / multimodal / as-of
    "dedup_minhash_signature",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_simhash_neardup",
    "embedding_knn",
    "embedding_lsh_buckets",
    "embedding_knn_lsh",
    "embedding_neardup",
    "embedding_knn_ivf",
    "embedding_knn_lsh_multiprobe",
    "embedding_knn_arrow",
    "sample_hash_10pct",
    "sample_split_assignment",
    "sample_pack_sequences",
    "sample_mix_sources",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_resize",
    "multimodal_features",
    "asof_join_last_purchase",
    # new in round 2 (no driver row yet): wider TPC-H planner shapes
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_revenue",
    "q13_order_distribution",
    "q19_or_predicates",
    "q22_no_order_customers",
    "embedding_neardup_keep",
    "approx_quantiles",
    "asof_join_tolerance",
    "sample_take_per_group",
    "corpus_pipeline",
    "q9_product_profit",
    "q16_supplier_cnt",
    "describe_struct_result",
    # round-2 continuation: the last seven TPC-H shapes (22/22 complete)
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q11_important_parts",
    "q12_priority_by_returnflag",
    "q15_top_supplier",
    "q20_excess_shipments",
    "q21_waiting_supplier",
    # round-2 continuation: ranking + sub-document dedup
    "text_bm25_topk",
    "text_vocab_df",
    "dedup_chunks",
    "embedding_knn_int8",
    "embedding_int8_recall",
    "sample_stratified_exact",
    "sliding_windows",
    "exact_percentiles",
    "text_pii_scrub",
    "text_bigram_counts",
    "text_repetition",
    "dedup_chunks_apply",
    "pipeline_chunked_corpus",
    "asof_join_forward",
    # round-2 continuation: corpus hygiene + clustering
    "text_decontaminate",
    "text_lm_score",
    "embedding_kmeans",
    "embedding_semdedup",
    "event_funnel",
    "sketch_countmin",
    "sketch_countmin_estimate",
    # round-2 third continuation: scale patterns + CDC + data quality
    "bloom_pruned_join",
    "merge_upsert",
    "scd2_intervals",
    "dedup_fuzzy_names",
    "sample_quality_curriculum",
    "forward_fill",
    "quality_profile_columns",
    "quality_fk_orphans",
    "quality_validate_dlq",
    # most expensive last within the priority block: if the budget is
    # tight, the cheap unverified rows still land
    "dedup_minhash_lsh",
    "dedup_neardup_keep",
]


def _merged() -> dict:
    flat = {}
    for mod in _modules():
        for name, pair in getattr(mod, "QUERIES", {}).items():
            assert name not in flat, f"duplicate query name {name}"
            flat[name] = pair
    missing = [n for n in _PRIORITY if n not in flat]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    out = {n: flat[n] for n in _PRIORITY}
    out.update((n, p) for n, p in flat.items() if n not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _merged().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _merged().items() if sql is not None
    }
