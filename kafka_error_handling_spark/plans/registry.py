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


# Driver-budget ordering (VERDICT r2 item 5): the rows with NO green driver
# CORRECTNESS entry across r1+r2 run FIRST, so any budget cut lands on
# queries already proven green.  Block 1 = the 3 r2 hash-FAILs re-fixed this
# round (need a fresh driver row); block 2 = the 26 never-driver-checked
# rows, cheapest first, the two expensive dedup gates last within the block.
_PRIORITY = [
    # re-fixed this round (r2 hash FAIL: HUGEINT oracle typing)
    "sample_pack_sequences",
    "q12_priority_by_returnflag",
    "dedup_chunks",
    # latent HUGEINT fixes (green in no round yet, cheap)
    "pipeline_chunked_corpus",
    "scd2_intervals",
    "sample_quality_curriculum",
    "quality_profile_columns",
    # new in round 3 (no driver row yet)
    "dedup_priority_source",
    "quality_gopher_report",
    "dedup_cdc_chunks",
    "event_sessionize",
    "sample_weighted_quality",
    "dedup_incremental",
    "quality_key_skew",
    "dedup_exact_substring",
    "corpus_pipeline_priority",
    # never driver-checked (r1+r2): cheap rows first
    "sliding_windows",
    "exact_percentiles",
    "text_pii_scrub",
    "text_bigram_counts",
    "text_repetition",
    "dedup_chunks_apply",
    "asof_join_forward",
    "forward_fill",
    "quality_fk_orphans",
    "quality_validate_dlq",
    "merge_upsert",
    "bloom_pruned_join",
    "dedup_fuzzy_names",
    "event_funnel",
    "sketch_countmin",
    "sketch_countmin_estimate",
    "text_decontaminate",
    "text_lm_score",
    "embedding_kmeans",
    "embedding_semdedup",
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
