"""Oracle-checked query registry — the engine's public query surface.

Every implemented operator gets a ``@query(name, sql=...)`` entry: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the equivalent
DuckDB SQL run by the driver's correctness harness. Column names/aliases are
kept identical on both sides because the harness hashes values after sorting
columns BY NAME.

Determinism rules (SURVEY.md §7.4):
- every sort emits an explicit rank column computed with full tiebreaker keys
  so order survives the order-insensitive hash;
- floating-point aggregates are computed on DECIMAL (exact, order-independent)
  then cast back to DOUBLE so Spark's and DuckDB's summation order can't
  diverge in the low bits.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None → driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}


_LOADED = False

#: The correctness driver oracle-checks exactly this many leading
#: ``queries()`` entries per round. ``_DRIVER_PRIORITY`` must hold exactly
#: this many valid names — ``_ensure_loaded`` warns (and a pytest fails)
#: otherwise, so a typo'd name or a silent driver-cap change can't quietly
#: shrink the checked window.
_DRIVER_WINDOW = 50

# Driver-facing registration order. The correctness driver oracle-checks only
# the FIRST 50 entries of ``queries()``, so ordering is part of the public
# contract: queries that have never had a driver correctness row (or whose
# implementation changed this round) are listed here and float to the front;
# queries with two green rounds behind them keep their import order at the
# tail. Names not present in the registry are ignored (forward references to
# planned queries are harmless).
#
# ROUND 6 ROTATION (VERDICT r05 "Next round" #1, executed; extended): every
# query with no driver row EVER goes first — the 12 r05-late, the 5 early
# round-6 adds (Q17/Q21/Q22, semantic dedup, frame near-dup), the 2
# displaced r03-green vec queries, then the 14 late round-6 adds (the
# 12-query TPC-H completion suite + 2 graph queries, all locally
# hash-verified in LOCAL_VERIFY_r06.txt) — and the remaining 17 slots go to
# the r04-checked block oldest-checked first (CORRECTNESS_r04.json record
# order). After CORRECTNESS_r06 lands, every never-checked query has its
# first driver row; round 7 rotates the remaining 29 r04 names + the r05
# block. NEVER assume old rows stay valid across a testdata regeneration
# (r03 TIMESTAMP_NTZ incident; compare testdata_checksums_r05.txt first).
_DRIVER_PRIORITY: tuple[str, ...] = (
    # ROUND 6 WINDOW (50 exactly; pytest-guarded in test_session.py).
    # -- 12 round-5 queries that never got a driver row (judge-verified
    #    locally in r05; text_bpe_* additionally REWRITTEN this round —
    #    greedy-merge fix — so their window slot is doubly required)
    "rel_window_range_frame",
    "rel_moment_stats",
    "rel_sql_q10_returned_items",
    "rel_sql_q18_large_volume",
    "rel_sql_q14_promo_revenue",
    "rel_sql_q19_brand_ranges",
    "events_ewma",
    "events_rollup_multires",
    "events_user_timeline",
    "text_bpe_merges",
    "text_bpe_segmentation",
    "mm_frame_dedup",
    # -- new in round 6: never driver-checked
    "rel_sql_q17_small_quantity",
    "rel_sql_q21_waiting_supplier",
    "rel_sql_q22_dormant_balance",
    "vec_semantic_dedup",
    "mm_frame_near_dup",
    # -- displaced past the cap in round 5 (newest row r03; unchanged code,
    #    locally full-sweep verified in r05)
    "vec_topk_with_metadata",
    "vec_quantize_int8",
    # -- late round-6 adds, never driver-checked: the TPC-H completion
    #    suite (suites/tpch.py) + graph analytics (suites/graphq.py)
    "rel_sql_q2_min_cost_supplier",
    "rel_sql_q4_priority_check",
    "rel_sql_q6_forecast_revenue",
    "rel_sql_q7_volume_shipping",
    "rel_sql_q8_market_share",
    "rel_sql_q9_product_profit",
    "rel_sql_q11_important_stock",
    "rel_sql_q12_ship_classes",
    "rel_sql_q13_customer_distribution",
    "rel_sql_q15_top_supplier",
    "rel_sql_q16_supplier_relationship",
    "rel_sql_q20_part_promotion",
    "graph_pagerank_trade",
    "graph_degree_distribution",
    "text_crossdup_coverage",
    # -- the r04-checked block, oldest-checked first (CORRECTNESS_r04.json
    #    record order); the remaining 30 r04 names (from rel_set_operations
    #    on, incl. mm_frame_sample, mm_frame_dedup_collapse,
    #    rel_correlated_subquery, rel_window_rank_functions) + the 50
    #    r05-green queries keep import order in the tail and rotate in
    #    round 7 — all r04-green, unchanged code, locally full-sweep
    #    verified this round.
    # ROUND 7 FRONT (pre-planned): the late-round-6 queries that missed
    #    this window (pipeline_data_quality_audit, text_vocab_growth,
    #    rel_window_value_functions, text_bigram_fluency,
    #    sample_weighted_topk, pipeline_scd2_asof, rel_equifreq_binning,
    #    dedup_containment — all locally hash-verified,
    #    LOCAL_VERIFY_r06.txt addenda 4+), then the r04 leftovers
    #    oldest-first, then the r05 block.
    "events_sessionize",
    "events_stream_user_profile",
    "events_stream_tumbling",
    "events_stream_dedup",
    "events_stream_enrich",
    "events_asof_join",
    "events_range_join",
    "events_zorder_code",
    "events_resample_gapfill",
    "events_outlier_robust",
    "mm_metadata_summary",
    "mm_frame_inventory",
    "rel_q1_pricing_summary",
    "rel_join_revenue_by_nation",
    "rel_window_top_orders_per_segment",
    "rel_semi_anti_join",
)


def _ensure_loaded() -> None:
    """Import every module that registers queries (import-for-side-effect),
    then apply the driver-facing priority order."""
    global _LOADED
    if _LOADED:
        return
    from .suites import (  # noqa: F401
        behavior,
        core_sort,
        decontam,
        events,
        graphq,
        multimodal,
        relational,
        sampling,
        skewq,
        text_dedup,
        tpch,
        vectors,
    )

    prioritized = [n for n in _DRIVER_PRIORITY if n in REGISTRY]
    if len(prioritized) != _DRIVER_WINDOW or len(_DRIVER_PRIORITY) != _DRIVER_WINDOW:
        import warnings

        missing = sorted(set(_DRIVER_PRIORITY) - set(prioritized))
        warnings.warn(
            f"driver priority window is {len(prioritized)}/{_DRIVER_WINDOW} "
            f"resolved names (listed: {len(_DRIVER_PRIORITY)}; unresolved: "
            f"{missing}) — a typo or a driver-cap change is silently "
            "shrinking the checked window",
            stacklevel=2,
        )
    prioritized_set = set(prioritized)
    tail = [n for n in REGISTRY if n not in prioritized_set]
    ordered = {n: REGISTRY[n] for n in (*prioritized, *tail)}
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True
