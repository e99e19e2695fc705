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

# Driver-facing registration order. The correctness driver oracle-checks only
# the FIRST 50 entries of ``queries()``, so ordering is part of the public
# contract: queries that have never had a driver correctness row (or whose
# implementation changed this round) are listed here and float to the front;
# queries with two green rounds behind them keep their import order at the
# tail. Names not present in the registry are ignored (forward references to
# planned queries are harmless).
#
# ROUND 5 ROTATION NOTE: after CORRECTNESS_r04 lands, the 43 tail queries'
# newest rows are r03 — float them back into the window (events_funnel …
# pipeline_scd2_merge by then-staleness), keep ~7 slots for new/changed
# queries plus one sentinel per suite from the r04-green set, and NEVER
# assume old rows stay valid across a testdata regeneration (see the r03
# TIMESTAMP_NTZ incident).
_DRIVER_PRIORITY: tuple[str, ...] = (
    # -- round 4: the 9 events/streaming queries broken by the regenerated
    #    events.parquet (TIMESTAMP_NTZ) and repaired this round — the driver
    #    must re-check every one (VERDICT r03 "Next round" #1-2)
    "events_sessionize",
    "events_stream_user_profile",
    "events_stream_tumbling",
    "events_stream_dedup",
    "events_stream_enrich",
    "events_asof_join",
    "events_range_join",
    "events_zorder_code",
    "events_resample_gapfill",
    # -- past r03's 50-query cap AND dependent on the regenerated events data
    "events_outlier_robust",
    # -- queries whose last driver row is two rounds stale (r02)
    "mm_metadata_summary",
    "mm_frame_inventory",
    "mm_byte_features",
    "mm_frame_sample",
    "rel_q1_pricing_summary",
    "rel_join_revenue_by_nation",
    "rel_window_top_orders_per_segment",
    "rel_semi_anti_join",
    "rel_set_operations",
    "rel_scalar_functions",
    "rel_rollup_customers",
    "rel_distinct_aggregates",
    "rel_outer_join",
    "rel_sql_q3_shipping_priority",
    "rel_percentiles",
    "rel_histogram",
    "rel_cube_orders",
    "rel_pivot_priority_by_year",
    "rel_window_running_totals",
    "rel_approx_distinct",
    "rel_unpivot_part_metrics",
    "rel_correlated_subquery",
    "rel_window_rank_functions",
    "rel_grouping_sets",
    "pipeline_scd2_merge",
    # -- reshaped in r03, never driver-checked since
    "rel_approx_quantiles",
    # -- graduating from rows-only to oracle-checked this round
    "vec_bucketed_near_dup",
    # -- new round-4 queries register here (keep total ≤ 50 before sentinels)
    "events_stream_sessionize",
    "events_stream_stream_join",
    "text_minhash_doc_sketch",
    "dedup_incremental_minhash",
    "text_cms_counts",
    "decontam_bloom_membership",
    "vec_ann_recall",
    "vec_kmeans_centroids",
    "vec_kmeans_ivf_topk",
    "text_winnow_fingerprints",
    # -- sentinels: one r03-green query per suite/table kept inside the
    #    checked window so a testdata or engine regression in a "settled"
    #    area is still caught (ADVICE r03: never leave a suite unwatched)
    "sort_total_lineitem",
    "dedup_exact",
    "text_analysis",
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
        multimodal,
        relational,
        sampling,
        skewq,
        text_dedup,
        vectors,
    )

    prioritized = [n for n in _DRIVER_PRIORITY if n in REGISTRY]
    prioritized_set = set(prioritized)
    tail = [n for n in REGISTRY if n not in prioritized_set]
    ordered = {n: REGISTRY[n] for n in (*prioritized, *tail)}
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True
