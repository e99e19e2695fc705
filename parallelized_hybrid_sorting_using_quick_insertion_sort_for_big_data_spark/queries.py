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
# ROUND 5 ROTATION (executed; VERDICT r04 "Next round" #1): the 43 queries
# whose newest driver rows were r03 are floated back through the 50-slot
# window; new round-5 queries go first (never checked); 4 r04-green
# sentinels cover the suites the stale set doesn't touch (relational,
# multimodal, streaming + a lineitem join). After CORRECTNESS_r05 lands,
# every oracle query's newest green row is r04 or r05. Round-6 rotation:
# FIRST the twelve r05-late queries that have never had a driver row
# (rel_window_range_frame, rel_moment_stats, rel_sql_q10_returned_items,
# rel_sql_q18_large_volume, events_ewma, events_rollup_multires,
# events_user_timeline, text_bpe_merges, text_bpe_segmentation,
# mm_frame_dedup, rel_sql_q14_promo_revenue, rel_sql_q19_brand_ranges —
# all locally verified vs DuckDB at sf0.01, hash-exact, in round 5),
# then the r04-checked set (events_sessionize … text_analysis block of
# CORRECTNESS_r04.json), same scheme. NEVER assume old rows stay valid
# across a testdata regeneration (r03 TIMESTAMP_NTZ incident; compare
# testdata_checksums_r05.txt first).
_DRIVER_PRIORITY: tuple[str, ...] = (
    # -- new in round 5: never driver-checked. The last three double as
    #    suite sentinels: rel_sql_q5 touches every TPC-H table,
    #    events_stream_cms covers streaming+events, sample_group_reservoir
    #    covers documents — so only multimodal still needs a dedicated
    #    sentinel below.
    "skew_salted_outer",
    "events_outlier_robust_approx",
    "fuzzy_token_match",
    "rel_sql_q5_local_supplier",
    "events_stream_cms",
    "sample_group_reservoir",
    # -- implementation changed late in round 5 (md5-slice hash family +
    #    staged digests, operators/sketch.py): per the policy above they
    #    re-enter the window; their r04 rows predate the new cell values.
    #    (events_stream_cms above shares the change and was already in.)
    #    Displaced to make room: vec_topk_with_metadata, vec_quantize_int8
    #    (unchanged since r03, locally full-sweep verified this round).
    "text_cms_counts",
    "decontam_bloom_membership",
    # -- the 43 queries whose newest driver row is r03, oldest-checked first
    "events_funnel",
    "events_funnel_counts",
    "events_cohort_retention",
    "events_transition_matrix",
    "sort_topk_lineitem",
    "sort_seeded_ints",
    "sort_hybrid_quickinsertion",
    "sort_multikey_orders",
    "sort_within_partitions",
    "decontam_ngram_overlap",
    "events_tumbling_window",
    "events_sliding_window",
    "events_json_props",
    "pipeline_snapshot_diff",
    "sample_train_split",
    "sample_stratified_langs",
    "pipeline_pack_sequences",
    "sample_mixture_tokens",
    "skew_salted_agg",
    "skew_salted_join",
    "text_token_frequency",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_portable",
    "dedup_simhash",
    "dedup_simhash_portable",
    "pipeline_clean_corpus",
    "dedup_components",
    "text_pii_scrub",
    "text_chunk_sliding",
    "text_repetition",
    "text_bm25_topk",
    "pipeline_dedup_keep_best",
    "fuzzy_name_match",
    "text_heavy_hitters",
    "vec_cosine_topk",
    "vec_exact_near_dup",
    "vec_lsh_near_dup",
    "vec_lsh_portable",
    "vec_ivf_topk",
    "vec_label_centroids",
    # -- sentinel: r04-green; multimodal is the one suite/table family
    #    neither the 43 stale queries nor the round-5 additions touch
    "mm_byte_features",
    # (vec_topk_with_metadata / vec_quantize_int8 fall past the 50-slot
    # cap this round — displaced by the two changed sketch queries above;
    # unchanged code, r03-green, locally verified this round, first in
    # line with the round-6 rotation set.)
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
