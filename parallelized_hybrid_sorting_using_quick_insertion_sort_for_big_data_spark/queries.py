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
    # ROUND 10 WINDOW (50 exactly; pytest-guarded in test_session.py).
    # Rotation per VERDICT r09 items 1-2: FRONT = vec_pq_recall_sweep (the
    # only query never driver-checked in any round) + the three queries
    # whose implementation changed this round (the adaptive-width portable
    # LSH fix: vec_lsh_portable / vec_bucketed_near_dup get portable_nbits
    # width + regenerated adaptive oracle; vec_ann_recall's plane table was
    # refactored to a pinned prefix — result identical, re-checked anyway).
    # TAIL = oldest-driver-checked first: the three r04 names displaced in
    # r09 (dedup_exact, sort_total_lineitem, text_analysis), then the r05
    # block in CORRECTNESS_r05.json record order (sort_within_partitions is
    # excluded — re-checked r09; vec_lsh_portable is already front). The
    # last 7 of that record order (text_heavy_hitters, vec_cosine_topk,
    # vec_exact_near_dup, vec_lsh_near_dup, vec_ivf_topk,
    # vec_label_centroids, mm_byte_features) don't fit and rotate in
    # round 11 with the r07 block. dedup_duplicate_spans_fast (the xxhash64 span-key path,
    # sharing the string form's oracle) and mm_audio_decode_features (the
    # real stdlib-WAV codec path with an analytic oracle) are new this
    # round — never-checked, so they take front slots. The three corpus-
    # filter queries (suites/corpus_filters.py: Gopher rule audit, CCNet
    # unigram-LM buckets, deterministic epoch shuffle) landed later in
    # round 10 — also never-checked, also front; text_bm25_topk,
    # pipeline_dedup_keep_best and fuzzy_name_match (all in-session
    # parity-pinned) rotate to round 11 to keep the window at 50.
    # mm_image_decode_features (the BMP twin of the WAV path),
    # mm_video_decode_features (the AVI chunk-tree walk completing the
    # modality set) and mm_audio_near_dup (decode → fingerprint → banded
    # near-dup join on the WAV path) are the last round-10 adds —
    # never-checked, front slots; text_repetition, text_chunk_sliding and
    # text_pii_scrub (all parity-pinned in test_text_dedup) rotate to
    # round 11 with the other three.
    "vec_pq_recall_sweep",
    "dedup_duplicate_spans_fast",
    "mm_audio_decode_features",
    "mm_image_decode_features",
    "mm_video_decode_features",
    "mm_audio_near_dup",
    "text_gopher_rules",
    "text_unigram_lm_score",
    "pipeline_epoch_shuffle",
    "vec_lsh_portable",
    "vec_bucketed_near_dup",
    "vec_ann_recall",
    "dedup_exact",
    "sort_total_lineitem",
    "text_analysis",
    "skew_salted_outer",
    "events_outlier_robust_approx",
    "fuzzy_token_match",
    "rel_sql_q5_local_supplier",
    "events_stream_cms",
    "sample_group_reservoir",
    "text_cms_counts",
    "decontam_bloom_membership",
    "events_funnel",
    "events_funnel_counts",
    "events_cohort_retention",
    "events_transition_matrix",
    "sort_topk_lineitem",
    "sort_seeded_ints",
    "sort_hybrid_quickinsertion",
    "sort_multikey_orders",
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
)

_DRIVER_PRIORITY_R09: tuple[str, ...] = (
    # ROUND 9 WINDOW (kept for the rotation audit trail).
    # Rotation per VERDICT r08 item 1: FRONT = the 19 queries with no
    # driver CORRECTNESS row in ANY round (the late-r08 adds — all
    # sweep-green in LOCAL_VERIFY_r08.txt and parity-pytest-pinned) plus
    # sort_within_partitions, whose r07 oracle promotion has never had a
    # driver row (its last row, r05, checked the old rows-only form).
    # events_cusum_changepoint additionally carries this round's S_0=0
    # clamp fix (ADVICE r08 medium) — its first driver row checks the
    # corrected identity on both engines. TAIL = the r04-checked block,
    # oldest-driver-checked first in CORRECTNESS_r04.json record order
    # (28 of its 31 names fit; `sort_total_lineitem`, `dedup_exact`,
    # and `text_analysis` rotate back in round 10 with the r05 block). graph_bfs_levels
    # is NOT re-windowed for its NOT-IN→NOT-EXISTS oracle hardening
    # (semantics-preserving; locally re-verified hash-green this round).
    "events_cusum_changepoint",
    "events_survival_retention",
    "events_dau_wau_mau",
    "events_ab_test",
    "events_bootstrap_ci",
    "events_hll_daily_merge",
    "events_stream_windowed_topk",
    "events_seasonal_anomaly",
    "graph_kcore",
    "graph_adamic_adar",
    "graph_assortativity",
    "rel_pareto_abc",
    "text_hashed_bow",
    "pipeline_dataset_card",
    "dedup_lsh_recall",
    "vec_pq_codes",
    "vec_pq_adc_topk",
    "vec_label_drift",
    "vec_ivf_nprobe_recall",
    "sort_within_partitions",
    # r09 adds (never driver-checked; sweep-green in LOCAL_VERIFY_r09.txt
    # and ORACLE_QUERIES-parity-pinned). They take the tail's last two
    # slots: sort_total_lineitem and dedup_exact yield — both driver-green
    # four times (r01-r04) and among the most pytest-pinned queries in the
    # repo — and rotate back in round 10 with text_analysis and the r05
    # block.
    "dedup_duplicate_spans",
    "pipeline_span_dedup_rewrite",
    "mm_frame_sample",
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
    "rel_approx_quantiles",
    "vec_bucketed_near_dup",
    "events_stream_sessionize",
    "events_stream_stream_join",
    "text_minhash_doc_sketch",
    "dedup_incremental_minhash",
    "vec_ann_recall",
    "vec_kmeans_centroids",
    "vec_kmeans_ivf_topk",
    "text_winnow_fingerprints",
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
        corpus_filters,
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
