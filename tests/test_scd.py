"""SCD2 point-in-time (AS OF) pins."""

from __future__ import annotations

import pytest

def test_asof_boundary_semantics(spark):
    """AS OF the merge instant: changed keys show their NEW balance and
    inserts exist; one instant earlier: OLD balances, no inserts. One row
    per live key at both instants (half-open [from, to) pinned)."""
    import __spark_entry__ as E
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators.scd import (
        scd2_asof,
    )
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.suites.relational import (
        _SCD_TS,
        pipeline_scd2_merge,
    )
    from tests.conftest import SF_DIR

    merged = pipeline_scd2_merge(spark, SF_DIR)
    at = {r["c_custkey"]: r["c_acctbal"] for r in scd2_asof(merged, _SCD_TS).collect()}
    before = {
        r["c_custkey"]: r["c_acctbal"] for r in scd2_asof(merged, _SCD_TS - 1).collect()
    }
    # one row per key both times (dict sizes == row counts)
    assert len(at) == scd2_asof(merged, _SCD_TS).count()
    assert len(before) == scd2_asof(merged, _SCD_TS - 1).count()
    # inserts (+1M keys) visible only at the merge instant
    inserts_at = [k for k in at if k >= 1_000_000]
    assert len(inserts_at) == 20 and not [k for k in before if k >= 1_000_000]
    # a %7 changed key: +100 at the instant, old value just before
    changed = sorted(k for k in before if k % 7 == 0 and k < 1_000_000)[0]
    assert at[changed] == pytest.approx(before[changed] + 100.0)
    # an untouched key is identical at both instants
    untouched = sorted(
        k for k in before if k % 7 != 0 and k % 11 != 0 and k < 1_000_000
    )[0]
    assert at[untouched] == before[untouched]


def test_cdc_apply_semantics(spark):
    """Crafted CDC log: latest-op-wins per key, a winning tombstone deletes
    the key, a re-insert AFTER a delete resurrects it, and keys never
    interfere. Also oracle parity for the registered query."""
    import __spark_entry__ as E
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators.scd import (
        cdc_apply,
    )
    from tests.conftest import SF_DIR, assert_matches_oracle

    log = spark.createDataFrame(
        [
            # k=1: plain update chain — last U wins
            (1, 1, "U", "a"), (1, 2, "U", "b"), (1, 3, "U", "c"),
            # k=2: delete wins (arrives last)
            (2, 1, "U", "x"), (2, 2, "D", None),
            # k=3: delete then re-insert — resurrected with the new value
            (3, 1, "U", "old"), (3, 2, "D", None), (3, 3, "U", "new"),
            # k=4: only a delete — never materializes
            (4, 1, "D", None),
        ],
        "k int, seq int, op string, v string",
    )
    got = {r["k"]: r["v"] for r in cdc_apply(log, ["k"], ["seq"]).collect()}
    assert got == {1: "c", 3: "new"}

    qs, oracles = E.queries(), E.oracle_sql()
    assert_matches_oracle(
        qs["pipeline_cdc_apply"](spark, SF_DIR), oracles["pipeline_cdc_apply"], SF_DIR
    )
