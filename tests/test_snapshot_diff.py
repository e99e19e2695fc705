"""snapshot_diff: change classification on crafted snapshots — null-safe
value comparison, composite keys, unchanged-row suppression, plan gate."""

from __future__ import annotations

import __spark_entry__ as entrymod
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators.scd import (
    snapshot_diff,
)
from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.plans import (
    inspect as PI,
)
from tests.conftest import SF_DIR


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double, s string")


def test_change_classification(spark):
    old = _df(
        spark,
        [
            (1, 1.0, "a"),  # unchanged → suppressed
            (2, 2.0, "a"),  # value change
            (3, 3.0, "a"),  # removed
            (4, None, "a"),  # null → value = changed
            (5, 5.0, None),  # null string unchanged (null <=> null)
        ],
    )
    new = _df(
        spark,
        [
            (1, 1.0, "a"),
            (2, 2.5, "a"),
            (4, 4.0, "a"),
            (5, 5.0, None),
            (6, 6.0, "b"),  # added
        ],
    )
    out = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["v", "s"]).collect()
    }
    assert set(out) == {2, 3, 4, 6}
    assert out[2]["change_type"] == "changed"
    assert out[2]["old_v"] == 2.0 and out[2]["new_v"] == 2.5
    assert out[3]["change_type"] == "removed" and out[3]["new_v"] is None
    assert out[4]["change_type"] == "changed"
    assert out[6]["change_type"] == "added" and out[6]["old_v"] is None


def test_composite_key(spark):
    old = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "k1 bigint, k2 string, v double"
    )
    new = spark.createDataFrame(
        [(1, "x", 9.0), (2, "y", 2.0)], "k1 bigint, k2 string, v double"
    )
    out = {
        (r["k1"], r["k2"]): r["change_type"]
        for r in snapshot_diff(old, new, ["k1", "k2"], ["v"]).collect()
    }
    assert out == {(1, "x"): "changed", (1, "y"): "removed", (2, "y"): "added"}


def test_identical_snapshots_empty_feed(spark):
    old = _df(spark, [(1, 1.0, "a"), (2, None, None)])
    assert snapshot_diff(old, old, ["k"], ["v", "s"]).count() == 0


def test_snapshot_diff_plan(spark):
    qs = entrymod.queries()
    df = qs["pipeline_snapshot_diff"](spark, SF_DIR)
    assert not PI.has_cartesian(df)
    # snapshot scans prune to key + compare columns (3 of orders' 6); the
    # synthetic-additions branch prunes all the way down to the key alone
    schemas = PI.scan_read_schemas(df)
    assert all(s.count(":") <= 3 for s in schemas), schemas
    assert any(s.count(":") == 3 for s in schemas), schemas


# r09 recency-guard backfill (test_session): in-session oracle parity.
ORACLE_QUERIES = [
    "pipeline_snapshot_diff",
]


import pytest as _pytest  # noqa: E402


@_pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    from tests.conftest import assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, SF_DIR), oracles[name], SF_DIR)
