"""Pins for integer-exact Efraimidis-Spirakis weighted sampling: selection
frequencies track weights across independent salts, weight-1 uniformity,
determinism, clamping, plan shape, and oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.operators import (
    sampling,
)

SCHEMA = StructType([StructField("id", LongType()), StructField("wt", LongType())])


def _ids(df):
    return sorted(r["id"] for r in df.collect())


@pytest.mark.slow
def test_heavier_items_selected_more_often_across_salts(spark):
    # 40 items of weight 1 + 10 items of weight 16; draw k=10 with 12
    # different salts (independent deterministic draws). Expected heavy
    # inclusion ~16x per-replica advantage; assert heavies win a clear
    # majority of slots overall — a distribution property, not a fluke,
    # because each salt is an independent uniform draw.
    rows = [(i, 1) for i in range(40)] + [(100 + i, 16) for i in range(10)]
    df = spark.createDataFrame(rows, SCHEMA)
    heavy_picks = total = 0
    for s in range(12):
        out = sampling.weighted_sample(
            df, "id", F.col("wt"), k=10, salt=f"trial{s}"
        )
        ids = _ids(out)
        heavy_picks += sum(1 for i in ids if i >= 100)
        total += len(ids)
    assert total == 120
    assert heavy_picks > total * 0.5, f"heavy items won {heavy_picks}/{total}"


def test_weight_one_is_plain_coin_reservoir(spark):
    df = spark.createDataFrame([(i, 1) for i in range(30)], SCHEMA)
    out1 = sampling.weighted_sample(df, "id", F.col("wt"), k=5, salt="u")
    # same corpus, same salt → identical selection on re-run (determinism)
    out2 = sampling.weighted_sample(df, "id", F.col("wt"), k=5, salt="u")
    assert _ids(out1) == _ids(out2)
    assert len(_ids(out1)) == 5


def test_weights_clamped_and_validated(spark):
    df = spark.createDataFrame([(1, 0), (2, -5), (3, 10**9)], SCHEMA)
    out = sampling.weighted_sample(df, "id", F.col("wt"), k=3, max_weight=8)
    # weight<=0 clamps to 1 (still sampleable), huge clamps to max_weight
    assert _ids(out) == [1, 2, 3]
    with pytest.raises(ValueError):
        sampling.weighted_sample(df, "id", F.col("wt"), k=0)
    with pytest.raises(ValueError):
        sampling.weighted_sample(df, "id", F.col("wt"), k=1, max_weight=0)


def test_rank_ordering_matches_selection_keys(spark):
    df = spark.createDataFrame([(i, 3) for i in range(20)], SCHEMA)
    rows = sampling.weighted_sample(df, "id", F.col("wt"), k=6).collect()
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    keys = [r["sel_key"] for r in by_rank]
    assert keys == sorted(keys, reverse=True)
    assert [r["rnk"] for r in by_rank] == list(range(1, 7))


def test_topk_plans_take_ordered(spark):
    from parallelized_hybrid_sorting_using_quick_insertion_sort_for_big_data_spark.plans import (
        inspect as PI,
    )

    df = spark.createDataFrame([(i, 2) for i in range(50)], SCHEMA)
    out = sampling.weighted_sample(df, "id", F.col("wt"), k=5)
    assert "TakeOrderedAndProject" in PI.formatted_plan(out)


def test_registered_query_matches_oracle(spark):
    import __spark_entry__ as E
    from tests.conftest import SF_DIR, assert_matches_oracle

    got = E.queries()["sample_weighted_topk"](spark, SF_DIR)
    assert_matches_oracle(got, E.oracle_sql()["sample_weighted_topk"], SF_DIR)
