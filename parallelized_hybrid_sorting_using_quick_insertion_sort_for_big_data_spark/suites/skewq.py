"""Headline queries exercising the explicit skew-mitigation operators
(operators/skew.py) on a DELIBERATELY skewed key: ~90% of event rows are
collapsed onto one hot key, the distribution that makes a naive
count(DISTINCT) or join funnel into a single straggler reducer.

Both queries are oracle-checked — salting is exact, so the DuckDB SQL is
just the unsalted formulation. The salted-vs-unsalted wall-time pair runs
in bench.py (``skew_salted_agg`` vs ``skew_plain_agg`` bench keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import skew
from ..queries import query
from ..sources.tables import load_table

_DEC = "decimal(27,8)"

# 90%-hot derived keys: users with user_id % 10 != 0 collapse to one key.
# (Functions, not module-level Columns: classic PySpark requires an active
# SparkContext to build a Column, and this module must be importable —
# e.g. by the driver enumerating queries() — before any session exists.)
def _hot_agg_key():
    return F.when(F.col("user_id") % 10 != 0, F.lit(-1)).otherwise(F.col("user_id"))


def _hot_join_key():
    return F.when(F.col("user_id") % 10 != 0, F.lit(0)).otherwise(F.col("user_id"))

_SALTED_AGG_ORACLE = """
SELECT CASE WHEN user_id % 10 <> 0 THEN -1 ELSE user_id END AS skew_key,
       count(DISTINCT value) AS n_distinct
FROM events
GROUP BY 1
"""


@query("skew_salted_agg", sql=_SALTED_AGG_ORACLE)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count(DISTINCT value) per key where one key holds ~90% of all
    rows. The salted two-phase form shuffles the hot key's distinct set
    across 16 partial reducers instead of funneling it through one — same
    answer, no straggler. (The plain form is the bench counterpart.)"""
    sk = load_table(spark, sf_dir, "events").select(
        _hot_agg_key().alias("skew_key"), "value"
    )
    return skew.salted_distinct_count(sk, "skew_key", "value", n_salts=16)


def skew_plain_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unsalted formulation of ``skew_salted_agg`` — NOT registered as a
    query (same answer); exists for the bench pair so the salting win is
    measured, not asserted."""
    sk = load_table(spark, sf_dir, "events").select(
        _hot_agg_key().alias("skew_key"), "value"
    )
    return sk.groupBy("skew_key").agg(
        F.countDistinct("value").alias("n_distinct")
    )


_SALTED_JOIN_ORACLE = """
WITH ev AS (
  SELECT CASE WHEN user_id % 10 <> 0 THEN 0 ELSE user_id END AS ukey, value
  FROM events
)
SELECT c_mktsegment,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total_value
FROM ev JOIN customer ON ev.ukey = customer.c_custkey
GROUP BY 1
"""


@query("skew_salted_join", sql=_SALTED_JOIN_ORACLE)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join the 90%-hot-key event stream to the customer dim via
    ``salted_join`` (hot key spread over 8 salts, dim exploded 8×), then
    aggregate value per market segment. Exact: matches the plain-join
    oracle row for row."""
    ev = load_table(spark, sf_dir, "events").select(
        _hot_join_key().alias("ukey"), "value"
    )
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = skew.salted_join(ev, dim, "ukey", "c_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
    )


_SALTED_OUTER_ORACLE = """
WITH ev AS (
  SELECT CASE WHEN user_id % 10 <> 0 THEN -1 ELSE user_id END AS ukey, value
  FROM events
)
SELECT c_mktsegment,
       count(value) AS n_events,
       count(CASE WHEN value IS NULL THEN 1 END) AS n_eventless_customers,
       CAST(sum(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total_value
FROM ev FULL OUTER JOIN customer ON ev.ukey = customer.c_custkey
GROUP BY 1
"""


@query("skew_salted_outer", sql=_SALTED_OUTER_ORACLE)
def skew_salted_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of the 90%-hot-key event stream to the customer dim
    via ``salted_outer_join`` — the hot key (-1) matches NO customer, so
    the entire hot mass flows through the salted left leg null-extended
    (the straggler case the operator exists for), matched keys land in
    their segments, and customers with no events surface once each from
    the anti-join leg. Exercises all three full-outer row classes against
    the plain FULL OUTER oracle: segment (null for the unmatched hot
    mass), event count, eventless-customer count, exact decimal value sum.

    This is the CDC/decontamination merge shape (``pipeline_scd2_merge``'s
    full outer) made hot-key-proof (VERDICT r04 next-round #3)."""
    ev = load_table(spark, sf_dir, "events").select(
        _hot_agg_key().alias("ukey"), "value"
    )
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = skew.salted_outer_join(ev, dim, "ukey", "c_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("value").alias("n_events"),
        F.count(F.when(F.col("value").isNull(), F.lit(1))).alias(
            "n_eventless_customers"
        ),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
    )


def skew_plain_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsalted counterpart of ``skew_salted_join`` for the bench pair. The
    dim is hinted to sort-merge (at test scale it would auto-broadcast,
    which never shuffles the hot key and would make the pair measure
    broadcast-vs-salting overhead instead of the straggler the salting
    removes); AQE's skew-split rescue stays on — it is part of the
    baseline being compared against."""
    ev = load_table(spark, sf_dir, "events").select(
        _hot_join_key().alias("ukey"), "value"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .hint("merge")
    )
    joined = ev.join(dim, ev["ukey"] == dim["c_custkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
    )
