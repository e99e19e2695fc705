"""Breadth suite (SURVEY.md §7.2 M6): filter / join / agg / window / set-ops
/ scalar functions over the TPC-H-ish tables, all oracle-checked.

The reference has none of these operators (SURVEY.md §2b — verified absent);
Spark's built-ins provide them, and these queries exercise the engine surface
so the oracle harness covers every §2b category.

Float discipline: every double aggregate is computed on DECIMAL (exact,
order-independent) and cast back to DOUBLE so Spark's and DuckDB's summation
orders can't diverge (per-row double arithmetic is IEEE-identical across
engines; only reduction order varies, and decimal removes that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import query
from ..sources.tables import load_table

# 8 decimal digits: source doubles carry ≤2 decimals, so products of three
# such values carry ≤6 — at scale 8 no value lands on a rounding tie, keeping
# Spark (HALF_UP) and DuckDB (HALF_EVEN) casts identical.
_DEC = "decimal(27,8)"


def _dsum(col):
    """Order-independent sum of a double column via decimal, back to double."""
    return F.sum(col.cast(_DEC)).cast("double")


def _davg(col):
    return (F.sum(col.cast(_DEC)).cast("double") / F.count(col)).cast("double")


# ---------------------------------------------------------------------------
# 1. TPC-H Q1-style pricing summary: filter + groupBy + many aggregates
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(27,8))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(27,8))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,8))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(27,8))) AS DOUBLE) / count(l_quantity) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(27,8))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(27,8))) AS DOUBLE) / count(l_discount) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("rel_q1_pricing_summary", sql=_Q1_ORACLE)
def rel_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: predicate (pushed to parquet) + hash agg with
    map-side partial aggregation — one shuffle of pre-aggregated rows, the
    at-scale shape for groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            _davg(F.col("l_quantity")).alias("avg_qty"),
            _davg(F.col("l_extendedprice")).alias("avg_price"),
            _davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# 2. Multi-way join with broadcast dims: revenue by nation
# ---------------------------------------------------------------------------

_REVENUE_ORACLE = """
SELECT
  n.n_name AS nation,
  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8))) AS DOUBLE) AS revenue,
  count(*) AS n_lineitems
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
"""


@query("rel_join_revenue_by_nation", sql=_REVENUE_ORACLE)
def rel_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact lineitem ⋈ orders (shuffle or broadcast by size) with
    nation/region explicitly broadcast (fixed 25/5-row dims — broadcastable
    at ANY scale factor, so no shuffle for the dimension legs even at
    100 TB)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _dsum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# 3. Window functions: top-3 orders per market segment + running totals
# ---------------------------------------------------------------------------

_WINDOW_ORACLE = """
SELECT * FROM (
  SELECT
    c.c_mktsegment AS segment,
    o.o_orderkey,
    o.o_totalprice,
    row_number() OVER (
      PARTITION BY c.c_mktsegment
      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk,
    CAST(sum(CAST(o.o_totalprice AS DECIMAL(27,8))) OVER (
      PARTITION BY c.c_mktsegment
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rnk <= 3
"""


@query("rel_window_top_orders_per_segment", sql=_WINDOW_ORACLE)
def rel_window_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k + running sum — windows PARTITIONED by segment (scales:
    each group sorts independently after one hash shuffle; no global window)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_mktsegment").alias("segment"), "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("segment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        joined.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "running_total",
            F.sum(F.col("o_totalprice").cast(_DEC))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"),
        )
        .where(F.col("rnk") <= 3)
        .select("segment", "o_orderkey", "o_totalprice", "rnk", "running_total")
    )


# ---------------------------------------------------------------------------
# 4. Semi/anti joins: customers with F-orders but no O-orders
# ---------------------------------------------------------------------------

_SEMI_ANTI_ORACLE = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
"""


@query("rel_semi_anti_join", sql=_SEMI_ANTI_ORACLE)
def rel_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS) + left_anti (NOT EXISTS) — the set-membership joins
    (absent from the reference, §2b)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    f_orders = orders.where(F.col("o_orderstatus") == "F")
    o_orders = orders.where(F.col("o_orderstatus") == "O")
    return (
        cust.join(f_orders, cust.c_custkey == f_orders.o_custkey, "left_semi")
        .join(o_orders, cust.c_custkey == o_orders.o_custkey, "left_anti")
    )


# ---------------------------------------------------------------------------
# 5. Set operations: UNION / INTERSECT / EXCEPT
# ---------------------------------------------------------------------------

_SETOPS_ORACLE = """
WITH big_parts AS (SELECT p_partkey FROM part WHERE p_size >= 30),
     cheap_parts AS (SELECT p_partkey FROM part WHERE p_retailprice < 1200.0)
SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM big_parts UNION SELECT * FROM cheap_parts)
UNION ALL
SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM big_parts INTERSECT SELECT * FROM cheap_parts)
UNION ALL
SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM big_parts EXCEPT SELECT * FROM cheap_parts)
"""


@query("rel_set_operations", sql=_SETOPS_ORACLE)
def rel_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    big = part.where(F.col("p_size") >= 30).select("p_partkey")
    cheap = part.where(F.col("p_retailprice") < 1200.0).select("p_partkey")

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        one("union", big.union(cheap).distinct())
        .unionAll(one("intersect", big.intersect(cheap)))
        .unionAll(one("except", big.exceptAll(cheap.distinct()).distinct()))
    )


# ---------------------------------------------------------------------------
# 6. Scalar functions: string / date / math / conditional
# ---------------------------------------------------------------------------

_SCALAR_ORACLE = """
SELECT
  o_orderkey,
  upper(o_orderpriority) AS prio_upper,
  length(o_orderpriority) AS prio_len,
  substr(o_orderpriority, 1, 1) AS prio_code,
  CAST(year(o_orderdate) AS INT) AS order_year,
  CAST(month(o_orderdate) AS INT) AS order_month,
  round(o_totalprice, 0) AS price_rounded,
  CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_bucket,
  CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
  abs(o_orderkey % 7 - 3) AS mod_demo
FROM orders
"""


@query("rel_scalar_functions", sql=_SCALAR_ORACLE)
def rel_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar surface — all JVM-side built-ins inside
    whole-stage codegen, zero Python in the hot path."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.length("o_orderpriority").cast("bigint").alias("prio_len"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.round("o_totalprice", 0).alias("price_rounded"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_bucket"),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.abs(F.col("o_orderkey") % 7 - 3).alias("mod_demo"),
    )


# ---------------------------------------------------------------------------
# 7. Rollup (grouping sets) over nation/region revenue
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT
  coalesce(r.r_name, 'ALL') AS region,
  coalesce(n.n_name, 'ALL') AS nation,
  count(*) AS n_customers,
  CAST(sum(CAST(c.c_acctbal AS DECIMAL(27,8))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@query("rel_rollup_customers", sql=_ROLLUP_ORACLE)
def rel_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (region→nation→grand total) — one pass,
    partial-agg friendly."""
    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_acctbal",
        )
    )


# ---------------------------------------------------------------------------
# 8. Distinct aggregates
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT
  l_returnflag,
  count(DISTINCT l_suppkey) AS n_suppliers,
  count(DISTINCT l_partkey) AS n_parts,
  count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@query("rel_distinct_aggregates", sql=_DISTINCT_ORACLE)
def rel_distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column COUNT(DISTINCT) — planned as expand + two-phase agg. At
    100 TB prefer approx_count_distinct (HLL, one pass, no expand); exact
    kept here because the oracle must match bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# 9. Outer joins: per-customer order stats keeping order-less customers
# ---------------------------------------------------------------------------

_OUTER_ORACLE = """
SELECT c.c_custkey,
       count(o.o_orderkey) AS n_orders,
       CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(27,8))), 0) AS DOUBLE) AS total_spent,
       CASE WHEN count(o.o_orderkey) = 0 THEN 1 ELSE 0 END AS is_orderless
FROM customer c
LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""


@query("rel_outer_join", sql=_OUTER_ORACLE)
def rel_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + null-aware aggregation (count skips nulls, sum
    coalesces) — preserves customers with zero orders. One shuffle on the
    join key, then partial-agg on the same key (no re-shuffle: the groupBy
    key equals the join key, Catalyst reuses the partitioning)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(_DEC)), F.lit(0).cast(_DEC))
            .cast("double")
            .alias("total_spent"),
            F.when(F.count("o_orderkey") == 0, 1).otherwise(0).cast("int").alias("is_orderless"),
        )
    )


# ---------------------------------------------------------------------------
# 10. Pure-SQL entry point: TPC-H Q3 shape via spark.sql over temp views —
#     proves the engine's SQL surface end-to-end (parser → Catalyst → exec)
# ---------------------------------------------------------------------------

_Q3_SQL = """
SELECT l.l_orderkey,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8))) AS DOUBLE) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
"""

# identical text modulo the rank materialization (order must survive the
# driver's order-insensitive hash)
_Q3_ORACLE = f"""
SELECT row_number() OVER (ORDER BY revenue DESC, o_orderdate, l_orderkey) AS rnk, *
FROM ({_Q3_SQL})
"""


@query("rel_sql_q3_shipping_priority", sql=_Q3_ORACLE)
def rel_sql_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape executed through spark.sql over registered temp views —
    the full SQL lifecycle (parse → analyze → optimize → execute). Plan
    quality is inherited: both date filters push to the scans, the
    ORDER+LIMIT plans as TakeOrderedAndProject."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    out = spark.sql(_Q3_SQL)
    from ..operators.sorting import ranked_small

    return ranked_small(
        out, ["revenue", "o_orderdate", "l_orderkey"], ascending=[False, True, True]
    ).select("rnk", "l_orderkey", "revenue", "o_orderdate", "o_orderpriority")


# ---------------------------------------------------------------------------
# 10b. TPC-H Q5 shape: the 6-table join chain — region/nation prune down
#      through customer/orders into lineitem/supplier with the co-nation
#      equi-constraint. The canonical Catalyst join-ordering showcase: every
#      dimension broadcasts, both date filters push to the orders scan, and
#      the fact table shuffles only for the final 5-row aggregation.
# ---------------------------------------------------------------------------

_Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@query("rel_sql_q5_local_supplier", sql=_Q5_SQL)
def rel_sql_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume) through spark.sql: revenue
    per nation for one region-year slice where the line's supplier sits in
    the customer's own nation — the 6-table join chain that exists to
    exercise join ordering. The oracle is the IDENTICAL SQL text run by
    DuckDB (decimal-exact revenue), so the hash match proves the whole
    parse → Catalyst → execute lifecycle agrees with an independent
    engine on a multi-join plan. Plan gates: every dimension side
    broadcasts (no fact-table shuffle before the final agg), date + region
    filters reach the scans."""
    for t in ("region", "nation", "customer", "supplier", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q5_SQL)


# ---------------------------------------------------------------------------
# 11. Statistical aggregates: exact interpolated percentiles + histogram
# ---------------------------------------------------------------------------

_PCT_ORACLE = """
SELECT
  l_returnflag,
  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
  round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
  min(l_extendedprice) AS lo,
  max(l_extendedprice) AS hi
FROM lineitem
GROUP BY l_returnflag
"""


@query("rel_percentiles", sql=_PCT_ORACLE)
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: both index by p·(n−1) and linearly interpolate;
    round(6) absorbs the last-ulp association difference). At 100 TB exact
    percentile needs a per-group sort of the values — switch to
    `percentile_approx` (t-digest, mergeable partial aggs) when the groups
    outgrow memory; the approx variant has no cross-engine oracle, which is
    why the exact form is the checked query."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.expr(
        "percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D, 0.99D))"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(pct[0], 6).alias("p25"),
            F.round(pct[1], 6).alias("p50"),
            F.round(pct[2], 6).alias("p75"),
            F.round(pct[3], 6).alias("p99"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


# DuckDB has no width_bucket; the CASE reproduces its semantics exactly
# (bucket 0 below range, n+1 above, else floor(x/step)+1)
_HIST_ORACLE = """
SELECT CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 400000 THEN 9
            ELSE CAST(floor(o_totalprice / 50000) AS BIGINT) + 1 END AS bucket,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,8))) AS DOUBLE) AS total
FROM orders
GROUP BY 1
"""


@query("rel_histogram", sql=_HIST_ORACLE)
def rel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via width_bucket — a single map-side expression
    + partial agg; the constant-memory way to profile a 100 TB column."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket(F.col("o_totalprice"), F.lit(0), F.lit(400000), F.lit(8)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# 12. CUBE grouping sets: all 4 aggregation granularities in one pass
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,8))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("rel_cube_orders", sql=_CUBE_ORACLE)
def rel_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping granularities
    (both, each alone, grand total) in one expand + partial-agg pass —
    2^k × the input rows feed the agg, but map-side combine keeps the
    shuffle at one pre-aggregated row per (group, grouping-set)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# 15. Pivot (wide aggregation): order counts per (year, priority) as columns.
#     Spark's groupBy().pivot() plans a single-pass grouped CASE aggregation
#     — one shuffle on the group key, exactly like a plain groupBy; the
#     oracle spells the same CASE sums.
# ---------------------------------------------------------------------------

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_PIV_COLS = ("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")

_PIVOT_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       {", ".join(
         f"CAST(sum(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS {c}"
         for p, c in zip(_PRIORITIES, _PIV_COLS))}
FROM orders
GROUP BY 1
"""


@query("rel_pivot_priority_by_year", sql=_PIVOT_ORACLE)
def rel_pivot_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority counts pivoted to columns per order year, hand-lowered
    to conditional aggregation: ONE shuffle of partial sums (plan-gated).
    `groupBy().pivot(col, values)` computes the same result but plans a
    two-level aggregate (count per (year, priority), then pivotfirst per
    year) = two exchanges; with a fixed value list the CASE form is the
    plan you want at scale. (Never `pivot(col)` without values at all —
    that adds a distinct-scan job just to discover the columns.)"""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.col("o_orderpriority"),
        )
        .groupBy("order_year")
        .agg(
            *[
                F.sum(F.when(F.col("o_orderpriority") == p, 1).otherwise(0))
                .cast("bigint")
                .alias(c)
                for p, c in zip(_PRIORITIES, _PIV_COLS)
            ]
        )
    )


# ---------------------------------------------------------------------------
# 16. Window frames: running totals + lag/lead over each customer's order
#     history — the frame-clause surface (rows between), shuffled once on
#     the partition key.
# ---------------------------------------------------------------------------

_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,8))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       row_number() OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
       lag(o_orderkey) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
       lead(o_orderkey) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders
WHERE o_custkey < 200
"""


@query("rel_window_running_totals", sql=_RUNNING_ORACLE)
def rel_window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend + order sequence + prev/next order keys.
    One shuffle on o_custkey serves all four window functions (same window
    spec); decimal accumulation keeps the running sum order-exact."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(wrun).cast("double").alias("running_spend"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


# ---------------------------------------------------------------------------
# 17. Approximate quantiles — the 100 TB percentile path (exact interpolated
#     percentiles need a full sort; approx_percentile is one pass with
#     bounded sketch memory). Promoted to a FULL oracle r08 (VERDICT r07
#     item 5): sketch estimates are engine-specific so they can't be
#     value-hashed, but the sketch's HARD rank guarantee can — the query
#     emits engine-invariant exact percentiles plus a boolean that the
#     approx value's rank bracket intersects the guaranteed window, and the
#     oracle asserts TRUE. A sketch regression now breaks the hash.
# ---------------------------------------------------------------------------

_APPROX_Q_ACC = 10000  # GK sketch: rank error <= n/accuracy, a hard bound

_APPROX_Q_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_rows,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS exact_p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS exact_p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS exact_p75,
       TRUE AS within_rank_bound
FROM lineitem
GROUP BY l_returnflag
"""


@query("rel_approx_quantiles", sql=_APPROX_Q_ORACLE)
def rel_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile(l_extendedprice) per l_returnflag at accuracy
    10000 — single-pass sketch aggregation, the scale substitute for
    `rel_percentiles`' exact interpolation.

    Oracle design (r08): the sketch value itself is engine-specific, but
    Greenwald-Khanna gives a HARD guarantee — the returned value is an
    actual element whose rank r satisfies |r - p·n| <= n/accuracy. The
    query verifies that guarantee IN the output: per percentile it counts
    elements strictly below / at-or-below the approx value (the element's
    feasible rank interval [n_lt+1, n_le]) and emits ``within_rank_bound``
    = that interval intersects [p·n - εn - 1, p·n + εn + 1] for all three
    percentiles. The oracle recomputes the engine-invariant columns
    (exact interpolated percentiles, counts) and asserts the boolean is
    TRUE — so a sketch that drifts out of its guarantee breaks the value
    hash. The exact percentiles are the verification harness; the sketch
    alone is the 100 TB path. Counting passes are map-side conditional
    sums against the BROADCAST one-row-per-group sketch output — no extra
    fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    pcts = [0.25, 0.50, 0.75]
    eps = 1.0 / _APPROX_Q_ACC
    base = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", pcts, _APPROX_Q_ACC
        ).alias("__ap"),
        F.expr(
            "percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D))"
        ).alias("__ep"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    j = li.join(F.broadcast(base), "l_returnflag")
    count_aggs = []
    for i in range(len(pcts)):
        count_aggs.append(
            F.sum(
                (F.col("l_extendedprice") < F.col("__ap")[i]).cast("long")
            ).alias(f"__lt{i}")
        )
        count_aggs.append(
            F.sum(
                (F.col("l_extendedprice") <= F.col("__ap")[i]).cast("long")
            ).alias(f"__le{i}")
        )
    counted = j.groupBy("l_returnflag").agg(
        F.first("__ep").alias("__ep"),
        F.first("n_rows").alias("n_rows"),
        *count_aggs,
    )
    ok = F.lit(True)
    for i, p in enumerate(pcts):
        target_lo = F.lit(p) * F.col("n_rows") - F.lit(eps) * F.col("n_rows") - 1
        target_hi = F.lit(p) * F.col("n_rows") + F.lit(eps) * F.col("n_rows") + 1
        # feasible rank interval of the returned element: [lt+1, le]
        ok = (
            ok
            & (F.col(f"__lt{i}") + 1 <= target_hi)
            & (F.col(f"__le{i}") >= target_lo)
        )
    return counted.select(
        "l_returnflag",
        "n_rows",
        F.round(F.col("__ep")[0], 6).alias("exact_p25"),
        F.round(F.col("__ep")[1], 6).alias("exact_p50"),
        F.round(F.col("__ep")[2], 6).alias("exact_p75"),
        ok.alias("within_rank_bound"),
    )


_APPROX_D_RSD = 0.01


def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PURE sketch form of ``rel_approx_distinct`` — what actually runs
    at 100 TB: one pass, fixed-size mergeable HLL partials, ONE exchange
    and NO Expand node (plan-gated in test_plans.py). The registry query
    wraps this with exact counts purely as the oracle-checkable
    verification harness; this is the plan users should copy."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", _APPROX_D_RSD).alias("approx_custs"),
        F.approx_count_distinct("o_totalprice", _APPROX_D_RSD).alias("approx_prices"),
        F.count(F.lit(1)).alias("n_rows"),
    )

_APPROX_D_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_rows,
       count(DISTINCT o_custkey) AS exact_custs,
       count(DISTINCT o_totalprice) AS exact_prices,
       TRUE AS custs_within_5rsd,
       TRUE AS prices_within_5rsd
FROM orders
GROUP BY o_orderpriority
"""


@query("rel_approx_distinct", sql=_APPROX_D_ORACLE)
def rel_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd 1%) of customers and
    prices per order priority — the 100 TB cardinality path: one pass,
    fixed-size mergeable sketch per group, no Expand and no per-key
    shuffle of the distinct sets (which is what an exact multi-column
    count(DISTINCT) plans).

    Oracle design (r08): the HLL estimate is engine-specific, but for a
    FIXED dataset and Spark's fixed hash it is deterministic — so the
    query emits the engine-invariant exact distinct counts plus booleans
    |approx - exact| <= max(1, 5·rsd·exact) (5σ of the HLL error model,
    the same band the pytest pins), and the oracle asserts TRUE. The
    exact counts are the verification harness; the sketch alone is the
    scale path."""
    o = load_table(spark, sf_dir, "orders")
    # The exact counts are computed as distinct-project → count per
    # column, then joined to the one-pass sketch agg — NOT as
    # countDistinct terms inside the sketch aggregation: mixing two exact
    # DISTINCT columns with HLL aggregates in one agg plans a 3-way
    # Expand whose replicated rows defeat the hash-agg fast path
    # (measured 7-20 s vs 1.5 s for this form at sf0.1). The join keys
    # are one-row-per-group relations; all three legs are ordinary
    # two-phase aggregations.
    sketch = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", _APPROX_D_RSD).alias("__ac"),
        F.approx_count_distinct("o_totalprice", _APPROX_D_RSD).alias("__ap"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ec = (
        o.select("o_orderpriority", "o_custkey")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("exact_custs"))
    )
    ep = (
        o.select("o_orderpriority", "o_totalprice")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("exact_prices"))
    )
    agg = sketch.join(ec, "o_orderpriority").join(ep, "o_orderpriority")

    def _ok(approx_col: str, exact_col: str) -> Column:
        band = F.greatest(
            F.lit(1.0), F.lit(5.0 * _APPROX_D_RSD) * F.col(exact_col)
        )
        return F.abs(F.col(approx_col) - F.col(exact_col)) <= band

    return agg.select(
        "o_orderpriority",
        "n_rows",
        "exact_custs",
        "exact_prices",
        _ok("__ac", "exact_custs").alias("custs_within_5rsd"),
        _ok("__ap", "exact_prices").alias("prices_within_5rsd"),
    )


# ---------------------------------------------------------------------------
# 19. Unpivot (melt) — wide → long reshaping, the inverse of pivot
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH u AS (
  SELECT p_brand, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT p_brand, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
)
SELECT p_brand, metric,
       count(*) AS n,
       CAST(sum(CAST(val AS DECIMAL(27,8))) AS DOUBLE) AS total_val
FROM u GROUP BY p_brand, metric
"""


@query("rel_unpivot_part_metrics", sql=_UNPIVOT_ORACLE)
def rel_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long via native unpivot (melt): two part metrics become
    (metric, val) rows, then aggregate per (brand, metric). Unpivot is a
    zero-shuffle Expand (each input row fans out locally); the only
    exchange is the final groupBy — same cost shape as scanning twice but
    with ONE pass over the table."""
    part = load_table(spark, sf_dir, "part").select(
        "p_brand",
        F.col("p_retailprice").cast("double"),
        F.col("p_size").cast("double"),
    )
    long = part.unpivot(
        ids=["p_brand"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return long.groupBy("p_brand", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val").cast(_DEC)).cast("double").alias("total_val"),
    )


# ---------------------------------------------------------------------------
# 20. Correlated scalar subqueries — Catalyst decorrelates them into
#     aggregate + left join; no per-row re-execution (the naive reading)
# ---------------------------------------------------------------------------

_CORRELATED_SQL = """
SELECT c.c_custkey,
       c.c_mktsegment,
       (SELECT max(o.o_orderdate) FROM orders o
         WHERE o.o_custkey = c.c_custkey) AS last_order,
       (SELECT count(*) FROM orders o
         WHERE o.o_custkey = c.c_custkey) AS n_orders
FROM customer c
WHERE c.c_acctbal > 0
"""


@query("rel_correlated_subquery", sql=_CORRELATED_SQL)
def rel_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (per-customer last order date + order
    count) through spark.sql. Catalyst rewrites each into an aggregate +
    left outer join on the correlation key — the plan you would hand-write
    — so the 'per-row subquery' surface costs two shuffles, not O(rows)
    query executions. Date/count outputs are integer-exact cross-engine."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_CORRELATED_SQL)


# ---------------------------------------------------------------------------
# 21. Ranking-function battery: the remaining window-rank surface (dense_
#     rank, percent_rank, cume_dist, ntile) over one deterministic window.
# ---------------------------------------------------------------------------

_RANKS_ORACLE = """
SELECT o_orderpriority, o_orderkey,
       row_number()   OVER w AS rn,
       dense_rank()   OVER w AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist()    OVER w AS cdist,
       ntile(4)       OVER w AS quartile
FROM orders
WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
"""


@query("rel_window_rank_functions", sql=_RANKS_ORACLE)
def rel_window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / dense_rank / percent_rank / cume_dist / ntile over one
    shared window spec (one shuffle on the partition key serves all five;
    the ORDER BY carries o_orderkey as a tiebreaker so every rank —
    including the percent/cume ratios, which are rank arithmetic, not
    sums — is integer-derived and engine-exact)."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 300)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# 22. Explicit GROUPING SETS (the general form rollup/cube specialize) with
#     GROUPING() ids disambiguating real NULLs from subtotal rows.
# ---------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,8))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), (o_orderstatus))
"""


@query("rel_grouping_sets", sql=_GSETS_ORACLE)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general grouping form (rollup and cube
    are its specializations, both covered by earlier queries) — with
    GROUPING() ids so subtotal rows are distinguishable from genuine NULL
    group keys. One-pass Expand + single aggregation shuffle; decimal
    accumulation keeps the double total exact."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GSETS_ORACLE)


# ---------------------------------------------------------------------------
# 23. SCD2 merge: history-preserving dimension update (the MERGE pattern,
#     format-agnostic). Exercises every path: closed history untouched,
#     no-op updates create no versions, changes close+reopen, new keys
#     insert. All timestamps integer micros; null-safe attr comparison.
# ---------------------------------------------------------------------------

_SCD_TS = 86_400_000_000  # change batch applies at day 1 (micros)
_SCD_HIST_TS = 43_200_000_000  # pre-existing closed rows ended at half-day

_SCD2_ORACLE = f"""
WITH hist AS (
  SELECT c_custkey, c_name, c_acctbal - 50.0 AS c_acctbal,
         CAST(0 AS BIGINT) AS valid_from_us,
         CAST({_SCD_HIST_TS} AS BIGINT) AS valid_to_us,
         false AS is_current
  FROM customer WHERE c_custkey % 13 = 0
),
snap AS (
  SELECT c_custkey, c_name, c_acctbal,
         CAST(0 AS BIGINT) AS valid_from_us,
         CAST(NULL AS BIGINT) AS valid_to_us,
         true AS is_current
  FROM customer
  UNION ALL
  SELECT * FROM hist
),
upd AS (
  SELECT c_custkey AS k, c_acctbal + 100.0 AS nb FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 11 = 0 AND c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, 42.0 FROM customer WHERE c_custkey < 20
),
open_j AS (
  SELECT s.*, u.k, u.nb
  FROM (SELECT * FROM snap WHERE is_current) s
  FULL OUTER JOIN upd u ON s.c_custkey = u.k
)
SELECT c_custkey, c_name, c_acctbal, valid_from_us, valid_to_us, is_current FROM snap WHERE NOT is_current
UNION ALL
SELECT c_custkey, c_name, c_acctbal, valid_from_us, valid_to_us, is_current
FROM open_j WHERE c_custkey IS NOT NULL AND (k IS NULL OR c_acctbal IS NOT DISTINCT FROM nb)
UNION ALL
SELECT c_custkey, c_name, c_acctbal, valid_from_us, CAST({_SCD_TS} AS BIGINT), false
FROM open_j WHERE c_custkey IS NOT NULL AND k IS NOT NULL AND c_acctbal IS DISTINCT FROM nb
UNION ALL
SELECT c_custkey, c_name, nb, CAST({_SCD_TS} AS BIGINT), CAST(NULL AS BIGINT), true
FROM open_j WHERE c_custkey IS NOT NULL AND k IS NOT NULL AND c_acctbal IS DISTINCT FROM nb
UNION ALL
SELECT k, CAST(NULL AS VARCHAR), nb, CAST({_SCD_TS} AS BIGINT), CAST(NULL AS BIGINT), true
FROM open_j WHERE c_custkey IS NULL
"""


@query("pipeline_scd2_merge", sql=_SCD2_ORACLE)
def pipeline_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (history-preserving) dimension merge over customer: a synthetic
    update batch changes acctbal for %7 keys, no-ops %11 keys, and inserts
    20 new keys, against a snapshot seeded with pre-closed history rows.
    One equi-join between the open slice and the update batch; closed
    history streams through untouched. Every output row (values + validity
    interval + currency flag) is value-checked against the DuckDB mirror."""
    from ..operators.scd import scd2_merge

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    hist = cust.where(F.col("c_custkey") % 13 == 0).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") - 50.0).alias("c_acctbal"),
        F.lit(0).cast("long").alias("valid_from_us"),
        F.lit(_SCD_HIST_TS).cast("long").alias("valid_to_us"),
        F.lit(False).alias("is_current"),
    )
    snap = cust.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.lit(0).cast("long").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
    ).unionByName(hist)
    upd = (
        cust.where(F.col("c_custkey") % 7 == 0)
        .select("c_custkey", (F.col("c_acctbal") + 100.0).alias("c_acctbal"))
        .unionByName(
            cust.where((F.col("c_custkey") % 11 == 0) & (F.col("c_custkey") % 7 != 0))
            .select("c_custkey", "c_acctbal")
        )
        .unionByName(
            cust.where(F.col("c_custkey") < 20).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                F.lit(42.0).alias("c_acctbal"),
            )
        )
    )
    return scd2_merge(snap, upd, key="c_custkey", tracked=["c_acctbal"], change_ts_us=_SCD_TS)


# ---------------------------------------------------------------------------
# 24. Snapshot diff (CDC reconciliation): one full-outer join between two
#     snapshot versions -> labeled change feed (added/removed/changed),
#     unchanged keys dropped. New snapshot is derived deterministically from
#     orders so the oracle can rebuild both sides: %10 keys removed, %7
#     totalprices bumped, %17 keys re-inserted under shifted ids.
# ---------------------------------------------------------------------------

_DIFF_ORACLE = """
WITH old_s AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
new_s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 10 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, 42.0, 'A' FROM orders WHERE o_orderkey % 17 = 0
),
j AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_totalprice AS old_o_totalprice, n.o_totalprice AS new_o_totalprice,
         o.o_orderstatus AS old_o_orderstatus, n.o_orderstatus AS new_o_orderstatus,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
                OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
              THEN 'changed' END AS change_type
  FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey, change_type, old_o_totalprice, new_o_totalprice,
       old_o_orderstatus, new_o_orderstatus
FROM j WHERE change_type IS NOT NULL
"""


@query("pipeline_snapshot_diff", sql=_DIFF_ORACLE)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot reconciliation over orders: full-outer join of two
    snapshot versions, column-wise null-safe comparison, labeled change
    feed. The one shuffle per side is on the snapshot key — zero-exchange
    under the bucketed layouts of sources/bucketing.py."""
    from ..operators.scd import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    old_s = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    new_s = (
        old_s.where(F.col("o_orderkey") % 10 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 100.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 17 == 0).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                F.lit(42.0).alias("o_totalprice"),
                F.lit("A").alias("o_orderstatus"),
            )
        )
    )
    return snapshot_diff(
        old_s, new_s, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


# ---------------------------------------------------------------------------
# 20. RANGE-frame window: event-time moving aggregate (90-day trailing sum
#     per customer). Distinct from the ROWS frames elsewhere in the battery:
#     the frame is bounded by the ORDER-BY VALUE, so ties (same order date)
#     are peers and the result is deterministic without a tiebreaker.
# ---------------------------------------------------------------------------

_RANGE_FRAME_S = 90 * 86400

_RANGE_FRAME_ORACLE = f"""
SELECT o_orderkey, o_custkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,8))) OVER (
         PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
         RANGE BETWEEN {_RANGE_FRAME_S} PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_sum,
       count(*) OVER (
         PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
         RANGE BETWEEN {_RANGE_FRAME_S} PRECEDING AND CURRENT ROW) AS trailing_n
FROM orders
"""


@query("rel_window_range_frame", sql=_RANGE_FRAME_ORACLE)
def rel_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90-day trailing order-value sum per customer — a RANGE frame over
    epoch seconds, the value-bounded frame the ROWS battery can't express
    (same-day orders are peers: both see the pair's combined sum, so the
    result is deterministic with NO tiebreaker key). One shuffle on the
    partition key; decimal-exact sum cast back to double."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    epoch_s = F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_s)
        .rangeBetween(-_RANGE_FRAME_S, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(27,8)"))
        .over(w)
        .cast("double")
        .alias("trailing_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_n"),
    )


# ---------------------------------------------------------------------------
# 21. Second-moment statistics from DECIMAL-EXACT power sums. corr/covar are
#     order-dependent when an engine folds doubles — the portable form
#     aggregates exact decimal moments (n, Σx, Σy, Σxy, Σx², Σy²) and does
#     the identical IEEE double combination on both engines.
# ---------------------------------------------------------------------------

_MOMENTS_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round((sxy - sx*sy/n) / (n-1), 6) AS covar_samp,
       round((sxy - sx*sy/n) / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)), 9) AS corr,
       round(sqrt((sxx - sx*sx/n) / (n-1)), 9) AS stddev_qty
FROM m
"""


@query("rel_moment_stats", sql=_MOMENTS_ORACLE)
def rel_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag covariance/correlation/stddev of (quantity, price) computed
    from decimal-exact power sums — the engine-portable form of the
    second-moment aggregates: native corr()/covar_samp() fold doubles in
    partition order and differ across engines in the low bits, while exact
    Σx/Σy/Σxy/Σx²/Σy² are order-independent and the final double
    combination is the same IEEE expression on both sides. One partial-agg
    shuffle, same as any grouped sum."""
    li = load_table(spark, sf_dir, "lineitem")
    d194 = "decimal(19,4)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(38,8)")).cast("double").alias("sx"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,8)")).cast("double").alias("sy"),
        F.sum(F.col("l_quantity").cast(d194) * F.col("l_extendedprice").cast(d194))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("l_quantity").cast(d194) * F.col("l_quantity").cast(d194))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("l_extendedprice").cast(d194) * F.col("l_extendedprice").cast(d194))
        .cast("double")
        .alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "l_returnflag",
        "n",
        F.round((sxy - sx * sy / n) / (n - F.lit(1)), 6).alias("covar_samp"),
        F.round(
            (sxy - sx * sy / n) / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 9
        ).alias("corr"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))), 9).alias("stddev_qty"),
    )


# ---------------------------------------------------------------------------
# 22. TPC-H Q10 shape: returned-item report — 4-table join, group on the
#     customer, top-20 by lost revenue. The classic "who returned the most"
#     slice: date window on orders, flag filter on lineitem, nation broadcast.
# ---------------------------------------------------------------------------

_Q10_SQL = """
SELECT c.c_custkey,
       c.c_name,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8))) AS DOUBLE) AS revenue,
       c.c_acctbal,
       n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""

_Q10_ORACLE = f"""
SELECT row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rnk, *
FROM ({_Q10_SQL})
"""


@query("rel_sql_q10_returned_items", sql=_Q10_ORACLE)
def rel_sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item report) through spark.sql: revenue
    lost to returns per customer over a half-year order window, top 20.
    Identical SQL text runs on DuckDB (decimal-exact revenue; rank
    materialized so the top-k order survives the order-insensitive hash).
    Plan shape: both the date window and the R-flag filter push to the
    scans, nation broadcasts at any scale, the customer-grain agg shuffles
    only pre-aggregated rows, and the final ORDER+LIMIT plans as
    TakeOrderedAndProject — no global sort of the grouped output."""
    for t in ("customer", "orders", "lineitem", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    out = spark.sql(_Q10_SQL)
    from ..operators.sorting import ranked_small

    return ranked_small(out, ["revenue", "c_custkey"], ascending=[False, True]).select(
        "rnk", "c_custkey", "c_name", "revenue", "c_acctbal", "n_name"
    )


# ---------------------------------------------------------------------------
# 23. TPC-H Q18 shape: large-volume orders — IN-subquery over a HAVING
#     aggregate (semi-join against an aggregated relation), then the detail
#     join + re-aggregation. The one subquery pattern the battery lacked:
#     filter BY an aggregate computed in a different grouping.
# ---------------------------------------------------------------------------

_Q18_SQL = """
SELECT c.c_custkey,
       c.c_name,
       o.o_orderkey,
       o.o_orderdate,
       o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(27,8))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(27,8))) > 250
)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
"""

_Q18_ORACLE = f"""
SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderdate, o_orderkey) AS rnk, *
FROM ({_Q18_SQL})
"""


@query("rel_sql_q18_large_volume", sql=_Q18_ORACLE)
def rel_sql_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers) through spark.sql: orders
    whose total line quantity exceeds a threshold, with customer detail,
    top-100 by order value. Exercises the IN-subquery-over-HAVING pattern:
    Catalyst rewrites the IN to a left-semi join against the aggregated
    lineitem relation — at scale that aggregate shuffles once on
    l_orderkey and the semi-join reuses the same key, so no extra fact
    shuffle; the HAVING compare is decimal-exact on both engines. Rank
    materialized over (totalprice, orderdate, orderkey) so the top-k
    order is hash-visible."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    out = spark.sql(_Q18_SQL)
    from ..operators.sorting import ranked_small

    return ranked_small(
        out, ["o_totalprice", "o_orderdate", "o_orderkey"], ascending=[False, True, True]
    ).select(
        "rnk", "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
    )


# ---------------------------------------------------------------------------
# 24. TPC-H Q14 shape: conditional-aggregation ratio (promo revenue share
#     for one ship-month). The CASE-inside-SUM pattern the battery lacked:
#     two decimal-exact sums in ONE pass, combined by a single double
#     division (engine-portable: no reduction-order dependence anywhere).
# ---------------------------------------------------------------------------

_Q14_SQL = """
SELECT CAST(100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8))
                 ELSE CAST(0 AS DECIMAL(27,8)) END) AS DOUBLE)
       / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8))) AS DOUBLE)
       AS DOUBLE) AS promo_revenue_pct,
       count(*) AS n_lineitems
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@query("rel_sql_q14_promo_revenue", sql=_Q14_SQL)
def rel_sql_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect) through spark.sql: the share of
    one ship-month's revenue that came from PROMO parts. Identical SQL
    text on both engines. Plan: the date window pushes to the lineitem
    scan, part broadcasts (or shuffles at real scale — either way one
    pass), and both conditional sums fold in the same partial aggregate;
    the final percent is one IEEE double expression over two
    order-independent decimal sums."""
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q14_SQL)


# ---------------------------------------------------------------------------
# 25. TPC-H Q19 shape: disjunctive multi-attribute predicate (OR of
#     conjunctions across BOTH join sides) — the pattern that exercises
#     Catalyst's CNF extraction: the part-only half of each disjunct is
#     pushed to the part scan while the mixed half stays on the join.
# ---------------------------------------------------------------------------

_Q19_SQL = """
SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8))) AS DOUBLE) AS revenue,
       count(*) AS n_matches
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 30 AND l.l_quantity BETWEEN 20 AND 40)
"""


@query("rel_sql_q19_brand_ranges", sql=_Q19_SQL)
def rel_sql_q19_brand_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under an OR of brand/size/
    quantity conjunctions) through spark.sql, identical text on both
    engines. The disjunction spans both join sides: Catalyst extracts the
    part-only residual (brand IN (...) and the size envelope) and pushes
    it into the part scan so the join builds over a pre-filtered dim,
    while the per-disjunct mixed conditions evaluate post-join — the
    standard CNF-extraction behavior this query exists to pin."""
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q19_SQL)


# ---------------------------------------------------------------------------
# 26. TPC-H Q17 shape: correlated scalar-aggregate subquery (small-quantity
#     revenue for one brand, threshold = 20% of that part's own average
#     quantity). The decorrelation pattern the battery lacked: Catalyst
#     rewrites each correlated aggregate into a grouped relation joined
#     back on the correlation key (and merges the two sibling subqueries
#     into ONE aggregate pass — pinned by the plan gate).
#     The textbook `l_quantity < 0.2 * avg(...)` predicate is restated as
#     the multiplied-through `5 * qty * count < sum` so the comparison is
#     decimal-exact on both engines: avg over DOUBLE would make the
#     threshold an engine-dependent last-ulp coin flip at the boundary.
# ---------------------------------------------------------------------------

_Q17_SQL = """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(27,8))) AS DOUBLE) / CAST(7 AS DOUBLE) AS avg_yearly,
       count(*) AS n_small_qty
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND CAST(5 AS DECIMAL(18,4)) * CAST(l.l_quantity AS DECIMAL(18,4))
        * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
      < (SELECT sum(CAST(l3.l_quantity AS DECIMAL(18,4))) FROM lineitem l3 WHERE l3.l_partkey = p.p_partkey)
"""


@query("rel_sql_q17_small_quantity", sql=_Q17_SQL)
def rel_sql_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue) through spark.sql,
    identical text on both engines: lineitems of one brand whose quantity
    is below 20% of that part's average, i.e. the correlated
    scalar-aggregate pattern. Catalyst decorrelates each subquery into a
    per-partkey aggregate joined back on l_partkey (the count leg as a
    LeftOuter join, the sum leg folded into an equi-join whose condition
    carries the threshold compare — plan-gated: exactly two per-partkey
    aggregate exchanges, no cartesian). At scale: the per-part aggregate
    shuffles once on partkey, the brand filter pushes to the part scan and
    prunes the probe side before the join; the `5*qty*count < sum`
    restatement keeps the threshold comparison exact (no double avg).
    Reference parity: engine-side decorrelation the reference cannot
    express at all (its pipeline is single-relation sorts, SURVEY §2b) —
    pure extension-layer SQL surface."""
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q17_SQL)


# ---------------------------------------------------------------------------
# 27. TPC-H Q21 shape: suppliers who kept the order waiting — EXISTS
#     (another supplier in the order) + NOT EXISTS (another LATE supplier
#     in the order) over the fact side, i.e. a left-semi + left-anti join
#     stack on the same key with non-equi correlated residuals. "Late" is
#     restated as shipdate > orderdate + 90 days (this corpus has no
#     commit/receipt dates — SURVEY §3 data model).
# ---------------------------------------------------------------------------

_Q21_SQL = """
SELECT s.s_name, n.n_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY s.s_name, n.n_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""

_Q21_ORACLE = f"""
SELECT row_number() OVER (ORDER BY numwait DESC, s_name) AS rnk, *
FROM ({_Q21_SQL})
"""


@query("rel_sql_q21_waiting_supplier", sql=_Q21_ORACLE)
def rel_sql_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting) through
    spark.sql, identical text on both engines: for finished orders, count
    per supplier the lineitems that shipped late where ANOTHER supplier
    participated (EXISTS → left-semi join on l_orderkey) but NO OTHER
    supplier was also late (NOT EXISTS → left-anti join on l_orderkey with
    the non-equi lateness residual correlated through o_orderdate). This
    pins Catalyst's EXISTS/NOT-EXISTS rewrite where it bites at scale: all
    three lineitem legs shuffle on the SAME key (l_orderkey), so the
    semi/anti stack reuses one exchange instead of re-partitioning per
    subquery; nation/supplier broadcast. Rank over (numwait DESC, s_name)
    makes the top-25 order hash-visible. Ties in numwait are broken by the
    unique s_name, so the cutoff is deterministic."""
    for t in ("supplier", "lineitem", "orders", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    out = spark.sql(_Q21_SQL)
    from ..operators.sorting import ranked_small

    return ranked_small(out, ["numwait", "s_name"], ascending=[False, True]).select(
        "rnk", "s_name", "n_name", "numwait"
    )


# ---------------------------------------------------------------------------
# 28. TPC-H Q22 shape: global-threshold anti-join report ("dormant
#     big-balance customers") — an UNCORRELATED scalar-aggregate threshold
#     (average positive balance, multiplied through for decimal exactness)
#     plus a NOT EXISTS anti-join against the fact side. Complements
#     Q17/Q21: Q17 pins CORRELATED scalar decorrelation, this pins the
#     uncorrelated form (one-row subquery results injected as scalars,
#     computed once — never per-row) over the same anti-join machinery.
#     ("never ordered" is vacuous in this corpus — every customer has ~10
#     orders — so the dormancy predicate is "no FINISHED order".)
# ---------------------------------------------------------------------------

_Q22_SQL = """
SELECT n.n_name,
       count(*) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(27,8))) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE CAST(c.c_acctbal AS DECIMAL(18,4))
        * (SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0.0)
      > (SELECT sum(CAST(c3.c_acctbal AS DECIMAL(18,4))) FROM customer c3 WHERE c3.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
GROUP BY n.n_name
"""


@query("rel_sql_q22_dormant_balance", sql=_Q22_SQL)
def rel_sql_q22_dormant_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape through spark.sql, identical text on both engines:
    per-nation count and balance of above-average-balance customers with
    no finished order. The two uncorrelated subqueries execute ONCE each
    (Spark plans them as scalar-subquery literals — a one-row broadcast,
    not a per-row probe; plan-gated), the threshold compare is the
    multiplied-through decimal form (`bal * n > sum` — no double-avg
    boundary coin flip), and the NOT EXISTS plans as a LeftAnti join on
    o_custkey with the status filter pushed into the orders scan. At
    scale: orders shuffles once on custkey for the anti join; nation
    broadcasts; the scalar thresholds are O(1) rows shipped."""
    for t in ("customer", "nation", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q22_SQL)


# ---------------------------------------------------------------------------
# 29. Data-quality audit: the validation pass over the whole lake —
#     PK uniqueness, FK referential integrity, null rates, domain checks,
#     one (check_name, bad) row each. At 100 TB each check keeps its own
#     optimal plan (broadcast anti joins for dim FKs, keyed exchange for
#     the fact-fact orderkey check, partial-agg counts for the rest).
# ---------------------------------------------------------------------------

_AUDIT_ORACLE = """
SELECT 'pk_unique_orders' AS check_name, CAST((SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1) t) AS BIGINT) AS bad
UNION ALL
SELECT 'pk_unique_customer', CAST((SELECT count(*) FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1) t) AS BIGINT)
UNION ALL
SELECT 'pk_unique_lineitem', CAST((SELECT count(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1) t) AS BIGINT)
UNION ALL
SELECT 'fk_lineitem_orders', CAST((SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
UNION ALL
SELECT 'fk_lineitem_part', CAST((SELECT count(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
UNION ALL
SELECT 'fk_lineitem_supplier', CAST((SELECT count(*) FROM lineitem l WHERE l.l_suppkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
UNION ALL
SELECT 'fk_orders_customer', CAST((SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'fk_customer_nation', CAST((SELECT count(*) FROM customer c WHERE c.c_nationkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
UNION ALL
SELECT 'fk_nation_region', CAST((SELECT count(*) FROM nation n WHERE n.n_regionkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)) AS BIGINT)
UNION ALL
SELECT 'null_documents_text', CAST((SELECT count(*) FROM documents WHERE text IS NULL) AS BIGINT)
UNION ALL
SELECT 'domain_lineitem_discount', CAST((SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
UNION ALL
SELECT 'domain_lineitem_quantity', CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT)
UNION ALL
SELECT 'domain_supplier_negative_acctbal', CAST((SELECT count(*) FROM supplier WHERE s_acctbal < 0) AS BIGINT)
UNION ALL
SELECT 'domain_customer_negative_acctbal', CAST((SELECT count(*) FROM customer WHERE c_acctbal < 0) AS BIGINT)
"""


@query("pipeline_data_quality_audit", sql=_AUDIT_ORACLE)
def pipeline_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake-wide data-quality audit (operators/quality.py): PK uniqueness
    (grouped HAVING counts), FK referential integrity (left-anti joins —
    dims broadcast, the lineitem→orders fact check shuffles on orderkey),
    null rates and domain-violation counts (scan-evaluable predicates).
    Emits one exact (check_name, bad) row per check; the two
    negative-balance domain checks are nonzero on this corpus, pinning
    that the audit actually counts rather than short-circuiting. The
    oracle runs the identical checks as plain SQL."""
    from ..operators import quality as Q
    from ..sources.tables import load_table as lt

    li = lt(spark, sf_dir, "lineitem")
    orders = lt(spark, sf_dir, "orders")
    customer = lt(spark, sf_dir, "customer")
    part = lt(spark, sf_dir, "part")
    supplier = lt(spark, sf_dir, "supplier")
    nation = lt(spark, sf_dir, "nation")
    region = lt(spark, sf_dir, "region")
    documents = lt(spark, sf_dir, "documents")
    checks = [
        Q.uniqueness_check(orders, "o_orderkey", "pk_unique_orders"),
        Q.uniqueness_check(customer, "c_custkey", "pk_unique_customer"),
        Q.uniqueness_check(li, ["l_orderkey", "l_linenumber"], "pk_unique_lineitem"),
        Q.fk_orphan_check(li, "l_orderkey", orders, "o_orderkey", "fk_lineitem_orders"),
        Q.fk_orphan_check(li, "l_partkey", part, "p_partkey", "fk_lineitem_part"),
        Q.fk_orphan_check(li, "l_suppkey", supplier, "s_suppkey", "fk_lineitem_supplier"),
        Q.fk_orphan_check(orders, "o_custkey", customer, "c_custkey", "fk_orders_customer"),
        Q.fk_orphan_check(customer, "c_nationkey", nation, "n_nationkey", "fk_customer_nation"),
        Q.fk_orphan_check(nation, "n_regionkey", region, "r_regionkey", "fk_nation_region"),
        Q.null_check(documents, "text", "null_documents_text"),
        Q.domain_check(
            li, (F.col("l_discount") < 0) | (F.col("l_discount") > 1), "domain_lineitem_discount"
        ),
        Q.domain_check(li, F.col("l_quantity") <= 0, "domain_lineitem_quantity"),
        Q.domain_check(supplier, F.col("s_acctbal") < 0, "domain_supplier_negative_acctbal"),
        Q.domain_check(customer, F.col("c_acctbal") < 0, "domain_customer_negative_acctbal"),
    ]
    return Q.audit(checks).select(F.col("check_name"), F.col("bad"))


# ---------------------------------------------------------------------------
# 30. Window VALUE functions (lag/lead/first/last/nth) — the navigation
#     family; the rank family is rel_window_rank_functions, frames are
#     rel_window_range_frame / rel_window_running_totals. last/nth use an
#     explicit full frame (the default frame stops at CURRENT ROW, which
#     would make last_value a self-copy). (o_orderdate, o_orderkey) is a
#     unique order so every navigated value is deterministic.
# ---------------------------------------------------------------------------

_WINVAL_SQL = """
SELECT o_custkey, o_orderkey,
       lag(o_totalprice)  OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
       nth_value(o_orderkey, 2)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("rel_window_value_functions", sql=_WINVAL_SQL)
def rel_window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation functions through spark.sql, identical text on
    both engines: per-customer order timeline with previous/next price
    (lag/lead — frame-exempt), first/last/second order id (explicit
    unbounded frame where the default CURRENT-ROW bound would lie).
    Values are copied, never recomputed, so doubles stay bit-exact. At
    scale: ONE shuffle on o_custkey serves all five functions (same
    window spec → one Window node), and the o_custkey filter pushes to
    the scan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_WINVAL_SQL)


# ---------------------------------------------------------------------------
# 31. SCD2 point-in-time (AS OF) read — the consumer of pipeline_scd2_merge:
#     reconstruct the dimension exactly as it stood at the merge instant,
#     pinning the half-open [from, to) boundary semantics (a version closed
#     AT ts is invisible; its successor and same-instant inserts are
#     visible).
# ---------------------------------------------------------------------------

_SCD2_ASOF_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, valid_from_us
FROM ({_SCD2_ORACLE}) m
WHERE valid_from_us <= {_SCD_TS}
  AND (valid_to_us IS NULL OR valid_to_us > {_SCD_TS})
"""


@query("pipeline_scd2_asof", sql=_SCD2_ASOF_ORACLE)
def pipeline_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS OF read of the merged SCD2 customer dimension at exactly the
    change-batch timestamp: versions closed at that instant are gone,
    their successors and the same-instant inserts are present — one row
    per live key. Runs the full merge then the pure filter
    (operators/scd.py scd2_asof); at scale the filter is two prunable
    scan predicates over the dimension's validity columns, no shuffle.
    The oracle applies the identical filter over the identical merged
    relation."""
    from ..operators.scd import scd2_asof

    merged = pipeline_scd2_merge(spark, sf_dir)
    return scd2_asof(merged, _SCD_TS).select(
        "c_custkey", "c_name", "c_acctbal", "valid_from_us"
    )


# ---------------------------------------------------------------------------
# 32. Equal-frequency binning (decile buckets) — the SCALE-SAFE form:
#     a global ntile(10) would funnel the whole table through ONE reducer
#     (single-partition window); instead the nine decile thresholds are
#     one aggregate row, broadcast, and binning is a per-row CASE chain —
#     one agg pass + one map pass, no global sort anywhere. Thresholds
#     use the rel_percentiles device (interpolated percentile rounded to
#     6dp — identical in both engines), and per-bin stats are decimal-
#     staged.
# ---------------------------------------------------------------------------

_BIN_PS = tuple(i / 10 for i in range(1, 10))


def _bin_case_sql() -> str:
    return " + ".join(
        f"(CASE WHEN v > t[{i + 1}] THEN 1 ELSE 0 END)" for i in range(len(_BIN_PS))
    )


_EQUIFREQ_ORACLE = f"""
WITH th AS (
  SELECT [{", ".join(f"round(quantile_cont(o_totalprice, {p}), 6)" for p in _BIN_PS)}] AS t
  FROM orders
),
b AS (
  SELECT o.o_totalprice AS v, 1 + {_bin_case_sql()} AS bin
  FROM orders o, th
)
SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_rows,
       min(v) AS lo, max(v) AS hi,
       CAST(sum(CAST(v AS DECIMAL(27,8))) AS DOUBLE) AS total
FROM b GROUP BY bin
"""


@query("rel_equifreq_binning", sql=_EQUIFREQ_ORACLE)
def rel_equifreq_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile (equal-frequency) binning of order totals with per-bin
    count/min/max/total. The thresholds are ONE aggregate row (exact
    interpolated percentiles, rounded to 6dp so both engines agree to the
    bit), broadcast-cross-joined back; each row's bin is a 9-comparison
    CASE chain against the threshold array. At 100 TB: one percentile
    aggregate pass + one map-side binning pass + a 10-group rollup — the
    global-sort-free form of ntile(10), which would otherwise serialize
    the table through a single window reducer."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    th = orders.agg(
        F.array(
            *[
                F.round(F.expr(f"percentile(o_totalprice, {p})"), 6)
                for p in _BIN_PS
            ]
        ).alias("t")
    )
    b = orders.crossJoin(F.broadcast(th)).select(
        F.col("o_totalprice").alias("v"),
        (
            F.lit(1)
            + sum(
                F.when(F.col("o_totalprice") > F.col("t")[i], 1).otherwise(0)
                for i in range(len(_BIN_PS))
            )
        ).alias("bin"),
    )
    return b.groupBy(F.col("bin").cast("bigint").alias("bin")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        _dsum(F.col("v")).alias("total"),
    )


# ---------------------------------------------------------------------------
# 32. Group-wise OLS regression (r08) from the same decimal-exact power sums
#     as rel_moment_stats: native regr_slope/regr_intercept/regr_r2 fold
#     doubles in partition order (engine- and order-dependent low bits);
#     exact Σ moments + one shared IEEE combination are portable.
# ---------------------------------------------------------------------------

_REGR_ORACLE = """
WITH m AS (
  SELECT l_returnflag, l_linestatus,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, n,
       round((sxy - sx*sy/n) / (sxx - sx*sx/n), 9) AS slope,
       round(sy/n - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * (sx/n), 6) AS intercept,
       round(((sxy - sx*sy/n) * (sxy - sx*sy/n)) / ((sxx - sx*sx/n) * (syy - sy*sy/n)), 9) AS r2
FROM m
"""


@query("rel_groupwise_regression", sql=_REGR_ORACLE)
def rel_groupwise_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(returnflag, linestatus) least-squares fit of extendedprice on
    quantity — slope/intercept/r² derived from decimal-exact power sums
    (the portable form of SQL:2016 regr_slope/regr_intercept/regr_r2; see
    rel_moment_stats for why the native fold isn't hash-stable). One
    partial-agg shuffle; the fit math is per-group constant work."""
    li = load_table(spark, sf_dir, "lineitem")
    d194 = "decimal(19,4)"
    m = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(38,8)")).cast("double").alias("sx"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,8)")).cast("double").alias("sy"),
        F.sum(F.col("l_quantity").cast(d194) * F.col("l_extendedprice").cast(d194))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("l_quantity").cast(d194) * F.col("l_quantity").cast(d194))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("l_extendedprice").cast(d194) * F.col("l_extendedprice").cast(d194))
        .cast("double")
        .alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    return m.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round(sy / n - slope * (sx / n), 6).alias("intercept"),
        F.round(
            ((sxy - sx * sy / n) * (sxy - sx * sy / n))
            / ((sxx - sx * sx / n) * (syy - sy * sy / n)),
            9,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# 33. Functional-dependency profiling (r08): does det -> dep hold? The data-
#     profiling primitive behind candidate-key discovery and denormalization
#     audits, asked over orders as one stacked two-level aggregate.
# ---------------------------------------------------------------------------

_FD_PAIRS = [
    ("o_orderkey", "o_custkey"),  # PK -> anything: must hold
    ("o_custkey", "o_orderpriority"),  # expected violated
    ("o_orderdate", "o_orderstatus"),  # expected violated
]

_FD_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{det}->{dep}' AS fd,
       count(*) AS n_groups,
       count(*) FILTER (WHERE n_dep > 1) AS n_violating,
       count(*) FILTER (WHERE n_dep > 1) = 0 AS holds
FROM (
  SELECT CAST({det} AS VARCHAR) AS det_val,
         count(DISTINCT CAST({dep} AS VARCHAR)) AS n_dep
  FROM orders GROUP BY 1
)"""
    for det, dep in _FD_PAIRS
)


@query("pipeline_fd_profile", sql=_FD_ORACLE)
def pipeline_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency check over orders for three candidate
    dependencies (the PK one must hold, the two attribute ones must not):
    one stack pass + two partial-agg shuffles, values never leave the
    executors — only group/violation counts come back."""
    from ..operators import quality as _Q

    return _Q.fd_violations(load_table(spark, sf_dir, "orders"), _FD_PAIRS)


# ---------------------------------------------------------------------------
# 34. Benford first-digit audit (r08): the classic fabricated-numbers test.
#     Expected probabilities are hard-coded double literals (log10(1+1/d))
#     so neither engine's libm is in the hash path; chi-square terms derive
#     from exact integer counts.
# ---------------------------------------------------------------------------

_BENFORD_P = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

_BENFORD_CASE_SQL = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items())
    + " END"
)

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
),
counted AS (
  SELECT digit, count(*) AS n_obs,
         (SELECT count(*) FROM digits) AS n_total
  FROM digits GROUP BY 1
)
SELECT digit, n_obs,
       {_BENFORD_CASE_SQL} AS expected_p,
       round(
         (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * ({_BENFORD_CASE_SQL}))
         * (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * ({_BENFORD_CASE_SQL}))
         / (CAST(n_total AS DOUBLE) * ({_BENFORD_CASE_SQL})), 9) AS chi2_term
FROM counted
"""


@query("rel_benford_digits", sql=_BENFORD_ORACLE)
def rel_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice vs Benford's
    law, with per-digit chi-square terms — the forensic-accounting data
    audit. One partial-agg shuffle plus a broadcast 1-row total; all
    randomness-free math happens on exact integer counts."""
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    counted = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    total = digits.agg(F.count(F.lit(1)).alias("n_total"))
    expected = F.create_map(
        *[x for d, p in _BENFORD_P.items() for x in (F.lit(d), F.lit(float(p)))]
    )[F.col("digit")]
    joined = counted.crossJoin(F.broadcast(total))
    n_obs_d = F.col("n_obs").cast("double")
    n_tot_d = F.col("n_total").cast("double")
    return joined.select(
        "digit",
        "n_obs",
        expected.alias("expected_p"),
        F.round(
            (n_obs_d - n_tot_d * expected)
            * (n_obs_d - n_tot_d * expected)
            / (n_tot_d * expected),
            9,
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# 35. Chi-square independence test (r08): is order status independent of
#     priority? Per-cell expected counts and chi-square terms from exact
#     integer marginals — the categorical counterpart of rel_benford_digits.
# ---------------------------------------------------------------------------

_CHISQ_ORACLE = """
WITH cells AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority, count(*) AS n_obs
  FROM orders GROUP BY 1, 2
),
margins AS (
  SELECT status, priority, n_obs,
         sum(n_obs) OVER (PARTITION BY status) AS n_row,
         sum(n_obs) OVER (PARTITION BY priority) AS n_col,
         sum(n_obs) OVER () AS n_total
  FROM cells
)
SELECT status, priority, n_obs,
       round(CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE) / CAST(n_total AS DOUBLE), 9) AS expected,
       round(
         (CAST(n_obs AS DOUBLE) - CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE) / CAST(n_total AS DOUBLE))
         * (CAST(n_obs AS DOUBLE) - CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE) / CAST(n_total AS DOUBLE))
         / (CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE) / CAST(n_total AS DOUBLE)), 9) AS chi2_term
FROM margins
"""


@query("rel_chisq_independence", sql=_CHISQ_ORACLE)
def rel_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square contingency terms for (orderstatus ×
    orderpriority): one partial-agg shuffle reduces the fact table to the
    |statuses| × |priorities| cell relation, then marginals come from
    windows over that TINY post-agg relation (never over facts). All
    randomness-free math on exact integer counts."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    from pyspark.sql import Window

    n_row = F.sum("n_obs").over(Window.partitionBy("status")).cast("double")
    n_col = F.sum("n_obs").over(Window.partitionBy("priority")).cast("double")
    n_tot = F.sum("n_obs").over(
        Window.partitionBy()
    ).cast("double")
    expected = n_row * n_col / n_tot
    dev = F.col("n_obs").cast("double") - expected
    return cells.select(
        "status",
        "priority",
        "n_obs",
        F.round(expected, 9).alias("expected"),
        F.round(dev * dev / expected, 9).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# 36. Gini concentration of customer revenue per market segment (r08):
#     exact rank statistic over integer cents, decimal-exact sums, the
#     identical IEEE combination both engines.
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH rev AS (
  SELECT c.c_mktsegment AS segment, c.c_custkey,
         coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT segment, cents,
         row_number() OVER (PARTITION BY segment ORDER BY cents, c_custkey) AS i
  FROM rev
),
agg AS (
  SELECT segment,
         count(*) AS n,
         sum(CAST(cents AS DECIMAL(38,0))) AS sx,
         sum(CAST(i * cents AS DECIMAL(38,0))) AS six
  FROM ranked GROUP BY 1
)
SELECT segment, n,
       CAST(sx AS DOUBLE) / 100.0 / n AS mean_revenue,
       round((2.0 * CAST(six AS DOUBLE) - (n + 1.0) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS gini
FROM agg
"""


@query("rel_gini_revenue", sql=_GINI_ORACLE)
def rel_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of lifetime customer revenue within each market
    segment — the inequality statistic from the rank formula
    G = (2·Σi·xᵢ − (n+1)·Σxᵢ)/(n·Σxᵢ) over cents-exact revenues.
    Customers without orders count as zero-revenue (a Gini that drops them
    understates concentration). One agg reduces orders to per-customer
    cents, the customer dim broadcasts, and the per-segment rank runs over
    the CUSTOMER-sized relation (facts never enter a window). Ties are
    rank-permutation-invariant in the formula, so the custkey tiebreak is
    for determinism only. At cluster scale the per-segment window bounds
    work to the largest segment — the inherent cost of an exact rank
    statistic; sketch quantiles are the approximate alternative."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("__cents")
    )
    rev = (
        F.broadcast(customer.select("c_custkey", F.col("c_mktsegment").alias("segment")))
        .join(per_cust, customer["c_custkey"] == per_cust["o_custkey"], "left")
        .select(
            "segment",
            "c_custkey",
            F.coalesce("__cents", F.lit(0)).alias("cents"),
        )
    )
    w = Window.partitionBy("segment").orderBy("cents", "c_custkey")
    ranked = rev.withColumn("i", F.row_number().over(w).cast("bigint"))
    agg = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("i") * F.col("cents")).cast("decimal(38,0)")).alias("six"),
    )
    n, sx, six = F.col("n"), F.col("sx").cast("double"), F.col("six").cast("double")
    return agg.select(
        "segment",
        "n",
        (sx / F.lit(100.0) / n).alias("mean_revenue"),
        F.round(
            (F.lit(2.0) * six - (n + F.lit(1.0)) * sx) / (n.cast("double") * sx), 9
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# 37. Co-purchase item similarity (r08): the recommender co-occurrence
#     primitive over customer baskets, with the DIMSUM-style hot-basket cap.
# ---------------------------------------------------------------------------

_COPURCHASE_ORACLE = """
WITH basket0 AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
capped AS (
  SELECT cust, part FROM (
    SELECT cust, part, count(*) OVER (PARTITION BY cust) AS bk FROM basket0
  ) WHERE bk <= 256
),
sizes AS (SELECT part, count(*) AS n_i FROM capped GROUP BY 1),
co AS (
  SELECT a.part AS part_a, b.part AS part_b, count(*) AS n_ab
  FROM capped a JOIN capped b ON a.cust = b.cust AND a.part < b.part
  GROUP BY 1, 2
  HAVING count(*) >= 5
)
SELECT co.part_a, co.part_b, co.n_ab, sa.n_i AS n_a, sb.n_i AS n_b,
       round(CAST(co.n_ab AS DOUBLE) / sqrt(CAST(sa.n_i * sb.n_i AS DOUBLE)), 9) AS cosine
FROM co
JOIN sizes sa ON sa.part = co.part_a
JOIN sizes sb ON sb.part = co.part_b
"""


@query("rel_copurchase_similarity", sql=_COPURCHASE_ORACLE)
def rel_copurchase_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine similarity over distinct customer baskets (orders ⋈
    lineitem), min support 5, hot baskets above 256 items dropped BEFORE
    the pair join (mirrored in the oracle). sqrt is IEEE-correctly-rounded
    so the cosine is engine-portable without a decimal detour."""
    from ..operators import behavior as _B

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r14 (guide §2.4): the explicit isNotNull on o_custkey is a PLAN
    # alignment, not a filter — o_custkey is NOT NULL by the TPC-H spec,
    # so zero rows change and the oracle needs no mirror. Without it the
    # pair-join legs (which use cust as a join key) push
    # IsNotNull(o_custkey) into THEIR orders scan while the item-sizes
    # leg does not, the mismatched PushedFilters make the basket subtrees
    # non-canonical, and AQE evaluates the whole scan→join→distinct→window
    # chain twice (final plan: 4 fact scans, 2 reused exchanges). Stated
    # once up front, every leg shares one canonical chain (2 scans, 3
    # reused exchanges, one fewer Exchange); interleaved A/B medians
    # 5.45→5.08 s. A localCheckpoint pin on `capped` was ALSO measured
    # here and is ~25% SLOWER either eager or lazy (4.49 none vs
    # 5.91/5.80 — the r12 association_rules negative reproduced): the
    # cache round-trip costs more than the duplicate it removes.
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .where(F.col("o_custkey").isNotNull())
    )
    baskets = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    return _B.copurchase_similarity(
        baskets, entity_col="cust", item_col="part", min_support=5, max_basket=256
    )


# ---------------------------------------------------------------------------
# 38. Winsorized / trimmed statistics (r08): the robust-mean pair every
#     metrics pipeline needs when a fat tail poisons the plain mean. Two
#     passes: exact p05/p95 per group (the rel_percentiles device), then the
#     thresholds broadcast back for clip-and-aggregate. Thresholds are
#     rounded to 6 decimals on BOTH sides so the clip comparisons use
#     identical constants in both engines.
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH th AS (
  SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.05), 6) AS p05,
         round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       count(*) AS n,
       any_value(th.p05) AS p05,
       any_value(th.p95) AS p95,
       count(*) FILTER (WHERE l.l_extendedprice < th.p05) AS n_clip_lo,
       count(*) FILTER (WHERE l.l_extendedprice > th.p95) AS n_clip_hi,
       round(CAST(sum(CAST(least(greatest(l.l_extendedprice, th.p05), th.p95)
                           AS DECIMAL(27,8))) AS DOUBLE) / count(*), 6) AS winsorized_mean,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(27,8)))
                    FILTER (WHERE l.l_extendedprice BETWEEN th.p05 AND th.p95) AS DOUBLE)
             / count(*) FILTER (WHERE l.l_extendedprice BETWEEN th.p05 AND th.p95),
             6) AS trimmed_mean
FROM lineitem l JOIN th ON l.l_returnflag = th.l_returnflag
GROUP BY 1
"""


@query("rel_winsorized_stats", sql=_WINSOR_ORACLE)
def rel_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clip-at-p05/p95) and trimmed (drop-outside) means of
    extendedprice per returnflag: pass 1 computes exact percentiles per
    group (a group-count-sized relation), pass 2 broadcasts the thresholds
    back and clips inside the scan — one fact shuffle total, decimal-exact
    sums. At 100 TB swap the exact percentile for percentile_approx and
    keep the identical clip pass."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    pct = F.expr("percentile(l_extendedprice, array(0.05D, 0.95D))")
    th = li.groupBy("l_returnflag").agg(
        F.round(pct[0], 6).alias("p05"), F.round(pct[1], 6).alias("p95")
    )
    j = li.join(F.broadcast(th), "l_returnflag")
    v = F.col("l_extendedprice")
    clipped = F.least(F.greatest(v, F.col("p05")), F.col("p95"))
    inside = v.between(F.col("p05"), F.col("p95"))
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.any_value(F.col("p05")).alias("p05"),
        F.any_value(F.col("p95")).alias("p95"),
        F.count_if(v < F.col("p05")).alias("n_clip_lo"),
        F.count_if(v > F.col("p95")).alias("n_clip_hi"),
        F.round(
            F.sum(clipped.cast("decimal(27,8)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("winsorized_mean"),
        F.round(
            F.sum(F.when(inside, v).cast("decimal(27,8)")).cast("double")
            / F.count_if(inside),
            6,
        ).alias("trimmed_mean"),
    )


# ---------------------------------------------------------------------------
# 39. k-anonymity / l-diversity privacy audit (r08): can this table be
#     released? The governance question as two partial-agg shuffles.
# ---------------------------------------------------------------------------

_KANON_ORACLE = """
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         count(*) AS n,
         count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l
  FROM customer GROUP BY 1, 2
)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       count(*) AS n_classes,
       CAST(min(n) AS BIGINT) AS k_anonymity,
       CAST(min(l) AS BIGINT) AS min_l_diversity,
       count(*) FILTER (WHERE n = 1) AS n_singleton_classes,
       count(*) FILTER (WHERE l = 1) AS n_low_diversity_classes
FROM classes
"""


@query("pipeline_k_anonymity", sql=_KANON_ORACLE)
def pipeline_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity of customer under quasi-identifiers (nation, market
    segment) with l-diversity of the coarse balance bucket as the
    sensitive attribute: the smallest equivalence class is the dataset's
    k; a class with one sensitive value leaks it at any k. Class counts
    only — rows never leave the executors."""
    from ..operators import quality as _Q

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_bucket"),
    )
    return _Q.k_anonymity(
        cust, quasi_cols=["c_nationkey", "c_mktsegment"], sensitive_col="bal_bucket"
    )


# ---------------------------------------------------------------------------
# 40. Period-over-period revenue (r08): the BI staple — monthly revenue with
#     month-over-month and year-over-year deltas from lag windows over the
#     MONTH-sized post-agg relation (≤ a few hundred rows at any corpus
#     size; the facts are reduced first, so the global window is free).
# ---------------------------------------------------------------------------

_YOY_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CAST(sum(CAST(o_totalprice AS DECIMAL(27,8))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT y, m, revenue,
       round(100.0 * (revenue - lag(revenue, 1) OVER w)
             / lag(revenue, 1) OVER w, 9) AS mom_pct,
       round(100.0 * (revenue - lag(revenue, 12) OVER w)
             / lag(revenue, 12) OVER w, 9) AS yoy_pct
FROM monthly
WINDOW w AS (ORDER BY y, m)
"""


@query("rel_yoy_revenue", sql=_YOY_ORACLE)
def rel_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with MoM and YoY percentage deltas: one partial-agg
    shuffle reduces orders to (year, month) rows, then lag(1)/lag(12)
    windows run over that tiny relation (first periods stay NULL).
    Decimal-exact revenue; identical ratio expression both engines."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,8)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("y", "m")
    prev1 = F.lag("revenue", 1).over(w)
    prev12 = F.lag("revenue", 12).over(w)
    return monthly.select(
        "y",
        "m",
        "revenue",
        F.round(F.lit(100.0) * (F.col("revenue") - prev1) / prev1, 9).alias("mom_pct"),
        F.round(F.lit(100.0) * (F.col("revenue") - prev12) / prev12, 9).alias("yoy_pct"),
    )


# ---------------------------------------------------------------------------
# 41. RFM customer segmentation (r08): recency / frequency / monetary
#     quintile scores + a rule-based segment label.
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         max(epoch_us(o_orderdate)) AS last_us,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DECIMAL(38,0)) AS monetary_cents
  FROM orders GROUP BY 1
),
scored AS (
  SELECT custkey,
         CAST(((SELECT max(epoch_us(o_orderdate)) FROM orders) - last_us)
              // 86400000000 AS BIGINT) AS recency_days,
         frequency,
         CAST(monetary_cents AS BIGINT) AS monetary_cents,
         ntile(5) OVER (ORDER BY last_us, custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency, custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary_cents, custkey) AS m_score
  FROM per_cust
)
SELECT custkey, recency_days, frequency, monetary_cents,
       r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
            ELSE 'regular' END AS segment
FROM scored
"""


@query("rel_rfm_segmentation", sql=_RFM_ORACLE)
def rel_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, days since last order (relative to
    the corpus max date — a broadcast scalar), order count, and cents-exact
    spend; quintile scores via ntile with custkey tiebreaks (deterministic
    in both engines) and a rule-based segment label. The ntile windows run
    over the CUSTOMER-sized relation; at 10^8-customer scale swap ntile for
    percentile thresholds + a broadcast join (the rel_winsorized_stats
    device) — the exact ntile form is the checked query."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias("last_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("decimal(38,0)")
        .alias("monetary_cents"),
    )
    max_us = orders.agg(F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias("__mx"))
    scored = (
        per_cust.crossJoin(F.broadcast(max_us))
        .select(
            "custkey",
            ((F.col("__mx") - F.col("last_us")) / F.lit(86400000000)).cast("bigint").alias(
                "recency_days"
            ),
            "frequency",
            F.col("monetary_cents").cast("bigint").alias("monetary_cents"),
            F.ntile(5).over(Window.orderBy("last_us", "custkey")).alias("r_score"),
            F.ntile(5).over(Window.orderBy("frequency", "custkey")).alias("f_score"),
            F.ntile(5)
            .over(Window.orderBy("monetary_cents", "custkey"))
            .alias("m_score"),
        )
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            F.lit("champion"),
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), F.lit("at_risk"))
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), F.lit("hibernating"))
        .otherwise(F.lit("regular"))
    )
    return scored.withColumn("segment", seg)


# ---------------------------------------------------------------------------
# 41. Association rules (market-basket): support / confidence / lift over
#     the same capped customer baskets as rel_copurchase_similarity — the
#     directional complement (cosine is symmetric; confidence and lift are
#     not: "A→B strong, B→A weak" is exactly what a recommender needs).
#     All three metrics are single IEEE expressions over exact bigint
#     counts, identical operand order both engines, rounded to 9.
# ---------------------------------------------------------------------------

_ASSOC_ORACLE = """
WITH basket0 AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
capped AS (
  SELECT cust, part FROM (
    SELECT cust, part, count(*) OVER (PARTITION BY cust) AS bk FROM basket0
  ) WHERE bk <= 256
),
nc AS (SELECT count(DISTINCT cust) AS n_c FROM capped),
sizes AS (SELECT part, count(*) AS n_i FROM capped GROUP BY part),
co_canon AS (
  SELECT a.part AS pa, b.part AS pb, count(*) AS n_ab
  FROM capped a JOIN capped b ON a.cust = b.cust AND a.part < b.part
  GROUP BY 1, 2
  HAVING count(*) >= 5
),
co AS (
  SELECT pa AS ante, pb AS cons, n_ab FROM co_canon
  UNION ALL
  SELECT pb AS ante, pa AS cons, n_ab FROM co_canon
)
SELECT co.ante, co.cons, co.n_ab,
       CAST(sa.n_i AS BIGINT) AS n_ante, CAST(sb.n_i AS BIGINT) AS n_cons,
       round(CAST(co.n_ab AS DOUBLE) / nc.n_c, 9) AS support,
       round(CAST(co.n_ab AS DOUBLE) / sa.n_i, 9) AS confidence,
       round(CAST(co.n_ab AS DOUBLE) * nc.n_c
             / (CAST(sa.n_i AS DOUBLE) * sb.n_i), 9) AS lift
FROM co
JOIN sizes sa ON sa.part = co.ante
JOIN sizes sb ON sb.part = co.cons
CROSS JOIN nc
"""


@query("rel_association_rules", sql=_ASSOC_ORACLE)
def rel_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules over capped customer baskets: for
    every ordered part pair bought together by ≥5 customers, support
    (joint frequency), confidence (P(cons|ante)) and lift (observed /
    expected-under-independence). Same DIMSUM basket cap (256) as the
    cosine query, mirrored in the oracle; the ONE driver-side scalar
    (distinct-customer count) rides a broadcast 1-row cross join — at
    corpus scale nothing but the entity-keyed pair join touches fact rows.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r14 examined: unlike rel_copurchase_similarity, this query's basket
    # chain is ALREADY evaluated once at runtime (final plan: 2 fact scans
    # before and after an isNotNull alignment experiment — the
    # countDistinct leg's constraints line up here), so the copurchase
    # scan-alignment fix is deliberately NOT applied.
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    baskets = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    w = Window.partitionBy("cust")
    # NOT checkpointed: every reference (scalar count, item sizes, both
    # pair-join legs) hash-partitions by cust, so Catalyst/AQE reuses the
    # one exchange; an eager checkpoint here measured 2× SLOWER (it breaks
    # the exchange reuse and the codegen pipeline into the pair join)
    capped = (
        baskets.withColumn("__bk", F.count(F.lit(1)).over(w))
        .where(F.col("__bk") <= 256)
        .drop("__bk")
    )
    nc = capped.agg(F.countDistinct("cust").alias("n_c"))
    sizes = capped.groupBy("part").agg(F.count(F.lit(1)).alias("n_i"))
    a = capped.select(F.col("cust").alias("__e"), F.col("part").alias("pa"))
    b = capped.select(F.col("cust").alias("__e"), F.col("part").alias("pb"))
    # count each unordered pair ONCE (a < b halves the pair join — the
    # whole cost of this query) and mirror the ~support-filtered aggregate
    # instead: the union runs over pair-count rows, not fact-pair rows
    co_canon = (
        a.join(b, "__e")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 5)
        # pinned: the mirror union references this twice, and unlike the
        # fact-sized `capped` relation (see above) this is ~1k aggregated
        # rows — a free checkpoint that guarantees the pair join runs once
        .localCheckpoint(eager=True)
    )
    co = co_canon.select(
        F.col("pa").alias("ante"), F.col("pb").alias("cons"), "n_ab"
    ).unionByName(
        co_canon.select(F.col("pb").alias("ante"), F.col("pa").alias("cons"), "n_ab")
    )
    sa = sizes.select(F.col("part").alias("ante"), F.col("n_i").alias("n_ante"))
    sb = sizes.select(F.col("part").alias("cons"), F.col("n_i").alias("n_cons"))
    return (
        co.join(sa, "ante")
        .join(sb, "cons")
        .crossJoin(F.broadcast(nc))
        .select(
            "ante",
            "cons",
            "n_ab",
            F.col("n_ante").cast("bigint").alias("n_ante"),
            F.col("n_cons").cast("bigint").alias("n_cons"),
            F.round(F.col("n_ab").cast("double") / F.col("n_c"), 9).alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("n_ante"), 9).alias(
                "confidence"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_c")
                / (F.col("n_ante").cast("double") * F.col("n_cons")),
                9,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# 42. Pareto / ABC classification: rank parts by revenue, classify by
#     cumulative share (A ≤ 70%, B ≤ 90%, C = rest) — the inventory-
#     management classic ("which 20% of parts make 80% of revenue").
#     Revenue is cents-exact; the cumulative share is a ratio of exact
#     bigints computed AFTER the ordered window, so the class boundaries
#     cannot flap between engines.
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH rev AS (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS DECIMAL(38,0))) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
ranked AS (
  SELECT partkey, cents,
         CAST(row_number() OVER (ORDER BY cents DESC, partkey) AS BIGINT) AS rnk,
         CAST(sum(cents) OVER (ORDER BY cents DESC, partkey
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
  FROM rev
)
SELECT r.partkey, r.cents, r.rnk,
       round(CAST(r.cum_cents AS DOUBLE) / t.total, 9) AS cum_share,
       CASE WHEN CAST(r.cum_cents AS DOUBLE) / t.total <= 0.70 THEN 'A'
            WHEN CAST(r.cum_cents AS DOUBLE) / t.total <= 0.90 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked r CROSS JOIN tot t
"""


@query("rel_pareto_abc", sql=_PARETO_ORACLE)
def rel_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC classification of parts by cents-exact revenue: global ordered
    rank + cumulative share + A/B/C class at 70/90% boundaries. The window
    runs over the PART-sized aggregate (facts reduce first — the global
    window is never fact-sized); the grand total rides one broadcast
    scalar. Class comparisons use the identical unrounded IEEE ratio on
    both engines; exact-integer cumulative sums make ties impossible to
    mis-order (rank tiebreak on partkey)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
            ).cast("decimal(38,0)")
        )
        .cast("bigint")
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("bigint").alias("total"))
    w = Window.orderBy(F.col("cents").desc(), F.col("partkey"))
    ranked = rev.select(
        "partkey",
        "cents",
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum_cents"),
    )
    share = F.col("cum_cents").cast("double") / F.col("total")
    return ranked.crossJoin(F.broadcast(tot)).select(
        "partkey",
        "cents",
        "rnk",
        F.round(share, 9).alias("cum_share"),
        F.when(share <= 0.70, F.lit("A"))
        .when(share <= 0.90, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
