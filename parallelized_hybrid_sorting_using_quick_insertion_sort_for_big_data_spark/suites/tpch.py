"""TPC-H completion suite: the 12 query shapes (Q2, Q4, Q6, Q7, Q8, Q9,
Q11, Q12, Q13, Q15, Q16, Q20) that — together with Q1/Q3/Q5/Q10/Q14/Q17/
Q18/Q19/Q21/Q22 in ``suites/relational.py`` — give the engine the full
22-query TPC-H SQL surface.

The reference implements none of this (SURVEY.md §2b: it is 809 lines of
C/CUDA sort code with no SQL layer at all); these queries are extension-layer
breadth that pins Catalyst behaviors the rest of the battery doesn't reach:
correlated MIN decorrelation (Q2), EXISTS with a non-equi date residual (Q4),
double-aliased dimension joins (Q7), ratio-of-conditional-aggregates over an
8-table snowflake (Q8), HAVING against an uncorrelated scalar aggregate
(Q11), left-join-then-reaggregate histograms (Q13), CTE reuse + scalar MAX
(Q15), null-aware NOT IN anti join (Q16), and IN over a grouped-HAVING
subquery (Q20).

Corpus adaptations (this synthetic schema has no l_shipmode /
l_commitdate / l_receiptdate — TESTDATA.md): "late" is shipdate >
orderdate + K days (same device as Q21), and Q12's ship-mode axis becomes
l_returnflag. Every adaptation keeps the original query's *plan shape* —
that is what these exist to pin.

The partsupp table (absent from the testdata) is DERIVED deterministically
from part x supplier by ``_PARTSUPP_CTE`` — TPC-H's own 4-suppliers-per-
part layout with arithmetic (seedless, engine-portable) availqty/
supplycost in dbgen's value ranges — so Q2/Q11/Q16/Q20 run as the TRUE
TPC-H queries over a real partsupp relation, not lineitem re-expressions
(VERDICT r06 #5). The CTE text is shared verbatim by the Spark query and
the DuckDB oracle, so the relation can never drift between engines; at
scale it is a broadcast-dim construction (part x 4 rows, one narrow
projection — no shuffle).

Float discipline matches suites/relational.py: every double aggregate runs
on DECIMAL(27,8) (order-independent) and is cast back to DOUBLE; per-row
double expressions are IEEE-identical across engines; ratios divide two
exact decimal sums in one double op. SQL text is IDENTICAL on both engines
(spark.sql over registered views == the DuckDB oracle string), so column
names/types can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..queries import query
from ..sources.tables import load_table


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# 4 partsupp rows per part, dbgen-style: supplier keys are 4 consecutive
# slots mod |supplier| (keys are 0-based in this corpus); availqty in
# 1..9999 and supplycost in 1.00..1000.00 come from small coprime
# multipliers instead of dbgen's RNG. supplycost's one double division is
# IEEE-identical across engines; aggregates over it stage through decimals
# per the suite discipline. Shared verbatim by spark.sql and the DuckDB
# oracle strings (see module docstring).
_PARTSUPP_CTE = """partsupp AS (
  SELECT p.p_partkey AS ps_partkey,
         CAST((p.p_partkey * 4 + i.i) % (SELECT count(*) FROM supplier) AS BIGINT) AS ps_suppkey,
         CAST((p.p_partkey * 7 + i.i * 13) % 9999 + 1 AS BIGINT) AS ps_availqty,
         CAST((p.p_partkey * 31 + i.i * 17) % 99900 + 100 AS DOUBLE) / 100.0 AS ps_supplycost
  FROM part p
  CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) i
)"""


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier — the TRUE TPC-H query over the derived
# partsupp relation: region-restricted correlated MIN subquery,
# decorrelated by Catalyst into a per-partkey MIN aggregate joined back on
# the correlation key, with the deterministic ORDER BY ... LIMIT 100 top.
# ---------------------------------------------------------------------------

_Q2_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name, ps.ps_supplycost
FROM part p
JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE p.p_size <= 15 AND p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
  AND ps.ps_supplycost = (
    SELECT min(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


@query("rel_sql_q2_min_cost_supplier", sql=_Q2_SQL)
def rel_sql_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) through spark.sql, identical text
    on both engines, over the derived partsupp relation — the true query:
    for small PROMO parts, the EUROPE supplier(s) whose cost equals the
    part's EUROPE-wide minimum, top-100 by account balance. Catalyst
    decorrelates the region-filtered scalar MIN into a per-partkey
    aggregate joined back on the correlation key — the same
    per-key-extremum-then-join shape as Q17 but with MIN (exact on
    doubles, no summation-order concern). The ORDER BY is a total order
    of the output (p_partkey breaks every tie), so LIMIT 100 is
    deterministic cross-engine. At scale: partsupp is a generated
    broadcast-dim construction (part x 4 — no shuffle to build); both the
    cost list and the per-partkey floor shuffle once on partkey with AQE
    exchange reuse; the size/type filter pushes to the part scan;
    supplier/nation/region broadcast; the top-100 is a
    TakeOrderedAndProject, never a global sort."""
    _views(spark, sf_dir, "part", "supplier", "nation", "region")
    return spark.sql(_Q2_SQL)


# ---------------------------------------------------------------------------
# Q4 shape: order-priority checking — EXISTS with a correlated non-equi
# date residual (the Q21 lateness device on the semi-join side).
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
GROUP BY o.o_orderpriority
"""


@query("rel_sql_q4_priority_check", sql=_Q4_SQL)
def rel_sql_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking) through spark.sql, identical
    text on both engines: per-priority count of one quarter's orders that
    had at least one late lineitem ("late" = shipped >45 days after the
    order date — this corpus has no commit/receipt dates, same adaptation
    as Q21). The EXISTS plans as a LEFT SEMI join on l_orderkey whose
    correlated date comparison rides the join as a non-equi residual —
    exactly one probe per order, never a per-row subquery. At scale: the
    quarter filter pushes to the orders scan and shrinks the probe side
    ~100x before the shuffle; lineitem shuffles once on l_orderkey (only
    orderkey+shipdate survive pruning); the final priority rollup is a
    5-group map-side partial aggregate."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4_SQL)


# ---------------------------------------------------------------------------
# Q6 shape: forecasting-revenue-change — the pure scan-side query: every
# predicate pushes to parquet, the whole plan is scan → filter → one
# partial-aggregated exchange of a single decimal row.
# ---------------------------------------------------------------------------

_Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(27,8))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


@query("rel_sql_q6_forecast_revenue", sql=_Q6_SQL)
def rel_sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change) through spark.sql, identical
    text on both engines: one year's discounted-revenue total under range
    predicates on date, discount, and quantity. This is the canonical
    scan-bound query: all three predicates push to the parquet scan
    (min/max row-group pruning does most of the work at real scale), the
    scan reads exactly 4 of lineitem's columns, and the aggregate is a
    single-row decimal partial per partition — the smallest possible
    shuffle. The per-row product stays an IEEE double before the decimal
    staging, so both engines see bit-identical addends."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_Q6_SQL)


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations — the SAME dimension table
# joined twice under different aliases (supplier's nation and customer's
# nation) with a symmetric two-disjunct pair filter.
# ---------------------------------------------------------------------------

_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume_dec) AS DOUBLE) AS revenue, count(*) AS n_rows
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8)) AS volume_dec
  FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("rel_sql_q7_volume_shipping", sql=_Q7_SQL)
def rel_sql_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping) through spark.sql, identical text on
    both engines: bilateral trade volume between two nations by ship year.
    The distinguishing feature is nation joined TWICE under different
    aliases — Catalyst keeps the two 25-row broadcasts distinct, and the
    symmetric pair disjunction can only be evaluated after both legs are
    attached (it references both aliases), which pins that the optimizer
    still pushes each disjunct's single-sided implication
    (n_name IN ('NATION_1','NATION_2')) into BOTH broadcast builds via
    in-filter inference. At scale: lineitem⋈orders⋈customer are the only
    shuffles; the two nation legs and supplier broadcast at any SF; the
    ship-date window pushes to the fact scan."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    return spark.sql(_Q7_SQL)


# ---------------------------------------------------------------------------
# Q8 shape: national market share — ratio of a conditional decimal sum to
# the unconditional sum over an 8-table snowflake (deepest join tree in
# the battery).
# ---------------------------------------------------------------------------

_Q8_SQL = """
SELECT o_year,
       CAST(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume_dec
                          ELSE CAST(0 AS DECIMAL(27,8)) END) AS DOUBLE)
            / CAST(sum(volume_dec) AS DOUBLE) AS DOUBLE) AS mkt_share,
       count(*) AS n_rows
FROM (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,8)) AS volume_dec,
         n1.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r ON n2.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) all_nations
GROUP BY o_year
"""


@query("rel_sql_q8_market_share", sql=_Q8_SQL)
def rel_sql_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share) through spark.sql, identical
    text on both engines: one nation's share of ECONOMY-part trade volume
    into ASIA, per order year. The deepest join tree in the battery
    (8 relations): part prunes the fact side via its type filter, the
    supplier-nation and customer-nation→region legs broadcast, and the
    share is computed as conditional-sum / total-sum where BOTH sums are
    exact decimals folded in the SAME partial aggregate (one pass, one
    exchange) and the division is a single IEEE double op — the
    numerator/denominator device that keeps ratios reproducible across
    engines regardless of reduction order."""
    _views(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer", "nation", "region"
    )
    return spark.sql(_Q8_SQL)


# ---------------------------------------------------------------------------
# Q9: product-type profit — the TRUE TPC-H query since r07: the profit
# expression uses ps_supplycost from the derived partsupp (joined on the
# (l_partkey, l_suppkey) pair), over a LIKE-filtered part slice, grouped
# by supplier nation and order year.
#
# Selectivity caveat (ADVICE r07): the testdata's lineitem (partkey,
# suppkey) pairs are uniform over all S suppliers, while the derived
# partsupp has 4 slots per part — so the ps equi-join retains ~4/S of
# lineitem (measured 3.90% at sf0.01, 0.39% at sf0.1; see COVERAGE.md).
# Oracle-identical either way, but Q9 bench timings are small-slice
# numbers, not full-fact-scan numbers.
# ---------------------------------------------------------------------------

_Q9_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT nation, o_year, CAST(sum(amount_dec) AS DOUBLE) AS sum_profit, count(*) AS n_rows
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount)
              - ps.ps_supplycost * l.l_quantity AS DECIMAL(27,8)) AS amount_dec
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
"""


@query("rel_sql_q9_product_profit", sql=_Q9_SQL)
def rel_sql_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) through spark.sql, identical text on
    both engines — with the derived partsupp this is the TRUE query: cost
    = ps_supplycost * l_quantity via the (partkey, suppkey) partsupp join,
    the 6-table snowflake of the original. The '%gear%' predicate cannot
    use an index but DOES push to the part scan, pruning the fact join by
    part keys early; profit is evaluated per-row in IEEE doubles (both
    engines bit-identical) then staged to decimal so the nation×year
    rollup is order-independent. Lineitem joins partsupp on the composite
    (partkey, suppkey) pair — a lineitem row matches exactly one partsupp
    row when the pair exists and drops out otherwise, same as dbgen data
    where every (partkey, suppkey) in lineitem IS a partsupp row. At
    scale: one fact shuffle per join key, dims (and the generated
    partsupp) broadcast, 2-column part scan."""
    _views(spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation")
    return spark.sql(_Q9_SQL)


# ---------------------------------------------------------------------------
# Q11 shape: important stock identification — groupBy + HAVING against an
# UNCORRELATED scalar aggregate computed over the SAME filtered relation
# (the "fraction of the national total" threshold).
# ---------------------------------------------------------------------------

_Q11_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT ps.ps_partkey,
       CAST(sum(CAST(ps.ps_supplycost AS DECIMAL(27,8)) * ps.ps_availqty) AS DOUBLE) AS part_value
FROM partsupp ps
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
GROUP BY ps.ps_partkey
HAVING CAST(sum(CAST(ps.ps_supplycost AS DECIMAL(27,8)) * ps.ps_availqty) AS DOUBLE) >
       0.001 * CAST((SELECT sum(CAST(ps2.ps_supplycost AS DECIMAL(27,8)) * ps2.ps_availqty)
                     FROM partsupp ps2
                     JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
                     JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
                     WHERE n2.n_name = 'NATION_3') AS DOUBLE)
"""


@query("rel_sql_q11_important_stock", sql=_Q11_SQL)
def rel_sql_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) through spark.sql, identical text on
    both engines, over the derived partsupp relation — the true query:
    parts whose stock value (supplycost x availqty) held by one nation's
    suppliers exceeds a fixed fraction of that nation's total. The HAVING
    threshold is an UNCORRELATED scalar subquery over the same filtered
    join — Spark executes it once as a separate one-row subquery job and
    injects the result as a literal into the HAVING filter (no per-group
    probe; the complement of Q17's correlated form, same complementarity
    Q22 pins on the anti-join side). Value staging: supplycost casts to
    decimal BEFORE the availqty multiply, so both the per-part sums and
    the grand total are exact decimal sums of exact decimal products; each
    side is then ONE double cast and the 0.001 multiply is one IEEE op —
    engine-independent comparison. At scale: two passes over the
    nation-filtered slice (supplier/nation broadcast, so the slice never
    shuffles to be filtered), each aggregating map-side first."""
    _views(spark, sf_dir, "part", "supplier", "nation")
    return spark.sql(_Q11_SQL)


# ---------------------------------------------------------------------------
# Q12 shape: shipping-priority classes — conditional counts (high- vs
# low-priority) per class with a non-equi date residual on the join.
# (No l_shipmode column: the class axis is l_returnflag.)
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT l.l_returnflag AS ship_class,
       count(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
       count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_returnflag
"""


@query("rel_sql_q12_ship_classes", sql=_Q12_SQL)
def rel_sql_q12_ship_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority classes) through
    spark.sql, identical text on both engines: for one ship-year's
    late-shipped lines (>30 days after order date; l_returnflag stands in
    for the absent l_shipmode), count urgent/high-priority vs other
    orders per class. Pins the pivot-free conditional-count idiom —
    count(CASE WHEN ...) twice in ONE aggregate pass (both legs fold into
    the same map-side partial; BIGINT in both engines, unlike sum(int)
    which DuckDB widens to HUGEINT) — and a cross-relation date residual
    that must stay ON the join, while the single-sided year window still
    pushes to the lineitem scan."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12_SQL)


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution — LEFT join with an
# ON-clause-only filter, then a second aggregation over the first
# (count-of-counts histogram). Zero-order customers MUST appear (c_count=0).
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@query("rel_sql_q13_customer_distribution", sql=_Q13_SQL)
def rel_sql_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution) through spark.sql, identical
    text on both engines: the histogram of how many non-urgent orders each
    customer has. Two stacked aggregations: per-customer counts over a
    LEFT join whose priority filter lives in the ON clause — it must NOT
    be pushed below the join as a WHERE (that would drop zero-order
    customers instead of counting them at 0; count(o_orderkey) ignores
    the null-extended rows, which is the semantics the shape exists to
    pin) — then a tiny count-of-counts rollup. At scale: one shuffle
    joins customer⋈orders on custkey, the first aggregate reuses that
    partitioning (no second exchange for the groupBy on the same key),
    and the histogram aggregates ~40 distinct counts map-side."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13_SQL)


# ---------------------------------------------------------------------------
# Q15 shape: top supplier — an aggregate CTE referenced twice (once as the
# join input, once under a scalar MAX), with exact-decimal equality at the
# top so ties are engine-independent.
# ---------------------------------------------------------------------------

_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS total_revenue_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue_dec AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue_dec = (SELECT max(total_revenue_dec) FROM revenue)
"""


@query("rel_sql_q15_top_supplier", sql=_Q15_SQL)
def rel_sql_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier) through spark.sql, identical text on
    both engines: the supplier(s) with maximal revenue in one quarter,
    via a revenue CTE used both as the join input and under a scalar MAX
    (the original's CREATE VIEW, expressed as a CTE). The equality test
    runs on the EXACT decimal sums — comparing doubles here could
    disagree across engines on a last-ulp tie; comparing decimals cannot,
    and ties correctly return every argmax supplier rather than an
    arbitrary LIMIT 1. At scale: the quarter filter pushes to the scan,
    the per-supplier aggregate shuffles once on suppkey, the MAX is a
    one-row reduction of that aggregate, and supplier broadcasts."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


# ---------------------------------------------------------------------------
# Q16 shape: supplier-relationship count — count(DISTINCT) per attribute
# triple with a null-aware NOT IN anti join against an excluded-supplier
# subquery (the one anti-join variant the battery didn't yet pin).
# ---------------------------------------------------------------------------

_Q16_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM partsupp ps JOIN part p ON ps.ps_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query("rel_sql_q16_supplier_relationship", sql=_Q16_SQL)
def rel_sql_q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) through spark.sql, identical
    text on both engines, over the derived partsupp relation — the true
    query: distinct supplier counts per (brand, type, size) for a sieve of
    sizes, excluding blacklisted suppliers (negative balance standing in
    for the original's complaint comment scan). Pins NOT IN's NULL-aware
    anti join — semantically distinct from NOT EXISTS (Q21/Q22): if the
    subquery produced a NULL key the whole predicate would void — Spark
    plans it as a null-aware broadcast anti join of the tiny excluded set.
    The brand/type/size sieve pushes to the part scan (IN-list + NOT LIKE
    are scan-evaluable) and prunes partsupp through the join, and
    count(DISTINCT suppkey) aggregates on (triple, suppkey) first — both
    engines dedup before counting, exact, no HLL. At scale: one partsupp
    shuffle on partkey, one distinct-agg exchange on the group keys."""
    _views(spark, sf_dir, "part", "supplier")
    return spark.sql(_Q16_SQL)


# ---------------------------------------------------------------------------
# Q20 shape: potential part promotion — IN over a grouped-HAVING subquery
# (semi join against an aggregate), nested inside a broadcast-dim filter.
# ---------------------------------------------------------------------------

_Q20_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT s.s_name, s.s_suppkey
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_7'
  AND s.s_suppkey IN (
    SELECT ps.ps_suppkey FROM partsupp ps
    WHERE ps.ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      AND ps.ps_availqty > (
        SELECT 0.5 * CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        FROM lineitem l
        WHERE l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01')
  )
"""


@query("rel_sql_q20_part_promotion", sql=_Q20_SQL)
def rel_sql_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) through spark.sql, identical
    text on both engines, over the derived partsupp relation — the true
    query and its full THREE-deep nesting: suppliers in one nation holding
    excess stock (availqty > half the year's shipped quantity) of
    LIKE-matched parts. The outer IN is a semi join; inside it, the
    availability check is a scalar aggregate CORRELATED on BOTH partsupp
    keys, which Catalyst decorrelates into a per-(partkey, suppkey)
    aggregate of the date-filtered lineitem joined back on the pair — a
    (part,supp) pair with no shipments yields NULL and the comparison
    voids, on both engines. The shipped sum is an exact DECIMAL(18,4)
    aggregate; 0.5x is one IEEE double op, so the excess-stock boundary is
    engine-independent. At scale: lineitem shuffles once on
    (partkey, suppkey) after scan-pushed date filters; the part LIKE
    filter semi-joins partsupp on partkey; supplier and nation broadcast —
    the outer semi join ships only the qualifying suppkey set."""
    _views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(_Q20_SQL)
