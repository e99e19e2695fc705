"""Graph-analytics queries over the customer↔supplier trade graph.

The graph: an undirected bipartite link between a customer and every
supplier they bought from (distinct (o_custkey, l_suppkey) pairs through
orders⋈lineitem), suppliers offset by +10,000,000 to disjointify the two
key spaces. Symmetric edges → no dangling nodes → PageRank mass is
conserved up to integer truncation (see operators/graph.py).

Both queries are oracle-checked value-for-value: PageRank via the
generated unrolled-CTE oracle (same integer constants as the Spark
recurrence — the kmeans/BPE generated-oracle pattern), the degree
distribution via plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import graph
from ..queries import query
from ..sources.tables import load_table

_SUPP_OFFSET = 10_000_000
_PR_ITERS = 4

_EDGES_CTE = f"""pairs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
edges AS (
  SELECT c AS src, {_SUPP_OFFSET} + s AS dst FROM pairs
  UNION ALL
  SELECT {_SUPP_OFFSET} + s AS src, c AS dst FROM pairs
)"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (src, dst) edge list of the trade graph — fixed-width
    bigint rows from the moment of creation; at scale the distinct() is
    the only fact-sized shuffle and everything downstream is node-sized."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    fwd = pairs.select(
        F.col("c").alias("src"), (F.lit(_SUPP_OFFSET) + F.col("s")).alias("dst")
    )
    rev = pairs.select(
        (F.lit(_SUPP_OFFSET) + F.col("s")).alias("src"), F.col("c").alias("dst")
    )
    return fwd.unionByName(rev)


_PAGERANK_ORACLE = graph.pagerank_oracle_sql(_EDGES_CTE, iters=_PR_ITERS)


@query("graph_pagerank_trade", sql=_PAGERANK_ORACLE)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier trade graph — 4 power-iteration
    rounds of the integer-scaled recurrence (operators/graph.py), every
    round value-checked by the generated unrolled-CTE DuckDB oracle built
    from the SAME constants. The iterative complement to
    dedup_components: components answers "which nodes connect", PageRank
    answers "which nodes matter" — the two classic Pregel workloads. At
    scale: one fact-sized distinct to build edges, then O(iters) shuffles
    of node-sized bigint rows; lineage cut per round keeps the plan flat
    (kmeans_fit device), pinned by the plan-depth gate in
    tests/test_graph.py."""
    return graph.pagerank(_trade_edges(spark, sf_dir), iters=_PR_ITERS)


_DEGREE_ORACLE = f"""
WITH {_EDGES_CTE},
deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY src)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
"""


@query("graph_degree_distribution", sql=_DEGREE_ORACLE)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the trade graph (how many distinct partners
    each participant trades with, histogrammed) — the count-of-counts
    shape over graph edges; two stacked aggregations, second one over at
    most max-degree distinct rows."""
    return graph.degree_stats(_trade_edges(spark, sf_dir))


_LPA_ITERS = 4
_LPA_ORACLE = graph.lpa_oracle_sql(_EDGES_CTE, iters=_LPA_ITERS)


@query("graph_lpa_communities", sql=_LPA_ORACLE)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities over the trade graph —
    4 deterministic rounds (neighbor-label mode, min-label ties), every
    node's final label value-checked against the generated unrolled-CTE
    oracle. The third Pregel workload next to PageRank and connected
    components: communities expose denser-than-chance neighborhoods
    (here: customer-supplier cliques) that components' reachability and
    PageRank's importance both miss. Same scale contract as pagerank:
    node-sized label relation per round, checkpointed edges, flat plans."""
    return graph.label_propagation(_trade_edges(spark, sf_dir), iters=_LPA_ITERS)
