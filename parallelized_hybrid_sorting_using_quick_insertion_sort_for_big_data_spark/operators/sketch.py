"""Count-Min Sketch (Cormode & Muthukrishnan 2005): bounded-memory
approximate frequency counts (extension layer, SURVEY §2c).

The mergeable complement to the exact two-pass heavy hitters
(``operators/heavy.py``): a CMS is ``depth × width`` counters regardless of
vocabulary size, built with one shuffle of (row, cell) partial counts and
mergeable across shards/streams by cell-wise addition — the structure a
streaming pipeline keeps per window when even the candidate set of an
exact pass would churn too fast. Estimates only ever OVER-count
(est ≥ true; est ≤ true + εN with probability 1−δ, ε = e/width,
δ = e^−depth).

Engine portability: cell indexes come from the md5-prefix hash family
(same construction as the MinHash base hash), so DuckDB rebuilds the
identical sketch cell-for-cell and the generated oracle value-checks both
the build and the estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(value, j: int, width: int):
    """Row-``j`` cell index of ``value``: md5-prefix of "value|j" mod width
    — bit-identical in any engine with md5."""
    h = F.conv(
        F.substring(F.md5(F.concat(value.cast("string"), F.lit(f"|{j}"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def _cell_sql(value_expr: str, j: int, width: int) -> str:
    return (
        f"(CAST('0x' || substr(md5({value_expr} || '|{j}'), 1, 8) AS BIGINT)"
        f" % {width})"
    )


def cms_build(df: DataFrame, value_col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Build the sketch: (j, cell, n) counters, one row per OCCUPIED cell
    (missing cells are zero). One shuffle of (j, cell) partial counts —
    map-side combine bounds it at depth·width rows per partition no matter
    the input size. Null values are ignored (consistent with heavy.py)."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got {depth}, {width}")
    v = F.col(value_col)
    cells = df.where(v.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cell(v, j, width).alias("cell")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__c")
    )
    return (
        cells.select(F.col("__c.j").alias("j"), F.col("__c.cell").alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    value_col: str = "value",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate each probe value's count: min over the sketch rows of its
    depth cells. The probe side fans out ×depth and joins the (tiny,
    broadcastable) sketch on (j, cell); a cell absent from the sketch is an
    exact zero. Output: probe columns + ``cms_est``."""
    v = F.col(value_col)
    fanned = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), _cell(v, j, width).alias("cell"))
                    for j in range(depth)
                ]
            )
        ).alias("__c"),
    ).select("*", F.col("__c.j").alias("j"), F.col("__c.cell").alias("cell")).drop("__c")
    joined = fanned.join(F.broadcast(cms), ["j", "cell"], "left").withColumn(
        "__n", F.coalesce(F.col("n"), F.lit(0))
    )
    probe_cols = [c for c in probes.columns]
    return (
        joined.groupBy(*probe_cols)
        .agg(F.min("__n").alias("cms_est"))
    )


def cms_topk_oracle_sql(
    depth: int = 4,
    width: int = 1024,
    topk: int = 20,
    table: str = "documents",
    text_col: str = "text",
    token_re: str = "[a-z0-9]+",
) -> str:
    """DuckDB SQL reproducing build + estimate for the top-``topk`` exact
    tokens (ties to the lexicographically smaller token): same md5 cells,
    same min-over-rows estimate. Generated from the same constants."""
    cell_rows = "\n  UNION ALL\n  ".join(
        f"SELECT {j} AS j, {_cell_sql('token', j, width)} AS cell, token FROM toks"
        for j in range(depth)
    )
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower({text_col}), '{token_re}')) AS token
  FROM {table}
),
cells AS (
  {cell_rows}
),
cms AS (
  SELECT j, cell, count(*) AS n FROM cells GROUP BY j, cell
),
exact AS (
  SELECT token, count(*) AS exact_n FROM toks GROUP BY token
  ORDER BY exact_n DESC, token LIMIT {topk}
),
probe_cells AS (
  {cell_rows.replace('FROM toks', 'FROM exact')}
),
est AS (
  SELECT p.token, min(coalesce(c.n, 0)) AS cms_est
  FROM probe_cells p LEFT JOIN cms c ON p.j = c.j AND p.cell = c.cell
  GROUP BY p.token
)
SELECT e.token, e.exact_n, s.cms_est,
       CAST(s.cms_est - e.exact_n AS BIGINT) AS overcount
FROM exact e JOIN est s USING (token)
"""
