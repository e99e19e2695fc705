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

Engine portability: cell indexes are 32-bit slices of md5 digests
(four hash rows per digest), so DuckDB rebuilds the identical sketch
cell-for-cell and the generated oracle value-checks both the build and
the estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# _cell draws positions from 32-bit md5 slices, so any bit-array / counter
# width beyond 2^32 would leave high positions permanently unset — a silent
# false-positive-rate degradation. Builders validate against this bound.
_MAX_POSITIONS = 1 << 32


def _digest(value, block: int):
    """Block-``block`` md5 digest of ``value`` — the hash material four
    cell slices share. Builders materialize this as a column BEFORE the
    cell fan-out so the plan provably computes ⌈k/4⌉ digests per value
    (Spark's subexpression elimination does not reach into a Generate's
    input array, so relying on CSE would silently keep k evaluations —
    the plan gate in test_plans counts md5 calls)."""
    return F.md5(F.concat(value.cast("string"), F.lit(f"|{block}")))


def _cell_of(digest, j: int, width: int):
    """Cell index from slice ``j % 4`` of the block-``j//4`` digest."""
    off = j % 4
    h = F.conv(F.substring(digest, 8 * off + 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(width))


def _cell(value, j: int, width: int):
    """Row-``j`` cell index of ``value``: 32-bit slice ``j % 4`` of
    md5("value|{j//4}"), mod width. One 128-bit digest feeds FOUR hash
    rows (4 × 32-bit slices — the standard way to stretch one strong hash
    into a family, cf. Kirsch–Mitzenmacher), so a depth/k ≤ 4 sketch
    needs ONE md5 per value; bit-identical in any engine with md5
    (:func:`_cell_sql` is the same construction in DuckDB syntax).
    Inline form for probe-side/one-off use; hot builders stage the digest
    via :func:`_digest`/:func:`_cell_of` so it is computed once."""
    return _cell_of(_digest(value, j // 4), j, width)


def _cell_sql(value_expr: str, j: int, width: int) -> str:
    block, off = divmod(j, 4)
    return (
        f"(CAST('0x' || substr(md5({value_expr} || '|{block}'), {8 * off + 1}, 8) AS BIGINT)"
        f" % {width})"
    )


def cms_build(df: DataFrame, value_col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Build the sketch: (j, cell, n) counters, one row per OCCUPIED cell
    (missing cells are zero). One shuffle of (j, cell) partial counts —
    map-side combine bounds it at depth·width rows per partition no matter
    the input size. Null values are ignored (consistent with heavy.py)."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got {depth}, {width}")
    if width > _MAX_POSITIONS:
        raise ValueError(
            f"width must be <= 2^32 ({_MAX_POSITIONS}): cell positions come "
            f"from 32-bit md5 slices, so wider sketches would silently "
            f"never occupy high cells; got {width}"
        )
    v = F.col(value_col)
    n_blocks = (depth + 3) // 4
    staged = df.where(v.isNotNull()).select(
        *[_digest(v, b).alias(f"__d{b}") for b in range(n_blocks)]
    )
    cells = staged.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cell_of(F.col(f"__d{j // 4}"), j, width).alias("cell"),
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


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS sketches built with the same (depth, width, hash family):
    cell-wise addition — the property that lets shards/streams/windows
    sketch independently and combine later (union + one bounded re-agg)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("j", "cell").agg(F.sum("n").alias("n"))


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


def bloom_build(df: DataFrame, value_col: str, m_bits: int = 65536, k_hashes: int = 4) -> DataFrame:
    """Build a Bloom filter as its OCCUPIED bit positions: one ``(pos)``
    row per set bit (≤ min(k·|values|, m) rows — kilobytes for an eval
    set, broadcastable anywhere). md5-slice position hashes (one digest
    per value at the default k=4), so any engine reconstructs the
    identical bit array.

    The compact-membership form of decontamination at scale: a 64Ki-bit
    filter summarizes an arbitrary-size benchmark set with NO false
    negatives (a missed contaminated doc is impossible); false positives
    are bounded by (1 − e^(−k·n/m))^k and only cost over-filtering."""
    if m_bits < 1 or k_hashes < 1:
        raise ValueError(f"m_bits and k_hashes must be >= 1, got {m_bits}, {k_hashes}")
    if m_bits > _MAX_POSITIONS:
        raise ValueError(
            f"m_bits must be <= 2^32 ({_MAX_POSITIONS}): bit positions come "
            f"from 32-bit md5 slices, so larger filters would silently "
            f"never set high bits; got {m_bits}"
        )
    v = F.col(value_col)
    n_blocks = (k_hashes + 3) // 4
    staged = df.where(v.isNotNull()).select(
        *[_digest(v, b).alias(f"__d{b}") for b in range(n_blocks)]
    )
    return (
        staged.select(
            F.explode(
                F.array(
                    *[
                        _cell_of(F.col(f"__d{j // 4}"), j, m_bits).alias(f"p{j}")
                        for j in range(k_hashes)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )


def bloom_contains(
    probes: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_bits: int = 65536,
    k_hashes: int = 4,
) -> DataFrame:
    """Append ``bloom_hit`` to ``probes``: true iff ALL ``k_hashes`` bit
    positions of the value are set. Probe side fans out ×k and left-joins
    the broadcast position set; a value hits iff every position matched."""
    v = F.col(value_col)
    n_blocks = (k_hashes + 3) // 4
    staged = probes.select(
        "*", *[_digest(v, b).alias(f"__d{b}") for b in range(n_blocks)]
    )
    fanned = staged.select(
        *probes.columns,
        F.explode(
            F.array(
                *[
                    _cell_of(F.col(f"__d{j // 4}"), j, m_bits)
                    for j in range(k_hashes)
                ]
            )
        ).alias("pos"),
    )
    marked = fanned.join(
        F.broadcast(bloom.withColumn("__set", F.lit(1))), "pos", "left"
    )
    probe_cols = list(probes.columns)
    return marked.groupBy(*probe_cols).agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("__set"), F.lit(0)))).alias(
            "bloom_hit"
        )
    )


def bloom_decontam_oracle_sql(
    bench_sql: str,
    corpus_sql: str,
    n: int = 8,
    m_bits: int = 65536,
    k_hashes: int = 4,
) -> str:
    """DuckDB SQL reproducing Bloom-based shingle decontamination exactly:
    build the bit set from the benchmark's char-``n``-gram shingles, flag
    every corpus doc gram that has all ``k_hashes`` bits set, aggregate
    per doc. ``bench_sql``/``corpus_sql`` yield (doc_id, text)."""
    pos_rows = "\n    UNION ALL\n    ".join(
        f"SELECT {_cell_sql('shingle', j, m_bits)} AS pos FROM bench_sh"
        for j in range(k_hashes)
    )
    gram_pos = "\n    UNION ALL\n    ".join(
        f"SELECT doc_id, shingle, {_cell_sql('shingle', j, m_bits)} AS pos"
        f" FROM corpus_sh"
        for j in range(k_hashes)
    )
    return f"""
WITH bench_d AS (SELECT doc_id, trim(lower(text)) AS t FROM ({bench_sql})),
bench_idx AS (SELECT t, unnest(generate_series(1, greatest(length(t) - {n - 1}, 1))) AS i FROM bench_d),
bench_sh AS (SELECT DISTINCT substr(t, CAST(i AS INT), {n}) AS shingle FROM bench_idx),
bloom AS (SELECT DISTINCT pos FROM (
    {pos_rows}
)),
corpus_d AS (SELECT doc_id, trim(lower(text)) AS t FROM ({corpus_sql})),
corpus_idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(length(t) - {n - 1}, 1))) AS i FROM corpus_d),
corpus_sh AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), {n}) AS shingle FROM corpus_idx),
gram_bits AS (
    {gram_pos}
),
gram_hits AS (
  SELECT g.doc_id, g.shingle,
         (count(*) = sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)) AS hit
  FROM gram_bits g LEFT JOIN bloom b ON g.pos = b.pos
  GROUP BY g.doc_id, g.shingle
)
SELECT doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       (sum(CASE WHEN hit THEN 1 ELSE 0 END) > 0) AS flagged
FROM gram_hits
GROUP BY doc_id
"""


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


def windowed_cms_oracle_sql(
    window_s: int = 21600,
    depth: int = 4,
    width: int = 256,
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "user_id",
) -> str:
    """DuckDB SQL reproducing the per-event-time-window CMS build
    (``streaming/windows.stream_windowed_cms``) cell-for-cell: epoch-floor
    tumbling windows, the same md5-prefix cells, one row per occupied
    (window, j, cell)."""
    cell_rows = "\n  UNION ALL\n  ".join(
        f"SELECT win_start, {j} AS j, {_cell_sql(value_col, j, width)} AS cell"
        f" FROM ev"
        for j in range(depth)
    )
    return f"""
WITH ev AS (
  SELECT make_timestamp(CAST(floor(epoch({ts_col}) / {window_s}) * {window_s} AS BIGINT) * 1000000) AS win_start,
         {value_col}
  FROM {table} WHERE {value_col} IS NOT NULL
),
cells AS (
  {cell_rows}
),
cms AS (SELECT win_start, j, cell, count(*) AS n FROM cells GROUP BY 1, 2, 3)
SELECT win_start, j, cell, n FROM cms
"""
