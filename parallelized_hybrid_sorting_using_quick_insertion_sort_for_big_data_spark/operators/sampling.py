"""Deterministic hash-based sampling and dataset splitting.

A training-data pipeline needs reproducible train/val/test splits and
reproducible downsampling: the assignment of a document must not depend on
partitioning, row order, executor count, or which engine evaluates it —
``df.sample()``/``TABLESAMPLE`` give none of those guarantees (seeded
per-partition RNG changes with the partition layout). The standard
production answer is content hashing: bucket = hash(id) mod D, then compare
the bucket against cumulative fraction thresholds.

Everything here is a narrow per-row projection + filter — zero shuffles, no
state, trivially parallel at 100 TB — and is built on the md5-prefix hash
family so the DuckDB oracle (and any other SQL engine over the same lake)
reproduces each row's assignment bit-for-bit:

  Spark : conv(substring(md5(key), 1, 8), 16, 10) % D
  DuckDB: CAST('0x' || substr(md5(key), 1, 8) AS BIGINT) % D

The reference has no sampling operator (it sorts fixed arrays end to end:
QuickInsertionHeap.c:141-204 processes every generated element); this module
is part of the LLM-pipeline extension layer the north star mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bucket-space denominator: fractions are resolved to integer thresholds out
#: of 1e6, so any fraction with ≤6 decimal places is exact in both engines.
DENOM = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, DENOM) from the md5 prefix of ``key``.

    ``salt`` decorrelates independent sampling decisions over the same key
    (e.g. a split assignment and a later downsample must not reuse the same
    coin). 32 hex chars of md5 >> 20 bits of bucket, so the prefix is
    uniform; the first 8 hex chars (32 bits) keep the conv() result well
    inside BIGINT in both engines.
    """
    # NULL keys hash like the sentinel string "\\0null" (not producible by a
    # real key's string form): a NULL would otherwise propagate through
    # md5/concat and silently drop the row from every split and sample.
    k = F.coalesce(key.cast("string"), F.lit("\\0null"))
    h = F.conv(F.substring(F.md5(F.concat(k, F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("long") % DENOM).alias("bucket")


def bucket_sql(key_expr: str, salt: str = "") -> str:
    """The DuckDB-equivalent expression for :func:`hash_bucket` — generated
    from the same constants so oracles can't drift from the engine."""
    return (
        f"CAST('0x' || substr(md5(coalesce(CAST({key_expr} AS VARCHAR), '\\0null') "
        f"|| '{salt}'), 1, 8) AS BIGINT) % {DENOM}"
    )


def _sq(name: str) -> str:
    """Single-quote a name for generated SQL (doubling embedded quotes), so
    split/stratum names like ``pt'BR`` can't break or re-shape the oracle."""
    return "'" + name.replace("'", "''") + "'"


def _thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    total = sum(fractions.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out: list[tuple[str, int]] = []
    acc = 0
    for name, frac in fractions.items():
        acc += int(round(frac * DENOM))
        out.append((name, acc))
    out[-1] = (out[-1][0], DENOM)  # absorb rounding so every bucket lands
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split",
    keep_bucket: bool = False,
) -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test), exactly and
    reproducibly: bucket(key) compared against cumulative thresholds.

    Adds a ``split`` string column; no rows are dropped. Fractions must sum
    to 1. The assignment depends only on (key, salt, fractions) — stable
    under repartitioning, engine changes, and incremental re-runs over a
    growing corpus (a doc keeps its split forever, the property that keeps
    eval sets uncontaminated as the lake grows).
    """
    out = df.withColumn("bucket", hash_bucket(F.col(key_col), salt))
    expr = None
    for name, upper in _thresholds(fractions):
        cond = F.col("bucket") < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    out = out.withColumn("split", expr)
    # keep_bucket=True spares callers that also want the raw bucket a second
    # md5 evaluation per row
    return out if keep_bucket else out.drop("bucket")


def split_case_sql(key_expr: str, fractions: dict[str, float], salt: str = "split") -> str:
    """DuckDB CASE expression mirroring :func:`hash_split`."""
    b = bucket_sql(key_expr, salt)
    arms = " ".join(
        f"WHEN {b} < {upper} THEN {_sq(name)}" for name, upper in _thresholds(fractions)
    )
    return f"CASE {arms} END"


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    The training-data use: rebalance a corpus by language/source — keep 100%
    of low-resource strata, hash-downsample the dominant ones. Per-row
    decision is bucket(key) < fraction·DENOM with the stratum's own
    fraction; strata absent from ``fractions`` get ``default_fraction``.
    Pure filter: no shuffle, no state, and the kept set is a superset-stable
    function of the keys (lowering a fraction only removes rows, never
    swaps them — monotone samples, the property curriculum schedules rely
    on).
    """
    b = hash_bucket(F.col(key_col), salt)
    thr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(stratum)
        lim = F.lit(int(round(frac * DENOM)))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    thr = F.lit(int(round(default_fraction * DENOM))) if thr is None else thr.otherwise(
        F.lit(int(round(default_fraction * DENOM)))
    )
    return df.where(b < thr)


def stratified_threshold_sql(
    strata_expr: str, fractions: dict[str, float], default_fraction: float = 0.0
) -> str:
    """DuckDB CASE expression for the per-stratum threshold of
    :func:`stratified_hash_sample`."""
    arms = " ".join(
        f"WHEN {strata_expr} = {_sq(s)} THEN {int(round(f * DENOM))}"
        for s, f in fractions.items()
    )
    return f"CASE {arms} ELSE {int(round(default_fraction * DENOM))} END"


def pack_greedy_bins(
    df: DataFrame,
    size_col: str,
    budget: int,
    id_col: str,
    n_bins: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign rows to size-budgeted packs — the shard-building step before
    training (documents → ≤budget-token sequences/shards).

    Optimal bin packing is sequential; the distributed approximation here is
    deterministic and single-shuffle: hash rows into ``n_bins`` independent
    bins, order each bin by (size DESC, id) — the first-fit-decreasing
    order — and segment the running total every ``budget`` units:
    ``pack = (cumsum - size) div budget`` (a row joins the pack its START
    offset falls in). Guarantees: a pack's total never exceeds budget plus
    its largest row, and rows larger than ``budget`` isolate into their own
    pack naturally.

    At 100 TB: one shuffle on ``bin`` (choose n_bins ≈ shuffle
    partitions); the per-bin window is a sort + running sum, all JVM-side.
    Every assignment is a pure function of (ids, sizes, salt), so packs are
    reproducible across engines — :func:`pack_sql` generates the matching
    DuckDB form."""
    from pyspark.sql import Window

    bin_col = (hash_bucket(F.col(id_col), salt) % n_bins).alias("bin")
    w = (
        Window.partitionBy("bin")
        .orderBy(F.col(size_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    return df.withColumn("bin", bin_col).withColumn(
        "pack", F.floor((cum - F.col(size_col)) / budget)
    )


def pack_sql(
    size_expr: str, budget: int, id_expr: str, n_bins: int = 64, salt: str = "pack"
) -> tuple[str, str]:
    """DuckDB (bin_expr, pack_expr-over-named-columns) mirroring
    :func:`pack_greedy_bins`; the caller wraps them in its own CTEs with
    columns named ``bin`` and the size column available."""
    bin_expr = f"({bucket_sql(id_expr, salt)}) % {n_bins}"
    pack_expr = (
        f"(sum({size_expr}) OVER (PARTITION BY bin ORDER BY {size_expr} DESC, "
        f"{id_expr} ROWS UNBOUNDED PRECEDING) - {size_expr}) // {budget}"
    )
    return bin_expr, pack_expr


# ---------------------------------------------------------------------------
# Data-mixture sampling (token-budget weighting)
# ---------------------------------------------------------------------------


def _share_case(group_col: Column, shares: dict[str, float]) -> Column:
    expr = None
    for g, s in shares.items():
        cond = group_col == F.lit(g)
        expr = F.when(cond, F.lit(float(s))) if expr is None else expr.when(cond, F.lit(float(s)))
    return expr.otherwise(F.lit(0.0))


def share_case_sql(group_expr: str, shares: dict[str, float]) -> str:
    """DuckDB CASE mirroring the per-group mixture share literals."""
    arms = " ".join(f"WHEN {group_expr} = {_sq(g)} THEN {float(s)!r}" for g, s in shares.items())
    return f"CASE {arms} ELSE 0.0 END"


def mixture_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weight_col: str,
    shares: dict[str, float],
    budget_frac: float,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic data-mixture downsampling: keep, per group g, the
    fraction of rows that makes g's share of the OUTPUT weight approach
    ``shares[g]`` of a ``budget_frac``·total-weight budget.

    This is the mixture-reweighting step of LLM corpus construction ("30%
    of the training budget should be English, 20% code, …"): with L_g =
    group weight and T = total weight, each group keeps fraction

        f_g = min(1, shares[g] · (budget_frac · T) / L_g)

    (min(1, ·) because a low-resource group can at most contribute all of
    itself — the standard epochs-capped mixture). The per-row decision is
    the md5 hash-bucket coin (:func:`hash_bucket`): reproducible across
    engines, partitionings, and re-runs; lowering a share only removes rows
    (monotone samples).

    Exactness across engines: L_g and T are exact BIGINT sums; f_g is ONE
    identically-parenthesized IEEE-double expression evaluated from those
    integers in both Spark and the generated oracle SQL, so the integer
    threshold floor(f_g · DENOM) matches bit-for-bit — no float-drift rows
    at the acceptance boundary.

    Plan shape at 100 TB: two tiny pre-aggregations (one row per group /
    one row total, partial-agg map-side), broadcast-joined back onto the
    scan; the accept test is a per-row projection + filter in the scan
    stage — the big table is never shuffled.
    """
    totals = df.groupBy(group_col).agg(F.sum(weight_col).cast("bigint").alias("__L"))
    grand = df.agg(F.sum(weight_col).cast("bigint").alias("__T"))
    frac = F.least(
        F.lit(1.0),
        _share_case(F.col(group_col), shares)
        * (F.lit(float(budget_frac)) * F.col("__T").cast("double"))
        / F.col("__L").cast("double"),
    )
    thr = F.floor(frac * F.lit(float(DENOM))).cast("long")
    return (
        df.join(F.broadcast(totals), group_col)
        .crossJoin(F.broadcast(grand))
        .where(hash_bucket(F.col(key_col), salt) < thr)
        .drop("__L", "__T")
    )


def mixture_threshold_sql(
    group_expr: str, shares: dict[str, float], budget_frac: float
) -> str:
    """DuckDB threshold expression for :func:`mixture_sample`, over columns
    named ``__L`` (group weight) and ``__T`` (total weight) — the SAME
    parenthesization as the Spark side so the doubles agree exactly."""
    return (
        f"CAST(floor(least(1.0, ({share_case_sql(group_expr, shares)}) "
        f"* ({float(budget_frac)!r} * CAST(__T AS DOUBLE)) / CAST(__L AS DOUBLE)) "
        f"* {float(DENOM)!r}) AS BIGINT)"
    )


def _coin(key: Column, salt: str) -> Column:
    """Full 32-bit md5-prefix coin for ordering (not bucketed to DENOM —
    fewer collisions; ties broken by the key itself downstream)."""
    k = F.coalesce(key.cast("string"), F.lit("\\0null"))
    return F.conv(F.substring(F.md5(F.concat(k, F.lit(salt))), 1, 8), 16, 10).cast(
        "long"
    )


def coin_sql(key_expr: str, salt: str) -> str:
    """DuckDB mirror of :func:`_coin`, generated from the same constants."""
    return (
        f"CAST('0x' || substr(md5(coalesce(CAST({key_expr} AS VARCHAR), '\\0null') "
        f"|| '{salt}'), 1, 8) AS BIGINT)"
    )


def group_reservoir(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    salt: str = "reservoir",
    n_salts: int = 16,
    rank_col: str = "rnk",
) -> DataFrame:
    """Deterministic 'reservoir' of exactly min(k, group size) rows per
    group: the k rows with the smallest md5 coin (ties to the smaller key)
    — the training-data curation op "give me k docs per language/source,
    stable across runs, engines, and corpus growth order". A true random
    reservoir is irreproducible; the hash-coin form IS the uniform sample
    (md5 prefix ~ U[0, 2^32)) with an audit trail any engine can replay.

    Skew-proof two-phase form (same pattern as ``salted_distinct_count``):
    a single ``row_number() OVER (PARTITION BY group)`` funnels a hot
    group through one reducer, so phase 1 ranks within (group, coin mod
    n_salts) shards — the hot group's sort spreads over n_salts reducers —
    and keeps each shard's top k. Any row in the group's true top k ranks
    ≤ k within its own shard, so phase 1 is a superset; phase 2 re-ranks
    the ≤ n_salts·k survivors per group exactly. Output: input columns +
    ``rank_col`` (1-based within group, ordered by coin then key).
    """
    if k < 1 or n_salts < 1:
        raise ValueError(f"k and n_salts must be >= 1, got {k}, {n_salts}")
    from pyspark.sql.window import Window

    coin = _coin(F.col(key_col), salt)
    shard = F.pmod(coin, F.lit(n_salts))
    w1 = Window.partitionBy(*group_cols, shard).orderBy(
        coin.asc(), F.col(key_col).asc()
    )
    cand = (
        df.withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= k)
        .drop("__rn1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(coin.asc(), F.col(key_col).asc())
    return (
        cand.withColumn(rank_col, F.row_number().over(w2))
        .where(F.col(rank_col) <= k)
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: Column,
    k: int,
    salt: str = "wsample",
    max_weight: int = 64,
    rank_col: str = "rnk",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-Res, integer-exact form): select k rows with probability
    proportional to an integer weight, reproducible across runs and
    engines.

    E-S draws key_i = u_i^(1/w_i) and keeps the k largest. For INTEGER
    weights that distribution is exactly the max of w_i iid uniforms
    (P(max <= x) = x^w), so the selection key is computed without any
    float math: explode ``sequence(1, w)``, draw one md5 coin per
    replica (:func:`_coin` on ``key || '|' || j``), take the per-row MAX.
    Everything is bigint — the DuckDB oracle replays it digit-for-digit,
    which a u^(1/w) float key could never guarantee at selection
    boundaries.

    ``weight_col`` is clamped to [1, max_weight]; the replica explosion
    is therefore bounded at max_weight rows per input row — at 100 TB
    this is a map-side expand feeding a per-key MAX partial aggregate
    (one keyed exchange), then the global top-k plans as
    TakeOrderedAndProject (per-partition heaps, k*P rows to the driver —
    the engine's sort capability reused, never a full sort). Output:
    input columns + the selection key + a 1-based rank.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_weight < 1:
        raise ValueError(f"max_weight must be >= 1, got {max_weight}")
    from .sorting import ranked_small

    w = F.greatest(F.lit(1), F.least(weight_col.cast("long"), F.lit(max_weight)))
    reps = df.select(F.col(key_col), w.alias("__w")).select(
        F.col(key_col), F.explode(F.sequence(F.lit(1), F.col("__w"))).alias("__j")
    )
    coin = _coin(
        F.concat(F.col(key_col).cast("string"), F.lit("|"), F.col("__j").cast("string")),
        salt,
    )
    keyed = (
        reps.select(F.col(key_col), coin.alias("__c"))
        .groupBy(key_col)
        .agg(F.max("__c").alias("sel_key"))
    )
    top = keyed.orderBy(F.col("sel_key").desc(), F.col(key_col)).limit(k)
    ranked = ranked_small(
        top, ["sel_key", key_col], ascending=[False, True], rank_col=rank_col
    )
    return df.join(F.broadcast(ranked), key_col).select(
        *df.columns, "sel_key", rank_col
    )


def weighted_sample_sql(
    table: str,
    key_expr: str,
    weight_expr: str,
    k: int,
    salt: str = "wsample",
    max_weight: int = 64,
    rank_col: str = "rnk",
    payload_cols: str = "",
) -> str:
    """DuckDB oracle for :func:`weighted_sample`, generated from the same
    constants (clamp, replica coins, max, top-k, rank)."""
    coin = coin_sql("CAST(k_ AS VARCHAR) || '|' || CAST(j AS VARCHAR)", salt)
    pay = f", {payload_cols}" if payload_cols else ""
    return f"""
WITH w AS (
  SELECT {key_expr} AS k_, greatest(1, least(CAST({weight_expr} AS BIGINT), {max_weight})) AS wt
  FROM {table}
),
reps AS (SELECT k_, unnest(generate_series(1, wt)) AS j FROM w),
keyed AS (
  SELECT k_ AS {key_expr}, CAST(max({coin}) AS BIGINT) AS sel_key
  FROM reps
  GROUP BY k_
),
top AS (SELECT * FROM keyed ORDER BY sel_key DESC, {key_expr} LIMIT {k}),
ranked AS (
  SELECT {key_expr}, sel_key,
         CAST(row_number() OVER (ORDER BY sel_key DESC, {key_expr}) AS BIGINT) AS {rank_col}
  FROM top
)
SELECT t.{key_expr}{pay}, r.sel_key, r.{rank_col}
FROM {table} t JOIN ranked r USING ({key_expr})
"""
