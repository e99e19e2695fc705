"""Data-quality audit: the validation pass a pipeline runs before trusting
a lake — primary-key uniqueness, null rates, referential integrity (FK
orphans), and domain checks, emitted as one uniform (check, bad, total)
relation.

The reference has no notion of data validation (SURVEY.md §2b: its only
integrity device is the INT_MAX sentinel, quickThreshold.c:169-172);
this is extension-layer breadth for the 100 TB posture: at that scale you
cannot eyeball data, you audit it.

Shapes (all exact integer counts, trivially oracle-checkable):
- uniqueness: groupBy(key) HAVING count>1 → count of violating keys; at
  scale one keyed exchange of pre-aggregated rows.
- null rate: conditional count, zero shuffle beyond the single partial-agg
  exchange.
- FK orphans: LEFT ANTI join child→parent on the key; parent sides that
  are dimension-sized broadcast, fact-fact checks shuffle on the key —
  the same join machinery every query already uses, repurposed as a
  validator.
- domain: predicate violation counts, scan-evaluable.

Each check is one small DataFrame; the audit unions them. Counts are
computed per check rather than in one mega-pass so each check keeps its
own optimal plan (a broadcast anti join and a partial-agg count don't
share a useful common subplan anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one(name: str, bad: DataFrame, total: int | None = None) -> DataFrame:
    agg = bad.agg(F.count(F.lit(1)).cast("bigint").alias("bad"))
    out = agg.select(F.lit(name).alias("check_name"), "bad")
    if total is not None:
        out = out.withColumn("total", F.lit(total).cast("bigint"))
    return out


def uniqueness_check(df: DataFrame, key: str | list[str], name: str) -> DataFrame:
    """Count of key values that occur more than once."""
    keys = [key] if isinstance(key, str) else list(key)
    dups = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
    return _one(name, dups)


def null_check(df: DataFrame, col: str, name: str) -> DataFrame:
    """Count of rows where ``col`` is NULL."""
    return _one(name, df.where(F.col(col).isNull()))


def fk_orphan_check(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str
) -> DataFrame:
    """Count of child rows whose non-null FK has no parent row (LEFT ANTI
    join — broadcast when the parent is dimension-sized, keyed shuffle
    otherwise; AQE picks per actual size)."""
    orphans = child.where(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    return _one(name, orphans)


def domain_check(df: DataFrame, violation: Column, name: str) -> DataFrame:
    """Count of rows violating a domain predicate (pass the VIOLATION
    condition, e.g. ``col('l_discount') < 0``)."""
    return _one(name, df.where(violation))


def audit(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check one-row frames into the audit report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    is_reference: Column,
    bucket_width: float,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current window
    of the same relation, per group — THE standing distribution-drift
    monitor of a production data pipeline (PSI < 0.1 stable, 0.1-0.25
    moderate shift, > 0.25 investigate). r08 extension breadth: drift
    detection is what tells a training-data pipeline its newest crawl
    slice no longer looks like the corpus the filters were tuned on.

    PSI = Σ_buckets (p_i − q_i) · ln(p_i / q_i) over equal-width value
    buckets (add-one smoothed, so empty buckets are well-defined).

    Engine portability (the suite's standard device): every input to the
    float math is an exact integer count; p, q, and p−q are fixed chains
    of single IEEE ops; ln() — the one libm call — is computed on ONE
    integer-ratio double and rounded to 9 digits; each bucket's term is
    rounded to 9 and the cross-bucket reduction happens in exact
    DECIMAL(28,9), so association order cannot move the result.

    Scale shape: two conditional-count aggregations over a (group,
    bucket) key — map-side partials, one fixed-width exchange, output
    |groups| × n_buckets rows pre-spine-join and |groups| rows out. The
    bucket spine (a literal sequence) guarantees empty buckets
    participate in both engines identically."""
    b = F.least(
        F.floor(F.col(value_col) / F.lit(bucket_width)).cast("int"),
        F.lit(n_buckets - 1),
    )
    counts = (
        df.select(
            F.col(group_col),
            b.alias("__b"),
            is_reference.cast("int").alias("__ref"),
        )
        .groupBy(group_col, "__b")
        .agg(
            F.sum("__ref").cast("long").alias("n_ref"),
            F.sum(1 - F.col("__ref")).cast("long").alias("n_cur"),
        )
    )
    spine = (
        df.select(group_col)
        .distinct()
        .crossJoin(
            df.sparkSession.range(n_buckets).select(
                F.col("id").cast("int").alias("__b")
            )
        )
    )
    full = spine.join(counts, [group_col, "__b"], "left").select(
        group_col,
        "__b",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = full.groupBy(group_col).agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    j = full.join(F.broadcast(tot), group_col)
    # smoothed proportions; the ln argument is ONE integer-ratio division
    rp = F.col("n_ref") + 1
    rq = F.col("n_cur") + 1
    dp = (F.col("__tr") + n_buckets).cast("double")
    dq = (F.col("__tc") + n_buckets).cast("double")
    p = rp.cast("double") / dp
    q = rq.cast("double") / dq
    lnr = F.round(
        F.log((rp * (F.col("__tc") + n_buckets)).cast("double")
              / (rq * (F.col("__tr") + n_buckets)).cast("double")),
        9,
    )
    term = F.round((p - q) * lnr, 9).cast("decimal(28,9)")
    return (
        j.groupBy(group_col)
        .agg(
            (F.sum("n_ref")).alias("n_ref"),
            (F.sum("n_cur")).alias("n_cur"),
            F.sum(term).cast("double").alias("psi"),
        )
    )


def fd_violations(df: DataFrame, fds: list[tuple[str, str]]) -> DataFrame:
    """Functional-dependency profiling: for each candidate ``det -> dep``,
    count determinant groups and how many of them map to MORE than one
    dependent value (the FD's violation count; 0 ⇒ the dependency holds —
    candidate-key / denormalization discovery, the Metanome/HyFD question
    asked as a query).

    One stacked pass: every (det, dep) pair becomes (fd, det_val, dep_val)
    rows via ``stack`` (values cast to string — injective, and only
    DISTINCT COUNTS are emitted, never the values), then two grouped
    aggregates. Scale shape: the stack multiplies rows by len(fds) but
    keeps them narrow (three short columns); both aggregates get map-side
    partial combining, and nothing is ever collected per-group."""
    if not fds:
        raise ValueError("fds must list at least one (det, dep) pair")
    k = len(fds)
    args: list[Column] = []
    for det, dep in fds:
        args.append(F.lit(f"{det}->{dep}"))
        args.append(F.col(det).cast("string"))
        args.append(F.col(dep).cast("string"))
    stacked = df.select(
        F.stack(F.lit(k), *args).alias("fd", "det_val", "dep_val")
    )
    per_group = stacked.groupBy("fd", "det_val").agg(
        F.countDistinct("dep_val").alias("n_dep")
    )
    return (
        per_group.groupBy("fd")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.count_if(F.col("n_dep") > 1).alias("n_violating"),
        )
        .select(
            "fd",
            "n_groups",
            "n_violating",
            (F.col("n_violating") == 0).alias("holds"),
        )
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """Privacy-risk profile of a release candidate: k-anonymity (every
    quasi-identifier combination must describe ≥ k individuals — the
    smallest class IS the dataset's k) and l-diversity (a class where the
    sensitive attribute takes one value leaks it even at high k).

    One grouped aggregate to the equivalence-class relation, one reduction
    over it: at any scale the answer is two partial-agg shuffles, and only
    class-level counts leave the executors — never rows. Output is a
    single row: (n_rows, n_classes, k_anonymity, min_l_diversity,
    n_singleton_classes, n_low_diversity_classes)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct(F.col(sensitive_col)).alias("__l"),
    )
    return classes.agg(
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("__n").cast("bigint").alias("k_anonymity"),
        F.min("__l").cast("bigint").alias("min_l_diversity"),
        F.count_if(F.col("__n") == 1).alias("n_singleton_classes"),
        F.count_if(F.col("__l") == 1).alias("n_low_diversity_classes"),
    )
