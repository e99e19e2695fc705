"""Headline queries for the deterministic sampling/split operators
(operators/sampling.py), oracle-checked ROW BY ROW: the DuckDB SQL is
generated from the same hash constants and thresholds, so every individual
coin flip — not just aggregate counts — must match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sampling
from ..queries import query
from ..sources.tables import load_table

_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}

_SPLIT_ORACLE = f"""
SELECT doc_id,
       lang,
       {sampling.bucket_sql("doc_id", salt="split")} AS bucket,
       {sampling.split_case_sql("doc_id", _SPLITS, salt="split")} AS split
FROM documents
"""


@query("sample_train_split", sql=_SPLIT_ORACLE)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment of every document by content-hash
    bucket — reproducible across engines, partitionings, and corpus growth
    (a doc's split never changes as the lake grows). Narrow projection,
    zero shuffles."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = sampling.hash_split(docs, "doc_id", _SPLITS, salt="split", keep_bucket=True)
    return out.select("doc_id", "lang", "bucket", "split")


# Rebalance the corpus: hash-downsample dominant English hard, carry the
# mid-size languages at half rate, keep all of low-resource French.
_FRACTIONS = {"en": 0.25, "zh": 0.5, "es": 0.5, "de": 0.5, "fr": 1.0}

_STRATIFIED_ORACLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {sampling.bucket_sql("doc_id", salt="sample")}
      < {sampling.stratified_threshold_sql("lang", _FRACTIONS)}
"""


@query("sample_stratified_langs", sql=_STRATIFIED_ORACLE)
def sample_stratified_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsample by language (the corpus-rebalance
    step of a training pipeline). Pure filter — no shuffle, monotone in the
    fractions — with per-row membership oracle-checked."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.stratified_hash_sample(
        docs, "doc_id", "lang", _FRACTIONS, salt="sample"
    )


_PACK_BUDGET = 512
_PACK_BINS = 8

_PACK_BIN_EXPR, _PACK_EXPR = sampling.pack_sql(
    "n_tokens", _PACK_BUDGET, "doc_id", n_bins=_PACK_BINS, salt="pack"
)


def _pack_oracle() -> str:
    from ..operators.text import TOKEN_RE

    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT) AS n_tokens,
         {_PACK_BIN_EXPR} AS bin
  FROM documents
),
p AS (
  SELECT bin, n_tokens, CAST(({_PACK_EXPR}) AS BIGINT) AS pack FROM t
)
SELECT bin, pack,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       CAST(max(n_tokens) AS BIGINT) AS largest_doc
FROM p
GROUP BY bin, pack
"""


@query("pipeline_pack_sequences", sql=_pack_oracle())
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: bucket documents into 8 hash-bins, order each bin
    first-fit-decreasing by token count, segment the running token total
    into 512-token packs — the shard-construction step of a training
    pipeline, per-pack totals oracle-checked (a pack never exceeds budget
    + its largest doc; tested)."""
    from ..operators import text as T

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    packed = sampling.pack_greedy_bins(
        docs, "n_tokens", _PACK_BUDGET, "doc_id", n_bins=_PACK_BINS, salt="pack"
    )
    return packed.groupBy("bin", "pack").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.max("n_tokens").alias("largest_doc"),
    )


# ---------------------------------------------------------------------------
# Data-mixture sampling: target shares of a global token budget per language
# (en is dominant in the corpus but gets a capped share; low-resource fr
# gets an outsized share, so min(1, ·) saturates — both regimes exercised).
# ---------------------------------------------------------------------------

_MIX_SHARES = {"en": 0.30, "zh": 0.15, "es": 0.15, "de": 0.10, "fr": 0.30}
_MIX_BUDGET = 0.6  # keep ~60% of total corpus weight

_MIXTURE_ORACLE = f"""
WITH tot AS (
  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS __L
  FROM documents GROUP BY lang
),
tt AS (SELECT CAST(sum(n_chars) AS BIGINT) AS __T FROM documents),
thr AS (
  SELECT lang, {sampling.mixture_threshold_sql("lang", _MIX_SHARES, _MIX_BUDGET)} AS thr
  FROM tot, tt
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN thr ON d.lang = thr.lang
WHERE {sampling.bucket_sql("d.doc_id", salt="mix")} < thr.thr
"""


@query("sample_mixture_tokens", sql=_MIXTURE_ORACLE)
def sample_mixture_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data-mixture sampling: per-language keep-fractions are
    DERIVED FROM THE DATA (f_g = min(1, share_g · budget / L_g) over exact
    BIGINT weight totals), then applied as deterministic hash-coin filters.
    Row-by-row oracle-checked, including the saturated min(1,·) branch.
    Plan: two broadcast-size pre-aggs; the documents scan itself is filtered
    map-side, never shuffled."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.mixture_sample(
        docs, "doc_id", "lang", "n_chars", _MIX_SHARES, _MIX_BUDGET, salt="mix"
    )


_RESERVOIR_K, _RESERVOIR_SALT = 50, "rsv5"

_RESERVOIR_ORACLE = f"""
WITH coined AS (
  SELECT doc_id, lang, source,
         {sampling.coin_sql("doc_id", _RESERVOIR_SALT)} AS __coin
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang ORDER BY __coin, doc_id) AS rnk
  FROM coined
)
SELECT doc_id, lang, source, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_RESERVOIR_K}
"""


@query("sample_group_reservoir", sql=_RESERVOIR_ORACLE)
def sample_group_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language 'reservoir': exactly min(50, group size)
    docs per lang, the ones with the smallest md5 coin — stable across
    runs, engines, partitionings, and corpus growth order, unlike a true
    random reservoir. Two-phase skew-proof ranking (shard by coin mod 16,
    keep k per shard, exact re-rank of the bounded survivors); the oracle
    is the single plain window the two-phase form must equal."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    out = sampling.group_reservoir(
        docs, ["lang"], "doc_id", _RESERVOIR_K, salt=_RESERVOIR_SALT, n_salts=16
    )
    return out.select(
        "doc_id", "lang", "source", F.col("rnk").cast("bigint").alias("rnk")
    )


_WS_K = 50
_WS_ORACLE = sampling.weighted_sample_sql(
    table="documents",
    key_expr="doc_id",
    weight_expr="n_chars // 100",
    k=_WS_K,
    payload_cols="n_chars, lang",
)


@query("sample_weighted_topk", sql=_WS_ORACLE)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis, integer-
    exact): 50 documents drawn with probability proportional to their
    length class (n_chars div 100, clamped to >= 1) — the curation op
    "sample favoring long documents, reproducibly". Selection keys are
    max-of-w md5 coins (bigint end to end), the top-k plans as
    TakeOrderedAndProject, and the oracle replays the identical draw."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    return sampling.weighted_sample(
        docs, key_col="doc_id", weight_col=F.expr("n_chars div 100"), k=_WS_K
    )
