"""Corpus-filter queries: the published pretraining-data filter families the
cleaning pipeline (suites/text_dedup.py) composes, exposed as standalone
audited operators.

Three filters every large-scale LLM-data pipeline runs before tokenization:

1. ``text_gopher_rules`` — the Gopher document-quality rule set (Rae et al.
   2021, §A1.1) as per-rule drop accounting, complementing the repetition
   rules already in :mod:`..operators.text` (``repetition_metrics``) and the
   composite heuristic ``quality_score``. Named rules with per-rule failure
   counts are what a pipeline audit needs — a single score can't tell you
   WHICH gate is eating your corpus.
2. ``text_unigram_lm_score`` — CCNet-style LM commonness bucketing (Wenzek
   et al. 2019): score each document under a corpus-trained unigram model
   and split head/middle/tail. CCNet scores with a pretrained KenLM and
   offline-calibrated perplexity thresholds; this operator trains the
   unigram model in-query and keeps the scoring integer-exact (summed
   corpus counts, one final division) so the result value-hashes across
   engines — a real deployment swaps KenLM log-probs into the same column
   slot.
3. ``pipeline_epoch_shuffle`` — deterministic seeded global shuffle for
   training-data ordering: hash-ordered permutation per epoch, sharded so
   no global sort exists anywhere in the plan. The standard trick for
   reshuffling a 100 TB corpus between epochs without ever materializing a
   random permutation: order IS the hash.

Reference parity note: the reference engine (SequentialQuickInsert.c,
QuickInsertionHeap.c) has no text surface; this module is part of the
LLM-pipeline extension layer the north star mandates (BASELINE.json).

Scale shapes (audited in tests/test_corpus_filters.py plan gates):
- gopher rules: tokenize once in the scan stage, per-row flag arithmetic,
  ONE exchange for the per-source rollup. Zero joins.
- unigram LM: explode -> token-frequency agg (1 exchange) -> join back on
  token (the frequency relation is vocab-sized — broadcastable when the
  vocabulary fits, shuffle-join otherwise; Spark's AQE picks at runtime) ->
  per-doc agg (1 exchange) -> map-side threshold bucket -> tiny rollup.
  The corpus-total scalar is a broadcast 1-row reduction, not a shuffle.
- epoch shuffle: map-side md5 bucket + shard, then a window partitioned BY
  (epoch, shard) — parallelism = shard count, exactly the writer-side
  sortWithinPartitions shape; no single-partition window at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as T
from ..operators.sampling import bucket_sql, hash_bucket
from ..queries import query
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# 1. Gopher document-quality rules (Rae et al. 2021 §A1.1), word-level
#    subset. The line-based rules (bullet-start fraction, ellipsis-end
#    fraction) are omitted: the synthetic corpus is single-line, so they
#    are vacuous here — a real corpus plugs them into the same flag shape.
#    Published bounds kept verbatim, NOT tuned to the corpus: the point of
#    an audit query is to report what the published gate would do.
# ---------------------------------------------------------------------------

_G_WC_LO, _G_WC_HI = 50, 100_000  # word count in [50, 100k]
_G_MWL_LO, _G_MWL_HI = 3.0, 10.0  # mean word length in [3, 10]
_G_SYM_MAX = 0.1  # symbol-to-char ratio < 0.1 (adapted from #/… per word)
_G_STOP_MIN = 2  # at least 2 of the stopword list
_G_ALPHA_MIN = 0.8  # >= 80% of words contain an alphabetic character

_GOPHER_STOP_LIST = ", ".join(f"'{m}'" for m in T.STOPWORDS)

_GOPHER_ORACLE = f"""
WITH ann AS (
  SELECT source,
         regexp_extract_all(lower(text), '{T.TOKEN_RE}') AS toks,
         (CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
          / greatest(length(text), 1)) AS sym_ratio
  FROM documents
),
flags AS (
  SELECT source,
         len(toks) AS n_tok,
         (len(toks) BETWEEN {_G_WC_LO} AND {_G_WC_HI}) AS r_wc,
         (CAST(length(array_to_string(toks, '')) AS DOUBLE)
            / greatest(len(toks), 1) BETWEEN {_G_MWL_LO} AND {_G_MWL_HI}) AS r_mwl,
         (sym_ratio < {_G_SYM_MAX}) AS r_sym,
         (len(list_filter(toks, x -> x IN ({_GOPHER_STOP_LIST}))) >= {_G_STOP_MIN}) AS r_stop,
         (CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
            / greatest(len(toks), 1) >= {_G_ALPHA_MIN}) AS r_alpha
  FROM ann
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN r_wc AND r_mwl AND r_sym AND r_stop AND r_alpha THEN 1 END) AS BIGINT) AS n_pass,
       CAST(count(CASE WHEN NOT r_wc THEN 1 END) AS BIGINT) AS fail_word_count,
       CAST(count(CASE WHEN NOT r_mwl THEN 1 END) AS BIGINT) AS fail_mean_word_len,
       CAST(count(CASE WHEN NOT r_sym THEN 1 END) AS BIGINT) AS fail_symbol_ratio,
       CAST(count(CASE WHEN NOT r_stop THEN 1 END) AS BIGINT) AS fail_stopword,
       CAST(count(CASE WHEN NOT r_alpha THEN 1 END) AS BIGINT) AS fail_alpha,
       CAST(sum(CASE WHEN r_wc AND r_mwl AND r_sym AND r_stop AND r_alpha
                THEN n_tok END) AS BIGINT) AS kept_tokens
FROM flags GROUP BY source
"""


def gopher_flags(docs: DataFrame) -> DataFrame:
    """(source, n_tok, r_wc, r_mwl, r_sym, r_stop, r_alpha) over a
    (source, text) relation — the five published rules as boolean flags.
    Shared by the registered query AND the crafted-documents pytest, so
    the test exercises the exact expressions the query ships (a private
    copy would silently drift). Tokenize once per row in the first select
    (no codegen subexpression elimination reaches higher-order functions —
    same staging rationale as text.text_metrics), flags in the second."""
    t = F.col("text")
    sym_ratio = (
        F.length(F.regexp_replace(F.lower(t), "[a-z0-9 ]", "")).cast("double")
        / F.greatest(F.length(t), F.lit(1)).cast("double")
    )
    ann = docs.select("source", T.tokens(t).alias("toks"), sym_ratio.alias("sym_ratio"))
    toks = F.col("toks")
    n_tok = F.size(toks)
    denom = F.greatest(n_tok, F.lit(1)).cast("double")
    mwl = F.length(F.array_join(toks, "")).cast("double") / denom
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*T.STOPWORDS)))
    alpha_frac = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double") / denom
    return ann.select(
        "source",
        n_tok.alias("n_tok"),
        n_tok.between(_G_WC_LO, _G_WC_HI).alias("r_wc"),
        mwl.between(_G_MWL_LO, _G_MWL_HI).alias("r_mwl"),
        (F.col("sym_ratio") < _G_SYM_MAX).alias("r_sym"),
        (stop_hits >= _G_STOP_MIN).alias("r_stop"),
        (alpha_frac >= _G_ALPHA_MIN).alias("r_alpha"),
    )


@query("text_gopher_rules", sql=_GOPHER_ORACLE)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-rule audit (Rae et al. 2021 §A1.1): per source, how
    many documents pass ALL five word-level rules, the failure count of
    EACH rule independently (rules overlap — a doc can fail several), and
    the surviving token budget. Bounds are the published ones, not tuned.

    Scale shape: tokenize once per row in the scan stage, per-row flag
    arithmetic (whole-stage codegen, zero joins), ONE exchange for the
    per-source rollup. Identical flag expressions on the DuckDB side, so
    every boundary comparison (mean word length exactly 3.0, …) lands the
    same way in both engines — the inputs to each comparison are the same
    two IEEE doubles produced by the same two exact integer operands."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    flags = gopher_flags(docs)
    all_pass = (
        F.col("r_wc") & F.col("r_mwl") & F.col("r_sym") & F.col("r_stop") & F.col("r_alpha")
    )

    def fails(rule: str) -> Column:
        return F.count(F.when(~F.col(rule), F.lit(1)))

    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(all_pass, F.lit(1))).alias("n_pass"),
        fails("r_wc").alias("fail_word_count"),
        fails("r_mwl").alias("fail_mean_word_len"),
        fails("r_sym").alias("fail_symbol_ratio"),
        fails("r_stop").alias("fail_stopword"),
        fails("r_alpha").alias("fail_alpha"),
        F.sum(F.when(all_pass, F.col("n_tok"))).alias("kept_tokens"),
    )


# ---------------------------------------------------------------------------
# 2. CCNet-style unigram-LM commonness bucketing (Wenzek et al. 2019).
#    Score = mean corpus probability of the document's token occurrences,
#    computed integer-exactly: sum the (BIGINT) corpus counts of every
#    occurrence, then divide ONCE by n_tok and ONCE by the corpus total —
#    two IEEE divisions on exact integer operands, so both engines produce
#    the bit-identical double and the head/middle/tail threshold
#    comparisons can't diverge. (A float-per-token sum would be shuffle-
#    order-dependent; ln()/KenLM log-probs are libm-implementation-defined
#    — both are deliberately avoided for the hash-checked form.)
#    Thresholds are fixed constants in the query text, the way CCNet ships
#    offline-calibrated per-language perplexity cutoffs — NOT computed from
#    the data at query time, so the bucketing is a map-side CASE, not a
#    global sort.
# ---------------------------------------------------------------------------

# Offline-calibrated cutoffs, the way CCNet ships per-language perplexity
# thresholds: measured once against the corpus family's score distribution
# (tertiles sit at ~0.03326/0.03335 across sf0.001–sf0.1 with full range
# 0.028–0.034 — the synthetic vocabulary is small, so scores concentrate)
# and pinned as constants so the bucketing stays a map-side CASE.
_LM_HEAD = 0.0334  # mean token probability >= head cut -> 'head'
_LM_MIDDLE = 0.0332  # >= middle cut -> 'middle', else 'tail'

_UNIGRAM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{T.TOKEN_RE}')) AS tok
  FROM documents
),
freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY tok),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok),
doc AS (
  SELECT t.doc_id, CAST(sum(f.cnt) AS BIGINT) AS sum_cnt,
         CAST(count(*) AS BIGINT) AS n_tok
  FROM tok t JOIN freq f USING (tok) GROUP BY t.doc_id
),
scored AS (
  SELECT d.doc_id, d.n_tok,
         CAST(d.sum_cnt AS DOUBLE) / CAST(d.n_tok AS DOUBLE)
           / CAST(tot.total AS DOUBLE) AS mean_p
  FROM doc d CROSS JOIN tot
),
bucketed AS (
  SELECT s.doc_id, s.n_tok, s.mean_p, dd.source,
         CASE WHEN s.mean_p >= {_LM_HEAD} THEN 'head'
              WHEN s.mean_p >= {_LM_MIDDLE} THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM scored s JOIN documents dd USING (doc_id)
)
SELECT source, bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(floor(min(mean_p) * 1e9) AS BIGINT) AS min_mean_p_e9,
       CAST(floor(max(mean_p) * 1e9) AS BIGINT) AS max_mean_p_e9
FROM bucketed GROUP BY source, bucket
"""


@query("text_unigram_lm_score", sql=_UNIGRAM_ORACLE)
def text_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM bucketing: train a unigram model on the corpus itself
    (token -> corpus count), score each document by the mean corpus
    probability of its token occurrences, and bucket head/middle/tail at
    fixed thresholds (the offline-calibrated-cutoff shape CCNet uses).
    Per (source, bucket): doc count, token budget, score bounds.

    Scale shape: explode -> token-frequency hash-agg (1 exchange; the
    result is vocab-sized) -> join occurrences back on token (vocab fits
    in memory at word level for most corpora — AQE broadcasts it; at a
    degenerate vocab it's a plain equi-join) -> per-doc agg (1 exchange)
    -> map-side CASE bucket -> equi-join to recover source (corpus-
    cardinality, so NO broadcast hint — AQE decides) -> tiny rollup. The
    corpus-total is a broadcast 1-row reduction. NO global sort/window
    anywhere — that is the point of fixed thresholds vs in-query
    tertiles."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    # The token relation is consumed three times (frequency agg, corpus
    # total, occurrence join) — pin it once or the explode re-tokenizes
    # per consumer (the r09 unpinned-lazy-relation perf class, 749ac3d).
    # On a cluster prefer .checkpoint() with a checkpoint dir for
    # executor-loss resilience; localCheckpoint is the single-node form.
    tok = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    ).localCheckpoint(eager=True)
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    doc = (
        tok.join(freq, "tok")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("sum_cnt"), F.count(F.lit(1)).alias("n_tok"))
    )
    scored = doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tok",
        (
            F.col("sum_cnt").cast("double")
            / F.col("n_tok").cast("double")
            / F.col("total").cast("double")
        ).alias("mean_p"),
    )
    # plain equi-join (NOT a broadcast hint): the source relation is
    # corpus-cardinality — one row per document — so a forced broadcast
    # would collect the whole projection to the driver at scale; AQE
    # picks broadcast at small SF on its own.
    bucketed = scored.join(docs.select("doc_id", "source"), "doc_id").select(
        "source",
        "n_tok",
        "mean_p",
        F.when(F.col("mean_p") >= _LM_HEAD, F.lit("head"))
        .when(F.col("mean_p") >= _LM_MIDDLE, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    # Score bounds as scaled BIGINT (floor(mean_p·1e9), identical double
    # multiply on both engines) instead of round(…, 9) doubles: the hashed
    # columns stay integer-only, removing the one float-comparison seam
    # this suite had (ADVICE r10 — Spark's BigDecimal HALF_UP round vs
    # DuckDB's multiply/round/divide could diverge 1 ulp at a near-tie).
    return bucketed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.floor(F.min("mean_p") * F.lit(1e9)).cast("long").alias("min_mean_p_e9"),
        F.floor(F.max("mean_p") * F.lit(1e9)).cast("long").alias("max_mean_p_e9"),
    )


# ---------------------------------------------------------------------------
# 3. Deterministic epoch shuffle: the between-epochs reshuffle of a training
#    corpus as a pure hash ordering. Each epoch salts the md5 coin
#    differently, so epochs are independent permutations; within an epoch,
#    shard = bucket % N and position = rank within the shard by (bucket,
#    doc_id). No randomness, no global sort: the window is partitioned by
#    shard, so parallelism equals shard count — at 100 TB you set shards to
#    the number of output files and this IS the writer-side
#    sortWithinPartitions. Reuses the same md5-bucket device as every
#    sampling operator (operators/sampling.py hash_bucket/bucket_sql), so
#    the oracle is generated from the same constants.
# ---------------------------------------------------------------------------

_SHUFFLE_SHARDS = 8
_SHUFFLE_EPOCHS = (0, 1)


def _epoch_shuffle_oracle() -> str:
    branches = "\nUNION ALL\n".join(
        f"SELECT {e} AS epoch, doc_id, {bucket_sql('doc_id', salt=f'epoch{e}')} AS bucket"
        " FROM documents"
        for e in _SHUFFLE_EPOCHS
    )
    return f"""
WITH b AS ({branches})
SELECT CAST(epoch AS INTEGER) AS epoch, doc_id,
       CAST(bucket % {_SHUFFLE_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY epoch, bucket % {_SHUFFLE_SHARDS}
         ORDER BY bucket, doc_id
       ) AS BIGINT) AS pos
FROM b
"""


@query("pipeline_epoch_shuffle", sql=_epoch_shuffle_oracle())
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic training-order shuffle, two epochs: per (epoch,
    doc) emit the shard it lands in and its position within the shard.
    Epoch e orders by md5(doc_id || 'epoch<e>') — a different permutation
    every epoch, reproducible from the salt alone, no stored permutation
    and no true random state. Full tiebreak (bucket, doc_id) keeps the
    rank collision-proof.

    Scale shape: map-side hash + shard, then ONE window partitioned by
    (epoch, shard) — each shard sorts independently (the writer-side
    sortWithinPartitions shape); shard count is the parallelism knob.
    Nothing global anywhere in the plan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    per_epoch = [
        docs.select(
            F.lit(e).cast("int").alias("epoch"),
            "doc_id",
            hash_bucket(F.col("doc_id"), salt=f"epoch{e}").alias("bucket"),
        )
        for e in _SHUFFLE_EPOCHS
    ]
    b = per_epoch[0]
    for other in per_epoch[1:]:
        b = b.unionByName(other)
    shard = (F.col("bucket") % _SHUFFLE_SHARDS).cast("bigint")
    w = Window.partitionBy("epoch", "shard").orderBy("bucket", "doc_id")
    return (
        b.select("epoch", "doc_id", shard.alias("shard"), "bucket")
        .select(
            "epoch",
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )
