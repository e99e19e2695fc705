"""BM25 keyword search over a document corpus (extension layer, SURVEY
§2c): the classic Okapi BM25 ranking function, expressed so the full
computation — term frequencies, document frequencies, idf, length
normalization, final ranking — is pure DataFrame algebra AND replayable as
ANSI SQL for the oracle.

Scale shape: the query's term list is tiny and literal, so per-document
term frequencies are per-row array arithmetic (``size(filter(tokens …))``)
— NO explode, NO (doc, term) shuffle. Corpus statistics (N, avgdl, per-term
document frequency) reduce to ONE row in a single aggregation pass and
re-enter the plan as a broadcast nested-loop join of a 1-row relation
(constant cost). The only ordered operation is the final top-k —
``TakeOrderedAndProject``, per-partition heaps, zero exchanges.

Determinism: scores involve ``ln`` — engines may differ in the last ulp —
so scores are rounded (default 9 dp) BEFORE ranking and the ordering key is
(rounded score desc, doc_id): both engines rank identical keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_RE, tokens


def _tf(toks, term: str):
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 9,
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 score for the bag-of-words query
    ``terms``. Output: (id_col, score, rank), rank 1-based dense by
    (score desc, id asc); zero-score documents never rank."""
    toks = tokens(F.col(text_col))
    per_doc = docs.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("__dl"),
        *[_tf(toks, t).cast("double").alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        (F.sum("__dl") / F.count(F.lit(1))).alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("int")).cast("double").alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    j = per_doc.join(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            (F.col("__n") - F.col(f"__df_{i}") + 0.5) / (F.col(f"__df_{i}") + 0.5) + 1.0
        )
        tf = F.col(f"__tf_{i}")
        part = idf * (
            tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
        )
        score = part if score is None else score + part
    scored = j.select(
        id_col, F.round(score, round_digits).alias("score")
    ).where(F.col("score") > 0)
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.select(id_col, "score", F.row_number().over(w).cast("bigint").alias("rank"))


def bm25_topk_sql(
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    round_digits: int = 9,
) -> str:
    """DuckDB SQL replaying :func:`bm25_topk` exactly."""
    toks = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
    tf_cols = ", ".join(
        f"CAST(len(list_filter({toks}, t -> t = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(terms))
    )
    parts = " + ".join(
        f"(ln((s.n - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0)"
        f" * (d.tf_{i} * ({k1} + 1.0)"
        f" / (d.tf_{i} + {k1} * (1.0 - {b} + {b} * d.dl / s.avgdl))))"
        for i in range(len(terms))
    )
    return f"""
WITH per_doc AS (
  SELECT doc_id, CAST(len({toks}) AS DOUBLE) AS dl, {tf_cols} FROM {table}
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) / count(*) AS avgdl, {df_cols}
  FROM per_doc
),
scored AS (
  SELECT d.doc_id, round({parts}, {round_digits}) AS score
  FROM per_doc d CROSS JOIN stats s
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT {k}
"""


def phrase_match(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search via positional postings (r08) — the retrieval
    capability BM25's bag-of-words scoring cannot express: count every
    occurrence of the EXACT token sequence ``phrase`` per document.
    Output: (id, n_matches), matching docs only.

    Plan: one positional posting relation (term, id, pos) from a single
    posexplode — then a k-way self-join chained on (same doc, pos+i)
    with each leg FILTERED to its query term before joining, so only the
    query terms' posting lists (corpus-frequency-sized, not corpus-
    sized) ever reach an exchange. That is the inverted-index query
    topology: at 100 TB the postings relation is the precomputed index
    (write it bucketed by term), and a phrase query touches |terms|
    posting lists — never the corpus. Token positions are identical to
    the oracle's generate_subscripts (1-based)."""
    terms = [t for t in phrase.lower().split(" ") if t]
    if not terms:
        raise ValueError("empty phrase")
    toks = F.split(F.lower(F.col(text_col)), " ")
    postings = docs.select(
        F.col(id_col),
        F.posexplode(toks).alias("__p0", "__t"),
    ).select(
        id_col,
        (F.col("__p0") + 1).cast("long").alias("pos"),
        F.col("__t").alias("term"),
    )
    legs = None
    for i, t in enumerate(terms):
        # each leg normalizes its position to the phrase START, so every
        # join is a plain equi-join on (id, start)
        leg = postings.where(F.col("term") == t).select(
            F.col(id_col), (F.col("pos") - i).alias("__start")
        )
        legs = leg if legs is None else legs.join(leg, [id_col, "__start"])
    return (
        legs.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


def phrase_match_sql(phrase: str, table: str = "documents") -> str:
    """DuckDB mirror of :func:`phrase_match` (generated, same
    tokenization and 1-based positions)."""
    terms = [t for t in phrase.lower().split(" ") if t]
    joins = []
    conds = ["a0.term = '" + terms[0] + "'"]
    for i in range(1, len(terms)):
        joins.append(
            f"JOIN tok a{i} ON a{i}.doc_id = a0.doc_id "
            f"AND a{i}.pos = a0.pos + {i} AND a{i}.term = '{terms[i]}'"
        )
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS term,
         CAST(generate_subscripts(string_split(lower(text), ' '), 1) AS BIGINT) AS pos
  FROM {table}
)
SELECT a0.doc_id, count(*) AS n_matches
FROM tok a0
{' '.join(joins)}
WHERE {' AND '.join(conds)}
GROUP BY a0.doc_id
"""


def rrf_fuse(
    legs: dict[str, DataFrame],
    k_rrf: int = 60,
    id_col: str = "doc_id",
    round_digits: int = 9,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) — the standard
    hybrid-retrieval combiner: each retrieval leg contributes
    ``1/(k_rrf + rank)`` for the documents it ranked, absent docs
    contribute 0, and the fused list is re-ranked by the summed score.
    ``legs`` maps a leg name to its ranked list (``id_col``, ``rank``);
    output is (id_col, {name}_rank…, rrf_score, fused_rank) over the UNION
    of the legs' candidates.

    Scale shape: every leg is already a top-k relation (queries × k rows —
    kilobytes at any corpus size), so the fusion is a chain of full outer
    joins between tiny lists followed by a single-partition window over
    ≤ Σk rows. The corpus-scale work lives in the legs (BM25's one-pass
    stats + TakeOrderedAndProject, ANN's bucketed probe); fusion itself is
    constant cost — exactly how a 100 TB serving tier composes lexical and
    dense retrieval.

    Determinism: ranks are integers, so ``1.0/(k_rrf + rank)`` is the same
    double in any engine; contributions are summed in the legs' dict order
    (mirrored by the generated oracle), rounded, then tie-broken by id."""
    names = list(legs)
    fused = None
    for name, df in legs.items():
        leg = df.select(F.col(id_col), F.col("rank").cast("bigint").alias(f"{name}_rank"))
        fused = leg if fused is None else fused.join(leg, [id_col], "full")
    score = None
    for name in names:
        part = F.coalesce(
            F.lit(1.0) / (F.lit(k_rrf) + F.col(f"{name}_rank")), F.lit(0.0)
        )
        score = part if score is None else score + part
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return (
        fused.select(
            id_col,
            *[f"{n}_rank" for n in names],
            F.round(score, round_digits).alias("rrf_score"),
        )
        .withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
    )


def rrf_fuse_sql(
    leg_sqls: dict[str, str],
    k_rrf: int = 60,
    id_col: str = "doc_id",
    round_digits: int = 9,
) -> str:
    """DuckDB mirror of :func:`rrf_fuse` (generated: same leg order, same
    summation order, same rounding and tie-break). Each value of
    ``leg_sqls`` must be a self-contained SELECT producing
    (``id_col``, rank)."""
    names = list(leg_sqls)
    ctes = ",\n".join(
        f"{name} AS (SELECT {id_col}, CAST(rank AS BIGINT) AS rank FROM ({sql}))"
        for name, sql in leg_sqls.items()
    )
    ids = " UNION ".join(f"SELECT {id_col} FROM {n}" for n in names)
    rank_cols = ", ".join(f"{n}.rank AS {n}_rank" for n in names)
    score = " + ".join(
        f"COALESCE(CAST(1 AS DOUBLE) / ({k_rrf} + {n}.rank), CAST(0 AS DOUBLE))"
        for n in names
    )
    joins = " ".join(f"LEFT JOIN {n} ON {n}.{id_col} = i.{id_col}" for n in names)
    return f"""
WITH {ctes},
ids AS ({ids}),
fused AS (
  SELECT i.{id_col}, {rank_cols}, round({score}, {round_digits}) AS rrf_score
  FROM ids i {joins}
)
SELECT {id_col}, {', '.join(f'{n}_rank' for n in names)}, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, {id_col}) AS BIGINT)
         AS fused_rank
FROM fused
"""


def tfidf_top_terms(
    docs: DataFrame,
    top: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 9,
) -> DataFrame:
    """Per-document keyword extraction: the ``top`` terms by smoothed
    TF-IDF (idf = ln((N+1)/(df+1)) + 1, the sklearn smoothing — never
    divides by zero, never goes negative). Output:
    (id, term, tf, score, rnk), ties broken by term ascending.

    Scale shape: ONE corpus-sized explode into (doc, term) with map-side
    partial counts, a term-sized df aggregation re-entering broadcast, and
    a per-doc window top-k — the inverted-index build cost, paid once.
    Scores are rounded before ranking so both engines rank identical keys
    (the BM25 ln-rounding doctrine, search.py header)."""
    from .text import tokens

    dt = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    df_counts = dt.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    scored = (
        dt.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0)) + 1.0),
                round_digits,
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= top)
        .select(id_col, "term", "tf", "score", "rnk")
    )


def tfidf_top_terms_sql(
    top: int = 3, table: str = "documents", round_digits: int = 9
) -> str:
    """DuckDB mirror of :func:`tfidf_top_terms` (generated: same tokenizer,
    smoothing, rounding, ties)."""
    toks = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
    return f"""
WITH dt AS (
  SELECT doc_id, unnest({toks}) AS term FROM {table}
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM dt GROUP BY 1, 2
),
dfc AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {table}),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         round(t.tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1.0), {round_digits})
           AS score
  FROM tf t JOIN dfc d ON d.term = t.term CROSS JOIN n
)
SELECT doc_id, term, tf, score, rnk FROM (
  SELECT doc_id, term, tf, score,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term
         ) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= {top}
"""
