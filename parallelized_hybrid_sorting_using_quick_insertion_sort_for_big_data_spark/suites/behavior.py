"""Behavioral analytics queries over `events`: ordered-step funnel (per-user
cascade + conversion table) and cohort retention matrix (SURVEY §2c
extension layer). Oracles replay the same cascade/cohort semantics in pure
SQL (cascading min CTEs / cohort joins) — the Spark side is the one-shuffle
fold, the oracle is the k-join reference form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import behavior as B
from ..queries import query
from ..sources.tables import load_table

_STEPS = ("view", "click", "purchase")

# Cascading-min CTEs shared by the per-user and the conversion-table oracle.
# t_i = earliest step-i event STRICTLY after t_{i-1} — identical to the
# fold's strict-> condition (see operators/behavior.py docstring).
_FUNNEL_CTES = """
su AS (SELECT DISTINCT user_id FROM events
       WHERE event_type IN ('view', 'click', 'purchase')),
s1 AS (SELECT user_id, min(ts) AS t1 FROM events
       WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
per_user AS (
  SELECT su.user_id, s1.t1 AS step1_ts, s2.t2 AS step2_ts, s3.t3 AS step3_ts,
         CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                   WHEN s2.t2 IS NOT NULL THEN 2
                   WHEN s1.t1 IS NOT NULL THEN 1
                   ELSE 0 END AS INT) AS steps_completed
  FROM su
  LEFT JOIN s1 USING (user_id)
  LEFT JOIN s2 USING (user_id)
  LEFT JOIN s3 USING (user_id)
)
"""

_FUNNEL_ORACLE = f"WITH {_FUNNEL_CTES} SELECT * FROM per_user"


@query("events_funnel", sql=_FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user view→click→purchase cascade-earliest funnel. Spark computes
    it in ONE shuffle (groupBy user + sorted-struct fold); the oracle is the
    k-join cascading-min reference form — identical semantics."""
    return B.funnel(load_table(spark, sf_dir, "events"), _STEPS)


_FUNNEL_COUNTS_ORACLE = f"""
WITH {_FUNNEL_CTES},
counts AS (
  SELECT
    CAST(sum(CASE WHEN steps_completed >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN steps_completed >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN steps_completed >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM per_user
)
SELECT 1 AS step, n1 AS n_users,
       CAST(round(1.0, 9) AS DOUBLE) AS conversion_from_prev FROM counts
UNION ALL
SELECT 2, n2, CAST(round(CAST(n2 AS DOUBLE) / nullif(n1, 0), 9) AS DOUBLE)
FROM counts
UNION ALL
SELECT 3, n3, CAST(round(CAST(n3 AS DOUBLE) / nullif(n2, 0), 9) AS DOUBLE)
FROM counts
"""


@query("events_funnel_counts", sql=_FUNNEL_COUNTS_ORACLE)
def events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-conversion table (3 rows) collapsed from the per-user funnel —
    partial-aggregated single pass, k-row output."""
    per_user = B.funnel(load_table(spark, sf_dir, "events"), _STEPS)
    return B.funnel_counts(per_user, len(_STEPS))


_RETENTION_ORACLE = """
WITH cohort AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_d FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT c.cohort_d,
         date_diff('day', c.cohort_d, CAST(e.ts AS DATE)) AS day_offset,
         e.user_id
  FROM events e JOIN cohort c ON e.user_id = c.user_id
),
matrix AS (
  SELECT cohort_d, day_offset, count(*) AS n_active
  FROM active GROUP BY 1, 2
),
sized AS (
  SELECT *, max(CASE WHEN day_offset = 0 THEN n_active END)
              OVER (PARTITION BY cohort_d) AS cohort_size
  FROM matrix
)
SELECT CAST(cohort_d AS TIMESTAMP) AS cohort_date,
       CAST(day_offset AS INT) AS day_offset,
       n_active,
       cohort_size,
       round(CAST(n_active AS DOUBLE) / cohort_size, 9) AS retention_frac
FROM sized
"""


@query("events_cohort_retention", sql=_RETENTION_ORACLE)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: first-seen-date cohorts × day offsets with
    distinct-active counts and retention fractions. cohort_date emitted as
    TIMESTAMP on both sides so engine dtypes agree."""
    return B.cohort_retention(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Event-path transition matrix: per-user event bigrams (lead over the
# user-time window) -> Markov transition counts + row-normalized
# probabilities. One shuffle by user serves the sequencing; the matrix agg
# is |types|^2 rows. Ties on (user, ts) are broken by event_id so both
# engines sequence identically.
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n_transitions
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
tot AS (
  SELECT *, sum(n_transitions) OVER (PARTITION BY from_type) AS from_total
  FROM pairs
)
SELECT from_type, to_type, n_transitions,
       round(CAST(n_transitions AS DOUBLE) / from_total, 9) AS p_transition
FROM tot
"""


@query("events_transition_matrix", sql=_TRANSITION_ORACLE)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event paths: lead() bigrams on
    the (user, ts, event_id) ordering, counted and row-normalized. The
    event stream shuffles ONCE (by user for the window); the |types|² matrix
    and its normalizing window are negligible."""
    from pyspark.sql import Window as _W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_from = _W.partitionBy("from_type")
    return pairs.withColumn(
        "from_total", F.sum("n_transitions").over(w_from)
    ).select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("from_total"), 9).alias(
            "p_transition"
        ),
    )
