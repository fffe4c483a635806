"""ML evaluation metrics as distributed one-pass plans.

The reference evaluates its models driver-side (scoring.py:10-52
computes RMSE on collected arrays; the CV loop in main_cuda.py:1389-
1401 prints per-fold metrics).  At 100 TB the scored table never fits
a driver, so the classic evaluation metrics must run as aggregation
plans: AUC from the Mann-Whitney rank-sum over a per-score histogram
(never a global sort of raw rows), calibration as fixed-width score
buckets, and PSI drift as two histograms joined on the bin key.

Determinism: AUC stays INTEGER until the single final division
(2U / 2·n_pos·n_neg — average-rank tie handling folded into the ×2
scaling), so it is bitwise-portable with no rounding at all; PSI's
per-bin ln() term is rounded to 6 decimals before the exact integer
sum (libm last-ulp rule); calibration rates are exact-int ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.io import table

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Exact AUC (Mann-Whitney U with average-rank ties) — "how well does
# `value` rank purchases above other events".  The fact table
# collapses to one row per DISTINCT score (pos/neg counts); the
# cumulative-negatives window runs over that histogram, which is
# |distinct scores|-sized, not |rows|-sized — the standard trick that
# makes exact AUC feasible at any scale.  2U = Σ_s pos_s·(2·neg_<s
# + neg_s) keeps tie handling integer; the one division at the end
# is exact-int / exact-int.
# --------------------------------------------------------------------------
@q(
    "q_auc",
    """
    WITH scored AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS score_c,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
        FROM events
    ), hist AS (
        SELECT score_c,
               SUM(label) AS pos,
               COUNT(*) - SUM(label) AS neg
        FROM scored GROUP BY score_c
    ), cum AS (
        SELECT score_c, pos, neg,
               COALESCE(SUM(neg) OVER (ORDER BY score_c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        FROM hist
    )
    SELECT SUM(pos) AS n_pos, SUM(neg) AS n_neg,
           CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)
             / (2 * SUM(pos) * SUM(neg)) AS auc
    FROM cum
    """,
)
def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    scored = ev.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("score_c"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    hist = scored.groupBy("score_c").agg(
        F.sum("label").alias("pos"),
        (F.count(F.lit(1)) - F.sum("label")).alias("neg"),
    )
    w = W.orderBy("score_c").rowsBetween(W.unboundedPreceding, -1)
    cum = hist.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("neg_below"),
    )
    u2 = F.sum(F.col("pos") * (2 * F.col("neg_below") + F.col("neg")))
    return cum.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        (u2.cast("double") / (2 * F.sum("pos") * F.sum("neg"))).alias("auc"),
    )


# --------------------------------------------------------------------------
# Calibration / reliability bins — fixed-width score deciles, each
# bin's mean predicted score vs observed positive rate.  One hash
# aggregation with map-side combine into ≤10 keys; every ratio is an
# exact-int division.
# --------------------------------------------------------------------------
@q(
    "q_calibration",
    """
    SELECT CAST(least(CAST(floor(value) AS BIGINT) // 10, 9) AS BIGINT) AS bin,
           COUNT(*) AS n,
           SUM(CAST(round(value * 100, 0) AS BIGINT)) / COUNT(*) / 100.0 AS mean_score,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS pos_rate
    FROM events
    GROUP BY 1
    """,
)
def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bin_ = F.least(
        F.expr("floor(value) div 10"), F.lit(9)
    ).cast("bigint")
    pos = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    return (
        ev.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
                / F.count(F.lit(1))
                / 100.0
            ).alias("mean_score"),
            F.sum(pos).cast("bigint").alias("n_pos"),
            (F.sum(pos).cast("double") / F.count(F.lit(1))).alias("pos_rate"),
        )
    )


# --------------------------------------------------------------------------
# Population stability index — score-distribution drift between the
# two deterministic hash splits, the production check that a serving
# population still looks like training.  Two histograms come out of
# ONE fact aggregation (conditional counts per bin); the PSI sum runs
# over ≤10 joined bins.  Each bin's (p−q)·ln(p/q) term is rounded to
# 6 decimals BEFORE the exact integer sum (the libm rule), so the
# total is order-independent and engine-portable.
# --------------------------------------------------------------------------
@q(
    "q_psi",
    """
    WITH bins AS (
        SELECT CAST(least(CAST(floor(value) AS BIGINT) // 10, 9) AS BIGINT) AS bin,
               SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
               SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1
        FROM events GROUP BY 1
    ), tot AS (
        SELECT SUM(n0) AS t0, SUM(n1) AS t1 FROM bins
    ), terms AS (
        SELECT bin,
               CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
               CAST(round((1.0 * n0 / t0 - 1.0 * n1 / t1)
                          * ln((1.0 * n0 / t0) / (1.0 * n1 / t1))
                          * 1000000, 0) AS BIGINT) AS term_micro
        FROM bins CROSS JOIN tot
        WHERE n0 > 0 AND n1 > 0
    )
    SELECT bin, n0, n1, term_micro / 1000000.0 AS psi_term
    FROM terms
    """,
)
def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bin_ = F.least(
        F.expr("floor(value) div 10"), F.lit(9)
    ).cast("bigint")
    bins = ev.groupBy(bin_.alias("bin")).agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("n1"),
    )
    tot = bins.agg(F.sum("n0").alias("t0"), F.sum("n1").alias("t1"))
    p = 1.0 * F.col("n0") / F.col("t0")
    qq = 1.0 * F.col("n1") / F.col("t1")
    return (
        bins.crossJoin(F.broadcast(tot))
        .filter((F.col("n0") > 0) & (F.col("n1") > 0))
        .select(
            "bin",
            F.col("n0").cast("bigint").alias("n0"),
            F.col("n1").cast("bigint").alias("n1"),
            (
                F.round((p - qq) * F.log(p / qq) * 1000000, 0).cast("bigint")
                / 1000000.0
            ).alias("psi_term"),
        )
    )
