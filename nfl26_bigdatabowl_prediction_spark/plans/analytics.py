"""Product-analytics suite over `events` — funnel conversion, cohort
retention, robust (MAD) outlier detection.  The classic engine
workloads a user of the reference's event tables runs daily; none
exist in the reference (pure trajectory ML), so these are engine
extensions under SURVEY §2.7b.

Scale design: every query is two-phase — a per-user (or per-group)
aggregation whose output is dimension-sized, then a join/agg over
that small side.  The fact table is scanned once and shuffles only
for its own keyed aggregation; no windows over the raw feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import table

QUERIES: dict = {}
ORACLES: dict = {}

DAY_US = 86400 * 10**6


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Funnel conversion — click → purchase ordered-sequence detection:
# for each user, the first click, whether a purchase follows it, and
# the time-to-convert.  Exact integer micros throughout.  Two hash
# aggregations + one dimension-sized join; the classic funnel over
# N stages repeats the same shape stage by stage.
# --------------------------------------------------------------------------
@q(
    "q_funnel",
    """
    WITH first_click AS (
        SELECT user_id, MIN(epoch_us(ts)) AS c_ts
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ), conv AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_ts
        FROM events e JOIN first_click f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= f.c_ts
        GROUP BY e.user_id
    )
    SELECT f.user_id, f.c_ts AS first_click_us,
           (p.p_ts IS NOT NULL) AS converted,
           p.p_ts - f.c_ts AS convert_us
    FROM first_click f LEFT JOIN conv p ON f.user_id = p.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(first_click), "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return first_click.join(F.broadcast(conv), "user_id", "left").select(
        "user_id",
        F.col("c_ts").alias("first_click_us"),
        F.col("p_ts").isNotNull().alias("converted"),
        (F.col("p_ts") - F.col("c_ts")).alias("convert_us"),
    )


# --------------------------------------------------------------------------
# Cohort retention — users grouped by their first active day; for
# each (cohort_day, day_offset) the count of distinct users active at
# that offset.  The cohort table is dimension-sized and broadcast
# back onto the fact scan; the distinct-count agg pre-dedups on
# (cohort, offset, user) so no Expand appears.
# --------------------------------------------------------------------------
@q(
    "q_retention",
    """
    WITH days AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events
    ), cohort AS (
        SELECT user_id, MIN(d) AS d0 FROM days GROUP BY user_id
    ), active AS (
        SELECT DISTINCT a.user_id, c.d0, a.d - c.d0 AS offset_d
        FROM days a JOIN cohort c ON a.user_id = c.user_id
    )
    SELECT d0 AS cohort_day, offset_d, COUNT(*) AS n_users
    FROM active GROUP BY d0, offset_d
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.select("user_id", F.expr(f"ts div {DAY_US}").alias("d"))
    cohort = days.groupBy("user_id").agg(F.min("d").alias("d0"))
    active = (
        days.join(F.broadcast(cohort), "user_id")
        .select("user_id", "d0", (F.col("d") - F.col("d0")).alias("offset_d"))
        .distinct()
    )
    return active.groupBy(
        F.col("d0").alias("cohort_day"), "offset_d"
    ).agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# Rolling 7-day distinct active users (trailing DAU) — the sliding
# COUNT DISTINCT that window functions cannot express (Spark forbids
# DISTINCT in a window frame).  Scale shape: dedup the fact feed to
# (user, day) pairs FIRST (the one fact shuffle; output is
# users x active-days, dimension-sized), then a x7 scan-side explode
# of that small set and a plain distinct-count per target day.  The
# observed-day gate is a broadcast semi join against the tiny
# distinct-day list — no scalar subquery, no NL join.
# --------------------------------------------------------------------------
@q(
    "q_rolling_dau",
    """
    WITH days AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
        FROM events
    ), contrib AS (
        SELECT u.user_id, u.d + t.off AS day
        FROM days u CROSS JOIN generate_series(0, 6) AS t(off)
    )
    SELECT c.day, COUNT(DISTINCT c.user_id) AS dau_7d
    FROM contrib c
    WHERE c.day IN (SELECT DISTINCT d FROM days)
    GROUP BY c.day
    """,
)
def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr(f"ts div {DAY_US}").alias("d")
    ).distinct()
    contrib = days.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.col("d") + F.lit(6))).alias("day"),
    )
    observed = days.select(F.col("d").alias("day")).distinct()
    return (
        contrib.join(F.broadcast(observed), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("dau_7d"))
    )


# --------------------------------------------------------------------------
# Gaps and islands — maximal runs of consecutive active days per
# user (the streak/churn-gap primitive).  Classic d - row_number()
# grouping constant; one fact shuffle to dedup (user, day), then the
# window and the final agg reuse that same hash distribution.
# --------------------------------------------------------------------------
@q(
    "q_gaps_islands",
    """
    WITH days AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
        FROM events
    ), isl AS (
        SELECT user_id, d,
               d - row_number() OVER (
                   PARTITION BY user_id ORDER BY d
               ) AS grp
        FROM days
    )
    SELECT user_id, MIN(d) AS start_day, MAX(d) AS end_day,
           COUNT(*) AS len_days
    FROM isl GROUP BY user_id, grp
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr(f"ts div {DAY_US}").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    return isl.groupBy("user_id", "grp").agg(
        F.min("d").alias("start_day"),
        F.max("d").alias("end_day"),
        F.count(F.lit(1)).alias("len_days"),
    ).select("user_id", "start_day", "end_day", "len_days")


# --------------------------------------------------------------------------
# MAD robust outliers — median absolute deviation per group, the
# robust complement to q_zscore_outliers (mean/std are pulled by the
# very outliers being hunted; medians are not).  Two exact-percentile
# aggregations (group median, then median of |x − med|), each a
# dimension-sized output broadcast back; flag = |x − med| > k·MAD.
# k = 10 (≈6.7σ under normality) so the flag set is small and stable;
# zero-MAD groups are excluded identically on both engines.  At
# 100 TB both medians swap to approx_percentile with the same shape.
# --------------------------------------------------------------------------
@q(
    "q_mad_outliers",
    """
    WITH med AS (
        SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
        FROM events GROUP BY event_type
    ), dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ), mad AS (
        SELECT event_type, round(quantile_cont(adev, 0.5), 4) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value, d.med, m.mad
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    WHERE m.mad > 0 AND d.adev > 10.0 * m.mad
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 4).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.col("adev") > 10.0 * F.col("mad")))
        .select("event_id", "event_type", "value", "med", "mad")
    )
