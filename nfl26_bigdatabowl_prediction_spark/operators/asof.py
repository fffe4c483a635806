"""General as-of join — the temporal operator Spark lacks natively.

The reference's as-of is degenerate (every future frame pairs with
the LAST input frame, main_cuda.py:404-431 — see plans/trajectory.py
q_asof).  This is the full generalization (pandas ``merge_asof``
semantics): for each left row, the most recent right row with
``right.ts <= left.ts`` within the same ``by`` keys, optionally
bounded by a tolerance.

Spark-first physical strategy — union + ordered window fill:

  1. tag right rows 0 and left rows 1, union them on (by, ts, tag);
  2. one window per `by` ordered by (ts, tag, right-tiebreaker):
     ``last(payload, ignorenulls=True)`` over the unbounded-preceding
     frame carries the latest right payload forward to each left row;
  3. keep the tagged-left rows.

Cost: ONE shuffle on the `by` keys — same price as a plain grouped
window, no range-condition join (which Spark would execute as a
broadcast nested loop or a cartesian-within-key explosion).  The
right-before-left tag order at equal ts makes the join
exact-match-inclusive, like merge_asof's allow_exact_matches=True.

Determinism: multiple right rows on the same (by, ts) are resolved
by the ordering tiebreaker (last one wins); pass ``dedup_right=True``
to keep only the max-tiebreaker row per (by, ts) — which is also what
makes the DuckDB ASOF JOIN oracle well-defined (q_asof_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_asof",
    dedup_right: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """As-of join; returns all left rows + right payload columns
    renamed ``<col><suffix>`` (NULL when no match, or when the match
    violates ``tolerance_us``).  ``direction='backward'`` (default)
    matches the most recent right row with right.ts <= left.ts;
    ``'forward'`` matches the earliest right row with
    right.ts >= left.ts (both exact-match-inclusive);
    ``'nearest'`` the temporally closest of the two, ties to the
    backward match (pandas merge_asof direction='nearest' with its
    prior-row tie preference) — composed from one backward and one
    forward pass, the forward pass running on the DISTINCT left
    (by, on) keys (the match is a function of those keys alone, so
    duplicate left rows join the same payload back exactly once)."""
    assert direction in ("backward", "forward", "nearest"), direction
    by = by or ["user_id"]
    if direction == "nearest":
        kw = dict(
            on=on, by=by, right_cols=right_cols, tiebreak=tiebreak,
            tolerance_us=tolerance_us, dedup_right=dedup_right,
        )
        b = asof_join(left, right, suffix=suffix, direction="backward", **kw)
        lk = left.select(*by, on).distinct()
        f = asof_join(lk, right, suffix="__f", direction="forward", **kw)
        j = b.join(f, [*by, on])
        cols = (right_cols or [
            c for c in right.columns if c not in set(by) | {on}
        ]) + [on]
        pick_b = F.col(f"{on}{suffix}").isNotNull() & (
            F.col(f"{on}__f").isNull()
            | (F.col(on) - F.col(f"{on}{suffix}")
               <= F.col(f"{on}__f") - F.col(on))
        )
        for c in cols:
            j = j.withColumn(
                f"{c}{suffix}",
                F.when(pick_b, F.col(f"{c}{suffix}")).otherwise(
                    F.col(f"{c}__f")
                ),
            ).drop(f"{c}__f")
        return j
    right_cols = right_cols or [
        c for c in right.columns if c not in set(by) | {on}
    ]
    if dedup_right and tiebreak is not None:
        wd = W.partitionBy(*by, on).orderBy(F.col(tiebreak).desc())
        right = (
            right.withColumn("_rn", F.row_number().over(wd))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    payload = [f"{c}{suffix}" for c in right_cols] + [f"{on}{suffix}"]
    r_tagged = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(on).alias(f"{on}{suffix}"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in set(by) | {on}],
    )
    l_tagged = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_cols],
        F.lit(None).cast(right.schema[on].dataType).alias(f"{on}{suffix}"),
        *[F.col(c) for c in left.columns if c not in set(by) | {on}],
    )
    if direction == "backward":
        order = [F.col(on).asc(), F.col("_tag").asc()]
        if tiebreak is not None and not dedup_right:
            # right rows first by tiebreak so last() picks the max one
            order.insert(1, F.when(F.col("_tag") == 0, F.col(f"{tiebreak}{suffix}")).asc_nulls_first())
        w = (
            W.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        fill = [
            F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in payload
        ]
    else:  # forward: earliest right row with right.ts >= left.ts
        # left (tag 1) sorts BEFORE right (tag 0) at equal ts, so the
        # current-row-to-following frame sees an equal-ts right match.
        order = [F.col(on).asc(), F.col("_tag").desc()]
        if tiebreak is not None and not dedup_right:
            # earliest-ts match wins; among same-ts rights, first()
            # picks the min-tiebreaker one unless dedup'd upstream
            order.append(
                F.when(F.col("_tag") == 0, F.col(f"{tiebreak}{suffix}")).asc_nulls_first()
            )
        w = (
            W.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        fill = [
            F.first(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in payload
        ]
    filled = r_tagged.unionByName(l_tagged).select("*", *fill)
    out = filled.filter(F.col("_tag") == 1)
    for c in payload:
        out = out.drop(c).withColumnRenamed(f"_f_{c}", c)
    out = out.drop("_tag")
    if tolerance_us is not None:
        if direction == "backward":
            stale = F.col(on) - F.col(f"{on}{suffix}") > F.lit(tolerance_us)
        else:
            stale = F.col(f"{on}{suffix}") - F.col(on) > F.lit(tolerance_us)
        for c in payload:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out
