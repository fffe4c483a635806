"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``nfl26_bigdatabowl_prediction_spark``;
this module only wires the registry into the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nfl26_bigdatabowl_prediction_spark.plans.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the multi-aggregate pricing summary
    (SURVEY.md §2.4 A2 — the reference's 14-named-agg groupBy,
    main_cuda.py:365-380) over sf0.001."""
    return QUERIES["q_groupby_multi"](spark, "/root/testdata/sf0.001")


# Names with a fully-green driver row (hash_match) in a PRIOR round's
# CORRECTNESS_r{N}.json.  The driver verifies the first 50 entries of
# queries() in insertion order, so each round we front-load the
# queries that do not yet have a green driver row and push the
# already-verified ones to the back — rotating until every query has
# driver-level evidence.  Update this set from CORRECTNESS_r{N}.json
# at the start of each round.
_DRIVER_GREEN: frozenset[str] = frozenset({
    # ROUND-3 TODO (first thing): merge CORRECTNESS_r02.json's green
    # names into this set.  The expected round-2 window (every member
    # pre-flighted green via tools/driver_sim.py this round) starts at
    # q_except/q_pivot/q_hypertable_rollup and ends at q_rolling_time
    # — see `list(queries())[:50]`.
    # round 1 (CORRECTNESS_r01.json)
    "q_groupby_multi", "q_scan_parquet", "q_scan_csv", "q_project",
    "q_filter_range", "q_filter_finite", "q_fill", "q_dropna", "q_clip",
    "q_cast", "q_dummy_encode", "q_str_parse", "q_concat_id", "q_distinct",
    # q_except was re-defined in round 2 (the round-1 green covered a
    # query that always returned 0 rows); it re-enters the rotation.
    "q_union_all", "q_intersect", "q_sort", "q_topn_global",
    "q_join_inner", "q_join_left", "q_semi", "q_anti", "q_rmse", "q_rollup",
    "q_distinct_agg", "q_cube", "q_grouping_sets", "q_salted_join",
    "q_salted_distinct", "q_star_join", "q_quantile", "q_scan_orc",
    "q_scan_json", "q_unpivot", "q_lag", "q_lead", "q_rolling", "q_diff",
    "q_diff2", "q_cumsum", "q_cumcount", "q_norm_by_max", "q_last_n",
    "q_topk_per_group", "q_rank_fns",
    # rows-only by declared contract (no value oracle): the driver row
    # cannot improve, so don't let them occupy front-window slots.
    "q_approx_distinct", "q_quantile_approx", "q_embed_kmeans",
    "q_image_resize",
})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    pending = {n: f for n, f in QUERIES.items() if n not in _DRIVER_GREEN}
    done = {n: f for n, f in QUERIES.items() if n in _DRIVER_GREEN}
    return {**pending, **done}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
