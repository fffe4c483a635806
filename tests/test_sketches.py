"""Semantic property tests for the sketch-audit family and the
rank-statistics queries — a third opinion beside the DuckDB bitwise
differential (tests/test_oracle.py): the differential proves both
engines compute the same thing; these prove the thing computed has
the defining property of the algorithm it claims to be.
"""

from __future__ import annotations

import math

from nfl26_bigdatabowl_prediction_spark.plans.registry import QUERIES


def test_cms_never_undercounts(spark, sf_dir):
    # Count-Min's defining guarantee: est >= true, always.
    rows = QUERIES["q_cms_topk"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.est_cnt >= r.true_cnt, r
        assert r.overcount == r.est_cnt - r.true_cnt


def test_hll_estimate_in_expected_band(spark, sf_dir):
    # Raw HLL relative error concentrates near 1.04/sqrt(m) ≈ 13 % at
    # m = 64; allow a generous 3-sigma-ish band.  Also pin that the
    # fixture sits ABOVE the linear-counting regime (2.5·m), which the
    # query's docstring claims.
    [r] = QUERIES["q_hll_audit"](spark, sf_dir).collect()
    assert r.n_true > 2.5 * r.m, "fixture fell into linear-counting regime"
    assert abs(r.rel_err) < 0.4, r
    # rel_err is rounded from the UNROUNDED estimate, so compare loosely
    assert abs(abs(r.hll_estimate - r.n_true) / r.n_true - abs(r.rel_err)) < 1e-6


def test_bloom_occupancy_bounds(spark, sf_dir):
    [r] = QUERIES["q_bloom_audit"](spark, sf_dir).collect()
    assert 0 < r.occupied <= min(r.m, r.k * r.n_items)
    assert r.fill_micro == 1_000_000 * r.occupied // r.m
    # occupancy-based FPR is (occupied/m)^k in integer micros
    assert r.fpr_micro == 1_000_000 * r.occupied**3 // r.m**3


def test_mannwhitney_matches_bruteforce(spark, sf_dir):
    # Third-opinion check of the tie-aware rank-collapse algebra:
    # recompute U and z from raw rows with textbook average ranks.
    import duckdb

    vals = duckdb.sql(
        f"SELECT user_id % 2 AS g, CAST(round(value * 100, 0) AS BIGINT) AS v"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    svals = sorted(v for _, v in vals)
    # average rank per distinct value (1-based)
    first = {}
    cnt = {}
    for i, v in enumerate(svals, start=1):
        first.setdefault(v, i)
        cnt[v] = cnt.get(v, 0) + 1
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2 for v in first}
    n = len(vals)
    n1 = sum(1 for g, _ in vals if g == 1)
    n0 = n - n1
    r1 = sum(avg_rank[v] for g, v in vals if g == 1)
    u1 = r1 - n1 * (n1 + 1) / 2
    ties = sum(c**3 - c for c in cnt.values())
    z = (u1 - n0 * n1 / 2) / math.sqrt(
        n0 * n1 / 12 * ((n + 1) - ties / (n * (n - 1)))
    )
    [row] = QUERIES["q_mannwhitney"](spark, sf_dir).collect()
    assert row.n0 == n0 and row.n1 == n1
    assert row.u1_x2 == int(2 * u1)
    assert row.u2_x2 == int(2 * (n0 * n1 - u1))
    assert abs(row.z_stat - z) < 1e-5


def test_knn_vote_is_deterministic_majority(spark, sf_dir):
    # The predicted label must be a label that actually appears among
    # the query's top-5 neighbors, and correctness must be consistent.
    knn = QUERIES["q_embed_cosine_topk"](spark, sf_dir).filter("rnk <= 5")
    import duckdb

    labels = dict(
        duckdb.sql(
            f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    neigh = {}
    for r in knn.collect():
        neigh.setdefault(r.qid, []).append(labels[r.nb_id])
    out = QUERIES["q_knn_classify"](spark, sf_dir).collect()
    assert out
    for r in out:
        votes = neigh[r.qid]
        top = max(set(votes), key=lambda l: (votes.count(l), -l))
        assert r.predicted == top, (r, votes)
        assert r.correct == int(r.predicted == labels[r.qid])
