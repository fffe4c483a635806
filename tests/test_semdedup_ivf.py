"""Semantic pins for q_semdedup_ivf on a hand-built embedding corpus
where every coarse-cell assignment, fine-centroid assignment,
nearest-neighbor cosine, and kept flag is known by construction.

The sf-scale differential (driver/driver_sim) proves cross-engine
agreement; these pin the SEMANTICS — two-level nprobe=1 IVF
assignment, within-cluster max-cos-to-lower-id, tau keep flag — on
inputs a human can compute.  Plus the round-10 cell-occupancy guard
(VERDICT r09 watch item) on a deliberately skewed corpus.

Geometry (dim 64, zero-padded; only the first 9 axes used):
- coarse centroids are vec_id 0..7  = unit one-hot on axis (v % 8)
- fine centroids   are vec_id 0..31 = (1 + v//8) * e_{v % 8}
  so each coarse cell a holds exactly the fine magnitudes 1,2,3,4
  (sids a, a+8, a+16, a+24): same-axis distance (m-1)^2 always beats
  cross-axis m^2+1, so f2c maps fine v -> cell v%8 by construction.
- vectors 0..31 are the fine centroids themselves -> distance 0 to
  their own sid -> 32 singleton clusters.
- vectors 32..39 = 3.75 * e_{v-32}: nearest fine magnitude is 4
  -> cluster (v-32)+24, parallel to its centroid -> cosine exactly
  1.0 (3.75 and 4.0 are exact in float32; sqrt of an exact square is
  exact), nn_cos1p_micro = 2_000_000, kept = 0.
- vector 40 = (3.0, 2.5, 0, ...): largest component -> coarse cell 0;
  within cell 0 the fine magnitude closest to 3.0 is 3 -> cluster 16;
  cos(vec16, vec40) = 9 / (3 * sqrt(15.25)) ~ 0.768 > tau=0.4
  -> kept = 0 with an exactly reproducible micro value.
"""

from __future__ import annotations

import math
import os

import pytest

from nfl26_bigdatabowl_prediction_spark.plans import vectors
from nfl26_bigdatabowl_prediction_spark.plans.registry import QUERIES
from nfl26_bigdatabowl_prediction_spark.scratch import scratch_dir

DIM = 64


def _onehot(axis: int, mag: float) -> list[float]:
    v = [0.0] * DIM
    v[axis] = mag
    return v


def _write_embeddings(spark, rows, prefix):
    d = scratch_dir(prefix)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


@pytest.fixture(scope="module")
def ivf_corpus_dir(spark):
    rows = []
    for v in range(32):  # fine centroids double as corpus vectors
        rows.append((v, _onehot(v % 8, 1.0 + v // 8), 0))
    for v in range(32, 40):  # joins the magnitude-4 cluster of its axis
        rows.append((v, _onehot(v - 32, 3.75), 0))
    e40 = [0.0] * DIM
    e40[0], e40[1] = 3.0, 2.5
    rows.append((40, e40, 0))
    return _write_embeddings(spark, rows, "semdedup_ivf_fixture_")


def test_semdedup_ivf_semantics(spark, ivf_corpus_dir):
    out = {
        r["vec_id"]: r
        for r in QUERIES["q_semdedup_ivf"](spark, ivf_corpus_dir).collect()
    }
    assert len(out) == 41

    # two-level assignment: every base vector is its own fine centroid
    for v in range(32):
        assert out[v]["cluster"] == v
    # magnitude-3.75 vectors land in their axis's magnitude-4 cluster
    for v in range(32, 40):
        assert out[v]["cluster"] == (v - 32) + 24
    # the mixed vector: coarse cell 0 (largest component), fine mag 3
    assert out[40]["cluster"] == 16

    # singletons (and cluster minima) keep: no lower id in cluster
    for v in range(32):
        assert out[v]["nn_cos1p_micro"] is None
        assert out[v]["kept"] == 1
    # parallel duplicates: cosine exactly 1.0 -> micro 2_000_000
    for v in range(32, 40):
        assert out[v]["nn_cos1p_micro"] == 2_000_000
        assert out[v]["kept"] == 0
    # vec 40 vs vec 16: dot=9, norms 3 and sqrt(15.25) — both exact
    # doubles, so the engine's value is bit-reproducible here
    c = 9.0 / (3.0 * math.sqrt(15.25))
    assert out[40]["nn_cos1p_micro"] == math.floor((c + 1.0) * 1e6 + 0.5)
    assert c > 0.4  # above tau
    assert out[40]["kept"] == 0


def test_semdedup_ivf_operator_is_the_registered_query(spark, ivf_corpus_dir):
    """The round-11 K-parameterization refactor must leave the
    registered fixture query bit-identical: q_semdedup_ivf ==
    semdedup_ivf(k=32, c=8) row for row (one shared implementation,
    frozen knobs)."""
    a = sorted(
        QUERIES["q_semdedup_ivf"](spark, ivf_corpus_dir).collect(),
        key=lambda r: r["vec_id"],
    )
    b = sorted(
        vectors.semdedup_ivf(spark, ivf_corpus_dir, k=32, c=8).collect(),
        key=lambda r: r["vec_id"],
    )
    assert a == b


def test_semdedup_ivf_scaled_k_tracks_corpus(spark):
    """The production scaled-K path: K = ceil(n/target_cell) must
    actually take effect (more clusters than the fixture's frozen 32)
    while preserving the SemDeDup output contract — every vector
    assigned exactly once, each cluster's smallest id kept with a
    NULL neighbor cosine, kept ∈ {0, 1}."""
    sf_dir = "/root/testdata/sf0.001"
    out = vectors.semdedup_ivf_scaled(spark, sf_dir, target_cell=4).collect()
    n = len(out)
    assert n == len({r["vec_id"] for r in out})  # one row per vector
    clusters = {}
    for r in out:
        assert r["kept"] in (0, 1)
        clusters.setdefault(r["cluster"], []).append(r)
    # K scaled: ceil(n/4) clusters available; far more than 32 used
    assert len(clusters) > 32
    for members in clusters.values():
        lead = min(members, key=lambda r: r["vec_id"])
        assert lead["nn_cos1p_micro"] is None
        assert lead["kept"] == 1


def test_semdedup_ivf_cell_guard(spark, monkeypatch):
    """A skewed corpus (every vector identical -> one giant cluster)
    must REFUSE with the occupancy message, not silently run the
    quadratic confirm."""
    rows = [(v, _onehot(0, 1.0), 0) for v in range(50)]
    d = _write_embeddings(spark, rows, "semdedup_ivf_skew_")
    monkeypatch.setattr(vectors, "MAX_SEMDEDUP_CELL", 16)
    with pytest.raises(ValueError, match="MAX_SEMDEDUP_CELL"):
        QUERIES["q_semdedup_ivf"](spark, d).collect()
