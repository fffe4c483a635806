"""Iterative connected components — dedup-cluster assembly.

Near-duplicate detection (MinHash-LSH, SimHash, embedding-cosine)
emits PAIRS; deduplication needs CLUSTERS: the canonical document of
each connected component of the pair graph.  Components are the one
genuinely iterative operator in the training-data pipeline — no
fixed number of joins computes them, so this runs a driver-side
min-label-propagation loop (hash-to-min):

    label(v) ← min(label(v), min over neighbors label(u))

repeated until fixpoint.  Iterations = graph diameter; dedup
clusters are near-cliques, so 2-3 rounds in practice.

Scale notes:
* each round is one self-contained shuffle (join on node id +
  min-aggregate) — the same cost profile as one GROUP BY round;
* ``localCheckpoint`` truncates the lineage every round — without it
  the plan doubles per iteration and the DAG scheduler, not the
  data, becomes the bottleneck;
* the result is DETERMINISTIC (min node id per component), so the
  driver's value-hash check applies despite the iteration — the
  DuckDB oracle is a recursive-CTE transitive closure
  (plans/text.py::q_dedup_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return (node, comp) where comp = min node id in the connected
    component.  Isolated nodes form singleton components.

    Only nodes incident to an edge enter the iteration: a node with
    no candidate pair can never change label, so the propagation set
    is |edge endpoints| (≈ 2·|near-dup pairs|), not |corpus| — at
    100 TB the dup-pair graph is a vanishing fraction of the corpus,
    and this is the difference between iterating over gigabytes and
    iterating over the whole lake.  Everyone else gets their singleton
    label via one final left join + coalesce (one shuffle, no loop).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    ).localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    prev_ckpt: DataFrame | None = labels
    for _ in range(max_iter):
        # min over neighbor labels, pre-aggregated before the join back
        # so the per-round state join is labels⋈(one row per node).
        nbmin = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nb_comp"))
        )
        # One materialization carries BOTH the updated label and the
        # convergence signal: the fixpoint check is a shuffle-free
        # filter-count over the checkpointed rows, not a second
        # labels⋈labels join job per round.
        joined = (
            labels.join(nbmin, "node", "left")
            .select(
                "node",
                "comp",
                F.least("comp", F.coalesce("nb_comp", "comp")).alias("new_comp"),
            )
            .localCheckpoint()
        )
        # The superseded round's blocks are dead the moment the new
        # checkpoint exists; without explicit unpersist they pile up in
        # executor storage memory across rounds (and across calls in a
        # long-lived session), degrading every later job.
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt = joined
        changed = joined.filter(F.col("new_comp") < F.col("comp")).count()
        labels = joined.select("node", F.col("new_comp").alias("comp"))
        if changed == 0:
            break
    out = nodes.select(F.col(node_col).alias("node")).join(labels, "node", "left")
    out = out.select("node", F.coalesce("comp", "node").alias("comp"))
    # Materialize the result before releasing the inputs it reads from:
    # the returned frame must not depend on blocks we are about to free.
    out = out.localCheckpoint()
    sym.unpersist()
    if prev_ckpt is not None:
        prev_ckpt.unpersist()
    return out
