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
* each round's state truncates through a scratch-parquet round-trip
  — without truncation the plan doubles per iteration and the DAG
  scheduler becomes the bottleneck; parquet (not localCheckpoint)
  because Dataset.checkpoint PRESERVES plan statistics, whose
  sizeInBytes quadruples per join round until BigInteger overflows
  (see the in-loop comment);
* the result is DETERMINISTIC (min node id per component), so the
  driver's value-hash check applies despite the iteration — the
  DuckDB oracle runs the SAME hook+compress min-label algorithm,
  unrolled to a fixed round budget with a convergence-audit sentinel
  (plans/text.py::_minlabel_cc_sql; it replaced the original
  recursive-CTE transitive closure, whose Σ|comp|² row count melted
  down at the 8x honest derivative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nfl26_bigdatabowl_prediction_spark.scratch import checkpoint_parquet


def _driver_union_find(edges_pdf) -> dict:
    """Exact union-find (path-halving + union by min root) over an
    edge list that fits on the driver; returns node → min-id-in-
    component for every edge-incident node.  Node ids are any
    totally-ordered hashable type (int doc ids, entity-name strings —
    numpy scalars are unwrapped so keys stay plain Python)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges_pdf["a"].to_numpy(), edges_pdf["b"].to_numpy()):
        a = a.item() if hasattr(a, "item") else a
        b = b.item() if hasattr(b, "item") else b
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id keeps the root = component label invariant
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {v: find(v) for v in parent}


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    driver_edge_threshold: int = 2_000_000,
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

    Two physical strategies behind one semantic:
    * |edges| ≤ ``driver_edge_threshold``: collect the (narrow,
      2-column) edge list and run exact union-find on the driver —
      one job instead of O(log diameter) shuffle rounds.  Dup-pair
      graphs are sparse, so this is the common case even under a
      huge corpus; the result is identical (min id per component).
    * otherwise: distributed hash-to-min with pointer jumping,
      O(log diameter) rounds of bounded shuffles.
    """
    e2 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    n_edges = e2.count()
    if n_edges <= driver_edge_threshold:
        spark = edges.sparkSession
        comp_map = _driver_union_find(e2.toPandas())
        e2.unpersist()
        if comp_map:
            import pandas as pd

            labels = spark.createDataFrame(
                pd.DataFrame(
                    {"node": list(comp_map.keys()), "comp": list(comp_map.values())}
                )
            )
            # the mapping is |edge-incident nodes| — broadcast-sized
            # whenever the driver path was chosen at all
            labels = F.broadcast(labels)
            out = nodes.select(F.col(node_col).alias("node")).join(
                labels, "node", "left"
            )
        else:
            out = nodes.select(F.col(node_col).alias("node")).withColumn(
                "comp", F.lit(None).cast("long")
            )
        return out.select("node", F.coalesce("comp", "node").alias("comp"))

    sym = (
        e2.unionByName(e2.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    ).localCheckpoint()
    e2.unpersist()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    init_labels = labels  # unpersisted after the result materializes
    for _ in range(max_iter):
        # min over neighbor labels, pre-aggregated before the join back
        # so the per-round state join is labels⋈(one row per node).
        nbmin = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nb_comp"))
        )
        upd = labels.join(nbmin, "node", "left").select(
            "node",
            "comp",
            F.least("comp", F.coalesce("nb_comp", "comp")).alias("c1"),
        )
        # Pointer jumping: follow the fresh label one hop —
        # c2(v) = c1(c1(v)) — so label distances halve per round and
        # convergence is O(log diameter), not O(diameter).  A label is
        # always a member node id, so the self-join lookup always hits.
        # Measured on the sf0.1 LSH graph: 7 rounds → 4.
        hop = upd.select(F.col("node").alias("c1"), F.col("c1").alias("c2"))
        # One materialization carries BOTH the updated label and the
        # convergence signal: the fixpoint check is a shuffle-free
        # filter-count over the checkpointed rows, not a second
        # labels⋈labels join job per round.
        #
        # The round state truncates through a PARQUET round-trip, NOT
        # localCheckpoint: Dataset.checkpoint preserves the logical
        # plan's statistics (LogicalRDD.rewriteStatsAndConstraints),
        # and SizeInBytesOnlyStatsPlanVisitor multiplies join children
        # — so a checkpointed iterative join loop QUADRUPLES its
        # sizeInBytes bit-length every round (three joins per round
        # here) until java.math.BigInteger overflows.  Measured: the
        # 64x honest derivative (2.7 M edges, the first real input to
        # cross driver_edge_threshold) died at round ~7 with
        # "BigInteger would overflow supported range" thrown from the
        # in-loop checkpoint's stats rewrite.  A parquet re-read
        # carries file-based stats instead — bounded per round — and
        # is what a 1000-executor job would do with per-round staging
        # state anyway (the checkpoint_parquet rationale).
        joined = checkpoint_parquet(
            upd.join(hop, "c1", "left").select(
                "node",
                "comp",
                F.least("c1", F.coalesce("c2", "c1")).alias("new_comp"),
            ),
            "cc_round_",
        )
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
    init_labels.unpersist()
    return out
