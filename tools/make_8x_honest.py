"""Rebuild the ts-shifted / de-mirrored "honest" 8x derivative.

tools/make_8x.py unions sf0.1 N times with key offsets only — a
MIRROR: every copy's events occupy the SAME hours and every copy's
documents are byte-identical to copy 0's.  That is the right probe
for key-offset queries, but it manufactures pathological shapes for
two families (measured, MEASURED.md round-8 close):

- frame-bucketed pair joins: hour buckets coincide across copies, so
  per-frame groups grow ×N and candidate pairs ×N² — q_pairwise's
  unshifted 64× row ran 480× wall, and q_pairwise_kernel's DuckDB
  oracle exceeded 79 GB of spill at 8×;
- duplicate-graph closures: the corpus becomes 98.4 % duplicates, a
  shape real growth never has — q_dedup_components' oracle recursive
  closure ran past 30 min.

This twin reproduces HONEST growth — more frames of the same size,
more documents at the same duplication rate:

- events: copy i shifted +i·366 days, so frame/hour/day buckets are
  disjoint across copies (event_id/user_id offsets as in make_8x);
- documents: copy i>0's text gets a per-copy suffix, so each copy
  keeps sf0.1's internal duplicates but copies never collide;
- embeddings: copy i>0's vector components are ROTATED by i
  positions.  A common permutation preserves every within-copy DOT
  PRODUCT exactly — cosines, norms, and confirmed-edge geometry
  survive bit-for-bit — while cross-copy pairs decorrelate to the
  corpus's own baseline near-dup rate (measured: 2.7e-4 cross-copy
  vs 2.8e-4 within-copy at cos ≥ 0.3) — i.e. the derivative behaves
  like a true i.i.d. sample of the same distribution, unlike the
  pre-round-10 byte-identical copies that made it a MIRROR for the
  vector family.  NOT permutation-invariant: fixed-coefficient LSH
  plane signatures (and any other hash of component ORDER) are
  re-drawn per copy, so within-copy bucket co-membership — hence
  candidate-pair generation — differs from sf0.1 for copies i>0;
  both engines see the same rotated data, so differential
  correctness is unaffected, but per-copy candidate counts are a new
  draw, not sf0.1's.  Note the honest shape for
  a FIXED-τ similarity graph on a homogeneous corpus is pair-RATE
  times C(n,2): edges grow ~quadratically in corpus size (551 →
  34 874 at 8x), which is exactly why production raises τ / LSH bits
  with scale (SCALING.md's bits sizing rule);
- all other tables: identical to make_8x (key offsets preserve join
  fanout exactly).

The q_ohlc oracle's event_id < 10^12 encoding precondition is
asserted the same way as in make_8x.

Usage:  python tools/make_8x_honest.py [out_dir] [copies]
        (default /tmp/nfl26_sf0.8x_honest, 8)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.make_8x import COPY_ONCE, FILES, OFFSETS, SRC


def main(out_dir: str = "/tmp/nfl26_sf0.8x_honest", copies: int = 8) -> None:
    from nfl26_bigdatabowl_prediction_spark.session import get_spark

    spark = get_spark(app_name="make-8x-honest", shuffle_partitions=32)
    for name in COPY_ONCE:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: copied 1x", flush=True)
    for name, offs in OFFSETS.items():
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        out = None
        for i in range(copies):
            c = base
            for col, step in offs.items():
                c = c.withColumn(col, (F.col(col) + F.lit(i * step)).cast("long"))
            if name == "events":
                # ts is timestamp at rest (the loader normalizes on
                # read); shift whole copies into disjoint years so
                # every time-bucketed group keeps its sf0.1 size
                c = c.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 366} DAYS"))
            if name == "embeddings" and i > 0:
                # per-copy component rotation: within-copy dot
                # products are bit-identical to sf0.1 (a common
                # permutation preserves them; order-sensitive hashes
                # like LSH plane signatures are re-drawn — see module
                # docstring); cross-copy cosines decorrelate.  The
                # dimension comes from the DATA (size(embedding)), so
                # a future dim change can't silently truncate to NULL
                # components the way a hardcoded 64 would under
                # non-ANSI element_at.
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(sequence(0, size(embedding) - 1), "
                        f"j -> element_at(embedding, "
                        f"((j + {i}) % size(embedding)) + 1))"
                    ),
                )
            if name == "documents" and i > 0:
                # per-copy content salt on EVERY word: copies are
                # corpora of NEW documents (sf0.1's internal dup rate
                # preserved — within-copy duplicates stay duplicates),
                # with per-copy-DISJOINT shingle sets.  A tail-only
                # suffix (the round-8 ad-hoc build) left copies
                # near-duplicates of each other — shingles 99 % shared
                # — which DENSIFIED the LSH graph 66× per copy
                # (2.83 M candidate edges vs 8×42.7 k ≈ 341 k honest;
                # measured round-9) instead of de-mirroring it.
                c = c.withColumn(
                    "text",
                    F.expr(
                        f"array_join(transform(split(text, ' '), "
                        f"w -> concat(w, '{i}')), ' ')"
                    ),
                )
            out = c if out is None else out.unionByName(c)
        nfiles = max(1, FILES[name] * copies // 8)
        out.repartition(nfiles).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        written = spark.read.parquet(os.path.join(out_dir, f"{name}.parquet"))
        n = written.count()
        if name == "events":
            lo, hi = written.agg(F.min("event_id"), F.max("event_id")).first()
            assert 0 <= lo and hi < 10**12, (
                f"event_id domain [{lo}, {hi}] breaks the q_ohlc oracle "
                f"encoding precondition 0 <= event_id < 10^12"
            )
        if name == "documents":
            # q_dedup_canonical oracle precondition (see make_8x.py):
            # the canonical pick encodes (1e6 - score)*10^12 + doc_id
            lo, hi = written.agg(F.min("doc_id"), F.max("doc_id")).first()
            assert 0 <= lo and hi < 10**12, (
                f"doc_id domain [{lo}, {hi}] breaks the q_dedup_canonical "
                f"oracle encoding precondition 0 <= doc_id < 10^12"
            )
        print(f"{name}: {n} rows x{copies}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/nfl26_sf0.8x_honest",
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    )
