"""Rebuild the /tmp 8x scale-probe derivative with ALL TEN tables.

Unions sf0.1 eight times with disjoint key offsets (the round-2
protocol, now covering orders/customer/part/supplier/embeddings too —
the round-5 verdict's ask #2: the vector/TPC-H heavies had no 8x rows
because the derivative lacked their tables).  Offsets per copy i:

    lineitem    l_orderkey += i*1e7, l_partkey += i*1e6, l_suppkey += i*1e4
    orders      o_orderkey += i*1e7, o_custkey += i*1e6
    customer    c_custkey  += i*1e6
    part        p_partkey  += i*1e6
    supplier    s_suppkey  += i*1e4
    events      event_id   += i*1e9, user_id += i*1e6
    documents   doc_id     += i*1e7
    embeddings  vec_id     += i*1e6
    region/nation: copied 1x (fixed dimensional domains — scaling the
    25-nation spine would change join semantics, not data volume)

Every offset is a multiple of 20 so fraction-of-corpus query sets
defined by `key % k == 0` (q_embed_ivf_topk's vec_id % 20) keep the
same sampling fraction, and fact/dim key references stay consistent
across copies (copy i's lineitem rows join copy i's orders/part/
supplier rows — join fanout per row is IDENTICAL to sf0.1, so a probe
ratio >1x measures plan behavior, not changed data semantics).

Usage:  python tools/make_8x.py [out_dir]     (default /tmp/nfl26_sf0.8x)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
COPIES = 8  # override with argv[2] (e.g. 64 for the decade-2 probe)

OFFSETS: dict[str, dict[str, int]] = {
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 10_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 10_000},
    "events": {"event_id": 1_000_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_ONCE = ("region", "nation")
# file counts ~ sf0.1 layout x8 so scan parallelism scales with the
# data (the round-2 derivative's coarser layout produced sub-1x scan
# artifacts; keep lineitem widest)
FILES = {"lineitem": 16, "orders": 16, "events": 16, "part": 8,
         "customer": 8, "supplier": 4, "documents": 8, "embeddings": 8}


def main(out_dir: str = "/tmp/nfl26_sf0.8x", copies: int = COPIES) -> None:
    from nfl26_bigdatabowl_prediction_spark.session import get_spark

    spark = get_spark(app_name="make-8x", shuffle_partitions=32)
    # RAW reads, not sources.io.table: the loader normalizes events.ts
    # to int64 epoch-MICROS, but its bigint branch on re-read assumes
    # epoch-NANOS (the driver's physical layout) — writing the raw
    # timestamp[us] column keeps the derivative on the same loader
    # path as /root/testdata (and matches the round-2 derivative).
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
            out = c if out is None else out.unionByName(c)
        nfiles = max(1, FILES[name] * copies // COPIES)
        out.repartition(nfiles).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        written = spark.read.parquet(os.path.join(out_dir, f"{name}.parquet"))
        n = written.count()
        if name == "events":
            # q_ohlc's oracle encodes (ts, event_id) ordering as the
            # scalar ts*10^12 + event_id, which is lexicographic ONLY
            # while 0 <= event_id < 10^12 — enforce the precondition on
            # every derivative rather than documenting it (round-9
            # ADVICE: at some copy count the offset walk would cross
            # the bound silently and corrupt the oracle's tiebreak).
            lo, hi = written.agg(
                F.min("event_id"), F.max("event_id")
            ).first()
            assert 0 <= lo and hi < 10**12, (
                f"event_id domain [{lo}, {hi}] breaks the q_ohlc oracle "
                f"encoding precondition 0 <= event_id < 10^12"
            )
        if name == "documents":
            # q_dedup_canonical's oracle encodes its canonical pick as
            # (1e6 - score)*10^12 + doc_id, lexicographic ONLY while
            # 0 <= doc_id < 10^12 — same enforcement as event_id
            # (round-10 ADVICE: the text.py comment claimed this was
            # asserted by the derivative tooling; now it is).
            lo, hi = written.agg(F.min("doc_id"), F.max("doc_id")).first()
            assert 0 <= lo and hi < 10**12, (
                f"doc_id domain [{lo}, {hi}] breaks the q_dedup_canonical "
                f"oracle encoding precondition 0 <= doc_id < 10^12"
            )
        print(f"{name}: {n} rows x{copies}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/nfl26_sf0.8x",
        int(sys.argv[2]) if len(sys.argv) > 2 else COPIES,
    )
