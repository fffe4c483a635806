"""Isolate per-query cost: warmup at sf0.001, then N noop-sink passes
at $SPARK_GRAFT_SF_DIR, min + all passes printed per query.

Usage:
    python tools/qtime.py [-n PASSES] q_name [q_name ...]

Same session factory and timing methodology as bench.py (so numbers
are comparable), but only the named queries run — the guide §1.4
isolation loop for optimization work.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    passes = 3
    if args and args[0] == "-n":
        passes = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nfl26_bigdatabowl_prediction_spark.plans.registry import QUERIES
    from nfl26_bigdatabowl_prediction_spark.session import get_spark

    spark = get_spark(app_name="nfl26-qtime")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as ex:
            print(f"WARMUP FAIL {name}: {ex}", flush=True)

    for name in names:
        ts = []
        for _ in range(passes):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{min(ts):7.3f}  {name}  all={ts}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
