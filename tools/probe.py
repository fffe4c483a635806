"""Per-query scale probe: min-of-3 noop-sink wall times at a given
data directory (the MEASURED.md protocol, warm session).

Usage:
    python tools/probe.py [--passes=N] <sf_dir> q_name [q_name ...]
    python tools/probe.py /tmp/nfl26_sf0.8x q_contrastive_pairs q_knn_classify

Prints one `name  sec` line per query (min of 3 measured passes after
one warmup pass) plus a final JSON line, and the launch load1 so a
drifted-host probe is self-documenting (bench.py convention).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    passes = 3
    if args and args[0].startswith("--passes="):
        passes = int(args[0].split("=")[1])
        args = args[1:]
    sf_dir, names = args[0], args[1:]
    load1 = round(os.getloadavg()[0], 2) if hasattr(os, "getloadavg") else -1.0

    from nfl26_bigdatabowl_prediction_spark.plans.registry import QUERIES
    from nfl26_bigdatabowl_prediction_spark.session import get_spark

    spark = get_spark(app_name="nfl26-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in names:
        try:
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()  # warmup: codegen + JIT
            best = None
            for _ in range(passes):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
            out[name] = round(best, 3)
            print(f"{name}  {out[name]}s", flush=True)
        except Exception as ex:
            print(f"{name}  ERR {str(ex)[:120]}", flush=True)
    print(json.dumps({"dir": sf_dir, "load1": load1, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
