"""Deterministic per-query execution-shape stats via the Spark event log.

Wall-clock on this host is noisy (bursty CPU steal, measured round 11);
jobs/stages/tasks/shuffle-bytes are load-invariant, and they are exactly
the quantities the optimization guide says to drive down (§2: fewer
shuffles, fewer bytes).  This tool runs each named query once with the
noop sink in an event-logged session and prints, per query:

    jobs  stages  tasks  shuffle_write_B  input_B  wall_s

Usage:
    python tools/jobstats.py q_name [q_name ...]

(Shuffle read ≈ shuffle write for a completed query; write is reported.)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="spark_evlog_")

    from nfl26_bigdatabowl_prediction_spark.plans.registry import QUERIES
    from nfl26_bigdatabowl_prediction_spark.session import get_spark

    spark = get_spark(
        app_name="nfl26-jobstats",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    warm = "/root/testdata/sf0.001"
    walls: dict[str, float] = {}
    for name in names:
        try:
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            QUERIES[name](spark, warm).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as ex:
            print(f"WARMUP FAIL {name}: {ex}", flush=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"measure:{name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        walls[name] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    # ---- parse the event log ----------------------------------------
    files = []
    for root, _dirs, fnames in os.walk(log_dir):
        for f in fnames:
            if "appstatus" in f or f.startswith("."):
                continue
            files.append(os.path.join(root, f))
    files.sort()
    stage_to_desc: dict[int, str] = {}
    per: dict[str, dict[str, float]] = {
        n: dict(jobs=0, stages=0, tasks=0, swrite=0, input=0) for n in names
    }
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    if not desc.startswith("measure:"):
                        continue
                    name = desc[len("measure:") :]
                    if name not in per:
                        continue
                    per[name]["jobs"] += 1
                    for sid in ev.get("Stage IDs", []):
                        stage_to_desc[sid] = name
                elif e == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info", {})
                    name = stage_to_desc.get(si.get("Stage ID"))
                    # a stage can appear in several jobs' Stage IDs but
                    # completes once; skipped (not re-run) stages never
                    # emit StageCompleted, so this counts EXECUTED stages
                    if name:
                        per[name]["stages"] += 1
                elif e == "SparkListenerTaskEnd":
                    name = stage_to_desc.get(ev.get("Stage ID"))
                    if not name:
                        continue
                    per[name]["tasks"] += 1
                    tm = ev.get("Task Metrics") or {}
                    sw = tm.get("Shuffle Write Metrics") or {}
                    im = tm.get("Input Metrics") or {}
                    per[name]["swrite"] += sw.get("Shuffle Bytes Written", 0)
                    per[name]["input"] += im.get("Bytes Read", 0)

    print(f"{'query':32s} {'jobs':>4} {'stg':>4} {'tasks':>6} "
          f"{'shufW_KB':>9} {'input_KB':>9} {'wall_s':>7}")
    for n in names:
        p = per[n]
        print(
            f"{n:32s} {p['jobs']:4.0f} {p['stages']:4.0f} {p['tasks']:6.0f} "
            f"{p['swrite']/1024:9.1f} {p['input']/1024:9.1f} "
            f"{walls.get(n, -1):7.3f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
