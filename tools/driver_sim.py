"""Simulate the driver's CORRECTNESS check more faithfully than the
local bitwise differential.

The local check (`tests/oracle_check.py`) compares ``toPandas()``
frames, where pandas collapses NULL doubles to NaN and erases the
int-vs-float distinction inside object columns.  The driver instead
hashes ``collect()`` rows, where a SQL NULL is ``None`` (never NaN)
and a value's Python type rides along — so a Spark DOUBLE NULL vs a
DuckDB NaN, or a DuckDB DECIMAL/HUGEINT vs a Spark BIGINT, diverge at
the driver even when the local check passes (this is exactly how
q_pivot/q_hypertable_rollup went driver-red in round 1).

This tool re-runs any slice of the registry with a *type-tagged*
canonical representation of raw collect()/fetchall() rows:

    int-family   -> ("i", value)           (int, numpy ints, HUGEINT)
    float-family -> ("f", repr(float))     (NaN kept distinct from None)
    Decimal      -> ("d", str)             (flags DECIMAL-typed oracles)
    None         -> ("0",)
    date/ts      -> ("t", isoformat)
    list/array/map -> DriverIncompatibleType (the driver's pandas
                   lexsort crashes on these — round-8 q_embed_quantize)

Usage:
    python tools/driver_sim.py [--window N] [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import math
import sys
import time

import duckdb
import numpy as np

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


class DriverIncompatibleType(Exception):
    """A top-level output cell the REAL driver cannot canonicalize.

    The driver lexsorts the collected frame with ``pandas.sort_values``
    over all columns, which throws ``unhashable type`` on list/array/
    map cells — q_embed_quantize shipped seven rounds of local greens
    and then crashed the first driver sample exactly this way (round-8
    verdict).  The contract checker must be at least as strict as the
    contract: tuple-tagging nested values (the pre-round-9 behavior)
    was strictly MORE permissive, so array outputs are now a loud
    failure here too.  Serialize arrays with the array_join house
    pattern (q_collect_traj) instead.
    """


def tag(v):
    if v is None:
        return ("0",)
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        raise DriverIncompatibleType(
            f"top-level {type(v).__name__} cell — the driver's pandas "
            f"sort_values canonicalization crashes on this; serialize "
            f"with array_join (q_collect_traj pattern)"
        )
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat())
    if isinstance(v, bytes):
        return ("y", v)
    return ("s", str(v))


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(tag(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def check(name, qfn, sql, spark, duck, sf_dir):
    t0 = time.time()
    sdf = qfn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_rows = duck.execute(sql).fetchall()
    o_cols = [d[0] for d in duck.description]
    wall = time.time() - t0
    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}", wall
    if len(s_rows) != len(o_rows):
        return False, f"rows spark={len(s_rows)} oracle={len(o_rows)}", wall
    _, a = canon_rows(s_cols, s_rows)
    cols, b = canon_rows(o_cols, o_rows)
    if a == b:
        return True, f"{len(s_rows)} rows", wall
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            for c, xv, yv in zip(cols, x, y):
                if xv != yv:
                    return (
                        False,
                        f"row {i} col {c}: spark={xv!r} oracle={yv!r}",
                        wall,
                    )
    return False, "row multiset differs (ordering-invisible)", wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=0,
                    help="check only the first N driver-order entries")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from nfl26_bigdatabowl_prediction_spark.session import get_spark

    qmap = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qmap)
    if args.window:
        names = names[: args.window]

    spark = get_spark(app_name="driver-sim", shuffle_partitions=8)
    duck = duckdb.connect()
    # Cap the in-process oracle: an unbounded DuckDB buffer pool ran
    # the whole host to a 125 GB OOM kill on a 64x-scale window oracle
    # (q_ohlc) — with a limit + temp dir it spills to disk instead.
    duck.execute("SET memory_limit='40GB'")
    # Per-process spill dir: a fixed shared path risks temp-file
    # collisions between concurrent driver_sim runs and orphans spill
    # files after a crash (round-9 ADVICE).
    import atexit
    import shutil
    import tempfile

    spill = tempfile.mkdtemp(prefix="duckdb_sim_spill_")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    duck.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        # the /tmp 8x/64x derivatives are Spark-written DIRECTORY
        # parquet (part files under <table>.parquet/); the driver's
        # fixtures are single files — glob accordingly
        path = f"{args.sf}/{t}.parquet"
        import os as _os

        if _os.path.isdir(path):
            path = f"{path}/*.parquet"
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_fail = 0
    for name in names:
        if name not in oracles or not oracles[name]:
            print(f"SKIP  {name} (no oracle)")
            continue
        try:
            ok, msg, wall = check(
                name, qmap[name], oracles[name], spark, duck, args.sf
            )
        except Exception as e:  # noqa: BLE001
            ok, msg, wall = False, f"EXC {type(e).__name__}: {e}", 0.0
        status = "ok  " if ok else "FAIL"
        if not ok:
            n_fail += 1
        print(f"{status}  {name:28s} {wall:6.2f}s  {msg}")
    print(f"\n{n_fail} failures / {len(names)} checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
