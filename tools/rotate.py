"""Start-of-round driver-window rotation helper.

Reads every CORRECTNESS_r*.json, collects the fully-green names
(rows+schema+hash), and reports what `__spark_entry__._DRIVER_GREEN`
should contain plus which registry queries still lack a driver row —
the candidates for the next `_PRIORITY` window.

Usage:
    python tools/rotate.py            # report
    python tools/rotate.py --check    # exit 1 if _DRIVER_GREEN is stale
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fully_green(path: str) -> set[str]:
    rows = json.load(open(path))
    return {
        n
        for n, r in rows.items()
        if r.get("rows_match")
        and r.get("schema_match")
        # rows-only queries have no hash; count them green on rows+schema
        and (r.get("hash_match") or r.get("hash_match") is None)
        and not r.get("err")
    }


def main() -> int:
    import __spark_entry__ as e
    from nfl26_bigdatabowl_prediction_spark.plans.registry import ORACLES, QUERIES

    green: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        g = fully_green(path)
        print(f"{path}: {len(g)} fully green")
        green |= g
    # q_except's round-1 green covered a since-respecified query;
    # membership in the current registry is the real filter.
    green &= set(QUERIES)

    declared = set(e._DRIVER_GREEN) & set(QUERIES)
    missing_from_decl = sorted(green - declared)
    stale_in_decl = sorted(
        n for n in declared - green
        if n in ORACLES  # rows-only names are parked there deliberately
    )
    pending = sorted(set(QUERIES) - green - set(e._DRIVER_GREEN))
    print(f"\ncumulative driver-green: {len(green)} / {len(QUERIES)}")
    if missing_from_decl:
        print(f"\nADD to _DRIVER_GREEN ({len(missing_from_decl)}):")
        for n in missing_from_decl:
            print(f'    "{n}",')
    if stale_in_decl:
        print(f"\nin _DRIVER_GREEN but never driver-green ({len(stale_in_decl)}):")
        for n in stale_in_decl:
            print(f"    {n}")
    print(f"\nstill pending a driver row ({len(pending)}):")
    for n in pending:
        print(f"    {n}")
    if "--check" in sys.argv and (missing_from_decl or stale_in_decl):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
