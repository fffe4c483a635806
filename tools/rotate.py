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


def _plan_drift(
    last_green_round: dict[str, str], queries: dict,
) -> list[tuple[str, str]]:
    """Green names whose query FUNCTION BODY changed since the commit
    that recorded their green row — their driver evidence predates the
    current plan, so they should be re-front-loaded (round-4
    ADVICE.md).  Function-body granularity: a registry function whose
    own ``def`` text is unchanged does not drift when an unrelated
    query in the same module is edited.  (Limitation: changes to
    shared helpers a query calls are not attributed to it.)"""
    import ast
    import inspect
    import subprocess
    import textwrap

    file_commits: dict[str, list[str]] = {}
    commit_rows: dict[tuple[str, str], set[str]] = {}

    def green_commit(path: str, name: str) -> str | None:
        # PER-ROW green commit: the OLDEST commit of this CORRECTNESS
        # file in which THIS name's row is fully green.  Using the
        # file's single last-touch commit (the round-5..7 behavior)
        # masks drift whenever the file is re-committed after the row
        # was recorded — the baseline silently advances past
        # intervening source changes (round-6/7 ADVICE/VERDICT).
        # Rows appended in later commits still resolve correctly
        # because the walk takes the first commit where the row IS
        # green, not the file's add-commit (round-5 ADVICE.md).
        if path not in file_commits:
            file_commits[path] = subprocess.run(
                ["git", "log", "--reverse", "--format=%H", "--", path],
                capture_output=True, text=True,
            ).stdout.split()
        for commit in file_commits[path]:
            key = (commit, path)
            if key not in commit_rows:
                show = subprocess.run(
                    ["git", "show", f"{commit}:{path}"],
                    capture_output=True, text=True,
                )
                try:
                    rows = json.loads(show.stdout) if show.returncode == 0 else {}
                except json.JSONDecodeError:
                    rows = {}
                commit_rows[key] = {
                    n
                    for n, r in rows.items()
                    if r.get("rows_match")
                    and r.get("schema_match")
                    and (r.get("hash_match") or r.get("hash_match") is None)
                    and not r.get("err")
                }
            if name in commit_rows[key]:
                return commit
        return None

    def fn_bodies(source: str) -> dict[str, str]:
        try:
            tree = ast.parse(source)
        except SyntaxError:
            return {}
        # Module-level defs only: a nested helper sharing a registry
        # query's name must not shadow it (round-5 ADVICE.md).
        return {
            node.name: ast.dump(node)
            for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
        }

    # file → name → dumped AST at the green commit (cache per pair)
    old_cache: dict[tuple[str, str], dict[str, str]] = {}
    drifted = []
    for name, corr_path in sorted(last_green_round.items()):
        fn = queries.get(name)
        if fn is None:
            continue
        commit = green_commit(corr_path, name)
        if commit is None:
            continue
        src_path = os.path.relpath(fn.__code__.co_filename, os.getcwd())
        key = (commit, src_path)
        if key not in old_cache:
            show = subprocess.run(
                ["git", "show", f"{commit}:{src_path}"],
                capture_output=True, text=True,
            )
            old_cache[key] = fn_bodies(show.stdout) if show.returncode == 0 else {}
        old = old_cache[key].get(fn.__name__)
        try:
            cur_src = textwrap.dedent(inspect.getsource(fn))
        except OSError:
            continue
        cur = fn_bodies(cur_src).get(fn.__name__)
        if cur is not None and old is not None and cur != old:
            drifted.append((name, src_path))
        elif old is None:
            # function did not exist at the green commit under this
            # name (moved module or renamed) — flag conservatively
            drifted.append((name, src_path + " (not found at green commit)"))
    return drifted


def main() -> int:
    import __spark_entry__ as e
    from nfl26_bigdatabowl_prediction_spark.plans.registry import ORACLES, QUERIES

    green: set[str] = set()
    # LATEST green round per name: a drift-slot re-verification
    # refreshes the evidence, so the drift baseline must be the newest
    # green row, not the first (else a name re-proven in r06 keeps
    # comparing against its r01 source forever).
    last_green_round: dict[str, str] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        g = fully_green(path)
        print(f"{path}: {len(g)} fully green")
        for n in g:
            last_green_round[n] = path
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
    drifted = _plan_drift(
        {n: p for n, p in last_green_round.items() if n in declared}, QUERIES
    )
    if drifted:
        print(
            f"\nplan drift — green rows older than their plan source "
            f"({len(drifted)}); re-front-load these:"
        )
        for n, src in drifted:
            print(f"    {n}  ({src})")
    if "--check" in sys.argv and (missing_from_decl or stale_in_decl):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
