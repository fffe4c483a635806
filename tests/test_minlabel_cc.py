"""Property pin for the oracle-side hook+compress connected
components (plans/text._minlabel_cc_sql) against a reference
union-find on random graphs.

The docstring's correctness claim is conditional: IF the convergence
audit passes, labels equal the per-component min id.  These tests
exercise both halves — random graphs (including path graphs, the
worst case for label distance) must converge within the default
rounds AND match union-find; a deliberately round-starved run must
trip the audit rather than return wrong labels.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from nfl26_bigdatabowl_prediction_spark.plans.text import _minlabel_cc_sql


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id in component
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _run_sql(nodes, edges, rounds):
    ctes, final, audit = _minlabel_cc_sql(rounds)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT);"
    )
    con.executemany("INSERT INTO documents VALUES (?)", [(n,) for n in nodes])
    con.execute("CREATE TABLE cand(doc_a BIGINT, doc_b BIGINT)")
    if edges:
        con.executemany("INSERT INTO cand VALUES (?, ?)", list(edges))
    sql = f"""
    WITH edges_sym AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM cand
        UNION SELECT doc_b, doc_a FROM cand
    ), {ctes}
    SELECT node, lbl FROM {final}
    """
    labels = dict(con.execute(sql).fetchall())
    bad = con.execute(
        f"""
    WITH edges_sym AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM cand
        UNION SELECT doc_b, doc_a FROM cand
    ), {ctes}
    SELECT {audit}"""
    ).fetchone()[0]
    con.close()
    return labels, bad


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=60),
    edge_seed=st.lists(
        st.tuples(st.integers(0, 59), st.integers(0, 59)),
        max_size=120,
    ),
)
def test_matches_union_find_on_random_graphs(n, edge_seed):
    nodes = list(range(n))
    edges = [(a, b) for a, b in edge_seed if a < b and a < n and b < n]
    labels, unconverged = _run_sql(nodes, edges, rounds=16)
    assert not unconverged
    assert labels == _union_find(nodes, edges)


def test_path_graph_converges_within_16_rounds():
    """A path is the label-distance worst case: the min id sits at one
    end and must traverse the whole diameter.  This pins a 16-round
    budget — deliberately STRICTER than the production default of 32
    (_minlabel_cc_sql's signature) — so the default carries at least a
    2x margin over a path far longer than any LSH cluster's diameter."""
    n = 3000  # diameter 2999; converged => doubling is really working
    nodes = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    labels, unconverged = _run_sql(nodes, edges, rounds=16)
    assert not unconverged
    assert set(labels.values()) == {0}


def test_star_graph_converges_in_few_rounds():
    """A star (the LSH near-clique limit shape): every leaf is one hop
    from the center, so convergence must be immediate regardless of
    which id is the center."""
    n = 500
    center = n - 1  # worst case: center has the LARGEST id
    nodes = list(range(n))
    edges = [(i, center) for i in range(n - 1)]
    labels, unconverged = _run_sql(nodes, edges, rounds=4)
    assert not unconverged
    assert set(labels.values()) == {0}


def test_bridged_cliques_converge():
    """Two dense communities joined by a long bridge — the shape the
    64x honest derivative actually produced (per-copy giant components
    chained by birthday-collision band signatures, MEASURED round-10).
    The min label must cross the bridge from one clique to the other."""
    k, bridge_len = 25, 400
    left = list(range(k))                     # clique containing node 0
    bridge = list(range(k, k + bridge_len))
    right = list(range(k + bridge_len, k + bridge_len + k))
    nodes = left + bridge + right
    edges = (
        [(a, b) for a in left for b in left if a < b]
        + [(a, b) for a in right for b in right if a < b]
        + [(left[-1], bridge[0])]
        + [(bridge[i], bridge[i + 1]) for i in range(bridge_len - 1)]
        + [(bridge[-1], right[0])]
    )
    labels, unconverged = _run_sql(nodes, edges, rounds=16)
    assert not unconverged
    assert set(labels.values()) == {0}


def test_phantom_edge_endpoint_does_not_vanish_node():
    """Regression for the compress step's join type (round-10 ADVICE):
    an edge referencing an id ABSENT from the node table used to make
    the referencing node's row vanish from the output via the inner
    p.node = h.lbl join — silently, because non-node endpoints also
    drop out of the convergence audit.  With the LEFT JOIN every node
    must survive.  (edges ⊆ nodes remains the documented precondition
    for label VALUES being meaningful; this pins non-disappearance.)"""
    nodes = [5, 6, 7]
    edges = [(5, 6), (3, 7)]  # 3 is not a node
    labels, _ = _run_sql(nodes, edges, rounds=8)
    assert set(labels) == {5, 6, 7}, "node 7 must not vanish"
    assert labels[5] == 5 and labels[6] == 5


def test_round_starved_run_trips_the_audit_not_wrong_labels():
    """With too few rounds the audit must fire — the oracle's sentinel
    path — rather than the query returning a silently wrong table."""
    n = 200
    nodes = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    labels, unconverged = _run_sql(nodes, edges, rounds=2)
    assert unconverged  # 2 rounds cannot cover diameter 199
