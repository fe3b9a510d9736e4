"""Link-graph operators: semantics vs a pure-Python reference, fixture
convergence, and plan-shape assertions (no pair explosion, no collects)."""

import pytest
from pyspark.sql import functions as F

from wcm_spark.operators.graph import (
    BASE_MICRO,
    DAMP_PCT,
    INIT_MICRO,
    connected_components,
    degrees,
    hits,
    pagerank,
    triangles,
)


def _py_pagerank(nodes, edges, iters):
    """Reference implementation with the operator's exact integer rules."""
    from collections import Counter

    outdeg = Counter(s for s, _ in edges)
    rank = {u: INIT_MICRO for u in nodes}
    for _ in range(iters):
        sums = {u: 0 for u in nodes}
        for s, d in edges:
            sums[d] += rank[s] // outdeg[s]
        rank = {u: BASE_MICRO + (DAMP_PCT * sums[u]) // 100 for u in nodes}
    return rank


def _toy(spark):
    # a -> b -> c -> a cycle plus a hub d pointed at by everyone; e orphan
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("a", "d"), ("b", "d"), ("c", "d"),
    ]
    nodes = ["a", "b", "c", "d", "e"]
    ndf = spark.createDataFrame([(u,) for u in nodes], "url string")
    edf = spark.createDataFrame(edges, "src string, dst string")
    return nodes, edges, ndf, edf


def test_pagerank_matches_integer_reference(spark):
    nodes, edges, ndf, edf = _toy(spark)
    got = {r["url"]: r["rank_micro"] for r in pagerank(ndf, edf, iters=4).collect()}
    assert got == _py_pagerank(nodes, edges, 4)
    # orphan e: never receives mass, settles at the damping base
    assert got["e"] == BASE_MICRO
    # the all-inlink hub outranks cycle members
    assert got["d"] > got["a"]


def _py_hits(nodes, edges, iters):
    """Reference with the operator's exact integer L-inf rules."""
    hub = {u: INIT_MICRO for u in nodes}
    auth = {}
    for _ in range(iters):
        araw = {u: 0 for u in nodes}
        for s, d in edges:
            araw[d] += hub[s]
        mx = max(max(araw.values()), 1)
        auth = {u: (araw[u] * INIT_MICRO) // mx for u in nodes}
        hraw = {u: 0 for u in nodes}
        for s, d in edges:
            hraw[s] += auth[d]
        mx = max(max(hraw.values()), 1)
        hub = {u: (hraw[u] * INIT_MICRO) // mx for u in nodes}
    return auth, hub


def test_hits_matches_integer_reference(spark):
    nodes, edges, ndf, edf = _toy(spark)
    rows = hits(ndf, edf, iters=4).collect()
    got_a = {r["url"]: r["auth_micro"] for r in rows}
    got_h = {r["url"]: r["hub_micro"] for r in rows}
    ref_a, ref_h = _py_hits(nodes, edges, 4)
    assert got_a == ref_a
    assert got_h == ref_h
    # d is the pure authority (everyone points at it, it points nowhere)
    assert got_a["d"] == INIT_MICRO and got_h["d"] == 0
    # orphan e scores zero on both axes
    assert got_a["e"] == 0 and got_h["e"] == 0
    # cycle members are the hubs (each points at d + one cycle member)
    assert max(got_h["a"], got_h["b"], got_h["c"]) == INIT_MICRO


def test_triangles_toy(spark):
    # undirected closure of _toy is K4 on {a,b,c,d}: 4 triangles, every
    # corner in 3; orphan e in none; reciprocal/duplicate edges count once
    _, _, ndf, edf = _toy(spark)
    got = {r["url"]: r["triangles"] for r in triangles(ndf, edf).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}
    rev = edf.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    dup = {
        r["url"]: r["triangles"]
        for r in triangles(ndf, edf.union(rev)).collect()
    }
    assert dup == got


def test_components_and_degrees_toy(spark):
    _, _, ndf, edf = _toy(spark)
    comp = {r["url"]: r["component"] for r in connected_components(ndf, edf, iters=4).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e"}
    deg = {r["url"]: (r["out_deg"], r["in_deg"]) for r in degrees(ndf, edf).collect()}
    assert deg == {"a": (2, 1), "b": (2, 1), "c": (2, 1), "d": (0, 3), "e": (0, 0)}
    # duplicate edges count once ("over the distinct edge set")
    dup = {
        r["url"]: (r["out_deg"], r["in_deg"])
        for r in degrees(ndf, edf.union(edf)).collect()
    }
    assert dup == deg


@pytest.fixture(scope="module")
def fixture_graph(spark):
    from wcm_spark.datapipe.linkgraph import graph_nodes_edges

    nodes, edges = graph_nodes_edges(spark)
    return nodes, edges.persist()


def test_fixture_components_converged(spark, fixture_graph):
    """COMP_ITERS covers the fixture diameter: two extra iterations must
    not move any label, so the fixed-iteration output IS the true
    component assignment (mirrored by the SQL-oracle check in
    test_oracle_parity)."""
    from wcm_spark.datapipe.linkgraph import COMP_ITERS

    nodes, edges = fixture_graph
    a = sorted(map(tuple, connected_components(nodes, edges, iters=COMP_ITERS).collect()))
    b = sorted(map(tuple, connected_components(nodes, edges, iters=COMP_ITERS + 2).collect()))
    assert a == b


def test_fixture_pagerank_total_mass(spark, fixture_graph):
    """Unnormalized formulation: total mass stays within [N*base, N*init]
    (sink loss only ever removes mass; base re-injects it)."""
    nodes, edges = fixture_graph
    pr = pagerank(nodes, edges, iters=5)
    n = nodes.count()
    total = pr.agg(F.sum("rank_micro")).collect()[0][0]
    assert n * BASE_MICRO <= total <= n * INIT_MICRO


def test_graph_plans_have_no_pair_explosion(spark, fixture_graph):
    from wcm_spark.plans.inspect import formatted_plan

    nodes, edges = fixture_graph
    for df in (
        pagerank(nodes, edges, iters=3),
        connected_components(nodes, edges, iters=3),
        degrees(nodes, edges),
    ):
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    # hits rescales by a ONE-ROW max crossed back in — a scalar
    # broadcast is the right plan; only an unbounded cartesian is not
    plan = formatted_plan(hits(nodes, edges, iters=3))
    assert "CartesianProduct" not in plan
    plan = formatted_plan(triangles(nodes, edges))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_trade_graph_plan(spark):
    import os

    from wcm_spark.datapipe.queries import spark_queries
    from wcm_spark.plans.inspect import formatted_plan

    sf = os.environ.get("WCM_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = formatted_plan(spark_queries()["trade_graph_pagerank"](spark, sf))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the orderkey join must prune both scans to the two join columns
    assert "o_orderstatus" not in plan
    assert "l_extendedprice" not in plan


@pytest.mark.parametrize("seed", [3, 17])
def test_components_match_union_find_on_random_graphs(spark, seed):
    """Seeded sparse random graphs vs a pure-Python union-find: the
    fixed-iteration min-label propagation (run to the graph's diameter
    bound) produces exactly the union-find components with min-node
    labels."""
    import random

    rng = random.Random(seed)
    n = 60
    nodes = [f"n{i:02d}" for i in range(n)]
    edges = sorted(
        {
            tuple(sorted((rng.choice(nodes), rng.choice(nodes))))
            for _ in range(45)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]

    parent = {u: u for u in nodes}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for a, b in edges:
        parent[find(a)] = find(b)
    want = {}
    for u in nodes:
        r = find(u)
        want.setdefault(r, []).append(u)
    expect = {u: min(members) for members in want.values() for u in members}

    # iterations sized to the true diameter (BFS per component) + 1 —
    # the bound min-label propagation needs, without paying n hops
    from collections import deque

    adj = {u: set() for u in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    diameter = 0
    for s in nodes:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        diameter = max(diameter, max(dist.values()))

    ndf = spark.createDataFrame([(u,) for u in nodes], "url string")
    # connected_components treats the edge frame as directed messages —
    # feed both directions explicitly, like the production callers do
    both = edges + [(b, a) for a, b in edges]
    edf = spark.createDataFrame(both, "src string, dst string")
    got = {
        r["url"]: r["component"]
        for r in connected_components(ndf, edf, iters=diameter + 1).collect()
    }
    assert got == expect
