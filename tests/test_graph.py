"""Connected components (SURVEY §2 #63, delta-iteration analog):
min-label propagation over near-dup pair graphs."""

from __future__ import annotations

import pytest

from flink_learning_practise_spark.operators.graph import connected_components


def cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, "src", "dst", **kw)
    return sorted((r.vertex, r.component) for r in out.collect())


def test_two_components(spark):
    got = cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]


def test_transitive_chain_beyond_one_hop(spark):
    """a~b, b~c, c~d with no direct a~d edge: the whole chain is ONE
    cluster — the transitivity the greedy survivor rule lacks."""
    got = cc(spark, [(4, 7), (7, 9), (9, 12)])
    assert got == [(4, 4), (7, 4), (9, 4), (12, 4)]


def test_min_label_wins_regardless_of_direction(spark):
    # min id sits on the dst side; propagation is undirected
    got = cc(spark, [(5, 1), (5, 3)])
    assert got == [(1, 1), (3, 1), (5, 1)]


def test_cycle(spark):
    got = cc(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == [(1, 1), (2, 1), (3, 1)]


def test_non_convergence_raises(spark):
    # a diameter-4 path cannot finish in 1 round
    with pytest.raises(RuntimeError, match="did not converge"):
        cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], max_iters=1)


def test_converges_within_diameter_rounds(spark):
    # path of length 6: min label must walk the full chain
    edges = [(i, i + 1) for i in range(1, 7)]
    got = cc(spark, edges)
    assert got == [(v, 1) for v in range(1, 8)]


def test_cc_matches_union_find_property(spark):
    """Property: CC must agree with a driver-side union-find reference
    on pseudo-random graphs of varying density (deterministic seeds)."""
    import random

    for seed, n_vertices, n_edges in [(1, 12, 6), (2, 15, 18), (3, 20, 10)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n_vertices), rng.randrange(n_vertices))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n_vertices))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {v for e in edges for v in e}
        # canonical label = min vertex in the component
        comp_min: dict[int, int] = {}
        for v in touched:
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        expect = sorted((v, comp_min[find(v)]) for v in touched)

        assert cc(spark, edges) == expect


def test_star_cc_long_chain_converges_fast(spark):
    """A 64-node path is the adversarial case for label propagation
    (O(diameter) rounds); large-star/small-star must collapse it into
    one component within its O(log^2 n) budget."""
    from flink_learning_practise_spark.operators.graph import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "a long, b long"
    )
    out = connected_components_star(edges, "a", "b", max_iters=12).collect()
    assert len(out) == 64
    assert {r["component"] for r in out} == {0}


def test_star_cc_matches_label_propagation_on_random_graphs(spark):
    """Both CC formulations must produce identical components on
    random graphs (deterministic seeds, mixed chains/stars/isolated
    pairs)."""
    import random

    from flink_learning_practise_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = 30
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(25)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "a long, b long")
        base = {
            r["vertex"]: r["component"]
            for r in connected_components(df, "a", "b").collect()
        }
        star = {
            r["vertex"]: r["component"]
            for r in connected_components_star(df, "a", "b").collect()
        }
        assert star == base, f"seed {seed}: {star} != {base}"


def test_star_cc_keeps_self_loop_only_vertices(spark):
    from flink_learning_practise_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame([(7, 7), (1, 2)], "a long, b long")
    star = {
        r["vertex"]: r["component"]
        for r in connected_components_star(edges, "a", "b").collect()
    }
    base = {
        r["vertex"]: r["component"]
        for r in connected_components(edges, "a", "b").collect()
    }
    assert star == base == {7: 7, 1: 1, 2: 1}


def test_triangle_census_brute_force(spark):
    """Census vs itertools brute force on a random oriented graph."""
    import itertools
    import random

    from flink_learning_practise_spark.operators.graph import triangle_census

    rng = random.Random(11)
    n = 40
    edges = sorted(
        {
            (a, b)
            for a, b in (
                tuple(sorted(rng.sample(range(n), 2))) for _ in range(200)
            )
        }
    )
    eset = set(edges)
    tris = sum(
        1
        for a, b, c in itertools.combinations(range(n), 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    # ALL unordered length-2 paths: sum over vertices of C(deg, 2)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    df = spark.createDataFrame(edges, "u long, v long")
    row = triangle_census(df).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_triangles == tris
    assert row.n_wedges == wedges
    if wedges:
        ratio = round(3.0 * tris / wedges, 9)
        assert abs(row.closure_ratio - ratio) < 1e-12
        assert 0.0 <= row.closure_ratio <= 1.0


def test_triangle_census_ratio_bounded(spark):
    """K3 plus a pendant edge: the r5 review case where the oriented
    formulation reported ratio 3.0 — the corrected global clustering
    coefficient is 3*1 / (C(3,2)+2*C(2,2)+... ) = 3/5."""
    from flink_learning_practise_spark.operators.graph import triangle_census

    edges = [(1, 2), (1, 3), (2, 3), (1, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    row = triangle_census(df).collect()[0]
    assert row.n_triangles == 1
    assert row.n_wedges == 5  # deg: 1->3, 2->2, 3->2, 4->1 => 3+1+1+0
    assert abs(row.closure_ratio - 0.6) < 1e-12


def test_triangle_census_empty_graph(spark):
    from flink_learning_practise_spark.operators.graph import triangle_census

    df = spark.createDataFrame([], "u long, v long")
    row = triangle_census(df).collect()[0]
    assert (row.n_triangles, row.n_wedges, row.n_edges) == (0, 0, 0)
    assert row.closure_ratio == 0.0


def test_label_propagation_brute_force(spark):
    """3-round LPA vs a pure-Python replay on a random graph: identical
    per-round most-frequent-neighbor-label/min-tiebreak updates."""
    import random

    from flink_learning_practise_spark.operators.graph import label_propagation

    rng = random.Random(7)
    n = 30
    edges = sorted(
        {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(60)
        }
    )
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    labels = {v: v for v in nbrs}
    for _ in range(3):
        nxt = {}
        for v, ns in nbrs.items():
            cnt: dict[int, int] = {}
            for u in ns:
                cnt[labels[u]] = cnt.get(labels[u], 0) + 1
            nxt[v] = min(
                (l for l in cnt), key=lambda l: (-cnt[l], l)
            )
        labels = nxt
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        r.vertex: r.community
        for r in label_propagation(df, iterations=3).collect()
    }
    assert got == labels


def test_label_propagation_two_cliques_bridge(spark):
    """Two triangles joined by one bridge edge: LPA keeps them as two
    communities (each triangle converges to its own min label) where
    CC would merge them — the chain-splitting property the query row
    claims."""
    from flink_learning_practise_spark.operators.graph import label_propagation

    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        r.vertex: r.community
        for r in label_propagation(df, iterations=3).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == got[6]
    assert got[4] != got[1]  # the bridge did NOT merge the cliques


def test_label_propagation_dedups_votes(spark):
    """Duplicate rows and both-direction rows of the same edge must not
    cast extra votes (neighbor-SET semantics, r5 review): with edges
    {10-5 (x2 + reversed), 10-3}, vertex 10's neighbor labels are the
    SET {5, 3} -> tie -> smallest (3), not the multiset's 5."""
    from flink_learning_practise_spark.operators.graph import label_propagation

    edges = [(10, 5), (10, 5), (5, 10), (10, 3), (3, 3)]  # + a self-loop
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        r.vertex: r.community
        for r in label_propagation(df, iterations=1).collect()
    }
    assert got[10] == 3  # set-tie broken to smallest, not dup-vote 5
    assert got[5] == 10 and got[3] == 10


def test_k_core_brute_force(spark):
    """Fixed-round peeling must match a reference peeling loop on a
    random graph (rounds chosen past convergence, so this is the TRUE
    2-core)."""
    import random

    from flink_learning_practise_spark.operators.graph import k_core

    rng = random.Random(11)
    edges = set()
    while len(edges) < 60:
        a, b = rng.randint(0, 29), rng.randint(0, 29)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "u long, v long")
    got = {(r.id, r.degree) for r in k_core(df, k=2, rounds=10).collect()}

    ref = set(edges)
    while True:
        deg: dict = {}
        for u, v in ref:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {x for x, d in deg.items() if d >= 2}
        nxt = {(u, v) for u, v in ref if u in keep and v in keep}
        if nxt == ref:
            break
        ref = nxt
    deg = {}
    for u, v in ref:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert got == set(deg.items())


def test_k_core_empty_and_tree(spark):
    from flink_learning_practise_spark.operators.graph import k_core

    # a tree has no 2-core: everything peels away
    tree = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (1, 4)], "u long, v long"
    )
    assert k_core(tree, k=2, rounds=6).count() == 0
    # a triangle IS its own 2-core
    tri = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "u long, v long")
    got = {(r.id, r.degree) for r in k_core(tri, k=2, rounds=3).collect()}
    assert got == {(0, 2), (1, 2), (2, 2)}


def test_local_clustering_matches_bruteforce(spark):
    """lcc per vertex on a random graph == the textbook neighbor-pair
    closure count computed in Python."""
    import itertools
    import random

    from flink_learning_practise_spark.operators.graph import local_clustering

    rng = random.Random(17)
    n = 14
    edges = sorted(
        {
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.3
        }
    )
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.id: (r.degree, r.n_triangles, r.lcc) for r in local_clustering(df).collect()}

    nbrs = {i: set() for i in range(n)}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    for v in range(n):
        d = len(nbrs[v])
        if d < 2:
            assert v not in got
            continue
        t = sum(
            1 for x, y in itertools.combinations(sorted(nbrs[v]), 2) if y in nbrs[x]
        )
        import math
        want_lcc = math.floor(2.0 * t / (d * (d - 1)) * 1e6 + 0.5) / 1e6
        assert got[v] == (d, t, want_lcc), f"vertex {v}"


# ---------------------------------------------------------------------------
# capped_wedges (VERDICT-r6 Adamic-Adar fix): hub-bounded wedge
# enumeration keyed on the middle vertex.

from flink_learning_practise_spark.operators.graph import capped_wedges


def _wedges(spark, edges, deg_cap=None):
    df = spark.createDataFrame(edges, "u long, v long")
    w, deg = capped_wedges(df, "u", "v", deg_cap=deg_cap)
    return (
        sorted((r.w, r.u, r.v) for r in w.collect()),
        {r.w: r.d for r in deg.collect()},
    )


def test_capped_wedges_uncapped_matches_bruteforce(spark):
    # path 1-2-3-4 plus spur 2-5: middles 2 (deg 3) and 3 (deg 2).
    edges = [(1, 2), (2, 3), (3, 4), (2, 5)]
    got, deg = _wedges(spark, edges)
    assert got == [(2, 1, 3), (2, 1, 5), (2, 3, 5), (3, 2, 4)]
    assert deg == {1: 1, 2: 3, 3: 2, 4: 1, 5: 1}


def test_capped_wedges_hub_is_dropped_not_squared(spark):
    """A boilerplate hub of degree H contributes C(H, 2) wedges — the
    quadratic fan-out the cap exists to bound. With cap < H the hub
    middle vanishes entirely; low-degree middles are untouched."""
    hub = [(100, i) for i in range(1, 41)]  # deg(100) = 40
    tail = [(1, 2)]  # makes 1 and 2 middles of deg 2 (hub edge + this)
    got, deg = _wedges(spark, hub + tail, deg_cap=10)
    assert deg[100] == 40
    # No wedge has the hub as middle; only the two deg-2 middles survive.
    assert all(w != 100 for (w, _, _) in got)
    assert got == [(1, 2, 100), (2, 1, 100)]
    # Uncapped, the hub alone would have contributed C(40,2) wedges.
    uncapped, _ = _wedges(spark, hub + tail)
    assert sum(1 for (w, _, _) in uncapped if w == 100) == 40 * 39 // 2


def test_capped_wedges_exact_when_cap_at_max_degree(spark):
    edges = [(1, 2), (2, 3), (3, 4), (2, 5), (100, 1), (100, 3)]
    exact, _ = _wedges(spark, edges)
    capped, _ = _wedges(spark, edges, deg_cap=4)  # max degree is 4
    assert capped == exact
