"""Iterative graph operators — Spark analog of Flink's DataSet
iterations (reference flink_typora.md:885 — Bulk Iteration / Delta
Iteration). The bulk-iteration analog already lives in
``similarity.refine_centroids`` (fixed-count k-means refinement); this
module adds the delta-iteration analog: connected components by
min-label propagation, driving a distributed join-agg loop to fixpoint.

The flagship use is dedup clustering: near-dup PAIRS (any tier —
n-gram Jaccard, MinHash-LSH, SimHash, embedding) are edges; a
component is one duplicate cluster; the canonical representative is
the component's minimum doc id.

Scale notes:
- Each iteration = one join (labels onto the symmetrized edge list) +
  one min-aggregate — both shuffle on the same vertex key, so AQE
  reuses the layout. No driver-side graph state, ever.
- Convergence is detected by a SCALAR invariant: labels only decrease,
  so the iteration is at fixpoint iff ``sum(label)`` is unchanged. One
  extra scalar agg per iteration, no extra join against the previous
  labels.
- Round count is O(component diameter). Dup clusters are short chains
  (diameter ≤ ~5 in practice), so this converges in a handful of
  rounds. For adversarial long-path graphs,
  :func:`connected_components_star` implements the published fix
  (large-star/small-star) at O(log² n) rounds.
- Lineage is truncated with ``localCheckpoint`` every few rounds so
  plan size stays constant regardless of iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 4


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iters: int = 25,
) -> DataFrame:
    """Undirected connected components over an edge list.

    Returns ``(vertex, component)`` for every vertex appearing in an
    edge, where ``component`` is the minimum vertex id in its connected
    component. Raises if ``max_iters`` rounds don't reach fixpoint
    (= a component with diameter > max_iters; see module notes).
    """
    # symmetrize once (plus a self-loop per vertex) so each round is
    # ONE join + ONE aggregate over a single reference to the labels
    # frame. Via explode, NOT a union of selects: a union would
    # evaluate the upstream edge pipeline (e.g. the full near-dup pair
    # computation) twice when sym materializes. The self-loops fold
    # "min(own label, neighbor offers)" into the same aggregate —
    # without them the round would reference labels a second time
    # (union side), and a twice-referenced iterate DOUBLES the lineage
    # every round (exponential plan growth by ~2^rounds).
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                    F.struct(F.col(src).alias("a"), F.col(src).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(dst).alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        # EAGER localCheckpoint, not persist: materializes the edge list
        # once and truncates its lineage, so every round's plan
        # references a compact LogicalRDD instead of re-analyzing and
        # re-optimizing the full edge-producing pipeline (for dedup
        # clustering, the entire near-dup pair tier) — at a handful of
        # rounds the repeated driver-side planning of that subtree was
        # a measurable share of wall time. The edge list is pair-count
        # sized, far smaller than its inputs — cheap to materialize.
        .localCheckpoint(eager=True)
    )

    # Free first round: starting labels = min over each vertex's
    # incoming offers under identity labeling (its own id and its
    # neighbors' ids) — exactly what loop round 1 would produce, minus
    # the join against an identity label frame.
    labels = (
        sym.groupBy(F.col("b").alias("vertex"))
        .agg(F.min("a").alias("component"))
        .persist()
    )
    # Up-front sum over the initial labels: since init IS round 1's
    # output (min over neighbors), dup graphs whose clusters are
    # star-shaped from their minimum — the common case — are already at
    # fixpoint, and comparing round 1 against this sum terminates one
    # full join+aggregate round earlier. The action itself only
    # materializes the persisted labels the first round would have
    # materialized anyway.
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    for i in range(max_iters):
        # every vertex offers its label to each neighbor AND itself
        # (self-loop); new label = min(offers) — monotone non-increasing
        updated = (
            sym.join(labels, sym["a"] == labels["vertex"])
            .groupBy(F.col("b").alias("vertex"))
            .agg(F.min("component").alias("component"))
        )
        if i % _CHECKPOINT_EVERY == _CHECKPOINT_EVERY - 1:
            updated = updated.localCheckpoint(eager=False)
        updated = updated.persist()
        new_sum = updated.agg(F.sum("component")).collect()[0][0]
        labels.unpersist()
        labels = updated
        if new_sum == prev_sum:  # labels only decrease ⇒ fixpoint
            # hand back a checkpointed frame and release every cache
            # this call pinned: repeated invocations (bench loops, a
            # service) must not accumulate persisted label frames, and
            # the caller must not silently re-run the whole iteration
            # if it recomputes. Final labels are vertex-count-sized —
            # cheap to materialize.
            final = labels.localCheckpoint(eager=True)
            labels.unpersist()
            return final
        prev_sum = new_sum

    labels.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(component diameter exceeds max_iters; raise it or switch to a "
        "large-star/small-star formulation)"
    )


def connected_components_star(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iters: int = 20,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — public paper): O(log² n) rounds regardless of
    component diameter, vs :func:`connected_components`'s O(diameter).

    Use this variant when components can be long chains (transitive
    near-dup chains across a 100 TB corpus); min-label propagation
    stays the cheaper choice for the short, star-shaped clusters
    typical of dedup output.

    Each round is two grouped aggregations and two joins over the
    current edge list, all keyed the same way (AQE reuses the
    layout); convergence is detected on a scalar (count + xor-hash of
    the canonical edge set), and lineage is truncated per round via
    ``localCheckpoint`` — constant plan size at any round count.

    - large-star: every node connects its LARGER neighbors to the
      minimum of its neighborhood (incl. itself) — halves long tails;
    - small-star: with edges oriented large→small, every node connects
      its smaller-or-equal neighbors to the neighborhood minimum —
      flattens into stars.

    Returns ``(vertex, component)`` with component = min vertex id
    reachable, exactly like :func:`connected_components`.
    """
    # ONE eager checkpoint of the raw edge list: vertices and the
    # working edge set both derive from it — two separate eager
    # checkpoints would each materialize the full upstream pipeline
    # (for dedup clustering, the entire near-dup pair tier) once more.
    raw = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # vertices from the RAW edge list, before self-loops are dropped:
    # a vertex whose only edge is (v, v) must still appear in the
    # output (as its own component), exactly like connected_components.
    vertices = (
        raw.select(F.col("u").alias("vertex"))
        .union(raw.select("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .localCheckpoint(eager=True)
    )

    def canon_sig(df: DataFrame):
        # order-insensitive signature of the canonical (min,max) edge set
        pair = F.struct(
            F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
        )
        return df.select(pair.alias("p")).distinct().agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor, not sum: order-insensitive and cannot overflow
            # under ANSI arithmetic (sum of 2^63-scale hashes throws)
            F.expr("bit_xor(xxhash64(p.x, p.y))").alias("h"),
        ).collect()[0]

    prev = canon_sig(e)
    for _ in range(max_iters):
        # large-star: sym neighborhoods; m = min(neighborhood ∪ self);
        # connect strictly-larger neighbors to m
        sym = e.select("u", "v").union(e.select(F.col("v"), F.col("u")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        m = mins.select(
            "u", F.least("_mn", F.col("u")).alias("m")
        )
        large = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: orient edges large→small; connect small-or-equal
        # neighbors (and self) to the neighborhood minimum
        oriented = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        omins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            oriented.join(omins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(omins.select(F.col("u"), F.col("m")))
        )
        # LAZY checkpoint: the signature collect right below is the
        # action that materializes it — an eager checkpoint would add
        # a second job per round for nothing.
        e = (
            large.union(small)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        sig = canon_sig(e)
        if (sig["n"], sig["h"]) == (prev["n"], prev["h"]):
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} rounds"
        )

    # stars: every remaining edge points large→min; component(v) =
    # min(neighbor mins, v). Isolated-after-convergence vertices (the
    # star centers) label themselves.
    sym = e.select("u", "v").union(e.select(F.col("v"), F.col("u")))
    comp = sym.groupBy(F.col("u").alias("vertex")).agg(
        F.min("v").alias("_mn")
    )
    return vertices.join(comp, "vertex", "left").select(
        "vertex",
        F.least(F.coalesce("_mn", F.col("vertex")), F.col("vertex")).alias(
            "component"
        ),
    )


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    vertices: DataFrame | None = None,
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list — the
    bulk-iteration analog beside :func:`connected_components`' delta
    iteration (reference flink_typora.md:885 teaches both DataSet
    iteration forms).

    ``vertices`` (one column, same name as ``src``) optionally extends
    the vertex set beyond edge endpoints — isolated vertices converge
    to (1−d)/N. Simple-variant semantics: dangling mass is dropped,
    not redistributed (documented; ranks then sum to < 1 when sinks
    exist — the relative ordering, which is what centrality consumers
    use, is unaffected).

    Determinism: each round's rank is quantized to 9 digits via
    ``floor(x·1e9 + 0.5)/1e9`` — plain IEEE ops, bit-identical across
    engines where ``round()`` is not (the transforms.ewma lesson; a
    chained recursion compounds boundary disagreements) — so the whole
    iteration is a pure function of the edge list: a SQL oracle can
    replay the exact rounds (bounded unrolling), and partition order
    can't drift the result.

    Scale shape per round: one join (ranks onto out-edges, vertex key)
    + one aggregate (contributions onto the destination key) — the CC
    loop's shape with a sum instead of a min; lineage truncated with
    ``localCheckpoint`` every few rounds, previous round unpersisted.
    The only driver materialization is the vertex COUNT (one scalar).

    Returns (vertex, pagerank) for every vertex.
    """
    v = edges.select(F.col(src).alias("vertex")).union(
        edges.select(F.col(dst).alias("vertex"))
    )
    if vertices is not None:
        v = v.union(vertices.select(F.col(src).alias("vertex")))
    v = v.distinct().localCheckpoint(eager=True)
    n = v.count()
    if n == 0:
        return v.withColumn("pagerank", F.lit(0.0))

    out_deg = edges.groupBy(F.col(src).alias("_src")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    # out-edges with degree attached, materialized once for the loop
    links = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .join(out_deg, "_src")
        .localCheckpoint(eager=True)
    )

    import math

    def _q9(c):
        return F.floor(c * 1e9 + F.lit(0.5)) / 1e9

    base = (1.0 - damping) / n
    r0 = math.floor(1.0 / n * 1e9 + 0.5) / 1e9
    ranks = v.withColumn("pagerank", F.lit(r0))
    for i in range(iterations):
        # per-edge contribution rounded, then DECIMAL-summed: a raw
        # double sum is partition-order-dependent (num.py rule) and
        # would both drift run-to-run and diverge from the SQL oracle
        contribs = (
            links.join(ranks, links["_src"] == ranks["vertex"])
            .select(
                F.col("_dst").alias("vertex"),
                (F.floor(F.col("pagerank") / F.col("_deg") * 1e12 + F.lit(0.5)) / 1e12)
                .cast("decimal(28,12)")
                .alias("_c"),
            )
            .groupBy("vertex")
            .agg(F.sum("_c").cast("double").alias("_in"))
        )
        updated = (
            v.join(contribs, "vertex", "left")
            .select(
                "vertex",
                _q9(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("pagerank"),
            )
        )
        # LAZY checkpoint per round (the CC loop's pattern, minus even
        # the per-round action): lineage truncates when the CONSUMER's
        # single action computes the chain, so `iterations` rounds cost
        # one job instead of one-materialize-job-per-round (the r4
        # persist();count();unpersist() ladder paid 6 extra jobs).
        # links stays eagerly checkpointed above — the loop's only
        # reused input — so no recomputation multiplies across rounds.
        # checkpoint_rounds=False keeps the full Catalyst plan visible:
        # the checkpoint truncates lineage to a LogicalRDD, which blinds
        # plan audits (PLANS.md, the no-cartesian suite guard) to the
        # loop's joins — tests audit the unchecked variant (review r5).
        ranks = (
            updated.localCheckpoint(eager=False)
            if checkpoint_rounds
            else updated
        )
    return ranks


def _deg_oriented_triangles(pairs: DataFrame):
    """Shared degree-oriented triangle finder (Cohen 2009 /
    Suri-Vassilvitskii 2011): returns ``(tris, deg)`` where ``tris``
    holds each triangle EXACTLY once as (x, b, c) — x the
    lowest-(degree, id) vertex — and ``deg`` is the vertex degree
    frame. Every edge re-directs from its lower-(degree, id) endpoint
    to its higher one, so wedge fan-out is Σ_v C(out-deg(v), 2) with
    out-deg ≤ O(√m); a hub contributes only in-edges and cannot
    square. Two vertex-keyed joins + one wedge join."""
    deg = (
        pairs.select(F.col("_a").alias("id"))
        .unionAll(pairs.select(F.col("_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # Rank every vertex by (degree, id) — a total order, so each edge
    # gets exactly one direction. Attaching both endpoint degrees is
    # two vertex-keyed shuffle joins (deg is vertex-cardinality).
    da = deg.select(F.col("id").alias("_a"), F.col("d").alias("_da"))
    db = deg.select(F.col("id").alias("_b"), F.col("d").alias("_db"))
    a_lower = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b"))
    )
    oriented_e = (
        pairs.join(da, "_a")
        .join(db, "_b")
        .select(
            F.when(a_lower, F.col("_a")).otherwise(F.col("_b")).alias("x"),
            F.when(a_lower, F.col("_b")).otherwise(F.col("_a")).alias("y"),
            F.when(a_lower, F.col("_db")).otherwise(F.col("_da")).alias("dy"),
        )
    )
    # Wedge at x: two out-edges (x→b), (x→c) with rank(b) < rank(c);
    # the closing edge, if present, is oriented (b→c) by transitivity.
    e1 = oriented_e.select(F.col("x"), F.col("y").alias("b"), F.col("dy").alias("_dbr"))
    e2 = oriented_e.select(F.col("x"), F.col("y").alias("c"), F.col("dy").alias("_dcr"))
    wedges = (
        e1.join(e2, "x")
        .where(
            (F.col("_dbr") < F.col("_dcr"))
            | ((F.col("_dbr") == F.col("_dcr")) & (F.col("b") < F.col("c")))
        )
        .select("x", "b", "c")
    )
    e3 = oriented_e.select(F.col("x").alias("b"), F.col("y").alias("c"))
    tris = wedges.join(e3, ["b", "c"]).select("x", "b", "c")
    return tris, deg


def local_clustering(
    edges: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Per-vertex local clustering coefficient lcc(v) = 2·t(v) /
    (d(v)·(d(v)−1)) over a deduplicated undirected edge list — the
    per-vertex refinement of :func:`triangle_census`'s single global
    closure ratio (which a few dense template cliques can mask). Same
    degree-oriented triangle finder (each triangle found once), its
    three vertices exploded back out for per-vertex counts (left join —
    triangle-free vertices score 0); vertices with degree < 2 have no
    defined lcc and are omitted. Output: (id, degree, n_triangles,
    lcc) with lcc floor-quantized@6.
    """
    pairs = edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
    tris, deg = _deg_oriented_triangles(pairs)
    per_vertex = (
        tris.select(F.explode(F.array("x", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_t"))
    )
    return (
        deg.where(F.col("d") >= 2)
        .join(per_vertex, "id", "left")
        .select(
            "id",
            F.col("d").alias("degree"),
            F.coalesce(F.col("_t"), F.lit(0)).alias("n_triangles"),
            (
                F.floor(
                    2.0
                    * F.coalesce(F.col("_t"), F.lit(0))
                    / (F.col("d") * (F.col("d") - 1))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("lcc"),
        )
        .orderBy("id")
    )


def triangle_census(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Triangle/wedge/edge counts over a deduplicated undirected edge
    list (each {u,v} exactly once, u ≠ v). DEGREE-oriented census
    (Cohen 2009 / Suri-Vassilvitskii 2011): every edge is re-directed
    from its lower-(degree, id) endpoint to its higher one, so each
    triangle appears exactly once as the wedge at its LOWEST-rank
    vertex. Wedges then fan out as Σ_v C(out-deg(v), 2) with
    out-deg ≤ O(√m) — a boilerplate-template hub in the dup graph
    contributes only in-edges and cannot square. Same two joins as the
    id-oriented census, different comparator (the r5 weak flag).

    Output is ONE row: n_triangles, n_wedges (= Σ_v C(deg v, 2), ALL
    unordered length-2 paths), n_edges, closure_ratio =
    3·tri/wedges — the global clustering coefficient, in [0, 1].
    """
    pairs = edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
    tris, deg = _deg_oriented_triangles(pairs)
    n_tri = tris.agg(F.count(F.lit(1)).alias("n_triangles"))
    # wedge count = ALL unordered length-2 paths = Σ_v C(deg(v), 2) —
    # NOT the rank-oriented join above (which holds exactly ONE wedge
    # per triangle and would let the "ratio" exceed 1; review r5). The
    # oriented join exists only to find triangles once each.
    # d·(d−1) summed in decimal (hub degrees square past 2^53 at scale,
    # where a double sum would silently lose wedges), halved exactly
    wedge_edge = deg.agg(
        F.coalesce(
            (
                F.sum((F.col("d") * (F.col("d") - 1)).cast("decimal(38,0)")) / 2
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("n_wedges"),
        F.coalesce(
            (F.sum(F.col("d").cast("decimal(38,0)")) / 2).cast("long"),
            F.lit(0).cast("long"),
        ).alias("n_edges"),
    )
    return (
        n_tri.crossJoin(F.broadcast(wedge_edge))
        .select(
            "n_triangles",
            "n_wedges",
            "n_edges",
            F.when(
                F.col("n_wedges") > 0,
                F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 9),
            )
            .otherwise(F.lit(0.0))
            .alias("closure_ratio"),
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    iterations: int = 3,
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Fixed-iteration Label Propagation communities over an undirected
    edge list — the fifth graph op beside CC / star-CC / PageRank /
    triangle census (reference flink_typora.md:885's iteration family).

    Each round every vertex adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label — a total order, so
    the whole iteration is a pure function of the edge list and a SQL
    oracle can replay the exact rounds (the pagerank unrolling
    pattern). Fixed ``iterations`` (no convergence test): LPA is not
    guaranteed to converge (labels can oscillate on bipartite
    structure); a bounded unroll is both the deterministic and the
    scale-honest choice.

    Scale shape per round: one join (labels onto the doubled edge
    list, vertex key) + one (vertex, label) count + one per-vertex
    top-1 window — per-vertex groups are degree-sized (many small
    keys), so the window is NOT the few-huge-keys trap. Lineage is
    checkpoint-truncated per round; ``checkpoint_rounds=False``
    exposes the unrolled plan for audits (review r5 pagerank note).

    Returns (vertex, community).
    """
    from pyspark.sql import Window

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # symmetrize via ONE explode reference (not a union of selects — the
    # CC comment's double-evaluation trap), DISTINCT so duplicate or
    # both-direction input rows can't cast extra votes (neighbor-SET
    # semantics), self-loops dropped (a vertex is not its own neighbor)
    both = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select(F.col("e.u").alias("_u"), F.col("e.v").alias("_v"))
        .filter(F.col("_u") != F.col("_v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # free first round: under identity labels every neighbor offers a
    # distinct label with count 1, so top-1-by-(count, label) is plain
    # min over neighbors — one aggregate, no join/window (the CC
    # free-first-round specialization; review r5)
    labels = both.groupBy(F.col("_v").alias("vertex")).agg(
        F.min("_u").alias("community")
    )
    w = Window.partitionBy("_v").orderBy(F.desc("_c"), F.asc("community"))
    for _ in range(iterations - 1):
        updated = (
            both.join(labels, both["_u"] == labels["vertex"])
            .groupBy("_v", "community")
            .agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("_v").alias("vertex"), "community")
        )
        labels = (
            updated.localCheckpoint(eager=False) if checkpoint_rounds else updated
        )
    return labels


def k_core(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 3,
    src: str = "u",
    dst: str = "v",
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Bounded-round k-core peeling over a deduplicated undirected edge
    list: each round drops every vertex with degree < k and the edges
    touching it; after ``rounds`` passes the survivors approximate the
    k-core from above (exact once a round removes nothing — random
    dup-graphs converge in 2-3 rounds; a fixed round count keeps the
    result a pure function of the edge list, so a SQL oracle can
    replay it as unrolled CTEs, the LPA/PageRank pattern).

    Each round is one degree aggregate + two LEFT SEMI joins on the
    vertex key — all shuffle-partitioned on ids, nothing driver-side,
    and the edge frame only shrinks. ``checkpoint_rounds=False`` keeps
    the full Catalyst plan visible for plan audits (lazy checkpoints
    truncate lineage to a LogicalRDD, blinding the no-cartesian suite
    guard — the PageRank loop's rule).

    Returns (id, degree): the surviving vertices with their degree in
    the final peeled edge set.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))

    def degrees(f: DataFrame) -> DataFrame:
        return (
            f.select(F.col("u").alias("id"))
            .unionAll(f.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )

    for _ in range(rounds):
        keep = degrees(e).where(F.col("d") >= k).select("id")
        e = (
            e.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
            .select("u", "v")
        )
        if checkpoint_rounds:
            e = e.localCheckpoint(eager=False)
    return degrees(e).select("id", F.col("d").alias("degree"))


def capped_wedges(
    pairs: DataFrame,
    src: str = "u",
    dst: str = "v",
    deg_cap: int | None = None,
):
    """Open-wedge enumerator keyed on the middle vertex, with a degree
    cap on the middle (the VERDICT-r6 Adamic-Adar fix; same hub
    discipline as :func:`_deg_oriented_triangles`).

    Returns ``(wedges, deg)``: ``wedges`` holds each unordered wedge
    u—w—v (u < v) once as (w, d, u, v) where ``d`` = deg(w); ``deg``
    is the full (w, d) vertex-degree frame (uncapped, for consumers
    that need true degrees).

    Wedge fan-out is Σ_w C(deg(w), 2) — quadratic in hub degree, so a
    single boilerplate-template hub dominates the self-join at scale.
    ``deg_cap`` filters middle vertices to deg(w) <= cap BEFORE the
    self-join, bounding per-middle fan-out at C(cap, 2). For
    1/ln(deg)-weighted consumers (Adamic-Adar) every dropped wedge
    contributed < 1/ln(cap) — vanishing exactly where the weight says
    hubs carry no signal — and the result is EXACT whenever the true
    max degree <= cap (the driver-SF regime; the oracle replays the
    uncapped sum and matches).
    """
    nbr = pairs.select(F.col(src).alias("w"), F.col(dst).alias("u")).unionByName(
        pairs.select(F.col(dst).alias("w"), F.col(src).alias("u"))
    )
    deg = nbr.groupBy("w").agg(F.count(F.lit(1)).alias("d"))
    kept = deg if deg_cap is None else deg.where(F.col("d") <= F.lit(deg_cap))
    # One vertex-keyed join attaches (and filters by) the middle
    # degree; the wedge self-join then only ever sees capped middles.
    nbr_d = nbr.join(kept, "w")
    n1 = nbr_d.select("w", "d", "u")
    n2 = nbr_d.select("w", F.col("u").alias("v"))
    wedges = n1.join(n2, "w").where(F.col("u") < F.col("v"))
    return wedges, deg
