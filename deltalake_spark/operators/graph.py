"""Graph operators over edge-list DataFrames: degree stats and
degree-oriented triangle counting.

Engine-native north-star surface (the reference has no graph ops;
``connected_components`` for near-dup clustering lives in
``operators/dedup.py``). Co-occurrence graphs — parts bought together,
docs sharing spans, users sharing sessions — are standard corpus-
analysis structures, and triangle counting is the canonical "does this
engine handle graph joins" workload.

Scale shape: the naive triangle join (adjacency ⋈ adjacency ⋈ edges)
explodes on high-degree nodes — a celebrity node of degree d produces
d² wedge candidates. The fix is the classic degree orientation
(node-iterator++ / Schank-Wagner): orient every undirected edge from
the (degree, id)-smaller endpoint to the larger, turning the graph into
a DAG where every vertex's OUT-degree is O(sqrt(|E|)) for any graph —
wedges are enumerated only from each node's oriented out-neighborhood,
so the worst case drops from d² to |E|^1.5 total with no skew hotspot.
Every triangle is counted exactly once (it has exactly one vertex with
two out-edges under a total order). Three shuffles: degree agg, wedge
self-join, closing-edge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deltalake_spark.operators.iterative import RoundCutter

__all__ = ["canonical_edges", "degree_stats", "triangle_count",
           "pagerank_fixed_point", "hits_fixed_point",
           "label_propagation", "bfs_distances", "link_prediction",
           "k_core"]


def canonical_edges(df: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Canonicalize an undirected edge list: drop self-loops, order
    endpoints (u < v), dedupe. The required input form for
    :func:`degree_stats` / :func:`triangle_count`."""
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    return (
        df.filter(F.col(src) != F.col(dst))
        .select(u, v)
        .distinct()
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node degree of a canonical edge list (one symmetric expand +
    one agg shuffle)."""
    sym = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node")))
    return sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def triangle_count(edges: DataFrame, *, per_node: bool = False) -> DataFrame:
    """Count triangles in a canonical undirected edge list.

    Returns a 1-row ``n_triangles`` frame, or per-node counts
    (``node, n_triangles`` — each triangle credited to all three
    corners) with ``per_node=True``.

    Uses degree orientation (see module docstring): wedges come only
    from oriented out-neighborhoods, bounding the self-join blow-up on
    skewed graphs; the closing join checks the third edge in oriented
    form, so each triangle is found exactly once.
    """
    deg = degree_stats(edges)
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    with_deg = edges.join(du, "u").join(dv, "v")
    # orient by (degree, id): lower endpoint -> higher endpoint
    oriented = with_deg.select(
        F.when((F.col("du") < F.col("dv"))
               | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
               F.struct(F.col("u").alias("a"), F.col("v").alias("b")))
        .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
        .alias("e")
    ).select("e.a", "e.b")
    # wedges: two out-edges of the same source (b1 < b2 avoids double
    # counting the unordered pair)
    o1 = oriented.select(F.col("a").alias("w_src"), F.col("b").alias("b1"))
    o2 = oriented.select(F.col("a").alias("w_src"), F.col("b").alias("b2"))
    wedges = o1.join(o2, "w_src").filter(F.col("b1") < F.col("b2"))
    # the closing edge: b1 < b2 already matches the canonical (u, v)
    # form, so join the original edge list directly — no re-orientation
    closing = edges.select(F.col("u").alias("b1"), F.col("v").alias("b2"))
    tris = wedges.join(closing, ["b1", "b2"])
    if not per_node:
        return tris.agg(F.count(F.lit(1)).alias("n_triangles"))
    # explode the three corners in ONE pass — a union of three
    # projections would replay the wedge+closing join three times
    corners = tris.select(
        F.explode(F.array("w_src", "b1", "b2")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"))


def pagerank_fixed_point(
    edges: DataFrame,
    *,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = 10 ** 12,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-point PageRank over a DIRECTED edge list: ``n_iter``
    power iterations in EXACT integer arithmetic.

    Why fixed-point: double-precision PageRank is not reproducible —
    the per-node contribution sum is order-dependent, so two runs with
    different partitionings disagree in the low bits, and an
    independent replay (SQL oracle, another cluster) can diverge. Here
    ranks live in integer ``scale``-units and every step is exact and
    order-independent:

    - ``r0 = scale // N`` for every node;
    - ``contrib(u->v) = (r(u) * damping_pct // 100) // outdeg(u)``
      (integer floor divisions — deterministic, and the flooring loss
      is bounded by ``outdeg`` units, i.e. < 1e-6 of a rank point at
      the default scale);
    - ``r'(v) = (100 - damping_pct) * scale // (100 * N)
      + SUM(contrib)`` — a BIGINT sum, order-independent.

    Dangling nodes (out-degree 0) simply leak their damped mass —
    the usual redistribute-to-all variant needs an extra global agg
    per iteration; for web-style link analysis over symmetrized
    co-occurrence graphs every node has out-edges anyway. Documented,
    tested.

    Scale shape: the out-degree join happens ONCE outside the loop
    (edges carry their source's outdeg thereafter); each iteration is
    one ranks<->edges equi-join plus one ``groupBy(dst)`` sum — the
    standard Pregel-on-DataFrames step, co-partitioned on the node
    key so AQE reuses the exchange. Driver state is one scalar (N).
    Returns ``(node, rank_scaled)`` with ranks in scale-units.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("long"))
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg"))
    # one-time: annotate each edge with its source's out-degree
    deg_edges = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .join(outdeg.withColumnRenamed("node", "e_src"), "e_src")
        .persist()
    )
    base = ((100 - damping_pct) * scale) // (100 * n)
    ranks = nodes.withColumn(
        "rank_scaled", F.lit(int(scale // n)).cast("long"))
    cutter = RoundCutter(edges.sparkSession, checkpoint_dir, "pagerank")
    for it in range(n_iter):
        contribs = (
            deg_edges.join(ranks.withColumnRenamed("node", "e_src"), "e_src")
            .select(
                F.col("e_dst").alias("node"),
                F.expr(f"(rank_scaled * {int(damping_pct)} DIV 100) "
                       f"DIV outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(int(base)).cast("long")
             + F.coalesce(F.col("in_mass"), F.lit(0).cast("long")))
            .alias("rank_scaled"),
        )
        # cut the iterative lineage: without this, iteration i's plan
        # nests and REPLAYS every earlier iteration's join+agg
        # (quadratic re-execution) — the same hazard the BPE trainer
        # flattens with localCheckpoint. checkpoint_dir switches to
        # reliable round files (executor-loss-safe on real clusters);
        # either way the cutter releases out-of-grace prior rounds.
        if it < n_iter - 1:
            ranks = cutter.materialize(ranks)
    return ranks


def hits_fixed_point(
    edges: DataFrame,
    *,
    n_iter: int = 2,
    scale: int = 10 ** 12,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-point HITS (hubs & authorities) over a DIRECTED edge
    list: ``n_iter`` mutual-reinforcement rounds in EXACT integer
    arithmetic.

    Per round (Kleinberg's update, max-normalized):

    - ``auth_raw(v) = Σ_{u→v} hub(u)`` — BIGINT sum, order-free;
    - ``auth(v) = (auth_raw(v) * scale) // max(auth_raw)`` — integer
      floor division against the global max (ONE scalar agg; the
      product runs in exact decimal(38,0) since it can pass int64),
      so the leader holds exactly ``scale`` and everything else is an
      exact integer fraction of it;
    - then the symmetric hub half-step from the fresh authorities.

    Max-normalization replaces the usual L2 norm — same fixed points
    up to scaling, but it keeps every value an integer (no sqrt), so
    the whole recursion replays bit-for-bit in SQL/numpy and is
    partitioning-invariant. Like :func:`pagerank_fixed_point`, each
    half-step is one ranks<->edges equi-join + one ``groupBy`` sum;
    per-round driver state is two scalars (the maxima). Nodes with no
    in-edges get authority 0 (and symmetrically for hubs) via the
    left join. Iterated frames persist+materialize to cut the
    quadratic lineage replay.

    Returns ``(node, hub_scaled, auth_scaled)``.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    e = edges.select(F.col(src).alias("e_src"),
                     F.col(dst).alias("e_dst")).persist()
    hub = nodes.withColumn("h", F.lit(int(scale)).cast("long"))
    auth = nodes.withColumn("a", F.lit(0).cast("long"))
    # two chains, two cutters: hub and auth alternate, so each chain's
    # previous frame is still live when the other one cuts
    cut_a = RoundCutter(edges.sparkSession, checkpoint_dir, "hits-auth")
    cut_h = RoundCutter(edges.sparkSession, checkpoint_dir, "hits-hub")

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        mx = raw.agg(F.max(col)).collect()[0][0] or 0
        if mx == 0:
            return raw  # degenerate graph: all zero, keep zeros
        # widen to decimal(38,0) for the product: raw * scale can
        # reach ~1e27 (raw is an in-degree-weighted sum of 1e12-scale
        # values), far past int64. Decimal multiply is exact and DIV
        # returns the integral quotient as BIGINT — verified equal to
        # Python/HUGEINT big-int arithmetic.
        return raw.select(
            "node",
            F.expr(f"CAST({col} AS DECIMAL(38,0)) * {int(scale)} "
                   f"DIV {int(mx)}").alias(col))

    for it in range(n_iter):
        araw = (
            e.join(hub.withColumnRenamed("node", "e_src"), "e_src")
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        auth = nodes.join(araw, "node", "left").select(
            "node", F.coalesce("a", F.lit(0).cast("long")).alias("a"))
        auth = cut_a.materialize(_normalize(auth, "a"))
        hraw = (
            e.join(auth.withColumnRenamed("node", "e_dst"), "e_dst")
            .groupBy(F.col("e_src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        hub = nodes.join(hraw, "node", "left").select(
            "node", F.coalesce("h", F.lit(0).cast("long")).alias("h"))
        hub = cut_h.materialize(_normalize(hub, "h"))
    return (
        hub.join(auth, "node")
        .select("node", F.col("h").alias("hub_scaled"),
                F.col("a").alias("auth_scaled"))
    )


def label_propagation(
    edges: DataFrame,
    *,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan 2007) —
    community detection over an UNDIRECTED edge list, completing the
    graph family (triangles / CC / PageRank / HITS give cohesion,
    reachability, and centrality; this gives the mesoscale grouping).

    Classic LPA is notoriously nondeterministic (random visit order,
    random tie-breaks). This variant is a PURE FUNCTION of the graph,
    so an independent replay matches exactly:

    - synchronous rounds: every node updates from the SAME previous
      labeling (no visit order);
    - vote = distinct-neighbor label counts (multi-edges collapse);
    - winner = highest count, ties broken by SMALLEST label — total
      order, no randomness.

    Labels start as node ids; after ``n_iter`` rounds each node's
    label is its community. Fixed small ``n_iter`` (3 by default) is
    the production pattern — LPA converges in a few rounds on social
    graphs, and a bounded round count keeps the lineage and the SQL
    replay finite. (Synchronous LPA can two-cycle on bipartite
    structures; a fixed round count makes that a deterministic,
    documented outcome rather than non-termination.)

    Scale shape: symmetrize+dedup once (persisted); each round is one
    adjacency<->labels equi-join, one (node, label) count aggregate,
    and one row_number window over the COUNT frame (bounded by edge
    count, partitioned by node — no global sort). Per-round
    persist+materialize cuts the iterative lineage (the PageRank/BPE
    lesson). Returns ``(node, community)``.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    adj = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionAll(edges.select(F.col(dst).alias("node"),
                               F.col(src).alias("nbr")))
        .distinct()
        .persist()
    )
    labels = adj.select("node").distinct().withColumn(
        "label", F.col("node"))
    win = Window.partitionBy("node").orderBy(
        F.desc("c"), F.asc("label"))
    cutter = RoundCutter(edges.sparkSession, checkpoint_dir, "lpa")
    for it in range(n_iter):
        votes = (
            adj.join(labels.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
        if it < n_iter - 1:
            labels = cutter.materialize(labels)
    return labels.withColumnRenamed("label", "community")


def bfs_distances(
    edges: DataFrame,
    *,
    source,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Bounded-hop BFS from a single source over a DIRECTED edge list
    (symmetrize first for undirected reachability) — "how far is
    everything from here", the primitive under reachability audits
    and neighborhood feature extraction.

    Synchronous min-plus rounds in exact integers:
    ``dist'(v) = min(dist(v), 1 + min over in-neighbors dist(u))``,
    ``max_hops`` rounds, unreached nodes stay NULL. A fixed hop bound
    is the production shape (k-hop neighborhoods, not full
    transitive closure) and keeps the lineage and the SQL replay
    finite; full closure belongs to connected_components.

    Scale shape: each round is one edges<->dist equi-join + one
    groupBy(node) min + one outer merge with the previous frame;
    rounds persist+materialize to cut lineage (the PageRank lesson).
    Returns ``(node, hops)`` with hops NULL when unreached within
    ``max_hops``.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    adj = edges.select(F.col(src).alias("u"),
                       F.col(dst).alias("v")).distinct().persist()
    nodes = (adj.select(F.col("u").alias("node"))
             .unionAll(adj.select(F.col("v").alias("node")))
             .distinct())
    dist = nodes.withColumn(
        "hops",
        F.when(F.col("node") == F.lit(source), F.lit(0).cast("long"))
        .otherwise(F.lit(None).cast("long")))
    cutter = RoundCutter(edges.sparkSession, checkpoint_dir, "bfs")
    for it in range(max_hops):
        relaxed = (
            adj.join(dist.withColumnRenamed("node", "u"), "u")
            .filter(F.col("hops").isNotNull())
            .groupBy(F.col("v").alias("node"))
            .agg((F.min("hops") + F.lit(1)).alias("via"))
        )
        dist = (
            dist.join(relaxed, "node", "left")
            .select("node", F.least("hops", "via").alias("hops"))
        )
        if it < max_hops - 1:
            # TRUE plan cut, not persist: each round references the
            # previous dist TWICE (relaxed derives from it and the
            # merge joins it), so the logical tree would grow
            # 2^max_hops (the k_core 3^rounds lesson). The cutter also
            # releases round N-2's blocks (eager cut: round N-1's
            # blocks are read during THIS cut's materialization).
            dist = cutter.cut(dist, eager=True)
    return dist


def link_prediction(
    edges: DataFrame,
    *,
    min_common: int = 1,
    scale: int = 10 ** 12,
    max_degree: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Common-neighbor link prediction over an UNDIRECTED edge list:
    score non-adjacent node pairs by shared-neighbor structure — the
    "people you may know" / co-purchase gap-filling primitive.

    Two classic scores per candidate pair (u, v), both EXACT:

    - ``common_neighbors`` — count of shared neighbors (integer);
    - ``ra_scaled`` — the resource-allocation index Σ_z 1/deg(z)
      over shared neighbors z, in integer ``scale``-units via
      ``scale // deg(z)`` floor division. RA is Adamic-Adar's
      stronger sibling (Zhou 2009) and needs NO logarithm, so the
      score is an order-independent BIGINT sum — bit-replayable in
      SQL, unlike a float Σ 1/log deg.

    Candidate pairs come from the wedge join (two adjacency hops
    through a shared center z), then pairs that are ALREADY edges are
    removed with one anti-join — prediction means proposing edges
    that don't exist. ``max_degree`` (recommended at scale) drops
    celebrity centers before the wedge join: a degree-m hub emits m²
    candidate pairs and carries near-zero RA signal (its
    ``scale // deg`` share rounds toward 0 anyway).

    Scale shape: degree agg + center-keyed wedge self-join (equi-join
    on z — never a cross product) + one (u,v) aggregate + the
    anti-join. Returns ``(node_u, node_v, common_neighbors,
    ra_scaled)`` with ``node_u < node_v``.
    """
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    adj = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionAll(edges.select(F.col(dst).alias("node"),
                               F.col(src).alias("nbr")))
        .distinct()
        .persist()
    )
    deg = adj.groupBy(F.col("node").alias("z")).agg(
        F.count(F.lit(1)).alias("deg"))
    centers = adj.select(F.col("nbr").alias("z"),
                         F.col("node").alias("leaf"))
    centers = centers.join(deg, "z")
    if max_degree is not None:
        centers = centers.filter(F.col("deg") <= int(max_degree))
    a = centers.select("z", F.col("leaf").alias("node_u"), "deg")
    b = centers.select("z", F.col("leaf").alias("node_v"))
    wedges = (
        a.join(b, "z")
        .filter(F.col("node_u") < F.col("node_v"))
        .groupBy("node_u", "node_v")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(F.expr(f"{int(scale)} DIV deg")).alias("ra_scaled"),
        )
        .filter(F.col("common_neighbors") >= int(min_common))
    )
    existing = adj.filter(F.col("node") < F.col("nbr")).select(
        F.col("node").alias("node_u"), F.col("nbr").alias("node_v"))
    return wedges.join(existing, ["node_u", "node_v"], "left_anti")


def k_core(
    edges: DataFrame,
    *,
    k: int,
    n_rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
    require_converged: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-core decomposition step: the maximal subgraph in which every
    vertex keeps degree >= k — the classic dense-community filter
    (spam rings, power-user cliques, robust similarity clusters).

    Synchronous peeling: round i removes EVERY vertex whose degree in
    the round-(i-1) subgraph is < k, simultaneously. The k-core is a
    canonical object (the peeling fixpoint is unique and independent
    of removal order), and each synchronous round is a pure function
    of the previous vertex set — so a SQL replay of the same
    ``n_rounds`` matches exactly, converged or not; once converged,
    extra rounds are no-ops. Rounds after convergence cost one
    cached-frame count each.

    Scale shape: symmetrize+dedup once (persisted); each round is ONE
    degree aggregate + two semi-joins against the surviving vertex
    frame, with a lazy lineage CUT per round (the round plan
    references the previous frame three times, so anything short of a
    plan truncation grows the logical tree 3^rounds — the
    connected_components recipe, not the persist-only PageRank one),
    early-stop on a stable vertex count.
    Returns ``(node, degree)`` of the k-core subgraph.

    Bounded-round contract: with the default
    ``require_converged=False`` the result after ``n_rounds``
    un-converged rounds is the (well-defined, SQL-replayable)
    ``n_rounds``-peeled subgraph, NOT yet the k-core — callers that
    need the true fixpoint (worst case O(n) synchronous rounds on
    path-shaped peel chains — the connected_components r7 lesson in
    loud-vs-silent truncation) pass ``require_converged=True`` to get
    a RuntimeError instead of a silent partial peel.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    adj = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    cur = adj
    prev_n: int | None = None
    converged = False
    cutter = RoundCutter(edges.sparkSession, checkpoint_dir, "kcore")
    for _ in range(n_rounds):
        deg = cur.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
        alive = deg.filter(F.col("d") >= int(k)).select("a")
        nxt = (
            cur.join(alive, "a", "left_semi")
            .join(alive.select(F.col("a").alias("b")), "b", "left_semi")
        )
        # the round plan references `cur` THREE times (deg -> alive on
        # both join sides), so without a true plan cut the logical tree
        # grows 3^rounds — persist caches data but never truncates the
        # plan, and at n_rounds=10 merely STRINGIFYING the plan for the
        # SQL listener OOMed a 16g driver (caught by the full suite
        # r8). The cut truncates to a leaf; LAZY so the
        # materialization piggybacks on the distinct-count job below
        # (the connected_components recipe). The cutter's 2-round
        # grace covers the lazy window, then prior rounds' blocks are
        # released instead of lingering until GC (r8 ADVICE).
        nxt = cutter.cut(nxt, eager=False)
        n_alive = nxt.select("a").distinct().count()  # materializes
        cur = nxt
        if prev_n is not None and n_alive == prev_n:
            converged = True
            break  # converged: further rounds are no-ops
        prev_n = n_alive
    if require_converged and not converged:
        raise RuntimeError(
            f"k_core: peel still removing vertices after {n_rounds} "
            f"rounds — raise n_rounds (the result would be the "
            f"partial peel, not the k-core)")
    return cur.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree"))
