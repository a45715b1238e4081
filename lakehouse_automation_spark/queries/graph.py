"""Graph keys: connected components and PageRank as first-class
operators.

The reference's lakehouse feeds entity tables (customers, suppliers,
uploaded documents — `/root/reference/datagen.py:62-135` generates
them); the canonical large-scale operation OVER such tables that plain
SQL lacks is transitive grouping — identity resolution, dedup-cluster
formation, account linking. The repo already runs min-label connected
components inside the text/vector dedup keys
(``operators/dedup.py::neardup_clusters``, the large-star/small-star
shape that scales to billions of edges); this module exposes it as a
registry key of its own over a RELATIONAL co-occurrence graph, so the
component operator is oracle-checked independently of any shingle or
LSH machinery.

Graph construction (deterministic, bounded): suppliers are linked
when they co-supply one order within the same nation — the
within-blocking-key linkage shape of real entity resolution (block =
nation, candidate pairs only inside a block). Orders are thinned to
``l_orderkey % 10 = 0`` to keep the oracle's transitive closure
small; per-order fan-out is bounded by TPC-H's <= 7 lineitems, so the
pair build is linear in lineitems at any scale.

100-TB shape: the pair self-join shuffles on l_orderkey (never a
cross join); components iterate one equi-join + one groupBy per
round with pointer jumping from round 3 (O(log diameter) rounds);
the driver sees only per-round convergence counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .base import register, t

# Shared graph construction (both keys, and both oracles, use the
# SAME edge set): suppliers linked when they co-supply one thinned
# order within one nation — see the module docstring.
_EDGE_CTES = """
    li AS (
      SELECT l.l_orderkey AS o, l.l_suppkey AS s, su.s_nationkey AS nat
      FROM lineitem l JOIN supplier su ON l.l_suppkey = su.s_suppkey
      WHERE l.l_orderkey % 10 = 0
    ),
    pairs AS (
      SELECT DISTINCT a.s AS u0, b.s AS v0
      FROM li a JOIN li b
        ON a.o = b.o AND a.nat = b.nat AND a.s < b.s
    ),
    edges AS (
      SELECT u0 AS u, v0 AS v FROM pairs
      UNION SELECT v0, u0 FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges)
"""


def _co_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b) with id_a < id_b: the deterministic co-supplier
    pair set both graph keys run on. The self-join shuffles on
    l_orderkey (fan-out bounded by TPC-H's <= 7 lineitems/order);
    the supplier dim is broadcast."""
    li = (t(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") % 10 == 0)
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_suppkey").alias("s")))
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("s"), F.col("s_nationkey").alias("nat"))
    li = li.join(F.broadcast(sup), "s")
    a = li.select("o", "nat", F.col("s").alias("id_a"))
    b = li.select("o", "nat", F.col("s").alias("id_b"))
    return (a.join(b, ["o", "nat"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())



def _co_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted symmetric edge table over :func:`_co_supplier_pairs`.

    Pairs persist BEFORE the symmetrizing union: both branches
    reference the pair subtree, so an unpersisted build ran the
    co-supplier self-join twice (guide §2: remove the duplicate
    pass). No distinct after the union: _co_supplier_pairs is
    distinct by construction and the u<v / u>v branches cannot
    collide, so a post-union dedup would re-shuffle the edge table
    to remove nothing (graph_jaccard_neighbors' edge build has
    relied on this since r7)."""
    from ..operators.cache import tracked_persist

    pairs = tracked_persist(_co_supplier_pairs(spark, sf_dir))
    return tracked_persist(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"),
                                  F.col("id_a").alias("v"))))


@register(
    "graph_components",
    oracle="WITH RECURSIVE " + _EDGE_CTES + """,
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    )
    SELECT node, MIN(r) AS component_id,
           CAST(CASE WHEN MIN(r) = node THEN 1 ELSE 0 END AS INT)
             AS is_root
    FROM reach GROUP BY node
    """,
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the supplier co-order graph (edges =
    two suppliers of the same nation supplying one thinned order):
    iterative min-label propagation with pointer jumping — each node's
    component id is its component's minimum supplier key, ``is_root``
    marks the representative. The oracle replays the transitive
    closure with a recursive CTE, so the component structure is
    hash-checked exactly."""
    from ..operators.dedup import neardup_clusters

    pairs = _co_supplier_pairs(spark, sf_dir)
    return neardup_clusters(pairs).select(
        F.col("doc_id").alias("node"),
        F.col("cluster_id").alias("component_id"),
        F.col("is_keeper").alias("is_root"))


# ------------------------------------------------------------------
# PageRank — fixed-point integer arithmetic so the iterative result
# is EXACT and cross-engine hashable.
# ------------------------------------------------------------------

_PR_SCALE = 1_000_000_000       # rank units: 1.0 == 1e9
_PR_TELEPORT = 150_000_000      # 0.15 * _PR_SCALE
_PR_ITERS = 8


def _pagerank_oracle() -> str:
    """Unroll the fixed iteration count as chained CTEs (pr0..prN) —
    standard SQL forbids aggregation over the recursive reference a
    recursive-CTE formulation would need, and a fixed unroll is
    bit-exact by construction."""
    ctes = [
        "deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg"
        " FROM edges GROUP BY u)",
        f"pr0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS units"
        " FROM nodes)",
    ]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(f"""pr{k} AS (
      SELECT n.node,
             CAST({_PR_TELEPORT} + (85 * COALESCE(s.su, 0)) // 100
                  AS BIGINT) AS units
      FROM nodes n LEFT JOIN (
        SELECT e.v AS node, SUM(p.units // d.deg) AS su
        FROM edges e
        JOIN pr{k - 1} p ON e.u = p.node
        JOIN deg d ON d.node = e.u
        GROUP BY e.v) s ON n.node = s.node)""")
    return ("WITH " + _EDGE_CTES + ",\n    " + ",\n    ".join(ctes) + f"""
    SELECT node, units AS rank_units,
           CAST(units AS DOUBLE) / {_PR_SCALE} AS rank
    FROM pr{_PR_ITERS}""")


def _pr_round(nodes: DataFrame, pr: DataFrame,
              edges: DataFrame, deg: DataFrame) -> DataFrame:
    """One PageRank power iteration: share = units div deg, contrib =
    sum of in-neighbor shares, damp in exact integer units. Factored
    out so the plan-shape test can assert the MARGINAL cost of a round
    — it must read only the persisted edge/degree caches (never a
    parquet re-scan) and add a bounded number of shuffles
    (tests/test_scale_plans.py::test_pagerank_round_runs_off_caches)."""
    shares = (pr.join(deg, "node")
              .select(F.col("node").alias("u"),
                      F.expr("units div deg").alias("share")))
    contrib = (edges.join(shares, "u")
               .groupBy("v").agg(F.sum("share").alias("su")))
    return (nodes.join(contrib, nodes.node == contrib.v, "left")
            .select(nodes.node,
                    (F.lit(_PR_TELEPORT)
                     + F.expr("(85 * coalesce(su, 0L)) div 100"))
                    .cast("long").alias("units")))


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier co-order graph (d = 0.85, 8 power
    iterations) — the influence/centrality ranking complementing
    `graph_components`' grouping; at corpus scale the same loop ranks
    domains or citation graphs for crawl prioritization.

    Deterministic by FIXED-POINT INTEGER arithmetic: ranks live in
    BIGINT units of 1e-9, each node's per-neighbor share is
    `units div deg` (integer floor), and damping is
    `(85 * sum) div 100` — every operation is exact and
    order-independent, so an iterative float algorithm that would
    drift by summation order (doubles sum differently per partitioning)
    becomes hash-comparable across Spark, DuckDB, and any cluster
    layout. The small mass the floors shed (< 1e-9 * degree per node
    per round) is part of the spec, not an error term; the double
    `rank` column is derived from the exact units at the very end.

    100-TB shape: one equi-join + one groupBy per iteration, shuffled
    on node keys (the same alternating shape `neardup_clusters`
    scales); the edge and degree tables are built once and persisted;
    iteration count is fixed at 8 so the plan is O(iters) stages with
    nothing driver-side."""
    from ..operators.cache import tracked_persist

    edges = _co_supplier_edges(spark, sf_dir)
    deg = tracked_persist(
        edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("u").alias("node"), "deg"))
    nodes = deg.select("node")          # every node has deg >= 1
    pr = nodes.select(
        "node", F.lit(_PR_SCALE).cast("long").alias("units"))
    for _ in range(_PR_ITERS):
        pr = _pr_round(nodes, pr, edges, deg)
    return pr.select(
        "node", F.col("units").alias("rank_units"),
        (F.col("units").cast("double")
         / F.lit(float(_PR_SCALE))).alias("rank"))


@register(
    "graph_triangles",
    oracle="WITH " + _EDGE_CTES + """,
    tri AS (
      SELECT e1.u0 AS a, e1.v0 AS b, e2.v0 AS c
      FROM pairs e1
      JOIN pairs e2 ON e1.v0 = e2.u0
      JOIN pairs e3 ON e3.u0 = e1.u0 AND e3.v0 = e2.v0
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM tri)
    SELECT n.node,
           CAST(COUNT(t.m) AS BIGINT) AS n_triangles,
           tot.tt AS total_triangles
    FROM nodes n
    CROSS JOIN tot
    LEFT JOIN (
      SELECT a AS m FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ) t ON n.node = t.m
    GROUP BY n.node, tot.tt
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the supplier co-order graph — the
    local-clustering primitive (community density, spam/collusion
    detection; at corpus scale the same shape scores link-farm
    neighborhoods). Counted on the ORDERED edge list (a < b < c), the
    standard compact-forward scheme: each triangle is generated
    exactly once by joining ordered edges (a,b)+(b,c) into wedges and
    closing them against (a,c) — never an unordered 6-fold expansion,
    and wedge fan-out is bounded by the per-block ordered degree. A
    node's count tallies every orientation it appears in; the
    constant total_triangles column cross-checks the global sum.

    100-TB shape: two equi-joins shuffling on edge endpoints (the
    blocking-key construction bounds degrees); the membership union
    is linear in triangles; nothing driver-side."""
    pairs = _co_supplier_pairs(spark, sf_dir)
    from ..operators.cache import tracked_persist
    e = tracked_persist(pairs)   # three self-join references
    e1 = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = e.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    e3 = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = tracked_persist(
        e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c"))
    nodes = (e.select(F.col("id_a").alias("node"))
             .unionByName(e.select(F.col("id_b").alias("node")))
             .distinct())
    members = (tri.select(F.col("a").alias("m"))
               .unionByName(tri.select(F.col("b").alias("m")))
               .unionByName(tri.select(F.col("c").alias("m"))))
    total = tri.agg(F.count(F.lit(1)).alias("tt"))
    per = (nodes.join(members, nodes.node == members.m, "left")
           .groupBy("node")
           .agg(F.count("m").alias("n_triangles")))
    return (per.crossJoin(F.broadcast(total))
            .select("node", "n_triangles",
                    F.col("tt").alias("total_triangles")))


@register(
    "graph_jaccard_neighbors",
    oracle="WITH " + _EDGE_CTES + """,
    deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY u
    ),
    wedge AS (
      SELECT e1.u AS a, e2.u AS b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM edges e1 JOIN edges e2 ON e1.v = e2.v AND e1.u < e2.u
      GROUP BY 1, 2
    )
    SELECT p.u0 AS node_a, p.v0 AS node_b,
           CAST(COALESCE(w.n_common, 0) AS BIGINT) AS n_common,
           da.deg AS deg_a, db.deg AS deg_b,
           CAST(COALESCE(w.n_common, 0) AS DOUBLE)
             / CAST(da.deg + db.deg - COALESCE(w.n_common, 0)
                    AS DOUBLE) AS jaccard
    FROM pairs p
    JOIN deg da ON da.u = p.u0
    JOIN deg db ON db.u = p.v0
    LEFT JOIN wedge w ON w.a = p.u0 AND w.b = p.v0
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood Jaccard similarity for every edge of the supplier
    co-order graph — the structural-equivalence / link-strength score
    (|N(a) n N(b)| / |N(a) u N(b)|) behind entity-resolution edge
    weighting and link prediction. Common neighbors come from the
    wedge join (edges sharing an endpoint, generated once per ordered
    pair); the union size is the inclusion-exclusion identity
    deg(a) + deg(b) - common, so no second pass over adjacency sets
    is ever made. Counts are exact integers; jaccard is ONE identical
    IEEE divide in both engines (denominator >= 2 always: each
    endpoint's adjacency contains the other).

    100-TB shape: the wedge join shuffles on the shared endpoint with
    fan-out bounded by the blocking-key degree (same bound as
    `graph_triangles`); degree attach is two node-keyed equi-joins;
    nothing is broadcast corpus-side and nothing driver-side."""
    from ..operators.cache import tracked_persist

    pairs = tracked_persist(_co_supplier_pairs(spark, sf_dir))
    edges = (pairs.select(F.col("id_a").alias("u"),
                          F.col("id_b").alias("v"))
             .unionByName(pairs.select(F.col("id_b").alias("u"),
                                       F.col("id_a").alias("v"))))
    edges = tracked_persist(edges)
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    e1 = edges.select(F.col("v").alias("x"), F.col("u").alias("a"))
    e2 = edges.select(F.col("v").alias("x"), F.col("u").alias("b"))
    wedge = (e1.join(e2, "x")
             .filter(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).alias("n_common")))
    da = deg.select(F.col("u").alias("node_a"),
                    F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("node_b"),
                    F.col("deg").alias("deg_b"))
    base = (pairs.select(F.col("id_a").alias("node_a"),
                         F.col("id_b").alias("node_b"))
            .join(wedge,
                  (F.col("node_a") == wedge.a)
                  & (F.col("node_b") == wedge.b), "left")
            .select("node_a", "node_b",
                    F.coalesce("n_common", F.lit(0).cast("long"))
                    .alias("n_common")))
    return (base.join(da, "node_a").join(db, "node_b")
            .select("node_a", "node_b", "n_common", "deg_a", "deg_b",
                    (F.col("n_common").cast("double")
                     / (F.col("deg_a") + F.col("deg_b")
                        - F.col("n_common")).cast("double"))
                    .alias("jaccard")))


def _bfs_oracle(iters: int = 6) -> str:
    """Unrolled multi-source BFS (d0..dN) — the graph_pagerank
    pattern: standard SQL cannot aggregate over a recursive
    reference, so a fixed hop budget unrolls into chained CTEs,
    bit-exact by construction."""
    ctes = [
        "d0 AS (SELECT node, CAST(0 AS BIGINT) AS d FROM nodes"
        " WHERE node % 10 = 0)",
    ]
    for k in range(1, iters + 1):
        ctes.append(f"""d{k} AS (
      SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM (
        SELECT node, d FROM d{k - 1}
        UNION ALL
        SELECT e.u AS node, p.d + 1 AS d
        FROM edges e JOIN d{k - 1} p ON e.v = p.node
      ) GROUP BY node)""")
    return ("WITH " + _EDGE_CTES + ",\n    " + ",\n    ".join(ctes) + f"""
    SELECT n.node,
           CAST(COALESCE(r.d, -1) AS BIGINT) AS dist,
           CAST(CASE WHEN n.node % 10 = 0 THEN 1 ELSE 0 END AS INT)
             AS is_landmark
    FROM nodes n LEFT JOIN d{iters} r ON n.node = r.node""")


_BFS_ITERS = 6


@register("graph_shortest_paths", oracle=_bfs_oracle(_BFS_ITERS))
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the supplier co-order graph: hop distance
    from every node to its nearest LANDMARK (suppliers with key % 10
    = 0), capped at 6 hops (-1 = unreachable within the budget) — the
    hub-distance / coverage-radius primitive behind landmark-based
    shortest-path indexes and blast-radius analyses. Distances are
    exact small integers; the frontier relaxation
    d'(v) = min(d(v), min_u d(u) + 1) is one equi-join + one min-agg
    per hop, the same alternating shape as `graph_pagerank`, and the
    hop budget fixes the stage count.

    100-TB shape: each round shuffles on node keys only; the reached
    set only grows so no round rescans raw data; landmark selection
    is a pushed-down filter, never a driver-side list."""
    from ..operators.cache import tracked_persist

    edges = _co_supplier_edges(spark, sf_dir)
    nodes = tracked_persist(
        edges.select(F.col("u").alias("node")).distinct())
    reached = (nodes.filter(F.col("node") % 10 == 0)
               .select("node", F.lit(0).cast("long").alias("d")))
    for _ in range(_BFS_ITERS):
        grown = (edges.join(reached.withColumnRenamed("node", "v"), "v")
                 .select(F.col("u").alias("node"),
                         (F.col("d") + 1).alias("d")))
        reached = (reached.unionByName(grown)
                   .groupBy("node").agg(F.min("d").alias("d")))
    return (nodes.join(reached, "node", "left")
            .select("node",
                    F.coalesce("d", F.lit(-1)).cast("long").alias("dist"),
                    F.when(F.col("node") % 10 == 0, 1).otherwise(0)
                    .cast("int").alias("is_landmark")))


@register(
    "graph_assortativity",
    oracle="WITH " + _EDGE_CTES + """,
    deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY u
    ), ed AS (
      SELECT da.deg AS x, db.deg AS y
      FROM edges e
      JOIN deg da ON da.u = e.u
      JOIN deg db ON db.u = e.v
    ), s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM ed
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(n / 2 AS BIGINT) AS n_edges,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the supplier co-order graph: the
    Pearson correlation of endpoint degrees over all directed edges
    (Newman's r) — positive means hubs link hubs (rich-club),
    negative means hub-and-spoke; the one-number structural summary
    used to sanity-check generated/ingested graphs. The five cross
    sums accumulate as 128-bit integers over exact degrees, and the
    closing Pearson expression is the `ts_crosscorr` shared-IEEE
    recipe (sqrt, never pow).

    100-TB shape: two node-keyed joins attach endpoint degrees to
    the edge list, then one global partial+final agg collapses to a
    single row — nothing driver-side, nothing broadcast
    corpus-side."""
    from ..operators.cache import tracked_persist

    edges = _co_supplier_edges(spark, sf_dir)
    deg = tracked_persist(
        edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg")))
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    da = deg.select(F.col("u").alias("u"), F.col("deg").alias("x"))
    db = deg.select(F.col("u").alias("v"), F.col("deg").alias("y"))
    ed = edges.join(da, "u").join(db, "v")
    d38 = "decimal(38,0)"
    s = ed.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"))
    num = (F.col("n") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx")
          - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy")
          - F.col("sy") * F.col("sy")).cast("double")
    return (s.crossJoin(F.broadcast(nn))
            .select("n_nodes",
                    (F.col("n") / 2).cast("long").alias("n_edges"),
                    (num / (F.sqrt(dx) * F.sqrt(dy)))
                    .alias("assortativity")))
