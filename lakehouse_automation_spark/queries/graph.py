"""Graph keys: connected components as a first-class operator.

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


@register(
    "graph_components",
    oracle="""
    WITH RECURSIVE li AS (
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
    nodes AS (SELECT DISTINCT u AS node FROM edges),
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

    li = (t(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") % 10 == 0)
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_suppkey").alias("s")))
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("s"), F.col("s_nationkey").alias("nat"))
    li = li.join(F.broadcast(sup), "s")
    a = li.select("o", "nat", F.col("s").alias("id_a"))
    b = li.select("o", "nat", F.col("s").alias("id_b"))
    pairs = (a.join(b, ["o", "nat"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
    return neardup_clusters(pairs).select(
        F.col("doc_id").alias("node"),
        F.col("cluster_id").alias("component_id"),
        F.col("is_keeper").alias("is_root"))
