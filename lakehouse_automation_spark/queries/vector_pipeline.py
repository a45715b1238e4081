"""Similarity-search keys over ``embeddings`` (SURVEY §2.3
"LLM-data-pipeline extensions": vec_cosine_topk / vec_knn_join /
embedding near-dup).

Exact tiers (brute-force top-k, all-pairs near-dup, IVF with seed
centroids) are fully deterministic and have exact DuckDB oracles: both
engines compute dot products as a sequential double fold and rank on
``round(sim, 9)`` with a vec_id tiebreak, so the hashes match bit-for-
bit. The RP-LSH kNN join is the sublinear scale path — approximate by
design, so it gets the driver's rows-only check plus a pytest recall
gate against the exact scan (SURVEY §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.vector import (
    SIM_DECIMALS,
    cosine_neardup_pairs,
    cosine_topk,
    ivf_kmeans_topk,
    ivf_pq_topk,
    ivf_topk,
    knn_join_lsh,
    lsh_neardup_pairs,
    pq_topk,
)
from .base import register, t

# Shared oracle CTE: vectors as DOUBLE[] with their norms. list_sum over
# list_transform is DuckDB's sequential double fold, same op order as
# Spark's aggregate().
_VNORM = """
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                                          i -> CAST(embedding[i] AS DOUBLE)
                                             * CAST(embedding[i] AS DOUBLE)))) AS nrm
      FROM embeddings
"""

_DOT = ("list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i]))")


def _sim(a: str, b: str, na: str, nb: str) -> str:
    return f"round({_DOT.format(a=a, b=b)} / ({na} * {nb}), {SIM_DECIMALS})"


@register(
    "vec_cosine_topk",
    oracle=f"""
    WITH n AS ({_VNORM}),
    pairs AS (
      SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
             {_sim('q.v', 'c.v', 'q.nrm', 'c.nrm')} AS sim_r
      FROM n q JOIN n c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 5
    )
    SELECT q_id, vec_id, sim_r, rk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY sim_r DESC, vec_id) AS rk
      FROM pairs)
    WHERE rk <= 10
    """,
)
def vec_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors: broadcast the
    query side, linear partition-parallel scan of the corpus — the
    exact baseline every approximate tier is measured against."""
    return cosine_topk(t(spark, sf_dir, "embeddings"), n_queries=5, k=10)


@register(
    "vec_neardup_cosine",
    oracle=f"""
    WITH n AS ({_VNORM})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_sim('a.v', 'b.v', 'a.nrm', 'b.nrm')} AS sim_r
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_sim('a.v', 'b.v', 'a.nrm', 'b.nrm')} >= 0.4
    """,
)
def vec_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs tier,
    threshold 0.4 on this corpus). At 100 TB the LSH candidate
    generator (vec_knn_join) runs first and this exact check verifies
    only its candidates — kept exact here as the oracle ground truth."""
    return cosine_neardup_pairs(t(spark, sf_dir, "embeddings"), threshold=0.4)


@register(
    "vec_ivf_topk",
    oracle=f"""
    WITH n AS ({_VNORM}),
    cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
    scored AS (
      SELECT n.vec_id, n.v, n.nrm, cents.cent_id,
             {_sim('n.v', 'cents.cv', 'n.nrm', 'cents.cn')} AS csim
      FROM n CROSS JOIN cents
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crk
      FROM scored
    ),
    assigned AS (
      SELECT vec_id, v, nrm, cent_id AS cell_id FROM ranked WHERE crk = 1
    ),
    probes AS (
      SELECT vec_id AS q_id, v AS qv, nrm AS qn, cent_id AS cell_id
      FROM ranked WHERE vec_id < 5 AND crk <= 3
    ),
    cand AS (
      SELECT p.q_id, a.vec_id,
             {_sim('p.qv', 'a.v', 'p.qn', 'a.nrm')} AS sim_r
      FROM probes p JOIN assigned a USING (cell_id)
      WHERE p.q_id != a.vec_id
    )
    SELECT q_id, vec_id, sim_r, rk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY sim_r DESC, vec_id) AS rk
      FROM cand)
    WHERE rk <= 10
    """,
)
def vec_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-10: 8 seed-centroid cells, 3 probed per
    query, exact rerank inside the probed cells. Deterministic seed
    centroids keep it oracle-able; recall vs the exact scan is asserted
    in tests (production swaps in k-means centroids, same plan shape)."""
    return ivf_topk(t(spark, sf_dir, "embeddings"),
                    n_centroids=8, nprobe=3, n_queries=5, k=10)


@register("vec_ivf_kmeans_topk", oracle=None)
def vec_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat with Lloyd-trained (spherical k-means, 2 rounds)
    centroids — the production coarse quantizer the seed-centroid tier
    approximates. Same probe/rerank plan as vec_ivf_topk; data-adapted
    cells raise recall at fixed nprobe (pytest asserts >= the seed
    tier). Driver holds only the k x 64 centroid matrix between
    rounds; the corpus is never collected. Rows-only check (the
    trained centroids aren't practical to replay in SQL)."""
    return ivf_kmeans_topk(t(spark, sf_dir, "embeddings"),
                           n_centroids=8, nprobe=3, n_queries=5, k=10, iters=2)


@register("vec_neardup_lsh", oracle=None)
def vec_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs at scale: LSH band-bucket candidates +
    exact cosine verification of candidates only — the benched 100-TB
    path (the exact all-pairs tier, vec_neardup_cosine, stays as the
    oracle ground truth). Approximate by design (recall tracks the LSH
    s-curve): rows-only driver check + pytest recall gate."""
    return lsh_neardup_pairs(t(spark, sf_dir, "embeddings"), threshold=0.4)


@register("vec_pq_topk", oracle=None)
def vec_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization top-10: corpus compressed to 8x 4-bit codes
    (32x less scan I/O than raw float32 — the memory-bandwidth ANN
    tier), ADC lookup-table scoring, exact rerank of the top-40 via a
    shuffle equi-join on vec_id. Approximate by design: rows-only
    driver check + pytest recall gate vs the exact scan."""
    return pq_topk(t(spark, sf_dir, "embeddings"),
                   n_queries=5, k=10, rerank_factor=4)


@register("vec_ivf_pq_topk", oracle=None)
def vec_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite (the FAISS-default billion-scale shape): seed-
    centroid cells prune WHICH rows are ADC-scored (~nprobe/n_cells of
    the corpus), 8x4-bit PQ codes shrink WHAT each scored row reads
    (32x), and the savings multiply; exact rerank restores true sims.
    Approximate by design: rows-only gate + pytest recall check."""
    return ivf_pq_topk(t(spark, sf_dir, "embeddings"),
                       n_centroids=8, nprobe=3, n_queries=5, k=10,
                       rerank_factor=4)


@register("vec_knn_join", oracle=None)
def vec_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate all-to-all kNN join via random-hyperplane LSH
    (8 bands x 4 sign bits): candidates share >=1 band bucket, exact
    cosine rerank, top-5 per vector. Sublinear candidate generation —
    the 100 TB path for corpus-vs-corpus joins. Approximate by design:
    rows-only driver check + pytest recall gate vs the exact scan."""
    return knn_join_lsh(t(spark, sf_dir, "embeddings"), k=5)


@register(
    "vec_semantic_doc_dedup",
    oracle=f"""
    WITH RECURSIVE n AS ({_VNORM}),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE {_sim('a.v', 'b.v', 'a.nrm', 'b.nrm')} >= 0.4
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM p
              UNION SELECT id_b, id_a FROM p),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    ),
    cl AS (SELECT node AS vdoc, MIN(r) AS cluster_id FROM reach GROUP BY node),
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cl
              GROUP BY cluster_id)
    SELECT d.doc_id,
           COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
           CAST(CASE WHEN COALESCE(cl.cluster_id, d.doc_id) = d.doc_id
                     THEN 1 ELSE 0 END AS INT) AS is_keeper,
           COALESCE(s.cluster_size, 1) AS cluster_size
    FROM documents d
    LEFT JOIN cl ON cl.vdoc = d.doc_id
    LEFT JOIN sizes s ON s.cluster_id = cl.cluster_id
    """,
)
def vec_semantic_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup as a DOC-LEVEL dedup decision: the
    testdata aligns embeddings.vec_id 1:1 with documents.doc_id, so
    cosine pairs -> connected components -> keeper/cluster-size joins
    back onto documents (docs with no near-neighbor form singleton
    clusters of themselves). This gate runs the EXACT all-pairs tier
    so the recursive-CTE oracle hash-checks the whole composition; at
    100 TB the candidate stage swaps to lsh_neardup_pairs — identical
    output contract, recall-gated in tests — and everything downstream
    is unchanged."""
    from ..operators.dedup import neardup_clusters

    emb = t(spark, sf_dir, "embeddings")
    cl = neardup_clusters(
        cosine_neardup_pairs(emb, threshold=0.4)).select(
        F.col("doc_id").alias("vdoc"), "cluster_id")
    sizes = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    d = t(spark, sf_dir, "documents").select("doc_id")
    cid = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    return (
        d.join(cl, d.doc_id == cl.vdoc, "left")
        .join(sizes, "cluster_id", "left")
        .select(
            "doc_id",
            cid.alias("cluster_id"),
            (cid == F.col("doc_id")).cast("int").alias("is_keeper"),
            F.coalesce(F.col("cluster_size"), F.lit(1).cast("long"))
            .alias("cluster_size"),
        )
    )
