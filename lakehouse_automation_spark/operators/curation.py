"""Training-data curation operators beyond dedup: eval-set
decontamination, deterministic mixture sampling, and concat-and-chunk
sequence packing — the three steps between "deduped corpus" and
"training batches" in an LLM data pipeline.

All three are pure DataFrame composition over the same md5-derived
portable hashes as operators/dedup.py, so every key built on them
carries an exact DuckDB oracle.

Scale shapes (100-TB):
- decontamination: the eval/benchmark side is TINY by definition, so
  its distinct shingle-hash set broadcasts; the corpus side is one
  explode + broadcast join + groupBy — linear in corpus tokens,
  never corpus×eval.
- mixture sampling: a narrow stateless projection (hash < rate) —
  computed inline, no shuffle before the per-source count.
- packing: cumulative token sums inside hash buckets — each window
  sorts ONE bucket, so parallelism = n_buckets and no global sort;
  at larger corpora raise n_buckets so a bucket fits an executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import portable_hash, shingle_hashes_col, tokens_col


def decontaminate_hits(docs: DataFrame, eval_pred: Column,
                       k: int = 5) -> DataFrame:
    """(doc_id, n_shared): TRAINING documents sharing >=1 distinct
    k-word-shingle hash with ANY document of the eval set
    (``eval_pred`` marks eval rows). This is benchmark
    decontamination: a training doc containing an eval n-gram is a
    leakage suspect, scored by how many distinct eval shingles it
    carries."""
    toks = docs.select(
        "doc_id", eval_pred.alias("is_eval"),
        tokens_col(F.col("text")).alias("t"))
    hashes = toks.select(
        "doc_id", "is_eval",
        F.explode(shingle_hashes_col(F.col("t"), k)).alias("h"))
    eval_hashes = (hashes.filter(F.col("is_eval"))
                   .select("h").distinct())
    return (
        hashes.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_hashes), "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n_shared"))
    )


def mixture_sample_counts(docs: DataFrame, rate_pct: Column) -> DataFrame:
    """(source, n_total, n_kept): deterministic weighted sampling per
    source — keep a doc iff md5-hash(source:doc_id) % 100 < its
    source's ``rate_pct``. The hash-based keep decision is the
    reproducible-at-scale alternative to rand(): stable across runs,
    engines, and cluster sizes, and replayable by a SQL oracle."""
    h = portable_hash(
        F.concat(F.col("source"), F.lit(":"),
                 F.col("doc_id").cast("string"))) % 100
    return (
        docs.select("source", rate_pct.alias("rate_pct"), h.alias("h"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_total"),
             F.sum(F.when(F.col("h") < F.col("rate_pct"), 1)
                   .otherwise(0)).cast("long").alias("n_kept"))
    )


def pack_sequences(docs: DataFrame, budget: int = 2048,
                   n_buckets: int = 8) -> DataFrame:
    """Concat-and-chunk packing: within each hash bucket, documents
    are concatenated in doc_id order and split into fixed
    ``budget``-token training sequences; each doc reports the
    sequence ids its tokens land in (``seq_start``..``seq_end`` —
    a doc straddles a boundary when they differ). Integer-exact
    window cumsum, so the oracle replays it bit-for-bit."""
    tk = docs.select(
        "doc_id", (F.col("doc_id") % n_buckets).alias("bucket"),
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"))
    from pyspark.sql import Window
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        tk.withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id", "bucket", "n_tokens",
            F.expr(f"(cum - n_tokens) div {budget}").alias("seq_start"),
            F.expr(f"(cum - 1) div {budget}").alias("seq_end"))
    )
