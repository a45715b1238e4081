#!/usr/bin/env python
"""Refresh-aging probe (VERDICT r8 ask #6): what sustained incremental
maintenance does to the two persisted indexes, measured at sf1.

Both incremental paths were already shown corpus-independent PER BATCH
(SCALE.md); the open question is what k SUCCESSIVE refreshes do:

- ``vec_ivf_index_refresh``: the index's centroids are FROZEN at build
  time, so as the corpus grows through refreshes the cell partition
  stops reflecting the data (the sf1 corpus's later vec_id ranges are
  orthogonally transformed replicas — a genuine distribution shift).
  We track, at growth checkpoints: cell-occupancy skew, files/cell,
  real search latency (min of 3) and recall@10 of the REAL persisted
  index against an exact numpy brute-force ground truth — and against
  a RE-TRAINED alternative (k-means centroids recomputed on the grown
  corpus, evaluated in numpy under the identical probe rule), which is
  what a rebuild would buy.

- ``text_incremental_dedup``'s persisted index (distinct content md5 +
  MinHash band buckets): per-batch dedup wall as the index grows batch
  over batch — the flat-cost claim, measured across k batches instead
  of one.

Writes the --json-out record (default bench/AGING_r12.json)
and prints the SCALE.md tables.

  python tools/aging_probe.py [--json-out FILE]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("AGING_SF_DIR",
                        os.path.join(REPO, ".scaledata", "sf1"))

N_CENTROIDS, NPROBE, N_QUERIES, K = 8, 3, 5, 10


def _normed(mat: np.ndarray) -> np.ndarray:
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _spread_queries(ids: np.ndarray) -> list[int]:
    """200 deterministic query ids spread across the whole id range
    (so later, distribution-shifted replicas are represented), none of
    them a centroid seed. The default 5-query search contract
    (vec_id < 5) saturates recall at 1.0 here — those queries ARE
    centroid seeds, so their neighbors live in their own cell by
    construction; a recall eval needs non-seed queries."""
    return [int(v) for v in ids[N_CENTROIDS::97][:200]]


def _numpy_ivf_recall(ids, X, cents: np.ndarray, nprobe: int) -> float:
    """Mean recall@K over the spread queries of an IVF search under
    the SAME rule as ivf_index_search (argmax-cosine cell assignment,
    top-``nprobe`` probe, exact rerank inside probed cells), evaluated
    in numpy for an arbitrary centroid set. For the FROZEN build
    centroids this reproduces the persisted index's assignments
    (tests pin refresh == rebuild under that rule); passing re-trained
    k-means centroids evaluates the rebuild alternative."""
    cn = _normed(cents)
    cell = np.argmax(X @ cn.T, axis=1)
    vals = []
    for q in _spread_queries(ids):
        qi = int(np.nonzero(ids == q)[0][0])
        qv = X[qi]
        s = X @ qv
        s[qi] = -2.0
        exact = set(map(int, ids[np.argsort(-s, kind="stable")[:K]]))
        probe = np.argsort(-(cn @ qv))[:nprobe]
        mask = np.isin(cell, probe)
        mask[qi] = False
        cand_ids, cand = ids[mask], X[mask]
        order = np.argsort(-(cand @ qv), kind="stable")[:K]
        got = set(map(int, cand_ids[order]))
        vals.append(len(got & exact) / K)
    return round(float(np.mean(vals)), 4)


def _numpy_kmeans(ids: np.ndarray, X: np.ndarray, k: int = N_CENTROIDS,
                  iters: int = 2) -> np.ndarray:
    """The library's deterministic spherical k-means (seeds vec_id<k,
    argmax-cosine assign, mean recompute) replicated in numpy — the
    're-train on the grown corpus' alternative."""
    C = X[ids < k].copy()
    for _ in range(iters):
        cn = _normed(C)
        cell = np.argmax(X @ cn.T, axis=1)
        for c in range(k):
            m = cell == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    return C


def ivf_probe(spark, record: dict) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lakehouse_automation_spark.operators.vector import (
        ivf_index_compact, ivf_index_refresh, ivf_index_search,
        ivf_index_write)

    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .select("vec_id", "embedding"))
    rows = emb.collect()  # 20k x 64 floats ~ 5 MB: ground-truth copy
    rows.sort(key=lambda r: r.vec_id)  # collect order is partition-
    # interleaved in general; _spread_queries' seed-exclusion stride
    # assumes vec_id order
    all_ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    all_X = _normed(np.array([r.embedding for r in rows],
                             dtype=np.float64))

    total = int(all_ids.max()) + 1
    n0 = total // 2
    batch_sz = (total - n0) // 8
    scratch = tempfile.mkdtemp(prefix="aging_ivf_")
    idx = os.path.join(scratch, "idx")  # write wants a fresh path
    # cadenced twin (round 10): same build, refreshed with
    # compact_files_per_cell=8 — the wired-in maintenance policy —
    # to measure that file growth stays capped WITHOUT an external
    # compact pass, at identical content/search results
    idx2 = os.path.join(scratch, "idx_cadence")
    try:
        ivf_index_write(emb.filter(F.col("vec_id") < n0), idx,
                        n_centroids=N_CENTROIDS)
        ivf_index_write(emb.filter(F.col("vec_id") < n0), idx2,
                        n_centroids=N_CENTROIDS)
        steps = []
        cadence_steps = []

        def checkpoint(label: str, hi: int) -> None:
            now = emb.filter(F.col("vec_id") < hi)
            m = all_ids < hi
            ids, X = all_ids[m], all_X[m]
            occ = np.array(
                [r["count"] for r in spark.read.parquet(idx)
                 .groupBy("cell_id").count().collect()], dtype=np.float64)
            parts = glob.glob(os.path.join(idx, "cell_id=*", "*.parquet"))
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                ivf_index_search(
                    spark, now, idx, n_centroids=N_CENTROIDS,
                    nprobe=NPROBE, n_queries=N_QUERIES, k=K).collect()
                walls.append(time.perf_counter() - t0)
            frozen = all_X[all_ids < N_CENTROIDS]
            retrained = _numpy_kmeans(ids, X)
            steps.append({
                "step": label, "corpus": int(m.sum()),
                "occupancy_max_over_mean": round(
                    float(occ.max() / occ.mean()), 3),
                "files": len(parts),
                "search_sec": round(min(walls), 3),
                "recall_frozen_np1": _numpy_ivf_recall(ids, X, frozen, 1),
                "recall_retrained_np1": _numpy_ivf_recall(
                    ids, X, retrained, 1),
                "recall_frozen_np3": _numpy_ivf_recall(ids, X, frozen, 3),
                "recall_retrained_np3": _numpy_ivf_recall(
                    ids, X, retrained, 3),
            })
            print(json.dumps(steps[-1]))

        def cadence_checkpoint(label: str, hi: int) -> None:
            now = emb.filter(F.col("vec_id") < hi)
            parts = glob.glob(os.path.join(idx2, "cell_id=*", "*.parquet"))
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                ivf_index_search(
                    spark, now, idx2, n_centroids=N_CENTROIDS,
                    nprobe=NPROBE, n_queries=N_QUERIES, k=K).collect()
                walls.append(time.perf_counter() - t0)
            cadence_steps.append({
                "step": label, "files": len(parts),
                "search_sec": round(min(walls), 3)})
            print(json.dumps({"cadence": cadence_steps[-1]}))

        checkpoint("build@50%", n0)
        # storage-registry column (VERDICT r11 ask #7): the r11 swap
        # from localCheckpoint to persist/unpersist is pytest-pinned
        # single-refresh; here the SAME invariant is asserted at scale
        # across the whole 8-refresh cadence — the JVM persistent-RDD
        # registry must end each refresh no larger than it started, or
        # a long-running maintenance daemon accumulates executor
        # storage.
        jsc = spark.sparkContext._jsc.sc()
        storage_steps = []
        for b in range(8):
            lo, hi = n0 + b * batch_sz, n0 + (b + 1) * batch_sz
            if b == 7:
                hi = total
            batch = emb.filter((F.col("vec_id") >= lo)
                               & (F.col("vec_id") < hi))
            rdds_before = jsc.getPersistentRDDs().size()
            ivf_index_refresh(spark, batch, idx)
            ivf_index_refresh(spark, batch, idx2,
                              compact_files_per_cell=8)
            rdds_after = jsc.getPersistentRDDs().size()
            storage_steps.append({
                "refresh": b + 1, "rdds_before": rdds_before,
                "rdds_after": rdds_after})
            assert rdds_after <= rdds_before, (
                f"refresh#{b + 1} leaked cached blocks: "
                f"{rdds_before} -> {rdds_after}")
            if b in (1, 3, 5, 7):
                checkpoint(f"refresh#{b + 1}", hi)
                cadence_checkpoint(f"refresh#{b + 1}", hi)

        # compaction closes the small-file half of aging
        t0 = time.perf_counter()
        ivf_index_compact(spark, idx)
        compact_sec = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            ivf_index_search(spark, emb, idx, n_centroids=N_CENTROIDS,
                             nprobe=NPROBE, n_queries=N_QUERIES,
                             k=K).collect()
            walls.append(time.perf_counter() - t0)
        # cadence-vs-plain content equality (the wired-in policy must
        # never change assignments)
        a = {(r.vec_id, r.cell_id) for r in spark.read.parquet(idx)
             .select("vec_id", "cell_id").collect()}
        b2 = {(r.vec_id, r.cell_id) for r in spark.read.parquet(idx2)
              .select("vec_id", "cell_id").collect()}
        record["ivf"] = {
            "steps": steps,
            "compact_sec": round(compact_sec, 3),
            "search_sec_after_compact": round(min(walls), 3),
            "files_after_compact": len(glob.glob(
                os.path.join(idx, "cell_id=*", "*.parquet"))),
            "cadence_steps": cadence_steps,
            "cadence_files_final": len(glob.glob(
                os.path.join(idx2, "cell_id=*", "*.parquet"))),
            "cadence_content_equal": a == b2,
            "storage_registry": storage_steps,
        }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def text_probe(spark, record: dict) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lakehouse_automation_spark.operators.dedup import (
        content_norm_col, minhash_buckets)

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    total = docs.count()
    n0 = total // 2
    batch_sz = (total - n0) // 8

    def md5_of(df):
        return df.select(
            "doc_id", F.md5(content_norm_col("text")).alias("content_md5"))

    root = tempfile.mkdtemp(prefix="aging_dedup_")
    try:
        (md5_of(docs.filter(F.col("doc_id") < n0))
         .select("content_md5").distinct().write.parquet(f"{root}/md5"))
        minhash_buckets(docs.filter(F.col("doc_id") < n0), k=3) \
            .write.parquet(f"{root}/buckets")
        steps = []
        for b in range(8):
            lo, hi = n0 + b * batch_sz, n0 + (b + 1) * batch_sz
            if b == 7:
                hi = total
            batch = docs.filter((F.col("doc_id") >= lo)
                                & (F.col("doc_id") < hi))
            t0 = time.perf_counter()
            idx_md5 = spark.read.parquet(f"{root}/md5")
            idx_b = spark.read.parquet(f"{root}/buckets")
            n_exact = (md5_of(batch)
                       .join(idx_md5, "content_md5", "left_semi").count())
            bb = minhash_buckets(batch, k=3)
            n_near = (bb.join(idx_b.select("band_id", "band_hash"),
                              ["band_id", "band_hash"], "left_semi")
                      .select("doc_id").distinct().count())
            dedup_sec = time.perf_counter() - t0
            t0 = time.perf_counter()
            (md5_of(batch).select("content_md5").distinct()
             .write.mode("append").parquet(f"{root}/md5"))
            bb.write.mode("append").parquet(f"{root}/buckets")
            append_sec = time.perf_counter() - t0
            steps.append({
                "batch": b + 1, "batch_docs": hi - lo,
                "index_docs_before": lo,
                "exact_dups": n_exact, "near_dups": n_near,
                "dedup_sec": round(dedup_sec, 3),
                "append_sec": round(append_sec, 3),
            })
            print(json.dumps(steps[-1]))
        record["text_incremental"] = {"steps": steps}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out",
                    default=os.path.join(REPO, "bench", "AGING_r12.json"))
    args = ap.parse_args()

    from lakehouse_automation_spark.engine import get_spark

    spark = get_spark("aging-probe")
    record: dict = {"sf_dir": SF_DIR}
    ivf_probe(spark, record)
    text_probe(spark, record)
    with open(args.json_out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
