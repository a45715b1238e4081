"""Vector similarity-search operators over ``embeddings.embedding``
(array<float>, 64-dim in the driver testdata).

Three tiers, mirroring what a 100 TB training-data pipeline needs:

- **exact**: brute-force cosine — broadcast a small query set against
  the corpus (linear scan, embarrassingly parallel), or all-pairs for
  near-dup verification;
- **IVF**: coarse-quantizer cells (assign to nearest centroid), probe
  the ``nprobe`` nearest cells per query — prunes the scan by
  ~n_cells/nprobe; deterministic seed centroids here so the DuckDB
  oracle can replay it (production would k-means them);
- **RP-LSH**: random-hyperplane sign signatures, banded; candidates
  share >=1 band bucket — sublinear candidate generation for kNN joins
  where both sides are large.

All arithmetic is JVM-side (zip_with/aggregate fold in double);
similarities are rounded to 9 decimals before ranking so Spark and
DuckDB order identically (absorbs last-ulp summation differences).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

from .cache import memo_scalar, tracked_persist_keyed
from .cache import plan_key as _plan_key  # shared with text_pipeline


SIM_DECIMALS = 9

# RP-LSH plane constants: deterministic, shared with any oracle/replay.
_rng = random.Random(123)  # fixed seed: planes are part of the contract
N_PLANES = 32        # 8 bands x 4 bits
N_LSH_BANDS = 8
BITS_PER_BAND = N_PLANES // N_LSH_BANDS
LSH_DIM = 64
# Uniform in [-1, 1): direction-uniform enough for sign-LSH, and exactly
# representable constants keep the dot products reproducible.
LSH_PLANES = [
    [_rng.uniform(-1.0, 1.0) for _ in range(LSH_DIM)] for _ in range(N_PLANES)
]

# Extended plane budget for large corpora (round-7 sf10 probe: the
# 8-bit cap on 32 fixed planes lets candidates regrow n²/256 — 780
# vectors/bucket at 200k). Holding recall while bits/band grows needs
# MORE bands of LONGER signatures (1-(1-p^r)^b), i.e. a larger total
# budget: the 16-bit × 16-band tier uses 256 planes. A SEPARATE rng
# (not a continuation of ``_rng``) so extending the budget can never
# perturb any other seeded constant; LSH_PLANES_EXT[:N_PLANES] is the
# original 32-plane contract the SQL oracles embed, verbatim.
N_PLANES_MAX = 256
_rng_ext = random.Random(124)
LSH_PLANES_EXT = LSH_PLANES + [
    [_rng_ext.uniform(-1.0, 1.0) for _ in range(LSH_DIM)]
    for _ in range(N_PLANES_MAX - N_PLANES)
]


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Sequential left-to-right dot product in double.

    With ``dim`` known, unrolls to a left-deep sum of 0-based array
    accesses: whole-stage-codegen'd JVM arithmetic in the SAME order as
    the fold, ~30x faster than the lambda path (higher-order functions
    are CodegenFallback — interpreted per row — so zip_with/aggregate
    must stay off the pair-join hot path). When both inputs are COLUMN
    NAMES the whole sum is built as ONE SQL string parsed server-side:
    the Column-object form costs ~3 py4j round-trips per term, which at
    64 dims x several dots added whole seconds of driver-side plan
    construction per query. Falls back to the fold when the width is
    unknown.
    """
    if dim is not None and isinstance(a, str) and isinstance(b, str):
        # SQL `arr[i]` is 0-based GetArrayItem — identical semantics
        # and evaluation order to the getItem chain it replaces.
        return F.expr("+".join(f"{a}[{i}]*{b}[{i}]" for i in range(dim)))
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    if dim is not None:
        acc = a.getItem(0) * b.getItem(0)
        for i in range(1, dim):
            acc = acc + a.getItem(i) * b.getItem(i)
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(vec: Column | str, dim: int | None = None) -> Column:
    return F.sqrt(dot(vec, vec, dim))


def with_vnorm(emb: DataFrame, vec_col: str = "embedding",
               dim: int = LSH_DIM) -> DataFrame:
    """Project (vec_id, v: array<double>, nrm) — narrow, no shuffle."""
    v = as_double(F.col(vec_col))
    # Two-step projection: `v` becomes a materialized attribute, so the
    # unrolled norm reads it instead of re-inlining the cast transform
    # 2*dim times (CollapseProject keeps multi-referenced non-cheap
    # aliases at a boundary).
    # The IsNotNull filter ENFORCES the vector family's ingest
    # contract (a NULL embedding has no geometry — it can't be
    # indexed, banded, or ranked) instead of assuming it: pushed to
    # the parquet scan, free on clean data, and every downstream tier
    # inherits the guarantee through this one funnel.
    return (
        emb.filter(F.col(vec_col).isNotNull())
        .select("vec_id", v.alias("v"))
        .select("vec_id", "v", norm("v", dim).alias("nrm"))
    )


def cosine_sim(va: Column | str, vb: Column | str, na: Column | str,
               nb: Column | str, dim: int = LSH_DIM) -> Column:
    """round(dot/(na*nb), 9) — one division, then rounding for
    cross-engine rank stability. Pass column NAMES to get the cheap
    single-expr plan build (see :func:`dot`)."""
    na = F.col(na) if isinstance(na, str) else na
    nb = F.col(nb) if isinstance(nb, str) else nb
    return F.round(dot(va, vb, dim) / (na * nb), SIM_DECIMALS)


def cosine_topk(emb: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Exact brute-force top-k: the first ``n_queries`` vec_ids against
    every other vector. The query side is broadcast (tiny), the corpus
    side is a linear partition-parallel scan — the right plan at any
    corpus size when the query set is small."""
    n = with_vnorm(emb)
    q = F.broadcast(
        n.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                F.col("nrm").alias("qn"))
    )
    pairs = q.join(n, F.col("q_id") != F.col("vec_id"))
    sim = cosine_sim("qv", "v", "qn", "nrm")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_r"), F.asc("vec_id"))
    return (
        pairs.select("q_id", "vec_id", sim.alias("sim_r"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def cosine_neardup_pairs(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """All-pairs cosine near-duplicate detection (exact tier).

    O(n^2) by construction — correct as the verification stage after a
    candidate generator. At corpus scale run :func:`knn_join_lsh` first
    and verify only its candidates; this exact form is the oracle-able
    ground truth the approximate tiers are measured against."""
    # Pair generation runs on BARE IDS (cheap nested-loop condition),
    # then two broadcast equi-joins attach vectors and the similarity
    # is computed in a whole-stage-codegen projection. Computing sim
    # inside the non-equi join condition instead is ~20x slower: the
    # filter gets pushed into the BroadcastNestedLoopJoin, whose
    # condition is evaluated interpreted for every (a, b) combination.
    ids = emb.select("vec_id")
    pairs = (
        ids.select(F.col("vec_id").alias("id_a"))
        .join(ids.select(F.col("vec_id").alias("id_b")),
              F.col("id_a") < F.col("id_b"))
    )
    n = with_vnorm(emb)
    a = F.broadcast(n.select(F.col("vec_id").alias("id_a"),
                             F.col("v").alias("va"), F.col("nrm").alias("na")))
    b = F.broadcast(n.select(F.col("vec_id").alias("id_b"),
                             F.col("v").alias("vb"), F.col("nrm").alias("nb")))
    sim = cosine_sim("va", "vb", "na", "nb")
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", sim.alias("sim_r"))
        .filter(F.col("sim_r") >= threshold)
    )


# ------------------------------------------------------------------- IVF

def ivf_topk(emb: DataFrame, n_centroids: int = 8, nprobe: int = 3,
             n_queries: int = 5, k: int = 10) -> DataFrame:
    """IVF-flat approximate top-k.

    Cells = nearest of ``n_centroids`` seed centroids (vec_id 0..C-1;
    deterministic so DuckDB can replay — production would k-means).
    Each query probes its ``nprobe`` nearest cells and reranks exactly
    within them: the scan shrinks by ~nprobe/n_centroids, and at scale
    the cell assignment is a broadcast join + one shuffle on cell_id.
    """
    assigned, probes = _ivf_assign_and_probes(
        emb, n_centroids, nprobe, n_queries)
    # the probe side is bounded by n_queries x nprobe rows at ANY
    # corpus size — a planner-time broadcast keeps the corpus side
    # exchange-free instead of materializing both sides for AQE
    cand = (F.broadcast(probes).join(assigned, "cell_id")
            .filter(F.col("q_id") != F.col("vec_id")))
    qsim = cosine_sim("qv", "v", "qn", "nrm")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_r"), F.asc("vec_id"))
    return (
        cand.select("q_id", "vec_id", qsim.alias("sim_r"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def _norm_py(cv: list, dim: int) -> float | None:
    """Driver-side replica of ``norm(cv, dim)``: left-fold sum of
    squares then sqrt — the identical IEEE operation sequence, so the
    value is bit-equal to the in-plan expression. None (NULL) where the
    in-plan form is NULL: a short array (out-of-range GetArrayItem) or
    a NULL element."""
    import math

    if len(cv) < dim or any(x is None for x in cv[:dim]):
        return None
    acc = cv[0] * cv[0]
    for i in range(1, dim):
        acc += cv[i] * cv[i]
    return math.sqrt(acc)


def _dlit(x: float | None) -> str:
    """Exact SQL double literal: repr() is the shortest round-tripping
    decimal form and the 'D' suffix parses it as DOUBLE directly (no
    cast node); non-finite specials go through the string cast, which
    Spark parses case-insensitively. None maps to NULL."""
    if x is None:
        return "CAST(NULL AS DOUBLE)"
    r = repr(float(x))
    if r in ("nan", "inf", "-inf"):
        return f"CAST('{r}' AS DOUBLE)"
    return r + "D"



def _darr(xs: list) -> str:
    """Exact SQL array<double> literal via :func:`_dlit`. An empty
    list needs the cast — bare ``array()`` types as array<void>."""
    if not xs:
        return "CAST(array() AS ARRAY<DOUBLE>)"
    return f"array({','.join(_dlit(x) for x in xs)})"


def _inline_relation(spark, structs: str) -> DataFrame:
    """Literal relation (one row per named_struct in ``structs``) via
    ``inline(array(...))`` — the python-parallelize-free local
    relation. A createDataFrame collection lands in
    default.parallelism slices whose reads are re-paid on every
    broadcast build (~0.2-0.3 s measured for 8 rows); a literal
    relation is part of the plan and costs nothing to realize."""
    return spark.range(1).select(F.expr(f"inline(array({structs}))"))


def _assign_cells(n: DataFrame, cents: list[tuple[int, list[float], float]],
                  dim: int = LSH_DIM) -> DataFrame:
    """Nearest-centroid cell assignment as ONE narrow JVM projection:
    (vec_id, v, nrm, cell_id), cell_id typed like vec_id.

    Per centroid, ``csim = round(dot(v, c) / (nrm * cn), 9)`` is built
    from EXACT double literals (:func:`_dlit` — repr() round-trips, the
    same literal-centroid in-plan form :func:`_probe_cells` uses), and
    the winner is ``array_max`` over ``(csim, -cent_id)`` structs —
    pure whole-stage-codegen expressions, no crossJoin, no corpus
    argmax window, no shuffle, and (unlike the r16 Arrow form this
    replaces) NO Python/Arrow boundary on the full-corpus hot path:
    guide §4.1 — a built-in exists, use it. The r16 ``mapInPandas``
    form Arrow-serialized (vec_id, 64-double v, nrm) out to Python
    workers and back for an argmax over 8 literals; the driver bench
    measured the one key on that path (vec_ivf_index_refresh) 2x
    slower drift-adjusted, so this keeps its shuffle removal and drops
    its Python boundary.

    Spark's struct ordering reproduces the original crossJoin +
    row_number window's (csim DESC, cent_id ASC) contract exactly:

    - doubles compare NaN-largest (identical to the window's desc-sort
      putting NaN first);
    - a NULL csim — poisoned centroid (short centroid vector, NULL
      element, or NULL norm folds the whole expression to NULL), or a
      NULL-norm row, which poisons EVERY centroid — compares SMALLEST
      (the window's desc NULLS LAST), and an all-NULL row falls to the
      second struct field, where max(-cent_id) = min cent_id;
    - unlike the r16 Arrow argmax's -inf sentinel, a poisoned
      centroid's NULL ranks strictly BELOW a real csim that evaluates
      to -inf (ADVICE r16: the sentinel could tie with a real -inf and
      steal the win from the real centroid).
    """
    id_type = n.schema["vec_id"].dataType
    if not cents:
        # empty centroid set: the crossJoin form produced zero rows
        return (n.select("vec_id", "v", "nrm",
                         F.lit(None).cast(id_type).alias("cell_id"))
                .filter(F.lit(False)))

    def csim(cv: list, cn_: float | None) -> str:
        # identical shape to cosine_sim over a centroid row: a short
        # centroid (out-of-range GetArrayItem) or NULL element becomes
        # a NULL term, which NullPropagation folds to NULL csim
        dot_ = "+".join(
            f"v[{i}]*{_dlit(cv[i] if i < len(cv) else None)}"
            for i in range(dim))
        return f"round(({dot_})/(nrm*{_dlit(cn_)}),{SIM_DECIMALS})"

    structs = ",".join(
        f"named_struct('s',{csim(cv, cn_)},'p',{-int(cid)}L)"
        for cid, cv, cn_ in cents)
    cell = F.expr(f"-(array_max(array({structs})).p)").cast(id_type)
    return n.select("vec_id", "v", "nrm", cell.alias("cell_id"))


def _probe_cells(n: DataFrame, cents: list[tuple[int, list[float], float]],
                 nprobe: int, n_queries: int) -> DataFrame:
    """(q_id, qv, qn, cell_id): per-query top-``nprobe`` probe cells —
    the original crossJoin + argmax-window shape, but over ONLY the
    query rows (``vec_id < n_queries`` is a scan-pushed predicate) and
    with the centroid side rebuilt from the collected rows as an
    INLINE LITERAL relation (exact double round-trip through
    :func:`_dlit`), so the probe subtree never re-plans the corpus.
    The window runs on n_queries x n_centroids rows — metadata scale.

    Literal inline() rather than createDataFrame: a python-
    parallelized local collection lands in default.parallelism slices
    whose reads are paid again on every broadcast build — a measured
    ~0.2-0.3 s constant per probe invocation for 8 rows; the literal
    relation is part of the plan (same class as the int8 scale
    literal) and costs nothing to realize."""
    id_type = n.schema["vec_id"].dataType
    q = n.filter(F.col("vec_id") < n_queries)
    if not cents:
        return (q.select(F.col("vec_id").alias("q_id"),
                         F.col("v").alias("qv"), F.col("nrm").alias("qn"),
                         F.lit(None).cast(id_type).alias("cell_id"))
                .filter(F.lit(False)))
    spark = n.sparkSession
    rows = ",".join(
        f"named_struct('cent_id',{int(cid)}L,'cv',{_darr(list(cv))},"
        f"'cn',{_dlit(cn)})"
        for cid, cv, cn in cents)
    cdf = F.broadcast(
        _inline_relation(spark, rows)
        .select(F.col("cent_id").cast(id_type).alias("cent_id"),
                "cv", "cn"))
    sim = cosine_sim("v", "cv", "nrm", "cn")
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("csim"), F.asc("cent_id"))
    return (q.crossJoin(cdf)
            .select("vec_id", "v", "nrm", "cent_id", sim.alias("csim"))
            .withColumn("crk", F.row_number().over(w_assign))
            .filter(F.col("crk") <= nprobe)
            .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                    F.col("nrm").alias("qn"),
                    F.col("cent_id").alias("cell_id")))


def _seed_centroid_rows(n: DataFrame,
                        n_centroids: int) -> list[tuple[int, list[float], float]]:
    """Collect the deterministic seed centroids (vec_id < n_centroids)
    with their in-plan-computed norms — bounded metadata (n_centroids x
    dim doubles). Memoized under the memo_scalar lifecycle (released
    with the keyed persists between harness keys) so repeated
    same-corpus invocations don't re-run the tiny collect job."""
    key = ("ivf_seed_cents", n_centroids, _plan_key(n))
    return memo_scalar(key, lambda: sorted(
        ((int(r.vec_id), list(r.v),
          float(r.nrm) if r.nrm is not None else None)
         for r in n.filter(F.col("vec_id") < n_centroids)
         .select("vec_id", "v", "nrm").collect()),
        key=lambda c: c[0]))


def _ivf_assign_and_probes(emb: DataFrame, n_centroids: int, nprobe: int,
                           n_queries: int):
    """(assigned, probes) under the deterministic seed-centroid IVF
    contract — shared by the inline ivf_topk and the persisted-index
    path so the two can never drift. Since r16 the corpus-side
    assignment is the Arrow argmax projection (:func:`_assign_cells` —
    no centroid crossJoin, no corpus-wide argmax window, no shuffle)
    and the probe side windows over query rows only
    (:func:`_probe_cells`)."""
    n = with_vnorm(emb)
    cents = _seed_centroid_rows(n, n_centroids)
    assigned = _assign_cells(n, cents)
    probes = _probe_cells(n, cents, nprobe, n_queries)
    return assigned, probes


def ivf_index_write(emb: DataFrame, path: str, n_centroids: int = 8) -> None:
    """Persist the IVF index as a CELL-PARTITIONED parquet table —
    the build-once half of a real ANN index lifecycle. One directory
    per cell means a probe reads nprobe/n_centroids of the index at
    the FILESYSTEM level (PartitionFilters directory pruning), which
    at 100 TB is the difference between opening every index file and
    only the probed cells'. The build is the expensive pass (full
    corpus assignment); searches amortize it.

    The coarse quantizer (centroid vectors + norms) is persisted as
    index METADATA under ``<path>/_meta/`` — an underscore-prefixed
    directory, so data reads of the partitioned table skip it — which
    is what makes :func:`ivf_index_refresh` possible: a later batch
    assigns against the FROZEN build-time centroids without needing
    the build corpus."""
    from pyspark.sql import types as T

    assigned, _ = _ivf_assign_and_probes(emb, n_centroids, 1, 0)
    assigned.write.partitionBy("cell_id").parquet(path)
    # the quantizer rows were already collected for the assignment
    # (memoized bounded metadata) — write them back from the driver
    # instead of re-scanning the corpus for vec_id < n_centroids
    # (exact double round-trip; one trivial write job, zero data scan)
    n = with_vnorm(emb)
    cents = _seed_centroid_rows(n, n_centroids)
    csch = T.StructType([
        T.StructField("cent_id", n.schema["vec_id"].dataType, False),
        T.StructField("cv", T.ArrayType(T.DoubleType()), True),
        T.StructField("cn", T.DoubleType(), True)])
    # repartition(1), NOT coalesce(1): a python-parallelized local
    # collection lands in default.parallelism slices, and coalesce(1)
    # reads them all SERIALLY in one task (~150 ms per slice — a
    # measured 4-5 s for this 8-row write); repartition's map side
    # reads the slices in parallel and the 1-partition exchange moves
    # 8 rows (measured 0.4 s).
    (emb.sparkSession.createDataFrame(
        [(cid, list(cv), cn) for cid, cv, cn in cents], csch)
     .repartition(1).write.parquet(f"{path}/_meta/centroids"))


def ivf_index_refresh(spark, batch: DataFrame, path: str,
                      compact_files_per_cell: int | None = None) -> DataFrame:
    """Incrementally maintain a persisted IVF index: assign ONLY the
    new ``batch`` vectors to the index's frozen build-time centroids
    (read back from ``_meta/`` — the batch never needs the original
    corpus) and APPEND them to the cell-partitioned table, touching
    only the cell directories the batch lands in. Refresh cost is
    proportional to the BATCH, never the corpus — the lifecycle gap
    between build-once (``ivf_index_write``) and continuous ingestion
    (reference ``check_lakehouse.py:102-123``'s incremental-load loop,
    applied to the vector index): at 100 TB re-running the full build
    per arriving batch is the difference between minutes and hours.

    Because the centroids are frozen, refresh-then-search is EXACTLY
    equivalent to a full rebuild over base ∪ batch (assignment is
    per-vector given fixed centroids) — asserted by the oracle and
    tests. Centroid drift under sustained ingest is the documented
    re-train trigger (rebuild when cell occupancy skews; see
    ``vec_centroid_drift`` for the detector), the same contract as
    FAISS's add() vs train().

    Sustained refresh accumulates one file per batch per touched cell;
    :func:`ivf_index_compact` rewrites chosen cells partition-locally
    (corpus-independent) when the small-file count hurts scan setup.
    Pass ``compact_files_per_cell`` to fold that maintenance into the
    refresh cadence: after the append, any TOUCHED cell holding more
    parquet parts than the threshold is compacted in place — the
    metric-driven form of the round-9 aging measurement
    (SCALE.md §refresh-aging: file count, not recall, is what degrades
    under sustained refresh; files/cell > 8 is the measured knee).
    Untouched cells are never listed, so the check costs
    O(touched cells), not an index walk.

    Returns the assigned batch (vec_id, cell_id) so callers can audit
    which cells were touched; the plan is one broadcast join + one
    append write of batch-sized data. Caller contract on the audit:
    with ``compact_files_per_cell`` set, the assignment cache is
    released once the maintenance pass finishes, so CONSUMING the
    returned DataFrame afterwards re-runs the batch-sized assignment
    job once more — deterministic (frozen centroids), and the right
    trade: the refresh cadence must not retain executor storage for an
    audit most callers drop, so auditors pay, non-auditors don't.
    Callers that always consume it can ``.persist()`` the return
    themselves."""
    from .pathio import pathio_for

    io = pathio_for(spark, path)
    meta = f"{path}/_meta/centroids"
    if not io.isdir(meta):
        raise FileNotFoundError(
            f"{path} has no _meta/centroids — the index predates "
            "refresh support (or is not an IVF index). Rebuild it with "
            "ivf_index_write, which persists the frozen centroids.")
    # the frozen quantizer is n_centroids x dim doubles — read it to the
    # driver (bounded metadata, same class as the PQ codebooks) and
    # assign the batch in ONE narrow projection instead of the old
    # centroid crossJoin + corpus-argmax window (an n_centroids-fold
    # expansion of the batch shuffled on vec_id; guide §2.3/§2.4)
    cents = sorted(
        ((int(r.cent_id), list(r.cv),
          float(r.cn) if r.cn is not None else None)
         for r in spark.read.parquet(meta).collect()),
        key=lambda c: c[0])
    assigned = _assign_cells(with_vnorm(batch), cents)
    if compact_files_per_cell is not None:
        # cache (NOT localCheckpoint) the batch-sized assignment so the
        # append write and the touched-cell listing compute it once
        # instead of re-running the broadcast assignment job 2x (review
        # r10). Cache, because it is RELEASABLE: a localCheckpoint here
        # truncates lineage, so its executor-storage blocks could never
        # be freed while the caller holds the audit DataFrame — a
        # long-running refresh cadence would accumulate them until
        # driver GC (ADVICE r10). The unpersist below returns storage
        # after the maintenance pass; the returned audit select then
        # re-evaluates lazily (deterministic given frozen centroids).
        assigned = assigned.persist()
    assigned.write.mode("append").partitionBy("cell_id").parquet(path)
    if compact_files_per_cell is not None:
        # batch-sized collect: the distinct touched-cell ids (metadata
        # scale — bounded by n_centroids, not corpus)
        touched = sorted(
            r["cell_id"] for r in
            assigned.select("cell_id").distinct().collect())
        crowded = [
            cid for cid in touched
            if sum(f.endswith(".parquet") for f in
                   io.listdir(io.join(path, f"cell_id={cid}")))
            > compact_files_per_cell]
        if crowded:
            ivf_index_compact(spark, path, cells=crowded)
        assigned.unpersist()
    # batch-sized re-evaluation (deterministic given frozen centroids)
    return assigned.select("vec_id", "cell_id")


def ivf_index_compact(spark, path: str,
                      cells: list[int] | None = None) -> int:
    """Rewrite the chosen index cells (default: all) into one file
    each — the maintenance pass that caps the small-file growth of
    sustained :func:`ivf_index_refresh` appends. Each rewrite is
    PARTITION-LOCAL: it reads and rewrites only that cell directory,
    so compacting the k hot cells costs those cells' bytes, never a
    corpus pass — the same partition-scoped maintenance contract as
    the CowTable ``table_compact`` key, applied to the index layout.
    Returns the number of cells rewritten. Assignment content is
    byte-stable (tests pin set equality before/after).

    Crash safety: all scratch state lives under ``<path>/_compact_tmp``
    — underscore-prefixed, so Spark's partitioned read never lists it
    (a tmp dir named ``cell_id=N.tmp`` in the table root would parse
    as a malformed partition value and corrupt discovery for EVERY
    reader until cleaned). The swap keeps exactly one destructive
    step, ordered last: write new → move old aside → move new in →
    delete old. A crash before the delete leaves the old cell intact
    in scratch; only the instant between the two renames has the cell
    absent (readers see a missing cell, never a torn one). On entry
    the pass first REPLAYS any interrupted swap it finds in scratch —
    a cell directory missing from the table is restored from its
    surviving scratch copy (old-N preferred: it is the authoritative
    pre-compact data; new-N only if old-N is already gone) — and only
    then wipes scratch, so a crash is recoverable by simply running
    compact again, and the wipe can never destroy the sole copy.

    Index-maintenance metadata ops (this and :func:`ivf_index_refresh`)
    run through the PathIO abstraction (operators/pathio.py): local
    paths use os.rename/isdir; hdfs/s3a/gs URIs resolve the Hadoop
    FileSystem API — the same single-directory rename contract — and
    an unsupported scheme raises loudly instead of half-running the
    swap with os.* calls that cannot see the remote store."""
    from .pathio import pathio_for, replay_interrupted_swap

    io = pathio_for(spark, path)
    scratch = io.join(path, "_compact_tmp")
    # crash recovery BEFORE touching scratch: an interrupted prior run
    # can have left a cell present only as scratch/old-N (crash between
    # the two renames) or only as scratch/new-N (crash after rename(cdir,
    # old) failed midway through a dirty shutdown). Restore before the
    # wipe below, or the wipe would delete the last copy of the cell.
    replay_interrupted_swap(io, path, scratch)
    io.rmtree(scratch)
    io.makedirs(scratch)
    # enumerate cells AFTER recovery, so a just-restored cell is both
    # listed and compacted in the same pass
    if cells is None:
        cells = sorted(
            int(name.split("=", 1)[1])
            for name in io.list_prefixed(path, "cell_id="))
    for cid in cells:
        cdir = io.join(path, f"cell_id={cid}")
        tmp = io.join(scratch, f"new-{cid}")
        old = io.join(scratch, f"old-{cid}")
        (spark.read.parquet(cdir).coalesce(1)
         .write.mode("overwrite").parquet(tmp))
        # drop the nested _SUCCESS marker before the swap; the cell
        # dir must hold only parquet parts for the partitioned read
        io.unlink(io.join(tmp, "_SUCCESS"))
        io.rename(cdir, old)
        io.rename(tmp, cdir)
        io.rmtree(old)
    io.rmtree(scratch)
    return len(cells)


def ivf_index_search(spark, emb: DataFrame, path: str,
                     n_centroids: int = 8, nprobe: int = 3,
                     n_queries: int = 5, k: int = 10) -> DataFrame:
    """Search a persisted IVF index: probe cells come from the same
    deterministic centroids, the probed cell ids (nprobe x n_queries
    values — metadata-scale) collect to the driver, and the index READ
    carries them as a partition-column filter so only the probed cell
    directories are listed and scanned. Exact cosine rerank within the
    probed cells; identical output contract (and oracle) to the
    inline ivf_topk."""
    from pyspark.sql import types as T

    # probes only — building (and discarding) the corpus-assignment
    # plan here paid the 8x64-term argmax expression's construction
    # and analysis per search invocation for nothing
    n_ = with_vnorm(emb)
    probes = _probe_cells(n_, _seed_centroid_rows(n_, n_centroids),
                          nprobe, n_queries)
    cells = [r["cell_id"]
             for r in probes.select("cell_id").distinct().collect()]
    # read with the EXPLICIT index schema (derived from the corpus the
    # index was built from, so the two cannot drift): no footer
    # inference pass, and an EMPTY index — a 0-row build window writes
    # zero cell files — reads back as 0 rows instead of failing
    # UNABLE_TO_INFER_SCHEMA. cell_id takes vec_id's type (it is an
    # aliased seed vec_id), so the probe join is cast-free.
    base = with_vnorm(emb).select("vec_id", "v", "nrm").schema
    sch = T.StructType(list(base.fields) + [
        T.StructField("cell_id", base["vec_id"].dataType, True)])
    idx = spark.read.schema(sch).parquet(path).filter(
        F.col("cell_id").isin(cells))
    cand = (F.broadcast(probes).join(idx, "cell_id")
            .filter(F.col("q_id") != F.col("vec_id")))
    qsim = cosine_sim("qv", "v", "qn", "nrm")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_r"), F.asc("vec_id"))
    return (
        cand.select("q_id", "vec_id", qsim.alias("sim_r"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def kmeans_centroids(emb: DataFrame, k: int = 8, iters: int = 2,
                     dim: int = LSH_DIM) -> list[tuple[int, list[float]]]:
    """Spherical k-means centroids via Lloyd iterations, pure DataFrame
    ops per round: assign = one narrow literal-centroid argmax
    projection (:func:`_assign_cells` — the centroids already live on
    the driver between rounds, so there is no crossJoin, no argmax
    window, no shuffle; the r16 re-plan), recompute = posexplode +
    per-(cell, pos) mean + re-assemble. Deterministic: seeds are
    vec_id < k, ties break on cent_id, no RNG anywhere.

    Centroids are collected to the DRIVER between rounds (k x dim
    doubles — every k-means implementation does this, incl. MLlib).
    The corpus is never collected. Scale shape per round: one narrow
    assignment projection + one narrow explode + one (cell, pos)
    shuffle bounded by k*dim groups."""
    n = with_vnorm(emb)
    seed_rows = sorted(
        n.filter(F.col("vec_id") < k).select("vec_id", "v").collect(),
        key=lambda r: r.vec_id,
    )
    cents: list[list[float]] = [list(r.v) for r in seed_rows]
    for _ in range(iters):
        assigned = _assign_cells(
            n, [(cid, cv, _norm_py(cv, dim)) for cid, cv in enumerate(cents)],
            dim=dim).withColumnRenamed("cell_id", "cent_id")
        means = (
            assigned.select("cent_id", F.posexplode("v").alias("pos", "val"))
            .groupBy("cent_id", "pos").agg(F.avg("val").alias("m"))
            .groupBy("cent_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cent_id", F.col("pm.m").alias("cv"))
        )
        new = {int(r.cent_id): list(r.cv) for r in means.collect()}
        # empty cells keep their previous centroid (standard Lloyd fix)
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    return list(enumerate(cents))


def ivf_kmeans_topk(emb: DataFrame, n_centroids: int = 8, nprobe: int = 3,
                    n_queries: int = 5, k: int = 10, iters: int = 2) -> DataFrame:
    """IVF-flat with k-means-refined cells: same probe/rerank plan as
    :func:`ivf_topk`, but the coarse quantizer is Lloyd-trained — cells
    follow the data distribution, so recall at fixed nprobe improves
    over seed centroids (asserted in tests). Assignment and probe
    selection are the same narrow literal-centroid projections as the
    seed tier (r16 re-plan — no crossJoin, no corpus argmax window)."""
    cents_local = kmeans_centroids(emb, k=n_centroids, iters=iters)
    n = with_vnorm(emb)
    cents = [(cid, cv, _norm_py(cv, LSH_DIM)) for cid, cv in cents_local]
    assigned = _assign_cells(n, cents)
    probes = _probe_cells(n, cents, nprobe, n_queries)
    cand = (F.broadcast(probes).join(assigned, "cell_id")
            .filter(F.col("q_id") != F.col("vec_id")))
    qsim = cosine_sim("qv", "v", "qn", "nrm")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_r"), F.asc("vec_id"))
    return (
        cand.select("q_id", "vec_id", qsim.alias("sim_r"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


# ------------------------------------------------------------------ RP-LSH

def adaptive_bits_per_band(n: int) -> int:
    """Bits per LSH band for a corpus of ``n`` vectors — the knob that
    keeps bucket OCCUPANCY (and with it candidate-pair count, which
    grows as n^2 / 2^bits per band) bounded as the corpus scales.
    Fixed banding is a scale bug: measured at a 10x corpus, 4-bit
    bands let candidates grow ~100x and the near-dup key went 1.5 s ->
    177 s.

    Bits must DIVIDE the band's plane budget: a non-divisor (say 6,
    from a naive log2 ramp) leaves a runt band of ``budget % bits``
    planes whose tiny bucket space regrows the n^2 blowup the
    adaptation exists to bound — a 2-bit runt band alone yields
    ~n^2/8 candidate pairs, dwarfing all full bands combined. So the
    choice is the smallest power-of-two bit width that holds expected
    occupancy <= ~125 vectors/bucket. Floor = BITS_PER_BAND (the
    small-sf oracle-contract banding: the driver's sf0.01 gate and
    the sf0.1 baseline corpora both resolve to it, so their banding —
    and the embedded-literal SQL oracles — are unchanged). Since
    round 7 there is no 8-bit cap: above the 8-bit tier's ~32k-vector
    occupancy bound this returns 16, and the PLANE budget steps to
    256 (16 bands x 16 bits, drawn from LSH_PLANES_EXT) so recall
    holds while bits grow — the two knobs move together (see
    :func:`adaptive_banding`, the authoritative tiering). This
    single-knob view exists for callers that only size signatures;
    anything that BUILDS buckets must take both knobs (or none) —
    :func:`lsh_bucket_table` re-derives the matching band count
    rather than trusting a lone bit width."""
    return adaptive_banding(n)[0]


def adaptive_banding(n: int) -> tuple[int, int]:
    """(bits_per_band, n_bands) for a corpus of ``n`` vectors — the
    TWO-knob version of :func:`adaptive_bits_per_band` (round 7).
    Bits bound occupancy (candidates grow n²/2^bits per band); bands
    hold recall, which collapses as bits grow unless the band count
    grows with them (P(candidate) = 1-(1-p^bits)^bands; at sim 0.9
    sign-LSH p ≈ 0.857, so 8-bit × 4-band ≈ 0.75 but 16-bit × 4-band
    ≈ 0.30 — the standard LSH cost/recall curve). The round-6 design
    capped the budget at the 32 oracle planes and documented plane
    growth as the deferred knob; the round-7 100× probe measured the
    cap's cost (vec_knn_join 158.9 s at sf10, ~780 vectors/bucket),
    so the budget now steps to 256 planes (16 × 16) above the 8-bit
    tier's ~32k-vector occupancy bound. Floor and mid tiers are
    byte-identical to round 6 — the sf0.01 gate, sf0.1 baseline, and
    sf1 corpora all resolve exactly as before, so every embedded SQL
    oracle and recorded measurement stands."""
    if n / (1 << BITS_PER_BAND) <= 125:
        return BITS_PER_BAND, N_LSH_BANDS    # 4 x 8: the oracle floor
    if n / (1 << 8) <= 125:
        return 8, 4                          # 32 planes, round-6 tier
    return 16, 16                            # 256-plane scale tier


def lsh_bucket_table(emb: DataFrame,
                     bits_per_band: int | None = None,
                     n_bands: int | None = None) -> DataFrame:
    """(vec_id, band_id, bucket): sign-bit signatures over fixed
    hyperplanes, packed per band.

    Banding defaults to :func:`adaptive_banding` of the NULL-FILTERED
    corpus count — the rows that actually receive signatures (a NULL
    embedding has no geometry; :func:`with_vnorm` drops it at the
    funnel below). Tiering on the raw count instead would diverge
    from the SQL oracles, whose tier CTE counts the same
    null-filtered ``n`` CTE: with NULL embeddings present and the
    corpus near a tier boundary (2000 or 32000 indexable vectors),
    engine and oracle would band differently and silently replay
    different pipelines — the fixed-tier bug class from the r12 sf1
    triage, reintroduced on the null axis. One metadata-cheap count
    job per invocation — the signature table is keyed-persisted by
    callers, so this never repeats per query. The small-sf tiers
    group the same 32 oracle-contract planes; the 256-plane scale
    tier draws the extension planes from ``LSH_PLANES_EXT`` (first
    32 = the contract, verbatim).

    The dots run as an Arrow-batched ``mapInPandas`` with a
    SEQUENTIAL-ORDER numpy loop (r13): the earlier pure-expression
    shape (vector × 256-plane crossJoin, one 64-term dot per joined
    row) materialized corpus×planes rows each carrying two 64-double
    arrays — 51M × ~1 KB at sf10, measured 80 s for what is a
    200k×64 @ 64×256 matrix product. numpy does it in seconds, and
    the bit contract survives EXACTLY because the loop accumulates
    dimension-by-dimension, left to right: ``acc += v[:, i] * p[i]``
    is IEEE-double bit-identical to Spark's left-deep unrolled sum
    AND DuckDB's sequential ``list_sum`` fold, so engine and oracle
    round the SAME double. One residual tie-break window remains:
    ``np.round`` is half-even via fp scaling while ``F.round`` is
    BigDecimal HALF_UP and DuckDB rounds half away from zero, so a
    dot within ~1 ulp of exactly ±5e-10 could round to a different
    SIGN across engines. That set is measure-zero for real-valued
    embeddings (a 64-term double sum landing within 1 ulp of a
    decimal tie) and has never been observed across the oracle
    replicas; the rounding exists to stabilize the generic
    |dot| < 5e-10 noise band, which it does identically in all three
    engines. This is the documented "drop to pandas only where
    built-ins genuinely can't express it" case — Catalyst has no
    batched matmul."""
    import numpy as np
    import pandas as pd

    n = with_vnorm(emb)
    if bits_per_band is None:
        # tier on the signed (null-filtered) count — see docstring
        bits_per_band, n_bands = adaptive_banding(n.count())
    elif n_bands is None:
        # Legacy single-knob call. The 32-plane legacy derivation is
        # only safe up to 8-bit bands; feeding it a 16-bit width (e.g.
        # adaptive_bits_per_band at scale) would compute 32//16 = 2
        # bands — a silent recall collapse (~0.17 vs the intended ~0.9
        # candidate probability at sim 0.9). Wide widths re-derive the
        # matching scale-tier band count instead (16 x 16 = 256-plane
        # budget), mirroring adaptive_banding's tiering.
        if bits_per_band > 8:
            n_bands = N_PLANES_MAX // bits_per_band   # 16 -> 16x16
        else:
            n_bands = N_PLANES // bits_per_band
    n_used = bits_per_band * n_bands
    if bits_per_band > 16 or n_used > N_PLANES_MAX:
        # bucket packs into an INT (shiftleft(bit, 15) max) and the
        # plane budget is fixed — raise rather than silently truncate
        raise ValueError(f"banding {bits_per_band}x{n_bands} exceeds "
                         f"the 16-bit/{N_PLANES_MAX}-plane budget")
    # planes matrix (64 × n_used), closed over — executors get it via
    # task serialization (~128 KB max, metadata-sized)
    planes_t = np.array(LSH_PLANES_EXT[:n_used], dtype=np.float64).T
    bpb, nb = bits_per_band, n_bands
    # bucket = sum_j bit[band*bpb + j] << j, vectorized as a matmul
    # against a power-of-two weight matrix per band
    weights = np.zeros((n_used, nb), dtype=np.int64)
    for band in range(nb):
        for j in range(bpb):
            weights[band * bpb + j, band] = 1 << j

    def signatures(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vec_ids = pdf["vec_id"].to_numpy()
            v = np.array(list(pdf["v"]), dtype=np.float64)
            # SEQUENTIAL fold over dimensions: bit-identical to the
            # engine's previous left-deep expression sum and to the
            # oracle's list_sum (see docstring) — np.dot would
            # pairwise-sum in a different order
            acc = np.zeros((len(pdf), n_used), dtype=np.float64)
            for i in range(planes_t.shape[0]):
                acc += v[:, i:i + 1] * planes_t[i]
            # round before the sign decision (SIM_DECIMALS, like every
            # other cross-engine boundary here)
            bits = (np.round(acc, SIM_DECIMALS) >= 0).astype(np.int64)
            buckets = bits @ weights  # (rows × n_bands) int64
            yield pd.DataFrame({
                "vec_id": np.repeat(vec_ids, nb),
                "band_id": np.tile(np.arange(nb, dtype=np.int32),
                                   len(pdf)),
                "bucket": buckets.reshape(-1).astype(np.int32),
            })

    return n.select("vec_id", "v").mapInPandas(
        signatures, "vec_id long, band_id int, bucket int")


#: Corpora up to this many vectors verify through the broadcast-attach
#: shape (~64 MB of 64-dim doubles + row overhead — the session's
#: autoBroadcastJoinThreshold); beyond it, block-local. See
#: _lsh_verify_shape.
LSH_BROADCAST_VECS = 120_000


def _lsh_verify_shape(n_vec: int, override: str | None = None) -> str:
    """Which exact-verify shape a corpus of ``n_vec`` vectors gets —
    the r13 A/B measured a clean CROSSOVER, so the choice adapts like
    the banding does:

    - ``broadcast`` (small corpora): candidate pairs are generated
      ids-only, deduped skinny, and vectors re-attach via joins whose
      build side (the whole vector table) BROADCASTS — the pair table
      itself never shuffles. Wins while the corpus fits the broadcast
      threshold: sf1 (20k vecs, occupancy-heavy 8x4 tier) measured
      6.3 s vs 22.2 s block-local.
    - ``blocklocal`` (everything bigger — the 100 TB shape): vectors
      ride the (band, bucket) shuffle once, each pair's cosine is
      computed AT the bucket-join output, and only skinny
      (id, id, sim) rows shuffle afterward. Once the vector table
      exceeds the broadcast threshold the attach joins become full
      shuffles of the PAIR table (the biggest thing in the pipeline)
      and the old shape inverts: sf10 (200k vecs) measured 10.8 s
      block-local vs 21.5 s attach-by-shuffle.

    ``override`` forces a shape (the tier-gate tool uses it to
    oracle-gate the block-local path on a corpus small enough for
    DuckDB to replay)."""
    if override is not None:
        if override not in ("broadcast", "blocklocal"):
            raise ValueError(f"unknown verify shape {override!r}")
        return override
    return "broadcast" if n_vec <= LSH_BROADCAST_VECS else "blocklocal"


def _lsh_signatures(emb: DataFrame) -> tuple[int, DataFrame]:
    """(null-filtered corpus count, keyed-persisted signature table).
    The count feeds both the banding tier and the verify-shape choice;
    passing the derived banding into lsh_bucket_table explicitly keeps
    it to ONE count job, and the count itself is memoized under the
    SAME plan key as the signature persist (r14 ADVICE: the forced
    block-local path, which skips no stage, paid a fresh corpus-count
    action on every invocation even when the signature table was a
    keyed-cache hit). Keyed persist: the signature table feeds both
    self-join sides (AQE broadcast conversion would re-execute it per
    side), and the key dedupes repeat invocations on the same corpus —
    the plane LocalRelation defeats CacheManager's own plan matching."""
    pk = _plan_key(emb)
    n_vec = memo_scalar(("lsh_nvec", pk),
                        lambda: with_vnorm(emb).count())
    bits, bands = adaptive_banding(n_vec)
    sig = tracked_persist_keyed(
        ("lsh_buckets", pk),
        lambda: lsh_bucket_table(emb, bits, bands)
        .select("vec_id", "band_id", "bucket"))
    return n_vec, sig


def _lsh_enriched(emb: DataFrame, sig: DataFrame) -> DataFrame:
    """(vec_id, band_id, bucket, v, nrm): the signature table with the
    vector riding along — the block-local verify input (see
    :func:`_lsh_verify_shape`). Built by JOINING the already-persisted
    signature table with the vector table, so the block-local path
    re-uses :func:`_lsh_signatures`'s one count job and one signature
    computation instead of re-deriving the banding (a second corpus
    count) and re-running the mapInPandas matmul — two redundant
    corpus scans at exactly the tier where scans are most expensive
    (r14, ADVICE). At corpus scale this keyed persist is a checkpoint
    to storage."""
    return tracked_persist_keyed(
        ("lsh_enriched", _plan_key(emb)),
        lambda: sig.join(with_vnorm(emb), "vec_id"))


def lsh_neardup_pairs(emb: DataFrame, threshold: float = 0.4,
                      verify_shape: str | None = None) -> DataFrame:
    """Embedding near-duplicate pairs at scale: LSH band-bucket
    candidate generation (sublinear — pairs only materialize for
    vectors sharing >=1 band bucket), then EXACT cosine verification
    of candidates only, through the size-adaptive shape of
    :func:`_lsh_verify_shape`. A pair sharing several band buckets
    scores identically per collision (same rounded expression), so
    the dedup — dropDuplicates before attach in the broadcast shape,
    first-agg after scoring in the block-local one — is exact either
    way. Same output contract as :func:`cosine_neardup_pairs`
    (id_a < id_b, sim_r >= threshold) restricted to LSH candidates;
    recall vs the exact all-pairs tier is asserted in tests, and the
    tier-gate tool oracle-gates BOTH shapes."""
    n_vec, sig = _lsh_signatures(emb)
    shape = _lsh_verify_shape(n_vec, verify_shape)
    if shape == "broadcast":
        cand = (
            sig.select(F.col("vec_id").alias("id_a"), "band_id", "bucket")
            .join(sig, ["band_id", "bucket"])
            .filter(F.col("id_a") < F.col("vec_id"))
            .dropDuplicates(["id_a", "vec_id"])
            .select("id_a", F.col("vec_id").alias("id_b"))
        )
        n = with_vnorm(emb)
        a = n.select(F.col("vec_id").alias("id_a"),
                     F.col("v").alias("va"), F.col("nrm").alias("na"))
        c = n.select(F.col("vec_id").alias("id_b"),
                     F.col("v").alias("vb"), F.col("nrm").alias("nb"))
        sim = cosine_sim("va", "vb", "na", "nb")
        return (
            cand.join(a, "id_a").join(c, "id_b")
            .select("id_a", "id_b", sim.alias("sim_r"))
            .filter(F.col("sim_r") >= threshold)
        )
    e = _lsh_enriched(emb, sig)
    a = e.select("band_id", "bucket", F.col("vec_id").alias("id_a"),
                 F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select("band_id", "bucket", F.col("vec_id").alias("id_b"),
                 F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    sim = cosine_sim("va", "vb", "na", "nb")
    return (
        a.join(b, ["band_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim_r"))
        # threshold BEFORE the dedup shuffle: only passing pairs (a
        # tiny fraction of candidates) pay the exchange
        .filter(F.col("sim_r") >= threshold)
        .groupBy("id_a", "id_b").agg(F.first("sim_r").alias("sim_r"))
    )


def knn_join_lsh(emb: DataFrame, k: int = 5,
                 verify_shape: str | None = None) -> DataFrame:
    """Approximate all-to-all kNN join: candidates share >=1 LSH band
    bucket, exact cosine rerank within candidates, top-k per query.

    The bucket join shuffles on (band_id, bucket) — bounded fanout,
    never all-pairs. Recall is tunable via N_LSH_BANDS/BITS_PER_BAND
    (tests assert recall vs the exact scan). Exact verification goes
    through the size-adaptive shape of :func:`_lsh_verify_shape`; in
    the block-local branch the scored pairs repartition on q_id ONCE:
    HashPartitioning(q_id) satisfies both the (q_id, vec_id) dedup
    aggregate (a subset of clustering keys co-locates every group)
    and the top-k window's ClusteredDistribution(q_id), so the dedup
    and the window share a single exchange — partitioning on the full
    (q_id, vec_id) group key instead would NOT satisfy the window and
    a second q_id exchange would follow it (r14, ADVICE)."""
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_r"), F.asc("vec_id"))
    n_vec, sig = _lsh_signatures(emb)
    shape = _lsh_verify_shape(n_vec, verify_shape)
    if shape == "broadcast":
        # ONE q_id exchange serves both the candidate dedup and the
        # final top-k window (the r14 blocklocal trick, applied to
        # the broadcast shape): q_id ⊆ the (q_id, vec_id) group key
        # co-locates every dedup group, the broadcast attach joins
        # preserve the partitioning, and the window's
        # ClusteredDistribution(q_id) is already satisfied — the old
        # shape paid a (q_id, vec_id) agg exchange AND a q_id window
        # exchange. The repartition moves ids-only rows (duplicate
        # factor bounded by n_bands) before anything wide attaches.
        cand = (
            sig.select(F.col("vec_id").alias("q_id"), "band_id", "bucket")
            .join(sig, ["band_id", "bucket"])
            .filter(F.col("q_id") != F.col("vec_id"))
            .select("q_id", "vec_id")
            .repartition("q_id")
            .dropDuplicates(["q_id", "vec_id"])
        )
        n = with_vnorm(emb)
        q = n.select(F.col("vec_id").alias("q_id"),
                     F.col("v").alias("qv"), F.col("nrm").alias("qn"))
        c = n.select("vec_id", "v", "nrm")
        # corpus side (vec_id) attaches FIRST, query side (q_id) last:
        # the final join leaves the rows partitioned for the window
        cand = cand.join(c, "vec_id").join(q, "q_id")
        sim = cosine_sim("qv", "v", "qn", "nrm")
        return (
            cand.select("q_id", "vec_id", sim.alias("sim_r"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
        )
    e = _lsh_enriched(emb, sig)
    q = e.select("band_id", "bucket", F.col("vec_id").alias("q_id"),
                 F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    c = e.select("band_id", "bucket", "vec_id", "v", "nrm")
    sim = cosine_sim("qv", "v", "qn", "nrm")
    return (
        q.join(c, ["band_id", "bucket"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", sim.alias("sim_r"))
        # one q_id exchange serves BOTH the dedup agg and the window
        # (see docstring) — a pair colliding in several bands scores
        # identically each time (same rounded expression), first()
        # dedups exactly
        .repartition("q_id")
        .groupBy("q_id", "vec_id").agg(F.first("sim_r").alias("sim_r"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


# ------------------------------------------------------------------- PQ

PQ_SUBSPACES = 8
PQ_CODES = 16  # 4-bit codes: 64 dims -> 8 bytes per vector


def pq_codebooks(emb: DataFrame, m: int = PQ_SUBSPACES, kc: int = PQ_CODES,
                 dim: int = LSH_DIM) -> list[list[list[float]]]:
    """``codebooks[s][c]`` = the c-th centroid of subspace s, taken
    from the UNIT-normalized sub-slices of the first ``kc`` corpus
    vectors — deterministic, replayable (production would run
    per-subspace k-means; the protocol is identical). Driver-side cost
    is kc x dim doubles, same as the k-means seeding path."""
    sub = dim // m
    rows = sorted(
        with_vnorm(emb).filter(F.col("vec_id") < kc)
        .select("vec_id", F.expr("transform(v, x -> x / nrm)").alias("u"))
        .collect(),
        key=lambda r: r.vec_id,
    )
    return [
        [[float(r.u[s * sub + j]) for j in range(sub)] for r in rows]
        for s in range(m)
    ]


def pq_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
            m: int = PQ_SUBSPACES, kc: int = PQ_CODES,
            rerank_factor: int = 4, dim: int = LSH_DIM) -> DataFrame:
    """Product-quantization top-k: the memory-bandwidth ANN tier.

    Corpus vectors are unit-normalized, split into ``m`` subspaces,
    and each subspace is ENCODED as the id of its nearest codebook
    centroid — 64 float32 dims become m=8 4-bit codes. The query scan
    then reads 8-byte codes instead of 256-byte vectors (32x less
    I/O, the entire point of PQ at 100 TB) and scores by ADC
    (asymmetric distance): per query, a lookup table
    ``lut[s][c] = <q_sub, codebook[s][c]>`` is precomputed driver-side
    (m*kc doubles, broadcast with the query row), so a corpus row's
    approximate cosine is m table lookups — no float math per dim.
    Top ``k*rerank_factor`` ADC candidates per query re-rank with
    EXACT cosine via a shuffle equi-join on vec_id (ids-only candidate
    set; nothing corpus-sized is broadcast). Output contract matches
    ``cosine_topk`` (q_id, vec_id, sim_r, rk) with exact sims, so the
    pytest recall gate compares tiers directly.

    Encoding is an Arrow-batched pandas UDF (argmin over kc centroids
    per subspace, vectorized numpy) — the blessed slow-path escape for
    semantics the built-ins cannot express without a 1024-term codegen
    expression.
    """
    n = with_vnorm(emb)
    coded, luts, _ = _pq_parts(emb, n, n_queries, m=m, kc=kc, dim=dim)
    cand = _adc_topn(coded.crossJoin(luts), m, k * rerank_factor)
    return _exact_rerank(n, cand, n_queries, k)


def _pq_parts(emb: DataFrame, n: DataFrame, n_queries: int,
              m: int, kc: int, dim: int, keep: tuple[str, ...] = ()):
    """Shared PQ machinery: (coded corpus, broadcast per-query LUTs,
    codebooks array). See :func:`pq_topk` for the design notes.

    ``keep`` names extra columns of ``n`` carried through the encode
    projection — ivf_pq_topk passes the cell assignment through so
    codes and cells come out of ONE corpus pass instead of being
    re-attached by a corpus-sized vec_id equi-join (guide §2.4)."""
    from pyspark.sql.functions import pandas_udf

    sub = dim // m
    books = pq_codebooks(emb, m=m, kc=kc, dim=dim)
    books_np = np.asarray(books)  # (m, kc, sub)

    @pandas_udf("array<int>")
    def encode(u: pd.Series) -> pd.Series:
        X = np.stack(u.to_numpy())  # (n, dim)
        codes = np.empty((X.shape[0], m), dtype=np.int32)
        for s in range(m):
            seg = X[:, s * sub:(s + 1) * sub]           # (n, sub)
            # ||x - c||^2 = ||x||^2 - 2<x,c> + ||c||^2; argmin over c
            # needs only the last two terms. Round before the argmin
            # (9 dp, the SIM_DECIMALS convention): BLAS's summation
            # order can differ from a sequential SQL fold by an ulp,
            # and an unrounded argmin at a near-tie would assign a
            # different code than the replaying oracle. np.argmin
            # takes the FIRST minimum = lowest code id, matching the
            # oracle's ORDER BY d, code_id tiebreak.
            dots = seg @ books_np[s].T                   # (n, kc)
            cn = (books_np[s] ** 2).sum(axis=1)          # (kc,)
            codes[:, s] = np.round(
                cn[None, :] - 2.0 * dots, 9).argmin(axis=1)
        return pd.Series(list(codes))

    unit = n.select("vec_id", *keep,
                    F.expr("transform(v, x -> x / nrm)").alias("u"))
    coded = unit.select("vec_id", *keep, encode("u").alias("codes"))

    # per-query ADC lookup tables, driver-built from n_queries rows
    qrows = sorted(
        unit.filter(F.col("vec_id") < n_queries).collect(),
        key=lambda r: r.vec_id,
    )
    lut_rows = []
    for r in qrows:
        q = np.asarray(r.u)
        lut = [
            [float(np.dot(q[s * sub:(s + 1) * sub], books_np[s][c]))
             for c in range(kc)]
            for s in range(m)
        ]
        lut_rows.append((r.vec_id, lut))
    # inline literal relation, not createDataFrame: the python-
    # parallelized local collection pays its slice reads on every
    # broadcast build (see _probe_cells); the LUT is bounded metadata
    # (n_queries x m x kc doubles) and embeds exactly via _dlit
    structs = ",".join(
        "named_struct('q_id',{}L,'lut',array({}))".format(
            int(qid), ",".join(_darr(row) for row in lut))
        for qid, lut in lut_rows)
    if lut_rows:
        luts = F.broadcast(_inline_relation(emb.sparkSession, structs))
    else:  # no query rows: keep the empty-relation shape/schema
        luts = F.broadcast(emb.sparkSession.createDataFrame(
            [], "q_id bigint, lut array<array<double>>"))
    return coded, luts, books_np


def _adc_topn(pairs: DataFrame, m: int, n_cand: int) -> DataFrame:
    """ADC-score (q_id, codes, lut) rows and keep the top ``n_cand``
    per query — ids only."""
    adc = (
        pairs.filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id", "vec_id",
            # round before ranking (same SIM_DECIMALS convention as the
            # exact tiers) so the candidate cut is reproducible by the
            # SQL oracle: numpy's BLAS dots can differ from a
            # sequential SQL fold by an ulp, and an unrounded
            # ORDER BY would let that flip the top-n_cand boundary
            F.round(
                F.expr(
                    f"aggregate(sequence(1, {m}), CAST(0 AS DOUBLE), "
                    "(acc, s) -> acc + element_at(element_at(lut, s), "
                    "element_at(codes, s) + 1))"
                ),
                SIM_DECIMALS,
            ).alias("adc_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("adc_sim"), F.asc("vec_id"))
    return (
        adc.withColumn("ark", F.row_number().over(w))
        .filter(F.col("ark") <= n_cand)
        .select("q_id", "vec_id")
    )


def _exact_rerank(n: DataFrame, cand: DataFrame, n_queries: int,
                  k: int) -> DataFrame:
    """Exact-cosine rerank of an ids-only candidate set; output matches
    ``cosine_topk`` (q_id, vec_id, sim_r, rk). The candidate set is
    bounded by n_queries x shortlist ids at ANY corpus size, so it
    broadcasts and the corpus side is never shuffled (the old shape
    shuffle-equi-joined the corpus against those few hundred ids —
    a full corpus exchange to attach vectors to a metadata-sized list;
    guide §3.1: broadcast the side that fits, which is always cand).
    Only the tiny query side and the candidate ids broadcast — never
    anything corpus-sized."""
    q = F.broadcast(
        n.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                F.col("nrm").alias("qn")))
    c = n.select("vec_id", "v", "nrm")
    sim = cosine_sim("qv", "v", "qn", "nrm")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_r"), F.asc("vec_id"))
    return (
        c.join(F.broadcast(cand), "vec_id").join(q, "q_id")
        .select("q_id", "vec_id", sim.alias("sim_r"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def ivf_pq_topk(emb: DataFrame, n_centroids: int = 8, nprobe: int = 3,
                n_queries: int = 5, k: int = 10,
                m: int = PQ_SUBSPACES, kc: int = PQ_CODES,
                rerank_factor: int = 4, dim: int = LSH_DIM) -> DataFrame:
    """IVF-PQ: the production composite (FAISS's default shape at
    billion scale) — coarse cells prune WHICH rows are scored
    (~nprobe/n_centroids of the corpus), PQ codes shrink WHAT is read
    per scored row (8 bytes vs 256), so the two savings multiply.
    Flow: assign corpus to seed-centroid cells, PQ-encode every vector
    once, probe nprobe cells per query, ADC-score ONLY the probed
    cells' codes, exact-rerank the top candidates. (Classic IVF-PQ
    encodes residuals v - centroid for tighter codes; raw-vector codes
    keep the codebooks query-independent here — same plan shape.)
    Approximate by design: rows-only gate + pytest recall check."""
    n = with_vnorm(emb)
    cents = _seed_centroid_rows(n, n_centroids)
    probes = _probe_cells(n, cents, nprobe, n_queries).select("q_id", "cell_id")

    # cell assignment RIDES the encode projection (keep="cell_id"):
    # codes and cells come out of one corpus pass, so candidate
    # selection is a broadcast probe join — the old shape re-attached
    # codes by a corpus-sized vec_id equi-join (two exchanges of the
    # whole coded corpus for ids that were already on the row)
    coded, luts, _ = _pq_parts(emb, _assign_cells(n, cents), n_queries,
                               m=m, kc=kc, dim=dim, keep=("cell_id",))
    cand_pool = (
        F.broadcast(probes).join(coded, "cell_id")
        .select("q_id", "vec_id", "codes")
        .join(luts, "q_id")
    )
    cand = _adc_topn(cand_pool, m, k * rerank_factor)
    return _exact_rerank(n, cand, n_queries, k)


# ------------------------------------------------- int8 scalar quantization

def int8_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
              shortlist: int = 32, dim: int = LSH_DIM) -> DataFrame:
    """Scalar-quantized top-k: L2-normalize each vector, map every
    coordinate to an int8 code with ONE global max-abs scale
    (``floor(u_i / s * 128)`` clamped to [-128, 127]), rank candidates
    on INTEGER code dot products — proportional to cosine up to
    quantization noise, because the scale is uniform and the offset is
    zero — then exact-cosine rerank the ``shortlist``. (A per-dim
    affine quantizer stores tighter codes but its code dot is NOT an
    inner-product proxy: the per-dim offsets dominate the sum. The
    symmetric-global form is what keeps candidate scoring integral and
    engine-exact.)

    The memory-bound scale story: the candidate scan reads 64 B/row
    instead of 256 — the reason FAISS ships SQ8 — and calibration is
    one partial+final ``max(abs(u))`` agg to a SINGLE scalar, never a
    bottleneck. Integer scores + (score, vec_id) ranking make
    the shortlist bit-reproducible across engines, partitionings, and
    the DuckDB oracle; FLOOR-before-CAST keeps Spark's truncating and
    DuckDB's rounding double->int casts agreeing.

    The scale scalar is collected once (memoized with the keyed-persist
    lifecycle) and embedded as an exact double literal instead of the
    old broadcast-1-row crossJoin: the query side of the candidate join
    used to RE-EXECUTE the whole scan+agg subtree to rebuild that
    broadcast (AQE broadcast sides are not covered by ReuseExchange),
    so the calibration agg ran twice per invocation — now it runs once,
    and both quantize projections are scan-narrow (guide §2.4)."""
    n = with_vnorm(emb, dim=dim)
    s_val = memo_scalar(
        ("int8_scale", dim, _plan_key(n)),
        lambda: n.agg(F.max(F.expr(
            "array_max(transform(v, x -> abs(x / nrm)))")).alias("s")
        ).collect()[0][0])
    s_lit = _dlit(s_val)
    codes = [F.expr(
        f"CAST(GREATEST(-128.0D, LEAST(127.0D, "
        f"FLOOR((v[{i}] / nrm / {s_lit}) * 128.0D))) AS INT)")
        for i in range(dim)]
    q8 = n.select("vec_id", F.array(*codes).alias("qv"))
    q = F.broadcast(
        q8.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("qv").alias("qq")))
    qdot = F.expr("+".join(f"qq[{i}]*qv[{i}]" for i in range(dim))) \
        .cast("long")
    w = Window.partitionBy("q_id").orderBy(F.desc("qdot"), F.asc("vec_id"))
    cand = (q.join(q8, F.col("q_id") != F.col("vec_id"))
            .select("q_id", "vec_id", qdot.alias("qdot"))
            .withColumn("qrk", F.row_number().over(w))
            .filter(F.col("qrk") <= shortlist)
            .select("q_id", "vec_id"))
    return _exact_rerank(n, cand, n_queries, k)


# --------------------------------------------------- binary (sign) quantization

def binary_hamming_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
                        shortlist: int = 32, dim: int = LSH_DIM) -> DataFrame:
    """Binary-quantized top-k — the 1-bit-per-dim compression tier
    (32x vs float32; what Cohere/Jina ship as "binary embeddings"):
    each vector's sign pattern packs into two 32-bit words, candidate
    ranking is Hamming distance via ``bit_count(xor(...))`` (for
    near-isotropic vectors, hamming ~ arccos of cosine — rank-faithful
    enough for a shortlist), then the exact-cosine rerank recovers
    float precision. Two words rather than one 64-bit pack because the
    bit-63 term would need 2^63 — overflowing signed-long ARITHMETIC
    under ANSI even though the xor itself is two's-complement-safe.
    At 100 TB the candidate scan reads 8 B/row and the distance is two
    popcounts — the cheapest scan of any tier here; everything is
    integer-exact, so the full value-hash oracle holds."""
    if dim % 2 or dim > 126:
        # the bit weights are emitted as signed-long literals: an odd
        # dim would silently drop the last sign bit, and half > 63
        # would need a 2^63 literal (overflows BIGINT at parse time)
        raise ValueError(f"binary_hamming_topk needs an even dim <= 126, got {dim}")
    n = with_vnorm(emb, dim=dim)
    half = dim // 2
    w0 = F.expr(" + ".join(
        f"CASE WHEN v[{i}] > 0.0D THEN {1 << i}L ELSE 0L END"
        for i in range(half)))
    w1 = F.expr(" + ".join(
        f"CASE WHEN v[{i + half}] > 0.0D THEN {1 << i}L ELSE 0L END"
        for i in range(half)))
    sig = n.select("vec_id", w0.alias("w0"), w1.alias("w1"))
    q = F.broadcast(
        sig.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("w0").alias("q0"),
                F.col("w1").alias("q1")))
    # Spark spells bitwise xor as the ^ operator (no xor() routine);
    # DuckDB has no ^ for xor — each engine uses its native spelling
    # of the same two's-complement op.
    ham = F.expr("bit_count(q0 ^ w0) + bit_count(q1 ^ w1)")
    w = Window.partitionBy("q_id").orderBy(F.asc("ham"), F.asc("vec_id"))
    cand = (q.join(sig, F.col("q_id") != F.col("vec_id"))
            .select("q_id", "vec_id", ham.alias("ham"))
            .withColumn("hrk", F.row_number().over(w))
            .filter(F.col("hrk") <= shortlist)
            .select("q_id", "vec_id"))
    return _exact_rerank(n, cand, n_queries, k)
