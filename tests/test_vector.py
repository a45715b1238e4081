"""Operator-level tests for operators/vector.py: exactness of the
brute-force tier and recall gates for the approximate tiers
(SURVEY §5.4 — recall >= bound, not exact sets, for LSH)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakehouse_automation_spark.operators.vector import (
    cosine_neardup_pairs,
    cosine_topk,
    dot,
    ivf_kmeans_topk,
    ivf_topk,
    kmeans_centroids,
    knn_join_lsh,
    lsh_neardup_pairs,
    norm,
    with_vnorm,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_dot_and_norm_exact(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in df.select(
        "vec_id",
        dot(F.col("embedding"), F.col("embedding")).alias("d"),
        norm(F.col("embedding")).alias("n"),
    ).collect()}
    assert rows[1].d == 14.0 and rows[1].n == math.sqrt(14.0)
    assert rows[2].d == 0.0


def _exact_topk_sets(emb, n_queries, k):
    out = {}
    for r in cosine_topk(emb, n_queries=n_queries, k=k).collect():
        out.setdefault(r.q_id, set()).add(r.vec_id)
    return out


def test_cosine_topk_shape_and_selfexclusion(emb):
    res = cosine_topk(emb, n_queries=3, k=5).collect()
    assert len(res) == 15
    assert all(r.q_id != r.vec_id for r in res)
    assert all(-1.0 <= r.sim_r <= 1.0 for r in res)


def test_ivf_recall_vs_exact(emb):
    """IVF probing 3/8 cells must beat the ~3/8 random-candidate
    baseline by a wide margin on the neighbors that matter."""
    k = 10
    exact = _exact_topk_sets(emb, 5, k)
    approx = {}
    for r in ivf_topk(emb, n_centroids=8, nprobe=3, n_queries=5, k=k).collect():
        approx.setdefault(r.q_id, set()).add(r.vec_id)
    recall = sum(len(exact[q] & approx.get(q, set())) for q in exact) / (len(exact) * k)
    assert recall >= 0.5, f"IVF recall {recall:.2f}"


def test_kmeans_centroids_move_and_stay_finite(emb):
    k = 8
    seeds = {cid: cv for cid, cv in kmeans_centroids(emb, k=k, iters=0)}
    trained = {cid: cv for cid, cv in kmeans_centroids(emb, k=k, iters=2)}
    assert set(trained) == set(range(k))
    assert any(seeds[c] != trained[c] for c in trained), "Lloyd did not move"
    assert all(all(math.isfinite(x) for x in cv) for cv in trained.values())


def test_ivf_kmeans_recall_not_worse_than_seed(emb):
    """Data-adapted cells must not lose recall vs seed centroids at the
    same nprobe (usually they gain; equality allowed — tiny corpus)."""
    k = 10
    exact = _exact_topk_sets(emb, 5, k)

    def recall(df):
        approx = {}
        for r in df.collect():
            approx.setdefault(r.q_id, set()).add(r.vec_id)
        return sum(len(exact[q] & approx.get(q, set())) for q in exact) / (len(exact) * k)

    r_seed = recall(ivf_topk(emb, n_centroids=8, nprobe=3, n_queries=5, k=k))
    r_km = recall(ivf_kmeans_topk(emb, n_centroids=8, nprobe=3, n_queries=5,
                                  k=k, iters=2))
    assert r_km >= r_seed - 0.05, f"kmeans {r_km:.2f} < seed {r_seed:.2f}"


def test_lsh_knn_recall_vs_exact(emb):
    """RP-LSH (8 bands x 4 bits) recall on top-5 neighbors: candidates
    are ~a third of the corpus, but sign-LSH concentrates them on the
    high-cosine pairs, so recall must clear 0.6."""
    k = 5
    n_eval = 20
    exact = {}
    for r in cosine_topk(emb, n_queries=n_eval, k=k).collect():
        exact.setdefault(r.q_id, set()).add(r.vec_id)
    approx = {}
    for r in knn_join_lsh(emb, k=k).filter(F.col("q_id") < n_eval).collect():
        approx.setdefault(r.q_id, set()).add(r.vec_id)
    recall = sum(len(exact[q] & approx.get(q, set())) for q in exact) / (n_eval * k)
    assert recall >= 0.6, f"LSH recall {recall:.2f}"


def test_lsh_reranks_exactly_within_candidates(emb):
    """Within its candidate set the LSH join is exact: sim_r values must
    match the brute-force sims for the same (q, v) pairs."""
    brute = {(r.q_id, r.vec_id): r.sim_r
             for r in cosine_topk(emb, n_queries=3, k=50).collect()}
    for r in knn_join_lsh(emb, k=5).filter(F.col("q_id") < 3).collect():
        if (r.q_id, r.vec_id) in brute:
            assert r.sim_r == brute[(r.q_id, r.vec_id)]


def test_lsh_neardup_recall_and_precision(emb):
    """The benched scale path (LSH candidates + exact verify) against
    the exact all-pairs tier: every emitted pair must be a TRUE near-dup
    with the exact sim (precision 1.0 by construction — the verify step
    recomputes exact cosine), and recall over the exact pair set must
    clear the LSH s-curve floor."""
    exact = {(r.id_a, r.id_b): r.sim_r
             for r in cosine_neardup_pairs(emb, threshold=0.4).collect()}
    approx = {(r.id_a, r.id_b): r.sim_r
              for r in lsh_neardup_pairs(emb, threshold=0.4).collect()}
    assert approx, "LSH near-dup returned no pairs"
    for p, s in approx.items():
        assert p in exact and exact[p] == s  # exact-verified subset
    recall = len(approx) / len(exact)
    assert recall >= 0.5, f"LSH near-dup recall {recall:.2f}"


def test_neardup_plans_have_no_forced_corpus_broadcast(emb):
    """100-TB guard: the corpus re-attach joins must not FORCE a
    broadcast (a hint survives any data size and would OOM at scale;
    planner-chosen broadcasts at small scale are fine — they flip to
    shuffle joins automatically as stats grow). With auto-broadcast
    disabled, the only hinted broadcast left is the 32-row plane
    table inside lsh_bucket_table."""
    import re

    from lakehouse_automation_spark.operators.cache import release_persisted

    release_persisted()  # a cached bucket table would embed its own
    # BroadcastExchange text in the InMemoryRelation plan string
    spark = emb.sparkSession
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for df in (lsh_neardup_pairs(emb), knn_join_lsh(emb, k=5)):
            plan = df._jdf.queryExecution().executedPlan().toString()
            n_bc = len(re.findall(r"BroadcastExchange", plan))
            # <=2: the plane-table hint appears once per self-join side
            # before ReuseExchange collapses them
            assert n_bc <= 2, f"forced corpus broadcast in plan:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_with_vnorm_no_shuffle(emb):
    """The norm projection must stay narrow — no exchange in the plan."""
    plan = with_vnorm(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pq_recall_vs_exact(emb):
    """PQ+ADC with top-40 exact rerank: codes discard most of each
    vector, so the gate is recall of the top-10 against the exact scan
    — must beat random-candidate levels decisively."""
    from lakehouse_automation_spark.operators.vector import pq_topk

    k = 10
    exact = _exact_topk_sets(emb, 5, k)
    approx = {}
    res = pq_topk(emb, n_queries=5, k=k, rerank_factor=4).collect()
    for r in res:
        approx.setdefault(r.q_id, set()).add(r.vec_id)
    assert all(r.q_id != r.vec_id for r in res)
    recall = sum(len(exact[q] & approx.get(q, set())) for q in exact) / (len(exact) * k)
    assert recall >= 0.3, f"PQ recall {recall:.2f}"


def test_pq_rerank_sims_are_exact(emb):
    """Reranked sims must equal the exact tier's sims for the same
    (q, vec) pairs — PQ approximates the CANDIDATE SET, never the
    reported similarity."""
    from lakehouse_automation_spark.operators.vector import pq_topk

    ex = {(r.q_id, r.vec_id): r.sim_r
          for r in cosine_topk(emb, n_queries=3, k=30).collect()}
    for r in pq_topk(emb, n_queries=3, k=10).collect():
        if (r.q_id, r.vec_id) in ex:
            assert abs(r.sim_r - ex[(r.q_id, r.vec_id)]) < 1e-12


def test_ivf_pq_recall_vs_exact(emb):
    """IVF-PQ scores only the probed cells' codes, so its recall is
    bounded by IVF's cell recall; it must still clear the
    random-candidate floor decisively and agree with PQ on the
    rerank-exactness contract."""
    from lakehouse_automation_spark.operators.vector import ivf_pq_topk

    k = 10
    exact = _exact_topk_sets(emb, 5, k)
    res = ivf_pq_topk(emb, n_centroids=8, nprobe=3, n_queries=5, k=k,
                      rerank_factor=4).collect()
    approx = {}
    for r in res:
        approx.setdefault(r.q_id, set()).add(r.vec_id)
    assert all(r.q_id != r.vec_id for r in res)
    recall = sum(len(exact[q] & approx.get(q, set())) for q in exact) / (len(exact) * k)
    assert recall >= 0.2, f"IVF-PQ recall {recall:.2f}"


def test_adaptive_banding_never_leaves_runt_bands():
    """Every tier's bands × bits must exactly consume its plane
    budget (no runt band whose tiny bucket space regrows the n²
    candidate blowup), stay inside the 16-bit/256-plane packing
    limits, and pin the contract boundaries: the sf0.01 gate and
    sf0.1 baseline corpora keep the 4-bit oracle banding, sf1 keeps
    the round-6 8-bit tier (recorded measurements stand), and only
    beyond the 8-bit occupancy bound does the 256-plane scale tier
    engage. The extended plane table must embed the 32 contract
    planes verbatim (the SQL oracles replay them as literals)."""
    from lakehouse_automation_spark.operators.vector import (
        BITS_PER_BAND, LSH_PLANES, LSH_PLANES_EXT, N_PLANES,
        N_PLANES_MAX, adaptive_banding, adaptive_bits_per_band)

    for n in [1, 125, 200, 2000, 2001, 5000, 8000, 16000, 20000,
              60000, 200000, 10**7]:
        bits, bands = adaptive_banding(n)
        assert bits * bands in (N_PLANES, N_PLANES_MAX), (n, bits, bands)
        assert BITS_PER_BAND <= bits <= 16
        assert adaptive_bits_per_band(n) == bits
    assert adaptive_banding(200) == (BITS_PER_BAND, 8)   # sf0.01 gate
    assert adaptive_banding(2000) == (BITS_PER_BAND, 8)  # sf0.1 baseline
    assert adaptive_banding(20000) == (8, 4)             # sf1 (round 6)
    assert adaptive_banding(60000) == (16, 16)           # sf3+
    # monotone: a bigger corpus never gets a smaller signature
    widths = [adaptive_bits_per_band(n) for n in range(1, 250_000, 997)]
    assert widths == sorted(widths)
    # the contract planes are the extension's prefix, bit-for-bit
    assert LSH_PLANES_EXT[:N_PLANES] == LSH_PLANES
    assert len(LSH_PLANES_EXT) == N_PLANES_MAX


def test_lsh_oracle_tier_case_matches_adaptive_banding():
    """The SQL oracles' tier CASE must pick the SAME (bits, bands) as
    adaptive_banding at every boundary — a drifted threshold silently
    replays a different pipeline (the r12 sf1 bug class). Probes the
    shared _TIER_SELECT fragment with synthetic counts straddling the
    2000 and 32000 boundaries."""
    import duckdb

    from lakehouse_automation_spark.operators.vector import adaptive_banding
    from lakehouse_automation_spark.queries.vector_pipeline import (
        _TIER_SELECT)

    con = duckdb.connect()
    for n in [1, 1999, 2000, 2001, 31999, 32000, 32001, 60000, 10**6]:
        got = con.sql(
            f"WITH n AS (SELECT * FROM range({n})) {_TIER_SELECT}"
        ).fetchone()
        assert tuple(got) == adaptive_banding(n), (n, got)
    con.close()


def test_lsh_tiering_ignores_null_embeddings(spark, emb):
    """lsh_bucket_table must tier on the INDEXABLE (null-filtered)
    count — the rows that actually receive signatures and the count
    the SQL oracle's tier CTE uses. A raw-count tier diverges from
    the oracle whenever NULL embeddings push the raw count over a
    banding boundary the filtered count stays under (ADVICE r12):
    2100 raw / 2000 filtered must band 4x8 (floor), not 8x4."""
    from lakehouse_automation_spark.operators.vector import (
        adaptive_banding, lsh_bucket_table)

    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    # inflate to exactly 2000 indexable rows + 100 NULL-embedding rows
    n_base = base.count()
    reps = 2000 // n_base
    assert reps * n_base == 2000, "fixture size must divide 2000"
    wide = base.crossJoin(spark.range(reps).select(F.col("id").alias("r"))) \
        .select((F.col("vec_id") + F.col("r") * n_base).alias("vec_id"),
                "embedding")
    nulls = spark.range(2000, 2100).select(
        F.col("id").alias("vec_id"),
        F.lit(None).cast("array<double>").alias("embedding"))
    dirty = wide.unionByName(nulls)
    assert adaptive_banding(2100) != adaptive_banding(2000)  # boundary real
    buckets = lsh_bucket_table(dirty)
    bands = [r.band_id for r in
             buckets.select("band_id").distinct().collect()]
    assert sorted(bands) == list(range(8)), (
        f"expected floor-tier 8 bands from the 2000-row indexable "
        f"count, got bands {sorted(bands)}")
    # and the NULL rows got no signatures at all
    assert buckets.filter(F.col("vec_id") >= 2000).count() == 0


def test_ivf_index_refresh_equals_full_rebuild(spark, emb, tmp_path):
    """Refreshing a persisted IVF index with a new batch (frozen
    build-time centroids, append-only) must yield the IDENTICAL index
    content and search results as a full rebuild over base ∪ batch —
    the incremental-maintenance contract (VERDICT r7 ask #7)."""
    from lakehouse_automation_spark.operators.vector import (
        ivf_index_refresh, ivf_index_search, ivf_index_write)

    split = max(8, int(emb.count() * 0.8))
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    ivf_index_write(emb.filter(F.col("vec_id") < split), inc)
    touched = ivf_index_refresh(
        spark, emb.filter(F.col("vec_id") >= split), inc)
    ivf_index_write(emb, full)

    # index content identical (vec_id -> cell assignment)
    a = {(r.vec_id, r.cell_id) for r in
         spark.read.parquet(inc).select("vec_id", "cell_id").collect()}
    b = {(r.vec_id, r.cell_id) for r in
         spark.read.parquet(full).select("vec_id", "cell_id").collect()}
    assert a == b

    # search results identical, value-exactly
    ra = sorted(map(tuple, ivf_index_search(spark, emb, inc).collect()))
    rb = sorted(map(tuple, ivf_index_search(spark, emb, full).collect()))
    assert ra == rb

    # the audit return covers exactly the batch
    got = {r.vec_id for r in touched.collect()}
    assert got == {r.vec_id for r in
                   emb.filter(F.col("vec_id") >= split)
                   .select("vec_id").collect()}


def test_ivf_index_refresh_touches_only_batch_cells(spark, emb, tmp_path):
    """The refresh append must write files ONLY into cell directories
    the batch assigns to — untouched cells keep their exact file sets
    (refresh cost ∝ batch at the filesystem level too)."""
    import glob
    import os

    from lakehouse_automation_spark.operators.vector import (
        ivf_index_refresh, ivf_index_write)

    split = max(8, int(emb.count() * 0.8))
    idx = str(tmp_path / "idx")
    ivf_index_write(emb.filter(F.col("vec_id") < split), idx)

    def files_per_cell():
        out = {}
        for d in glob.glob(os.path.join(idx, "cell_id=*")):
            out[os.path.basename(d)] = sorted(
                os.path.basename(f)
                for f in glob.glob(os.path.join(d, "*.parquet")))
        return out

    before = files_per_cell()
    touched = ivf_index_refresh(
        spark, emb.filter(F.col("vec_id") >= split), idx)
    batch_cells = {f"cell_id={r.cell_id}"
                   for r in touched.select("cell_id").distinct().collect()}
    after = files_per_cell()
    for cell, fs in before.items():
        if cell not in batch_cells:
            assert after[cell] == fs, f"untouched {cell} was rewritten"
        else:
            assert set(fs) <= set(after[cell])


def test_ivf_index_compact_preserves_content_and_search(spark, emb, tmp_path):
    """After repeated refreshes, compacting the index must collapse
    each cell to one file while leaving assignment content and search
    results byte-identical — the partition-local small-file
    maintenance pass of the refresh lifecycle."""
    import glob
    import os

    from lakehouse_automation_spark.operators.vector import (
        ivf_index_compact, ivf_index_refresh, ivf_index_search,
        ivf_index_write)

    n = emb.count()
    idx = str(tmp_path / "idx")
    ivf_index_write(emb.filter(F.col("vec_id") < n - 200), idx)
    ivf_index_refresh(
        spark, emb.filter((F.col("vec_id") >= n - 200)
                          & (F.col("vec_id") < n - 100)), idx)
    ivf_index_refresh(spark, emb.filter(F.col("vec_id") >= n - 100), idx)

    before = {(r.vec_id, r.cell_id) for r in
              spark.read.parquet(idx).select("vec_id", "cell_id").collect()}
    res_before = sorted(map(tuple, ivf_index_search(spark, emb, idx).collect()))
    n_cells = ivf_index_compact(spark, idx)
    assert n_cells > 0
    for d in glob.glob(os.path.join(idx, "cell_id=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
    after = {(r.vec_id, r.cell_id) for r in
             spark.read.parquet(idx).select("vec_id", "cell_id").collect()}
    assert after == before
    assert sorted(map(tuple, ivf_index_search(spark, emb, idx).collect())) \
        == res_before


def test_ivf_index_compact_crash_residue_is_invisible(spark, emb, tmp_path):
    """Compaction scratch lives under the underscore-prefixed
    ``_compact_tmp`` dir precisely so a crashed run's leftovers are
    skipped by Spark's partitioned listing — a root-level tmp dir
    would parse as a malformed cell_id partition value and corrupt
    discovery for every reader. Simulate the crash residue (a fully
    written new-cell dir left in scratch) and assert reads and search
    are byte-identical to the clean index."""
    import os
    import shutil

    from lakehouse_automation_spark.operators.vector import (
        ivf_index_search, ivf_index_write)

    idx = str(tmp_path / "idx")
    ivf_index_write(emb, idx)
    clean = {(r.vec_id, r.cell_id) for r in
             spark.read.parquet(idx).select("vec_id", "cell_id").collect()}
    res_clean = sorted(map(tuple, ivf_index_search(spark, emb, idx).collect()))
    # crash residue: a compacted copy of cell 0 abandoned in scratch
    scratch = os.path.join(idx, "_compact_tmp")
    os.makedirs(scratch)
    shutil.copytree(os.path.join(idx, "cell_id=0"),
                    os.path.join(scratch, "new-0"))
    after = {(r.vec_id, r.cell_id) for r in
             spark.read.parquet(idx).select("vec_id", "cell_id").collect()}
    assert after == clean
    assert sorted(map(tuple, ivf_index_search(spark, emb, idx).collect())) \
        == res_clean


def test_ivf_index_compact_replays_interrupted_swap(spark, emb, tmp_path):
    """Crash WINDOW recovery (not just residue invisibility): a run
    killed between rename(cdir, old) and rename(tmp, cdir) leaves the
    cell absent from the table with both copies stranded in scratch.
    Re-running compact must first restore the missing cell from the
    authoritative old-N copy — never wipe scratch while it holds the
    sole copy — and then finish normally, leaving assignments and
    search byte-identical to the pre-crash index."""
    import glob
    import os

    from lakehouse_automation_spark.operators.vector import (
        ivf_index_compact, ivf_index_search, ivf_index_write)

    idx = str(tmp_path / "idx")
    ivf_index_write(emb, idx)
    clean = {(r.vec_id, r.cell_id) for r in
             spark.read.parquet(idx).select("vec_id", "cell_id").collect()}
    res_clean = sorted(map(tuple, ivf_index_search(spark, emb, idx).collect()))

    # stage the mid-swap crash: cell 0 gone from the table, old copy
    # (authoritative) AND a half-written new copy both in scratch
    scratch = os.path.join(idx, "_compact_tmp")
    os.makedirs(scratch)
    cdir = os.path.join(idx, "cell_id=0")
    os.rename(cdir, os.path.join(scratch, "old-0"))
    os.makedirs(os.path.join(scratch, "new-0"))  # torn write, no parts
    assert not os.path.isdir(cdir)

    n_cells = ivf_index_compact(spark, idx)
    assert n_cells > 0
    assert os.path.isdir(cdir), "cell 0 not restored from scratch"
    assert not os.path.isdir(scratch) or not os.listdir(scratch)
    after = {(r.vec_id, r.cell_id) for r in
             spark.read.parquet(idx).select("vec_id", "cell_id").collect()}
    assert after == clean
    assert sorted(map(tuple, ivf_index_search(spark, emb, idx).collect())) \
        == res_clean
    for d in glob.glob(os.path.join(idx, "cell_id=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d


def test_ivf_index_refresh_rejects_pre_meta_index(spark, emb, tmp_path):
    """A pre-refresh-era index (no _meta/centroids) must fail with a
    clear rebuild instruction, not a cryptic parquet error."""
    import shutil

    import pytest as _pytest

    from lakehouse_automation_spark.operators.vector import (
        ivf_index_refresh, ivf_index_write)

    idx = str(tmp_path / "idx")
    ivf_index_write(emb.limit(100), idx)
    shutil.rmtree(f"{idx}/_meta")
    with _pytest.raises(FileNotFoundError, match="ivf_index_write"):
        ivf_index_refresh(spark, emb.limit(10), idx)


def test_legacy_single_knob_wide_bits_rederives_scale_bands(emb):
    """A single-knob lsh_bucket_table call with a 16-bit width (what
    adaptive_bits_per_band returns at scale) must re-derive the
    16-band scale tier, not the 32-plane legacy 32//16 = 2 bands — a
    2-band 16-bit signature collapses candidate recall to ~0.17 at
    sim 0.9 vs the intended ~0.96 (ADVICE r7). 8-bit-and-under
    widths keep the legacy 32-plane derivation bit-for-bit."""
    from lakehouse_automation_spark.operators.vector import (
        N_LSH_BANDS, lsh_bucket_table)

    sample = emb.limit(40)
    wide = lsh_bucket_table(sample, bits_per_band=16)
    assert wide.select("band_id").distinct().count() == 16
    legacy = lsh_bucket_table(sample, bits_per_band=4)
    assert legacy.select("band_id").distinct().count() == N_LSH_BANDS


def test_scale_tier_banding_recall(spark):
    """The 16x16 scale tier must keep recall in the regime it exists
    for — HIGH-similarity (near-dup) pairs: sign-LSH collision p at
    sim 0.95 is ~0.90, so 16-bit bands hit p^16 ~ 0.18 per band and
    the 16-band growth is what rescues recall (1-(1-0.18)^16 ~ 0.96;
    a 16-bit x 4-band misconfiguration collapses to ~0.55). The
    testdata corpus plants no high-sim pairs (0 above 0.6), so the
    test plants its own: 150 base vectors + 50 noisy near-copies at
    sim >= ~0.9, then checks the 16x16 pair recall against the exact
    scan. Low-sim generic kNN is NOT the tier's contract — at any
    banding, sign-LSH needs band counts this budget doesn't target
    (documented in adaptive_banding)."""
    import numpy as np

    from lakehouse_automation_spark.operators.cache import release_persisted
    import lakehouse_automation_spark.operators.vector as V

    rng = np.random.default_rng(7)
    base = rng.standard_normal((150, 64))
    dups = base[:50] + 0.25 * rng.standard_normal((50, 64))
    vecs = np.vstack([base, dups]).astype("float64")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    exact = {(r.id_a, r.id_b) for r in
             V.cosine_neardup_pairs(emb, threshold=0.8).collect()}
    assert len(exact) >= 30, "planting failed"
    release_persisted()
    orig = V.adaptive_banding
    V.adaptive_banding = lambda n: (16, 16)
    try:
        approx = {(r.id_a, r.id_b) for r in
                  V.lsh_neardup_pairs(emb, threshold=0.8).collect()}
    finally:
        V.adaptive_banding = orig
        release_persisted()
    assert approx <= exact          # precision 1.0: candidates re-verified
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.7, f"scale-tier near-dup recall {recall:.2f}"


def test_matryoshka_recall_vs_exact(spark, emb):
    """The 16-of-64-dim coarse stage must carry real signal: recall@10
    of the 50-wide shortlist far above the random-shortlist baseline.
    The testdata embeddings are random (not MRL-trained), so the
    prefix/full-sim correlation is only ~sqrt(16/64)=0.5 — measured
    recall ~0.44 vs a 50/499~0.10 baseline. MRL-trained embeddings
    concentrate the signal in the prefix and push this toward 1."""
    from lakehouse_automation_spark.queries import REGISTRY
    from lakehouse_automation_spark.queries.vector_pipeline import _MRL_SHORT

    k = 10
    exact = _exact_topk_sets(emb, 5, k)
    approx = {}
    rows = REGISTRY["vec_matryoshka_topk"].fn(
        spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        approx.setdefault(r.q_id, set()).add(r.vec_id)
    assert all(len(v) == k for v in approx.values())
    recall = (sum(len(exact[q] & approx.get(q, set())) for q in exact)
              / (len(exact) * k))
    n_corpus = emb.count()
    baseline = _MRL_SHORT / (n_corpus - 1)
    assert recall >= 3 * baseline, (
        f"matryoshka recall {recall:.2f} vs random baseline {baseline:.2f}")


def test_matryoshka_recall_on_mrl_structured_embeddings(spark, tmp_path):
    """The meaningful recall gate (VERDICT r5 #5): on RANDOM vectors a
    16-of-64 prefix carries only ~sqrt(16/64) of the cosine signal, so
    the random-testdata assertion above is necessarily weak. Real MRL
    training concentrates representation energy in the prefix dims —
    synthesize exactly that (prefix sigma 1.0, tail sigma 0.15 ->
    ~94% of energy in the first 16 dims) and pin an ABSOLUTE
    recall@10 >= 0.8 for the 50-wide shortlist over 500 vectors."""
    import numpy as np
    import pandas as pd

    from lakehouse_automation_spark.queries import REGISTRY

    rng = np.random.default_rng(42)
    scales = np.where(np.arange(64) < 16, 1.0, 0.15)
    X = (rng.normal(size=(500, 64)) * scales).astype(np.float32)

    pdf = pd.DataFrame({
        "vec_id": np.arange(500, dtype=np.int64),
        "embedding": [row for row in X],
        "label": np.zeros(500, dtype=np.int32),
    })
    pdf.to_parquet(str(tmp_path / "embeddings.parquet"), index=False)

    # numpy ground truth from the SAME float32 values Spark reads
    Xd = X.astype(np.float64)
    sims = Xd @ Xd.T / np.outer(np.linalg.norm(Xd, axis=1),
                                np.linalg.norm(Xd, axis=1))
    exact = {}
    for q in range(5):
        s = sims[q].copy()
        s[q] = -np.inf  # self-exclusion, matching the operator
        # operator tie-breaks by vec_id asc; argsort is stable so
        # sorting by (-sim, id) via stable argsort on -s matches
        exact[q] = set(np.argsort(-s, kind="stable")[:10].tolist())

    approx = {}
    for r in REGISTRY["vec_matryoshka_topk"].fn(spark, str(tmp_path)).collect():
        approx.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(approx) == set(exact)
    recall = (sum(len(exact[q] & approx[q]) for q in exact)
              / (len(exact) * 10))
    assert recall >= 0.8, f"MRL-structured recall@10 {recall:.2f} < 0.8"


def test_int8_recall_and_exact_rerank(emb):
    """SQ8 gates: (a) the 32-wide int8 shortlist must carry most of
    the exact top-10 — 8-bit per-dim codes lose little cosine signal,
    so pin an absolute recall, far above shortlist-size baseline;
    (b) surviving sim_r values are EXACT cosine (the rerank recomputes
    in full precision), so they must equal the brute-force tier's
    values for the same (q, c) pairs."""
    from lakehouse_automation_spark.operators.vector import int8_topk

    k = 10
    exact_rows = cosine_topk(emb, n_queries=5, k=k).collect()
    exact_sets = {}
    exact_sims = {}
    for r in exact_rows:
        exact_sets.setdefault(r.q_id, set()).add(r.vec_id)
        exact_sims[(r.q_id, r.vec_id)] = r.sim_r
    got = int8_topk(emb, n_queries=5, k=k).collect()
    approx = {}
    for r in got:
        approx.setdefault(r.q_id, set()).add(r.vec_id)
        if (r.q_id, r.vec_id) in exact_sims:
            assert r.sim_r == exact_sims[(r.q_id, r.vec_id)]
    assert all(len(v) == k for v in approx.values())
    recall = (sum(len(exact_sets[q] & approx.get(q, set()))
                  for q in exact_sets) / (len(exact_sets) * k))
    assert recall >= 0.8, f"int8 recall {recall:.2f}"


def test_int8_codes_cover_full_range(spark, emb):
    """Calibration law: the global max-abs coordinate must land on a
    range extreme (127 if positive, -128 if negative) — the scale is
    chosen so the code book uses its full width."""
    import numpy as np

    X = np.array(emb.orderBy("vec_id").select("embedding")
                 .toPandas()["embedding"].tolist(), dtype=np.float64)
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    s = np.abs(U).max()
    q = np.clip(np.floor(U / s * 128.0), -128, 127).astype(int)
    assert q.max() == 127 or q.min() == -128
    assert q.max() <= 127 and q.min() >= -128


def test_binary_recall_and_exact_rerank(emb):
    """Binary tier gates: the Hamming 32-wide shortlist must carry
    most of the exact top-10 (random ~isotropic vectors: hamming is a
    faithful arccos-of-cosine proxy), and surviving sim_r values are
    exact cosine — equal to the brute-force tier's for shared pairs."""
    from lakehouse_automation_spark.operators.vector import binary_hamming_topk

    k = 10
    exact_rows = cosine_topk(emb, n_queries=5, k=k).collect()
    exact_sets, exact_sims = {}, {}
    for r in exact_rows:
        exact_sets.setdefault(r.q_id, set()).add(r.vec_id)
        exact_sims[(r.q_id, r.vec_id)] = r.sim_r
    got = binary_hamming_topk(emb, n_queries=5, k=k).collect()
    approx = {}
    for r in got:
        approx.setdefault(r.q_id, set()).add(r.vec_id)
        if (r.q_id, r.vec_id) in exact_sims:
            assert r.sim_r == exact_sims[(r.q_id, r.vec_id)]
    assert all(len(v) == k for v in approx.values())
    recall = (sum(len(exact_sets[q] & approx.get(q, set()))
                  for q in exact_sets) / (len(exact_sets) * k))
    # 1 bit/dim keeps less signal than 8 — gate above the 32/499
    # random-shortlist baseline with clear margin, below SQ8's 0.8
    assert recall >= 0.5, f"binary recall {recall:.2f}"


def test_binary_topk_matches_numpy_replay(spark, emb):
    """End-to-end determinism: replicate the WHOLE operator in numpy
    (sign packing, two-word Hamming, (ham, vec_id) shortlist of 32,
    exact-cosine rerank with (sim, vec_id) tie-break) and require the
    Spark output to match exactly — a wrong bit weight, swapped word
    half, or >= vs > sign rule all diverge here."""
    import numpy as np

    from lakehouse_automation_spark.operators.vector import (
        SIM_DECIMALS,
        binary_hamming_topk,
    )

    rows = emb.orderBy("vec_id").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    bits = X > 0
    nrm = np.linalg.norm(X, axis=1)

    want = set()
    for qi in range(5):
        q = int(np.where(ids == qi)[0][0])
        ham = (bits != bits[q]).sum(axis=1)
        order = sorted((int(ham[j]), int(ids[j]))
                       for j in range(len(ids)) if ids[j] != qi)[:32]
        short = [v for _, v in order]
        sims = []
        for v in short:
            j = int(np.where(ids == v)[0][0])
            # same sequential fold order as the engines
            d = 0.0
            for t in range(X.shape[1]):
                d += X[q, t] * X[j, t]
            sims.append((round(d / (nrm[q] * nrm[j]), SIM_DECIMALS), v))
        top = sorted(sims, key=lambda sv: (-sv[0], sv[1]))[:10]
        for rk, (sv, v) in enumerate(top, 1):
            want.add((qi, v, sv, rk))

    got = {(r.q_id, r.vec_id, r.sim_r, r.rk)
           for r in binary_hamming_topk(emb, n_queries=5, k=10).collect()}
    assert got == want


def test_ivf_refresh_compact_cadence_caps_files_and_preserves_search(
        spark, emb, tmp_path):
    """compact_files_per_cell wires the maintenance pass into the
    refresh cadence (VERDICT r9 ask #6): after repeated refreshes no
    touched cell may exceed the threshold by more than the single
    fresh append, and index content + search stay identical to a
    never-compacted twin — refresh -> refresh -> (auto)compact ->
    search equality, pinned."""
    import glob
    import os

    from lakehouse_automation_spark.operators.vector import (
        ivf_index_refresh, ivf_index_search, ivf_index_write)

    n = emb.count()
    base = emb.filter(F.col("vec_id") < n // 2)
    cadenced, plain = str(tmp_path / "cad"), str(tmp_path / "plain")
    ivf_index_write(base, cadenced)
    ivf_index_write(base, plain)
    # 4 refresh batches; threshold 2 forces at least one auto-compact
    bounds = [n // 2 + (n // 8) * i for i in range(5)]
    bounds[-1] = n + 1
    for lo, hi in zip(bounds, bounds[1:]):
        b = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        ivf_index_refresh(spark, b, cadenced, compact_files_per_cell=2)
        ivf_index_refresh(spark, b, plain)

    # content identical to the never-compacted twin
    a = {(r.vec_id, r.cell_id) for r in
         spark.read.parquet(cadenced).select("vec_id", "cell_id").collect()}
    b2 = {(r.vec_id, r.cell_id) for r in
          spark.read.parquet(plain).select("vec_id", "cell_id").collect()}
    assert a == b2

    # search identical, value-exactly
    ra = sorted(map(tuple, ivf_index_search(spark, emb, cadenced).collect()))
    rb = sorted(map(tuple, ivf_index_search(spark, emb, plain).collect()))
    assert ra == rb

    # the cadence actually capped file growth: every cell holds at most
    # threshold+1 parts (one fresh append may land after its compact),
    # and the cadenced index holds strictly fewer parts than the twin
    def parts(idx):
        return {os.path.basename(d): len(glob.glob(os.path.join(d, "*.parquet")))
                for d in glob.glob(os.path.join(idx, "cell_id=*"))}

    pc, pp = parts(cadenced), parts(plain)
    assert all(v <= 3 for v in pc.values()), pc
    assert sum(pc.values()) < sum(pp.values()), (pc, pp)


def test_refresh_compact_releases_cached_assignment(spark, emb, tmp_path):
    """ADVICE r10: the compact-enabled refresh must not accumulate
    executor storage across a long-running cadence. The batch
    assignment is persist()ed for the write + touched-cell listing and
    explicitly unpersisted before return (a localCheckpoint here would
    be unreleasable while the caller holds the audit DataFrame), so
    the JVM's persistent-RDD registry must end no larger than it
    started — and the lazily re-evaluable audit return still works."""
    from lakehouse_automation_spark.operators.vector import (
        ivf_index_refresh, ivf_index_write)

    split = max(8, int(emb.count() * 0.8))
    idx = str(tmp_path / "idx")
    ivf_index_write(emb.filter(F.col("vec_id") < split), idx,
                    n_centroids=4)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    touched = ivf_index_refresh(
        spark, emb.filter(F.col("vec_id") >= split), idx,
        compact_files_per_cell=1)  # force the compact branch
    n_audit = touched.count()  # audit DF re-evaluates lazily post-release
    assert n_audit == emb.filter(F.col("vec_id") >= split).count()
    after = jsc.getPersistentRDDs().size()
    assert after <= before, (
        f"refresh leaked cached blocks: {before} -> {after}")


def test_memo_scalar_lifecycle_matches_keyed_persists(spark):
    """memo_scalar (the LSH corpus-count cache, ADVICE r14) must share
    the keyed-persist lifecycle exactly: hit on the same key without
    recomputing, miss on a different key, and be CLEARED by
    release_persisted — a scalar outliving the cached table it
    describes would serve a stale banding tier to the next corpus
    that happens to reuse the key tuple."""
    from lakehouse_automation_spark.operators import cache as C
    from lakehouse_automation_spark.operators.cache import (
        memo_scalar, release_persisted)

    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return 42

    release_persisted()
    assert memo_scalar(("k", "a"), compute) == 42
    assert memo_scalar(("k", "a"), compute) == 42  # hit: no recompute
    assert calls["n"] == 1
    assert memo_scalar(("k", "b"), compute) == 42  # different key: miss
    assert calls["n"] == 2
    assert len(C._SCALARS) == 2
    release_persisted()
    assert C._SCALARS == {}  # cleared WITH the persists
    assert memo_scalar(("k", "a"), compute) == 42  # fresh epoch: miss
    assert calls["n"] == 3
    release_persisted()
