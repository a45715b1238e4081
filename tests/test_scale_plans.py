"""Plan-shape guards for the scale patterns: bucketed co-located join
(no exchange), parquet pushdown/pruning on the flagship scan, and the
salted join's reducer spread."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from lakehouse_automation_spark.queries import REGISTRY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Both sides bucketed on the join key => sort-merge join with NO
    exchange (broadcast disabled so the planner can't sidestep the
    check at this tiny scale)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["join_bucketed"].fn(spark, sf_dir)
        plan = _plan(df)
        join_part = plan.split("SortMergeJoin", 1)
        assert len(join_part) == 2, f"expected SortMergeJoin:\n{plan}"
        # below the join: scans only, no hashpartitioning exchange
        below = join_part[1].split("HashAggregate")[0]
        assert "Exchange hashpartitioning" not in below, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_flagship_scan_pushdown_and_pruning(spark, sf_dir):
    """The pricing-summary scan must push the date filter to parquet
    and read only the referenced columns."""
    df = REGISTRY["flagship_pricing_summary"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan), plan
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "l_comment" not in m.group(1), "scan reads unneeded columns"


def test_flagship_guard_applied_exactly_once_per_sum(spark, sf_dir):
    """The money domain guard (CASE WHEN abs(x) <= 1e15) must appear
    exactly once per guarded aggregate input — round 10 shipped call
    sites passing an already-dec()-guarded expression into dsum(),
    which nested a second identical CASE around the first: two abs()
    evaluations and an extra decimal round-trip per row on exactly
    the hottest agg columns (VERDICT r10 'what's wrong' #1). Pin the
    de-dup by counting guard CASEs in the analyzed plan: 7 guarded
    inputs (4 sums + 3 avgs), never more."""
    df = REGISTRY["flagship_pricing_summary"].fn(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    n_guards = analyzed.count("1.0E15")
    assert n_guards == 7, (
        f"expected 7 single guards (4 dsum + 3 davg), saw {n_guards} "
        f"domain-bound literals — a nested double guard re-appeared"
        if n_guards > 7 else
        f"only {n_guards} guard literals — a money input lost its "
        f"domain guard")


def test_partitioned_sink_prunes_partitions(spark, sf_dir):
    """A date predicate over the partitioned layout must prune at the
    directory level: the scan's partition count < the total number of
    event-date partitions."""
    import datetime as dt
    import os
    import tempfile

    from pyspark.sql import functions as F

    from lakehouse_automation_spark.engine.catalog import table

    # catalog.table() owns the events.ts normalization (dtype-guarded:
    # ns-long on old Sparks, native timestamp_ntz on 4.1.2+); a
    # hand-rolled `ts div 1000` here breaks whenever the reader's
    # TIMESTAMP(NANOS) handling changes.
    ev = (table(spark, sf_dir, "events")
          .withColumn("event_date", F.to_date(F.date_trunc("day", "ts"))))
    path = os.path.join(tempfile.mkdtemp(prefix="las_prune_"), "t")
    ev.write.partitionBy("event_date").parquet(path)
    n_parts = len([d for d in os.listdir(path) if d.startswith("event_date=")])
    lo = ev.agg(F.min("event_date")).collect()[0][0]
    back = spark.read.parquet(path).filter(
        F.col("event_date") < F.lit(lo + dt.timedelta(days=3)))
    plan = _plan(back)
    # the date predicate must land in PartitionFilters (directory-level
    # pruning), not DataFilters (row-level after reading)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan
    assert n_parts > 3  # and there genuinely was something to prune
    # pruned scan returns only the filtered days
    days = {r[0] for r in back.select("event_date").distinct().collect()}
    assert len(days) == 3


def test_salted_join_matches_plain(spark, sf_dir):
    """Salting is a physical rewrite only — row-identical results."""
    salted = {
        r.s_nationkey: (r.n, round(r.price_sum, 2))
        for r in REGISTRY["join_skew_salted"].fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    plain = {
        r.s_nationkey: (r.n, round(r.price_sum, 2))
        for r in li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").alias("price_sum"),
        ).collect()
    }
    assert salted == plain


def test_interval_join_bucketed_is_hash_join_and_exact(spark, sf_dir):
    """The bucketized interval join must (a) return exactly the naive
    range join's rows and (b) plan as a hash/sort-merge join on the
    bucket key — never a nested loop."""
    from lakehouse_automation_spark.operators.rangejoin import (
        interval_join_bucketed,
    )
    from lakehouse_automation_spark.queries.base import t
    from pyspark.sql import functions as F

    ev = t(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"))
    r = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts"))
    got = interval_join_bucketed(l, r, "l_ts", "r_ts", 0, 600)
    naive = l.join(r, (F.col("r_ts") >= F.col("l_ts"))
                   & (F.col("r_ts") <= F.col("l_ts")
                      + F.expr("INTERVAL 600 SECONDS")))
    g = {(x.l_id, x.r_id) for x in got.select("l_id", "r_id").collect()}
    n = {(x.l_id, x.r_id) for x in naive.select("l_id", "r_id").collect()}
    assert g == n and len(n) > 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan[:500]


# ------------------------------------------------------------------
# sf1 (10x) plan-shape guards: the SAME physical strategies must hold
# on the scaled corpus — pushdown/pruning, partial+final aggregation,
# no cartesian on data joins, occupancy-bounded LSH banding. Data is
# local-generated (gitignored); regenerate all corpora with ONE
# command:
#   tools/regen_scaledata.sh
# Measured counterpart: bench/BASELINE_sf1.json + SCALE.md ratio table.
# CI mode: set LAS_REQUIRE_SCALEDATA=1 to FAIL (not skip) when the
# corpus is missing — a silent skip reads as coverage it isn't.

import os as _os

import pytest as _pytest

SF1_DIR = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    ".scaledata", "sf1")
_require_scaledata = _os.environ.get("LAS_REQUIRE_SCALEDATA") == "1"
_sf1 = _pytest.mark.skipif(
    not _os.path.isdir(SF1_DIR) and not _require_scaledata,
    reason="sf1 corpus not generated (tools/regen_scaledata.sh; "
           "LAS_REQUIRE_SCALEDATA=1 fails instead of skipping)")


def test_scale_corpus_present_when_required():
    """In CI mode the sf1 corpus must exist — fail loudly with the
    regenerate command instead of skipping the whole sf1 section."""
    if _require_scaledata:
        assert _os.path.isdir(SF1_DIR), (
            "LAS_REQUIRE_SCALEDATA=1 but .scaledata/sf1 is missing — "
            "run tools/regen_scaledata.sh")


@_sf1
def test_sf1_flagship_pushdown_and_pruning(spark):
    """Pushdown and column pruning must survive the 10x scale-up —
    same assertions as the sf0.001 test, bigger input."""
    df = REGISTRY["flagship_pricing_summary"].fn(spark, SF1_DIR)
    plan = _plan(df)
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan), plan
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "l_comment" not in m.group(1)


@_sf1
def test_sf1_aggs_stay_partial_final(spark):
    """Aggregations at sf1 must still plan map-side partials before the
    shuffle (partial_* functions under >=2 HashAggregate nodes)."""
    for key in ["agg_hash_basic", "flagship_pricing_summary"]:
        plan = _plan(REGISTRY[key].fn(spark, SF1_DIR))
        assert plan.count("HashAggregate") >= 2, f"{key}:\n{plan[:800]}"
        assert "partial_" in plan, f"{key} lost map-side partials"


@_sf1
def test_sf1_data_joins_never_cartesian(spark):
    """No relational headline join may degrade to a cartesian product
    on the scaled corpus (broadcast-nested-loop over a tiny literal
    side — e.g. the 32-row LSH plane table — is fine and excluded)."""
    for key in ["join_inner_equi", "join_broadcast", "join_self",
                "join_asof", "flagship_regional_revenue",
                "graph_pagerank"]:
        plan = _plan(REGISTRY[key].fn(spark, SF1_DIR))
        assert "CartesianProduct" not in plan, f"{key} went cartesian"


@_sf1
def test_sf1_lsh_banding_adapts(spark):
    """The 20k-vector sf1 corpus must resolve to 8-bit bands (4 bands,
    256 buckets) while the small-sf gate corpora keep the 4-bit oracle
    contract — the occupancy bound that turned the measured 177 s
    near-dup key into 6 s at sf1."""
    from lakehouse_automation_spark.engine.catalog import table as _t
    from lakehouse_automation_spark.operators.vector import (
        adaptive_bits_per_band, lsh_bucket_table)

    assert adaptive_bits_per_band(200) == 4     # sf0.01 gate corpus
    assert adaptive_bits_per_band(2000) == 4    # sf0.1 baseline corpus
    assert adaptive_bits_per_band(20000) == 8   # sf1
    b = lsh_bucket_table(_t(spark, SF1_DIR, "embeddings"))
    hi = b.agg(F.max("band_id").alias("band"), F.max("bucket").alias("bkt")
               ).first()
    assert hi["band"] == 3 and 15 < hi["bkt"] <= 255


def test_ivf_persisted_index_prunes_cell_partitions(spark, sf_dir, tmp_path):
    """The persisted IVF index must (a) lay out one directory per
    cell, (b) plan probe reads with a cell_id PartitionFilter so only
    probed directories are scanned, and (c) return exactly the inline
    ivf_topk results — the storage path changes, the answer doesn't."""
    from lakehouse_automation_spark.operators.vector import (
        ivf_index_search, ivf_index_write)
    from lakehouse_automation_spark.queries.base import t as _t

    emb = _t(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    ivf_index_write(emb, path, n_centroids=8)
    cell_dirs = [d for d in _os.listdir(path) if d.startswith("cell_id=")]
    assert len(cell_dirs) == 8
    out = ivf_index_search(spark, emb, path,
                           n_centroids=8, nprobe=3, n_queries=5, k=10)
    plan = _plan(out)
    # the INDEX scan (not the unpartitioned embeddings scan) must
    # carry the probe cells as a directory-level partition filter
    assert re.search(r"PartitionFilters: \[[^\]]*cell_id", plan), plan
    inline = REGISTRY["vec_ivf_topk"].fn(spark, sf_dir)
    key = lambda r: (r["q_id"], r["rk"])
    assert sorted(out.collect(), key=key) == sorted(inline.collect(), key=key)


def test_sink_partitioned_key_plan_prunes(spark, sf_dir):
    """The registry key itself must partition-prune its read-back: the
    7-day predicate lands in PartitionFilters (directory pruning), and
    the plan contains no filter on the data column ts — the bound is
    served by partition metadata, never a source re-scan."""
    df = REGISTRY["sink_partitioned"].fn(spark, sf_dir)
    plan = _plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan
    assert "ts" not in re.search(r"DataFilters: \[([^\]]*)\]", plan).group(1)


def test_sessionize_salted_two_level_plan(spark, sf_dir):
    """The skew-safe plan must shuffle event rows ONCE on the salted
    (user_id, _day) key and touch the plain user_id partitioning only
    AFTER aggregation to session rows — exactly two hash exchanges,
    with the bucketed one carrying the day salt."""
    plan = _plan(REGISTRY["sessionize_salted"].fn(spark, sf_dir))
    parts = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(parts) == 2, plan[:800]
    assert any("_day" in p for p in parts), parts
    assert any("_day" not in p and "user_id" in p for p in parts), parts


def test_dpp_join_prunes_fact_partitions(spark, sf_dir):
    """The fact scan of join_dpp_partition_pruned must carry a
    DynamicPruning PartitionFilter (the dim's md5-tag filter is opaque
    to static analysis, so ONLY runtime pruning can reduce the fact
    listing), and the pruned result must equal the unpruned join —
    pruning may never change answers."""
    df = REGISTRY["join_dpp_partition_pruned"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "dynamicpruning" in plan.lower(), plan
    # unpruned restatement on the same scratch table
    from lakehouse_automation_spark.queries.sinks import _scratch

    fact = spark.read.parquet(_scratch(sf_dir, "events_by_day"))
    dim = (fact.select("day").distinct()
           .withColumn("tag", F.substring(
               F.md5(F.col("day").cast("string")), 32, 1))
           .filter(F.col("tag").isin("a", "b")).drop("tag"))
    # DPP OFF for the reference — Spark injects DynamicPruning into
    # this restatement too otherwise, making the equality
    # self-confirming (a wrong pruned partition set would appear on
    # both sides)
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try:
        ref = (fact.join(dim, "day")
               .groupBy(F.col("day").cast("string").alias("day"))
               .agg(F.count(F.lit(1)).alias("n"),
                    (F.sum("cents").cast("double") / F.lit(100.0))
                    .alias("rev")))
        assert "dynamicpruning" not in _plan(ref).lower()
        want = {(r.day, r.n, round(r.rev, 6)) for r in ref.collect()}
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    got = {(r.day, r.n_events, round(r.revenue, 6)) for r in df.collect()}
    assert got == want and got


def test_quantized_ann_window_has_partial_group_limit(spark, sf_dir):
    """The quantized-ANN shortlist windows must carry Spark's
    rank-limit pushdown: a WindowGroupLimit in Partial mode BEFORE the
    q_id exchange caps the shuffle at shortlist rows per query per map
    partition, which is what makes a 1000-query batch viable (measured
    round 7, SCALE.md: the scoring expression, not the window
    exchange, is the dominant term at n_queries=1000). A Spark conf or
    plan change that silently drops the pushdown would re-expose the
    full n_queries x n candidate shuffle."""
    for key in ("vec_int8_topk", "vec_binary_topk"):
        plan = _plan(REGISTRY[key].fn(spark, sf_dir))
        assert re.search(r"WindowGroupLimit .*row_number\(\), \d+, Partial",
                         plan), f"{key}: no partial group limit\n{plan[:900]}"
        # the Partial limit must sit BELOW the q_id exchange
        part = plan.split("Exchange hashpartitioning(q_id", 1)
        assert len(part) == 2 and "Partial" in part[1], key


def test_sweepline_window_runs_over_aggregated_series(spark, sf_dir):
    """win_intervals_overlap's cumulative-sum window must consume the
    (priority, day) AGGREGATE, not raw order rows — the property that
    keeps the serialized-window hazard calendar-bounded. Plans print
    top-down, so every Window node must have a HashAggregate below it."""
    plan = _plan(REGISTRY["win_intervals_overlap"].fn(spark, sf_dir))
    assert "Window" in plan
    first_window_below = plan.split("Window", 1)[1]
    assert "HashAggregate" in first_window_below, plan


def test_weighted_median_window_over_value_histogram(spark, sf_dir):
    """agg_weighted_median's cumsum window likewise runs over the
    (flag, cents) histogram aggregate, never raw lineitems."""
    plan = _plan(REGISTRY["agg_weighted_median"].fn(spark, sf_dir))
    assert "Window" in plan
    assert "HashAggregate" in plan.split("Window", 1)[1], plan


def test_collocations_topk_is_partial(spark, sf_dir):
    """text_collocations' top-100 must plan as TakeOrderedAndProject
    (per-partition partial top-k), never a global Sort+Limit."""
    plan = _plan(REGISTRY["text_collocations"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_sample_estimate_single_scan(spark, sf_dir):
    """agg_sample_estimate computes the sampled and exact sides in ONE
    scan (CASE aggregates), not a second pass over lineitem."""
    plan = _plan(REGISTRY["agg_sample_estimate"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1, plan


def test_tfidf_scans_corpus_once_reuses_tf(spark, sf_dir):
    """tfidf_keywords (r15 plan): ONE scan+tokenize pass over the
    corpus. The pre-r15 plan fed the exploded token table into two
    different aggregations (tf, and a count_distinct df) that cannot
    share an exchange — two full corpus scans. Now tf is persisted
    and df derives from it (one row per distinct (doc, term) in tf
    makes count(*) == count_distinct(doc)), so the executed plan must
    show exactly one documents scan feeding the cache build, with
    BOTH join sides reading the cached tf (>=2 InMemoryTableScans).
    The join (not a count-over-window) keeps hot stopword terms
    AQE-skew-splittable."""
    from lakehouse_automation_spark.operators.cache import (
        release_persisted)

    release_persisted()
    try:
        df = REGISTRY["tfidf_keywords"].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = _plan(df)
        assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
        # the only parquet scan is the cache build's lineage reprint;
        # the execution tree itself reads the corpus zero times
        # outside the cached tf (tree-walk excludes cache lineage)
        names = _op_names(df)
        n_scans = sum("Scan parquet" in n or n == "FileSourceScan"
                      for n in names)
        assert n_scans == 0, names
    finally:
        release_persisted()


def test_bm25_scans_corpus_once_pivots_stats(spark, sf_dir):
    """text_bm25_rank (r15 plan): ONE scan+tokenize pass. The old plan
    re-executed the exploded-token subtree up to four times (dl, tf,
    and their downstream n_docs/avgdl and df aggs). Now doclen and the
    fixed query terms' tfs pivot into one persisted doc-sized
    aggregation, consumed by both the broadcast stats agg and the
    scoring pass — so the execution tree must read the cache at least
    twice and touch parquet zero times outside the cache build.

    r16 addition (ADVICE r15): doc-set selection must be the EXPLICIT
    match disjunction (tf_i > 0 for any query term), never the sign of
    the summed score — classic BM25 idf goes negative for
    df > n_docs/2, so a score-sign filter would silently couple the
    doc set to the idf formula."""
    from lakehouse_automation_spark.operators.cache import (
        release_persisted)

    release_persisted()
    try:
        df = REGISTRY["text_bm25_rank"].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = _plan(df)
        assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
        # selection = explicit term-match disjunction on the tf cols...
        assert re.search(r"\(tf_0#\d+L > 0\) OR \(tf_1#\d+L > 0\)", plan), \
            plan[:2000]
        # ...never a filter on the summed score's sign
        assert not re.search(r"Filter \(s#\d+ > 0", plan), plan[:2000]
        names = _op_names(df)
        n_scans = sum("Scan parquet" in n or n == "FileSourceScan"
                      for n in names)
        assert n_scans == 0, names
    finally:
        release_persisted()


def test_text_midtable_persists_are_keyed(spark, sf_dir):
    """tfidf_keywords and text_bm25_rank key their mid-table persists
    on the corpus plan (r16, ADVICE r15): a second invocation on the
    SAME corpus must add ZERO new persisted tables — the unkeyed
    version cached a fresh copy per call, degrading looping harnesses
    to LRU eviction pressure (the leak class the LSH keyed persists
    closed in r13)."""
    from lakehouse_automation_spark.operators import cache as C
    from lakehouse_automation_spark.operators.cache import (
        release_persisted)

    release_persisted()
    try:
        for key, cache_tag in (("tfidf_keywords", "tfidf_tf"),
                               ("text_bm25_rank", "bm25_per_doc")):
            REGISTRY[key].fn(spark, sf_dir).write.format(
                "noop").mode("overwrite").save()
            assert cache_tag in {k[0] for k in C._KEYED}, sorted(C._KEYED)
            n = len(C._PERSISTED)
            REGISTRY[key].fn(spark, sf_dir).write.format(
                "noop").mode("overwrite").save()
            assert len(C._PERSISTED) == n, (key, n, len(C._PERSISTED))
    finally:
        release_persisted()


# ------------------------------------------------------------- graph

def _op_names(df) -> list[str]:
    """Node names of the EXECUTED physical plan, tree-walked via py4j.
    Unlike the treeString, this excludes cached-plan reprints:
    InMemoryTableScan is a leaf of the execution tree, so whatever
    lineage built the cache never appears. AdaptiveSparkPlan wrappers
    are descended through their current (post-execution: final)
    plan."""
    names: list[str] = []

    def walk(node):
        name = node.nodeName()
        names.append(name)
        if "AdaptiveSparkPlan" in name:
            walk(node.executedPlan())
            return
        kids = node.children()
        for i in range(kids.length()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return names


def test_graph_pair_build_broadcasts_dim_no_cartesian(spark, sf_dir):
    """The shared co-supplier pair build (all graph keys run on it)
    must broadcast the supplier dim, shuffle the lineitem self-join on
    its equi-keys exactly once, and never degrade to a cartesian — at
    100 TB an unbounded cross join here is the scale-killer the
    blocking-key construction exists to prevent (VERDICT r7 ask #8)."""
    from lakehouse_automation_spark.queries.graph import _co_supplier_pairs

    df = _co_supplier_pairs(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan           # supplier dim
    # one shuffle for the (o, nat) self-join / distinct family; AQE
    # may fuse but never multiply it
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_pagerank_round_runs_off_caches(spark, sf_dir):
    """The MARGINAL cost of one PageRank iteration: a round built from
    the persisted edge/degree tables must read ONLY in-memory caches
    (a parquet scan inside the loop body means every one of the 8
    rounds re-runs the pair build — the per-round recompute regression
    this test exists to catch) and add a bounded number of shuffles."""
    from pyspark.sql import functions as F

    from lakehouse_automation_spark.operators.cache import (
        release_persisted, tracked_persist)
    from lakehouse_automation_spark.queries.graph import (
        _PR_SCALE, _co_supplier_pairs, _pr_round)

    try:
        pairs = _co_supplier_pairs(spark, sf_dir)
        edges = tracked_persist(
            pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
            .unionByName(pairs.select(F.col("id_b").alias("u"),
                                      F.col("id_a").alias("v")))
            .distinct())
        deg = tracked_persist(
            edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
            .select(F.col("u").alias("node"), "deg"))
        deg.count()  # materialize both caches
        nodes = deg.select("node")
        pr0 = nodes.select(
            "node", F.lit(_PR_SCALE).cast("long").alias("units"))
        rnd = _pr_round(nodes, pr0, edges, deg)
        rnd.write.format("noop").mode("overwrite").save()
        # walk the EXECUTION tree, not its string: InMemoryTableScan
        # is a leaf there, so the cached pair-build lineage (which the
        # treeString reprints, FileScans and all) is excluded — only
        # operators that actually run in the round are counted
        ops = _op_names(rnd)
        assert "InMemoryTableScan" in ops, ops
        assert not any("FileScan" in o or o == "Scan parquet"
                       for o in ops), ops
        assert "CartesianProduct" not in ops, ops
        assert "BroadcastNestedLoopJoin" not in ops, ops
        # share-join + contrib groupBy + node left-join: <= 4 shuffles
        # per round (AQE may broadcast some sides, never add more)
        assert ops.count("Exchange") <= 4, ops
    finally:
        release_persisted()


def test_triangles_joins_stay_equi_and_bounded(spark, sf_dir):
    """graph_triangles' wedge-close must plan as equi-joins over the
    persisted ordered edge list: zero CartesianProduct, and the only
    nested-loop join is the documented 1-row total_triangles
    broadcast. The persisted edge table must feed all three self-join
    references (InMemoryTableScan present)."""
    from lakehouse_automation_spark.operators.cache import release_persisted

    try:
        df = REGISTRY["graph_triangles"].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
        assert "InMemoryTableScan" in plan, plan
    finally:
        release_persisted()


def test_checkpointed_keys_capture_their_real_plans(spark, sf_dir):
    """The checkpointed keys' observable plan is `Scan ExistingRDD`
    (their scratch tables are deleted before return), so the REAL plan
    is published through operators/plancapture.py — the same helper
    tools/plan_report.py uses for PLANS.md (VERDICT r9 ask #7). Run
    the registry key with capture on and assert the pre-checkpoint
    search plan shows the cell_id PartitionFilters pruning that the
    post-checkpoint plan hides."""
    import os
    import re

    from lakehouse_automation_spark.operators import plancapture as PC
    from lakehouse_automation_spark.operators.cache import release_persisted
    from lakehouse_automation_spark.queries import REGISTRY

    os.environ["LAS_CAPTURE_PLANS"] = "1"
    PC.clear_captured()
    try:
        out = REGISTRY["vec_ivf_index_refresh"].fn(spark, sf_dir)
        post = out._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in post  # the observability gap, by design
        plans = PC.captured_plans()
        assert "vec_ivf_index_refresh:search" in plans, sorted(plans)
        pre = plans["vec_ivf_index_refresh:search"]
        assert re.search(r"PartitionFilters: \[[^\]]*cell_id", pre), (
            pre[:800])
    finally:
        os.environ.pop("LAS_CAPTURE_PLANS", None)
        PC.clear_captured()
        release_persisted()


def test_lsh_signature_stage_is_map_in_pandas(spark, sf_dir):
    """The LSH signature stage must plan as ONE Arrow-batched
    MapInPandas over the corpus (the r13 numpy matmul), never the old
    vector x plane crossJoin — that shape materialized corpus x 256
    rows each carrying two 64-double arrays (51M x ~1 KB at sf10,
    measured 80 s for a 200k x 64 matrix product). Pins both LSH keys'
    executed plans (VERDICT r13 ask #3)."""
    from lakehouse_automation_spark.operators.cache import release_persisted

    try:
        for key in ("vec_neardup_lsh", "vec_knn_join"):
            plan = _plan(REGISTRY[key].fn(spark, sf_dir))
            assert "MapInPandas" in plan, f"{key}: no MapInPandas stage"
            # the plane table must not enter as a join side at all
            assert "CartesianProduct" not in plan, key
            assert "BroadcastNestedLoopJoin" not in plan, key
    finally:
        release_persisted()


def test_knn_blocklocal_dedup_and_window_share_one_exchange(spark, sf_dir):
    """In the block-local verify shape the scored pairs repartition on
    q_id ONCE: HashPartitioning(q_id) satisfies both the (q_id, vec_id)
    dedup aggregate (subset of clustering keys) and the top-k window —
    exactly one q_id exchange in the plan. Partitioning on the full
    group key instead would NOT satisfy the window and a second q_id
    exchange would follow (ADVICE r13; the 100 TB shape pays shuffles
    in pair-table units)."""
    from lakehouse_automation_spark.operators.cache import release_persisted
    from lakehouse_automation_spark.operators.vector import knn_join_lsh
    from lakehouse_automation_spark.queries.base import t as _t

    try:
        df = knn_join_lsh(_t(spark, sf_dir, "embeddings"), k=5,
                          verify_shape="blocklocal")
        plan = _plan(df)
        n_qid = len(re.findall(r"Exchange hashpartitioning\(q_id", plan))
        assert n_qid == 1, f"{n_qid} q_id exchanges:\n{plan[:1200]}"
        # and none keyed on the full (q_id, vec_id) group key
        assert not re.search(
            r"Exchange hashpartitioning\(q_id[^)]*vec_id", plan), plan[:1200]
    finally:
        release_persisted()


def test_lsh_blocklocal_counts_corpus_once(spark, sf_dir):
    """The auto-resolved AND forced block-local paths must run exactly
    ONE corpus-count job per fresh corpus: r13 shipped the signature
    persist discarded and the banding re-derived by a second count
    inside the enriched build — two redundant corpus scans at exactly
    the tier where scans cost most (ADVICE r13). Pinned structurally
    via the keyed-persist registry (the signature table must be
    registered AND consumed — a discarded-signature regression would
    need a new keyed entry; a second LSH operator on the same corpus
    must add ZERO new persists) plus, since r15, the count action
    itself: the corpus count is memoized in cache._SCALARS under the
    signature plan key (r14 ADVICE — zero-new-persists alone rules out
    re-materialization but not a repeated count() action, which the
    forced-blocklocal path was paying per invocation), so we assert
    the memo holds exactly one lsh_nvec entry after BOTH operators."""
    from lakehouse_automation_spark.operators import cache as C
    from lakehouse_automation_spark.operators.cache import release_persisted
    from lakehouse_automation_spark.operators.vector import (
        knn_join_lsh, lsh_neardup_pairs)
    from lakehouse_automation_spark.queries.base import t as _t

    emb = _t(spark, sf_dir, "embeddings")
    try:
        lsh_neardup_pairs(emb, verify_shape="blocklocal").count()
        keyed = {k[0] for k in C._KEYED}
        # the signature table is persisted AND used (it feeds the
        # enriched build — the r13 version registered it then threw
        # it away), and the enriched table is keyed alongside it
        assert {"lsh_buckets", "lsh_enriched"} <= keyed, keyed
        n_persisted = len(C._PERSISTED)
        # the second operator on the same corpus must reuse ALL
        # shared state: no new persist, no new keyed entry — which
        # structurally rules out a second corpus count or a second
        # signature materialization
        knn_join_lsh(emb, k=5, verify_shape="blocklocal").count()
        assert len(C._PERSISTED) == n_persisted, (
            n_persisted, len(C._PERSISTED))
        assert {k[0] for k in C._KEYED} == keyed
        # the corpus-count action ran once and was memoized: both
        # operators resolved their banding/verify-shape from the SAME
        # single lsh_nvec entry (a second count would key identically,
        # so a re-count can only mean the memo was bypassed)
        nvec_keys = [k for k in C._SCALARS if k[0] == "lsh_nvec"]
        assert len(nvec_keys) == 1, sorted(C._SCALARS)
    finally:
        release_persisted()


def test_zorder_sampled_compact_write_is_one_scan_no_cache(spark, sf_dir):
    """The default ("sampled") z-order compact must write from a plan
    with NO InMemoryRelation and NO approxQuantile machinery — the
    one-scan guarantee _zorder_layout exists for (r13: the deleted
    passes were full-width scans, one a cluster-memory persist). The
    "persist" reference layout must show the cache, proving the pin
    discriminates. Job accounting confirms the deleted passes stay
    deleted: the sampled path runs strictly fewer jobs."""
    import os

    from lakehouse_automation_spark.operators import plancapture as PC
    from lakehouse_automation_spark.queries.base import t as _t
    from lakehouse_automation_spark.tableformat import CowTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    os.environ["LAS_CAPTURE_PLANS"] = "1"
    sc = spark.sparkContext
    try:
        plans = {}
        jobs = {}
        for layout in ("sampled", "persist"):
            import shutil
            import tempfile

            root = tempfile.mkdtemp(prefix=f"las_zpin_{layout}_")
            try:
                tbl = CowTable.create(
                    spark, orders, os.path.join(root, "t"),
                    stats_cols=["o_custkey", "o_orderdate"])
                PC.clear_captured()
                sc.setJobGroup(f"zpin_{layout}", "zorder pin", False)
                tbl.compact(n_files=4,
                            zorder_by=["o_custkey", "o_orderdate"],
                            zorder_layout=layout)
                sc.setJobGroup("", "", False)
                plans[layout] = PC.captured_plans()[
                    "cowtable:compact_write"]
                jobs[layout] = len(
                    sc.statusTracker().getJobIdsForGroup(
                        f"zpin_{layout}"))
            finally:
                shutil.rmtree(root, ignore_errors=True)
        assert "InMemoryRelation" not in plans["sampled"], \
            plans["sampled"][:1200]
        assert "InMemoryTableScan" not in plans["sampled"]
        # discriminator: the reference layout DOES cache
        assert ("InMemoryRelation" in plans["persist"]
                or "InMemoryTableScan" in plans["persist"])
        # the job COUNT per layout floats with AQE stage splits and
        # stats reads (r14 ADVICE: a >=2 delta was fragile across
        # Spark upgrades), so the plan-string assertions above are the
        # primary pin; the job gap only confirms the persist layout
        # still pays at least one extra pass (approxQuantile / range-
        # partitioner sampling) that the sampled path does not
        # (measured 10 vs 7 on Spark 4.1.2 at sf0.001)
        assert jobs["persist"] - jobs["sampled"] >= 1, jobs
    finally:
        os.environ.pop("LAS_CAPTURE_PLANS", None)
        PC.clear_captured()


def test_capture_plan_is_identity_when_disabled(spark, sf_dir):
    """With LAS_CAPTURE_PLANS unset the helper must record nothing and
    return the same DataFrame object — the bench/driver path pays no
    explainString cost."""
    import os

    from lakehouse_automation_spark.operators import plancapture as PC
    from lakehouse_automation_spark.queries.base import t

    assert os.environ.get("LAS_CAPTURE_PLANS") != "1"
    PC.clear_captured()
    df = t(spark, sf_dir, "region")
    assert PC.capture_plan("x", df) is df
    assert PC.captured_plans() == {}
