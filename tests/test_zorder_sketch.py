"""Z-order clustering + theta/top-k sketch keys.

The oracle gate hash-checks outputs; these tests pin the physical
claims — multi-dimensional file pruning actually happens, content
survives the clustering rewrite, sketch estimates hit their bounds —
with the diagnostic numbers the oracle booleans compress away.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lakehouse_automation_spark.queries import REGISTRY

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def run(key, spark, sf=SF_SMOKE):
    return REGISTRY[key].fn(spark, sf)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    from lakehouse_automation_spark.engine.catalog import table
    from lakehouse_automation_spark.tableformat import CowTable

    orders = table(spark, SF_CORRECT, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    tbl = CowTable.create(spark, orders, str(tmp_path / "o"),
                          stats_cols=["o_custkey", "o_orderdate"])
    tbl.compact(n_files=16, zorder_by=["o_custkey", "o_orderdate"])
    man = tbl.manifest()
    files_total = sum(len(v) for v in man["file_stats"].values())
    assert files_total >= 8  # the clustering actually fanned out
    f_cust = len(tbl.pruned_files("o_custkey", 100, 199))
    f_date = len(tbl.pruned_files(
        "o_orderdate", dt.datetime(1997, 1, 1), dt.datetime(1997, 12, 31)))
    # BOTH dimensions skip files — the property single-key range
    # clustering cannot give the second column
    assert f_cust < files_total
    assert f_date < files_total
    # content survives the rewrite bit-exactly
    assert tbl.read().count() == orders.count()
    a = tbl.read().agg(F.sum(F.round(F.col("o_totalprice") * 100)
                             .cast("long"))).collect()[0][0]
    b = orders.agg(F.sum(F.round(F.col("o_totalprice") * 100)
                         .cast("long"))).collect()[0][0]
    assert a == b
    # scan() returns exactly the range rows despite reading a subset
    got = tbl.scan("o_custkey", 100, 199).count()
    want = orders.filter(F.col("o_custkey").between(100, 199)).count()
    assert got == want


def test_zorder_sortby_mutually_exclusive(spark, tmp_path):
    import pytest

    from lakehouse_automation_spark.tableformat import CowTable

    tbl = CowTable.create(
        spark, spark.range(10).withColumn("v", F.col("id")),
        str(tmp_path / "t"))
    with pytest.raises(ValueError):
        tbl.compact(sort_by=["id"], zorder_by=["v"])


def test_zorder_single_dim_beats_second_column_of_sortby(spark, tmp_path):
    """sort_by(custkey) gives the DATE query nothing; zorder gives it
    real pruning on the same data and file count."""
    from lakehouse_automation_spark.engine.catalog import table
    from lakehouse_automation_spark.tableformat import CowTable

    orders = table(spark, SF_CORRECT, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice")
    lo, hi = dt.datetime(1997, 1, 1), dt.datetime(1997, 6, 30)

    s = CowTable.create(spark, orders, str(tmp_path / "s"),
                        stats_cols=["o_custkey", "o_orderdate"])
    s.compact(n_files=16, sort_by=["o_custkey"])
    z = CowTable.create(spark, orders, str(tmp_path / "z"),
                        stats_cols=["o_custkey", "o_orderdate"])
    z.compact(n_files=16, zorder_by=["o_custkey", "o_orderdate"])

    s_total = sum(len(v) for v in s.manifest()["file_stats"].values())
    s_date = len(s.pruned_files("o_orderdate", lo, hi))
    z_total = sum(len(v) for v in z.manifest()["file_stats"].values())
    z_date = len(z.pruned_files("o_orderdate", lo, hi))
    # custkey-sorted layout: every file spans ~the whole date range
    assert s_date == s_total
    # z-ordered layout: date range genuinely prunes
    assert z_date < z_total


def test_theta_setops_bounds_and_identities(spark):
    r = run("agg_sketch_setops", spark, SF_CORRECT).collect()[0]
    assert r["inter_ok"] and r["union_ok"]
    # inclusion-exclusion on the exact side
    assert (r["exact_view"] + r["exact_purchase"]
            == r["exact_union"] + r["exact_inter"])
    assert r["exact_inter"] <= min(r["exact_view"], r["exact_purchase"])
    assert r["exact_union"] >= max(r["exact_view"], r["exact_purchase"])


def test_approx_topk_matches_exact(spark):
    rows = run("agg_approx_topk", spark, SF_CORRECT).collect()
    assert len(rows) == 3
    assert all(r["est_exact"] for r in rows)
    # descending and tie-broken deterministically
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_pattern_detect_bursts_verified_by_pairs(spark):
    got = {r["user_id"]: r["n_bursts"]
           for r in run("win_pattern_detect", spark, SF_CORRECT).collect()}
    from lakehouse_automation_spark.engine.catalog import table
    ev = (table(spark, SF_CORRECT, "events")  # catalog: ns-ts normalized
          .filter(F.col("event_type") == "error")
          .select("user_id", "event_id", "ts"))
    # independent construction: self-join consecutive errors via
    # row_number instead of lag
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    idx = ev.withColumn("rn", F.row_number().over(w))
    a, b = idx.alias("a"), idx.alias("b")
    pairs = a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                   & (F.col("a.rn") + 1 == F.col("b.rn")))
    gap_us = (F.unix_micros(F.col("b.ts").cast("timestamp"))
              - F.unix_micros(F.col("a.ts").cast("timestamp")))
    want = {r["user_id"]: r["n"] for r in
            pairs.filter(gap_us <= 600_000_000)
            .groupBy(F.col("a.user_id").alias("user_id"))
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_zorder_many_columns_stays_in_sign_free_bits(spark, tmp_path):
    """With k columns the per-column bit budget is 63 // k: 4-column
    interleaving must not land a bit on the sign bit (which would
    invert the top-level ordering) and 5-column must not wrap the
    shift mod 64 (silent cross-column bit collisions). Pin both via
    non-negativity and monotonicity in the dominant column."""
    from lakehouse_automation_spark.tableformat import CowTable

    # the z-curve is monotone along its diagonal (all coordinates
    # increasing together); a sign-bit hit or a wrapped shift breaks
    # exactly that
    df = spark.range(256).select(
        *[F.col("id").alias(c) for c in ("a", "b", "c", "d", "e")])
    tbl = CowTable.create(spark, df, str(tmp_path / "t"))
    for cols in (["a", "b", "c", "d"], ["a", "b", "c", "d", "e"]):
        z = (df.withColumn("__z", tbl._zorder_value(df, cols))
             .select("a", "__z").collect())
        k = len(cols)
        assert all(r["__z"] >= 0 for r in z), f"sign bit hit for k={k}"
        by_a = [r["__z"] for r in sorted(z, key=lambda r: r["a"])]
        assert by_a == sorted(by_a), f"diagonal ordering corrupted for k={k}"
        assert by_a[0] < by_a[-1], f"z-value degenerate for k={k}"


def test_cms_no_underestimate_and_mass_conservation(spark):
    """Count-min laws: (a) est >= true for EVERY probe (the sketch's
    one-sided guarantee — a single violation means broken hashing);
    (b) each of the K counter rows conserves total mass (sums to the
    corpus row count); (c) the sketch is linear: the CMS of the corpus
    equals the cellwise sum of the CMS of any disjoint split."""
    from lakehouse_automation_spark.queries import REGISTRY
    from lakehouse_automation_spark.queries.events_analytics import (
        _CMS_K,
        _CMS_W,
        _cms_bucket,
    )

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["agg_count_min_sketch"].fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.est_n >= r.true_n, r

    ev = (REGISTRY["agg_count_min_sketch"].fn.__globals__["t"](
        spark, sf, "events").select("user_id"))
    total = ev.count()

    def build(df):
        return {
            (r.i, r.bucket): r.n
            for r in (df.select(
                "user_id",
                F.explode(F.sequence(F.lit(0), F.lit(_CMS_K - 1))).alias("i"))
                .withColumn("bucket",
                            _cms_bucket(F.col("i"), F.col("user_id")))
                .groupBy("i", "bucket")
                .agg(F.count(F.lit(1)).alias("n")).collect())
        }

    cms = build(ev)
    for i in range(_CMS_K):
        assert sum(n for (ri, _), n in cms.items() if ri == i) == total
        assert all(b < _CMS_W for (ri, b) in cms if ri == i)

    half_a = build(ev.filter(F.col("user_id") % 2 == 0))
    half_b = build(ev.filter(F.col("user_id") % 2 == 1))
    merged: dict = {}
    for part in (half_a, half_b):
        for cell, n in part.items():
            merged[cell] = merged.get(cell, 0) + n
    assert merged == cms


def test_murmur3_tokens_match_spark_hash_partitioning(spark):
    """_murmur3_int32 must compute EXACTLY Spark's Murmur3Hash of an
    IntegerType value (the HashPartitioning placement function): the
    sampled z-order layout picks its file tokens driver-side with it,
    and a drift scrambles files across partitions (pruning would
    still fail loudly via tf_zorder's oracle booleans, but pin it at
    the unit level too). Sweep negatives, boundaries, and the token
    search range itself."""
    from lakehouse_automation_spark.tableformat import (
        _hash_bucket_tokens, _murmur3_int32)

    vals = list(range(0, 512)) + [-1, -512, 2**31 - 1, -2**31, 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "t int")
    got = {r.t: r.h for r in df.select("t", F.hash("t").alias("h")).collect()}
    for v in vals:
        assert _murmur3_int32(v) == got[v], v
    # and the derived tokens place collision-free: bucket b's token
    # must land in shuffle partition b for every n in the useful range
    for n in (1, 2, 7, 16, 64):
        toks = _hash_bucket_tokens(n)
        assert len(set(toks)) == n
        placed = (spark.createDataFrame([(t,) for t in toks], "t int")
                  .repartition(n, "t")
                  .select("t", F.spark_partition_id().alias("p")).collect())
        assert {r.t: r.p for r in placed} == {toks[b]: b for b in range(n)}


def test_sampled_layout_files_cover_disjoint_z_ranges(spark, tmp_path):
    """The sampled layout's contract: every output file covers one
    narrow, contiguous z range (cell ranges per file are contiguous
    and collision-free), so min/max stats prune on each z-ordered
    dimension. Check per-file custkey spans are narrow relative to
    the domain — the physical property the pruning booleans
    compress away."""
    from lakehouse_automation_spark.queries.base import t as _t
    from lakehouse_automation_spark.tableformat import CowTable

    orders = _t(spark, SF_CORRECT, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    tbl = CowTable.create(spark, orders, str(tmp_path / "z"),
                          stats_cols=["o_custkey", "o_orderdate"])
    tbl.compact(n_files=16, zorder_by=["o_custkey", "o_orderdate"],
                zorder_layout="sampled")
    man = tbl.manifest()
    (chunk,) = man["chunks"]
    fs = man["file_stats"][chunk]
    spans = []
    dom_lo = min(s["o_custkey"][0] for s in fs.values()
                 if s["o_custkey"][0] is not None)
    dom_hi = max(s["o_custkey"][1] for s in fs.values()
                 if s["o_custkey"][1] is not None)
    for s in fs.values():
        lo, hi = s["o_custkey"]
        if lo is not None:
            spans.append(hi - lo)
    # z-order trades exactness for multi-dim locality: each file's
    # custkey span should sit well under the full domain (a random
    # layout gives ~the whole domain per file)
    assert sorted(spans)[len(spans) // 2] < 0.6 * (dom_hi - dom_lo), spans
