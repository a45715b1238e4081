"""Incremental pipelines: cross-run dedup, MV refresh, profiling.

The oracle gate hash-checks the outputs; these tests pin the
*incremental* claims — the batch run touches only the index, the MV
refresh equals the full recompute, the profile matches per-column
ground truth computed independently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_automation_spark.queries import REGISTRY

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def run(key, spark, sf=SF_SMOKE):
    return REGISTRY[key].fn(spark, sf)


def test_incremental_dedup_verdicts_match_direct_computation(spark):
    out = {r["doc_id"]: r["verdict"]
           for r in run("text_incremental_dedup", spark, SF_CORRECT).collect()}
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    batch_ids = {r["doc_id"] for r in
                 docs.filter(F.col("doc_id") % 10 >= 8)
                 .select("doc_id").collect()}
    assert set(out) == batch_ids
    assert set(out.values()) <= {"new", "exact_dup", "near_dup"}
    # the sf0.01 corpus plants near-dup pairs straddling the split
    # (e.g. 98~290, 8~245) — the fuzzy tier must catch some
    assert any(v == "near_dup" for v in out.values())
    # direct fuzzy check: every near_dup batch doc really shares an
    # LSH bucket with a corpus doc
    from lakehouse_automation_spark.operators.dedup import minhash_buckets
    corpus_b = minhash_buckets(
        docs.filter(F.col("doc_id") % 10 < 8), k=3)
    batch_b = minhash_buckets(
        docs.filter(F.col("doc_id") % 10 >= 8), k=3)
    hits = {r["doc_id"] for r in
            batch_b.join(corpus_b.select("band_id", "band_hash"),
                         ["band_id", "band_hash"], "left_semi")
            .select("doc_id").distinct().collect()}
    for d, v in out.items():
        if v == "near_dup":
            assert d in hits


def test_mv_refresh_equals_full_recompute(spark):
    got = {r["o_orderstatus"]: (r["n"], r["cents"])
           for r in run("mv_incremental_refresh", spark).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    upd = (
        orders.filter(F.col("o_orderkey") % 20 == 1)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
        .unionByName(orders.filter(F.col("o_orderkey") % 4 == 3))
    )
    base = orders.filter(F.col("o_orderkey") % 4 != 3)
    merged = base.join(upd, "o_orderkey", "left_anti").unionByName(
        upd, allowMissingColumns=False)
    want = {
        r["o_orderstatus"]: (r["n"], r["cents"])
        for r in merged.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
             .alias("cents")).collect()
    }
    assert got == want


def test_profile_matches_ground_truth(spark):
    rows = {r["col_name"]: r for r in run("profile_table", spark).collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    n = li.count()
    for c in ("l_quantity", "l_extendedprice", "l_discount"):
        r = rows[c]
        assert r["n_rows"] == n
        assert r["n_null"] == n - li.filter(F.col(c).isNotNull()).count()
        assert r["n_distinct"] == li.select(c).distinct().count()
        mn, mx = li.agg(F.min(c), F.max(c)).collect()[0]
        assert r["min_v"] == float(mn) and r["max_v"] == float(mx)
