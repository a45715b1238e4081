"""Tests for the round-2 surface: JDBC source, S3A conf helper, Delta
probe, UDF keys, and the approx-distinct error bound (VERDICT r1 items
5, 7, 8, 9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_automation_spark.engine.session import (
    apply_s3a,
    delta_available,
    s3a_confs,
)
from lakehouse_automation_spark.queries import REGISTRY


def test_approx_distinct_within_error_bound(spark):
    """The self-verifying key: exact counts must equal an independent
    countDistinct, the sketch-ok booleans must hold, AND the raw HLL++
    estimate (recomputed here) must land within 4x the requested rsd
    (tighter than the query's own 5x gate bound; catches wired-wrong
    columns, not sketch noise)."""
    sf_dir = "/root/testdata/sf0.01"
    got = {
        r.l_returnflag: r
        for r in REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ref = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag").agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_parts"),
        ).collect()
    }
    assert set(got) == set(ref)
    for flag, g in got.items():
        e = ref[flag]
        assert g.n_orders_exact == e.n_orders and g.n_parts_exact == e.n_parts
        assert g.orders_sketch_ok and g.parts_sketch_ok, flag
        assert abs(e.a_orders - e.n_orders) <= 0.08 * e.n_orders, flag
        assert abs(e.a_parts - e.n_parts) <= 0.08 * e.n_parts, flag


def test_approx_percentile_tracks_exact(spark):
    """The key now self-verifies the GK rank guarantee in-query (the
    booleans the oracle pins to true); here assert those hold at
    sf0.01 AND separately track the raw estimate (recomputed) against
    the exact interpolated tier with a 0.5% value guard band."""
    sf_dir = "/root/testdata/sf0.01"
    got = {
        r.l_returnflag: r
        for r in REGISTRY["agg_percentile_approx"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r
        for r in REGISTRY["agg_percentile"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(exact)
    for flag, g in got.items():
        assert g.p50_rank_ok and g.p95_rank_ok, flag
        assert g.n_rows > 0
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag").agg(
            F.round(F.percentile_approx(
                "l_extendedprice", F.lit(0.5), F.lit(10000)), 4).alias("p50_price"),
            F.round(F.percentile_approx(
                "l_extendedprice", F.lit(0.95), F.lit(10000)), 4).alias("p95_price"),
        ).collect()
    }
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a.p50_price - e.p50_price) <= 0.005 * e.p50_price, flag
        assert abs(a.p95_price - e.p95_price) <= 0.005 * e.p95_price, flag


def test_jdbc_source_roundtrips_nation(spark, sf_dir):
    """jdbc_source must return exactly the nation rows (via embedded
    Derby when available, parquet fallback otherwise — same rows)."""
    got = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in REGISTRY["jdbc_source"].fn(spark, sf_dir).collect()
    )
    want = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    )
    assert got == want and len(got) == 25


def test_jdbc_read_is_partitioned(spark, sf_dir):
    """The JDBC scan must be a partitioned range-read (numPartitions=4),
    not a single-connection drain — the property that matters at scale."""
    df = REGISTRY["jdbc_source"].fn(spark, sf_dir)
    # fallback path (parquet) is allowed to differ; only assert when the
    # JDBC relation is actually in the plan
    plan = df._jdf.queryExecution().analyzed().toString()
    if "JDBCRelation" in plan:
        assert "numPartitions=4" in plan


def test_s3a_confs_placement():
    confs = s3a_confs("bkt", "https://osn.example.invalid", "ak", "sk")
    assert confs["spark.hadoop.fs.s3a.endpoint"] == "https://osn.example.invalid"
    assert confs["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert confs["spark.hadoop.fs.s3a.secret.key"] == "sk"
    assert confs["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert confs["spark.hadoop.fs.s3a.bucket.bkt.probe"] == "0"


def test_apply_s3a_reaches_hadoop_conf(spark):
    keys = apply_s3a(spark, s3a_confs("bkt2", "https://e.invalid", "a", "s"))
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    assert "fs.s3a.endpoint" in keys
    assert hc.get("fs.s3a.access.key") == "a"


def test_delta_probe_and_upsert_branch(spark, sf_dir):
    """Whichever branch this sandbox hits must work: sink_upsert already
    converges to the full table (oracle-gated); here we assert the
    probe's answer is consistent with the environment."""
    avail = delta_available()
    import importlib.util

    assert avail == (
        importlib.util.find_spec("delta") is not None and avail
    )  # probe never claims jars that can't import
    n = REGISTRY["sink_upsert"].fn(spark, sf_dir).agg(F.sum("n")).collect()[0][0]
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n == total


@pytest.mark.parametrize("key", [
    "udf_pandas_scalar", "udf_sql_register", "udf_grouped_map", "udtf_lateral",
])
def test_udf_keys_smoke(spark, sf_dir, key):
    """Exact values are oracle-gated; here: the keys run and return rows
    on the smoke fixture."""
    assert REGISTRY[key].fn(spark, sf_dir).count() > 0


def test_dynamic_overwrite_leaves_other_partitions_untouched(spark, tmp_path):
    """The dynamic mode's physical claim: only the restated partition's
    files change — other partition dirs keep their exact files."""
    import glob
    import os

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 3) + 1:02d}", float(i)) for i in range(30)],
        "id long, d string, v double").withColumn("d", F.col("d").cast("date"))
    path = str(tmp_path / "t")
    df.write.partitionBy("d").parquet(path)
    before = {p: os.path.getmtime(p)
              for p in glob.glob(f"{path}/d=*/**/*.parquet", recursive=True)}

    (df.filter(F.col("d") == F.lit("2024-01-02").cast("date"))
     .withColumn("v", F.col("v") + 1000)
     .write.partitionBy("d")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(path))

    after_files = set(glob.glob(f"{path}/d=*/**/*.parquet", recursive=True))
    untouched = {p for p in before if "d=2024-01-02" not in p}
    # untouched partitions: same files, same mtimes
    assert untouched <= after_files
    for p in untouched:
        assert os.path.getmtime(p) == before[p]
    # restated partition: new files
    old_restated = {p for p in before if "d=2024-01-02" in p}
    assert not (old_restated & after_files)
    # content: only the restated day shifted
    got = {str(r["d"]): r["s"] for r in
           spark.read.parquet(path).groupBy("d")
           .agg(F.sum("v").alias("s")).collect()}
    assert got["2024-01-02"] > 1000
