"""Ingestion-pipeline tests (reference parity: datagen -> land ->
incremental load -> ledger -> retention; README.md:17-37's two-program
flow, deterministic)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakehouse_automation_spark.pipelines.datagen import (
    CUSTOMER_TYPES, SATISFACTION, TRAVEL_TYPES,
    generate_survey, minute_stamp, write_survey_csv,
)
from lakehouse_automation_spark.pipelines.ledger import Ledger
from lakehouse_automation_spark.pipelines.retention import retention_sweep
from lakehouse_automation_spark.streaming.ingest import IngestPipeline


def test_generate_survey_domains(spark):
    """Generated values stay inside the closed domains (datagen.py:22-27)."""
    df = generate_survey(spark, rowcount=5000, seed=7)
    stats = df.agg(
        F.min("id"), F.max("id"),
        F.min("departure_delay"), F.max("departure_delay"),
        F.min("baggage_handling"), F.max("baggage_handling"),
    ).collect()[0]
    assert 1 <= stats[0] and stats[1] <= 129879
    assert 0 <= stats[2] and stats[3] <= 1599
    assert 1 <= stats[4] and stats[5] <= 4
    vals = {r[0] for r in df.select("customer_type").distinct().collect()}
    assert vals <= set(CUSTOMER_TYPES)
    assert {r[0] for r in df.select("travel_type").distinct().collect()} <= set(TRAVEL_TYPES)
    assert {r[0] for r in df.select("satisfaction").distinct().collect()} <= set(SATISFACTION)


def test_generate_survey_deterministic(spark):
    a = generate_survey(spark, 1000, seed=9).collect()
    b = generate_survey(spark, 1000, seed=9).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_minute_stamp_format():
    import datetime as dt
    import zoneinfo

    now = dt.datetime(2024, 3, 1, 23, 59, tzinfo=zoneinfo.ZoneInfo("Asia/Seoul"))
    assert minute_stamp(now) == "datagen_202403012359"
    # UTC moment converts into Seoul local time (datagen.py:65 parity)
    utc = dt.datetime(2024, 3, 1, 15, 0, tzinfo=dt.timezone.utc)  # 00:00 KST next day
    assert minute_stamp(utc) == "datagen_202403020000"


def test_csv_roundtrip(spark, tmp_path):
    df = generate_survey(spark, 500, seed=3)
    path = write_survey_csv(df, str(tmp_path), stamp="datagen_202401010000")
    assert os.path.basename(path) == "datagen_202401010000"
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 500
    assert back.columns == df.columns


def test_ledger_roundtrip_and_topk(spark, tmp_path):
    import datetime as dt

    led = Ledger(spark, str(tmp_path / "ledger"))
    for i, ok in enumerate([True, False, True]):
        led.record("/root/lakehouse", ok, when=dt.datetime(2024, 1, 1, 10, i))
    assert led.read().count() == 3
    top2 = led.last_checks(2).collect()
    assert [r["checktime"].minute for r in top2] == [2, 1]
    assert [r["is_apply"] for r in top2] == [1, 0]


def test_retention_sweep(tmp_path):
    old = tmp_path / "datagen_202301010000"
    new = tmp_path / "datagen_202501010000"
    old.mkdir(), new.mkdir()
    os.utime(old, (1_000_000, 1_000_000))  # ancient mtime
    deleted = retention_sweep(str(tmp_path), max_age_days=1.0)
    assert [os.path.basename(p) for p in deleted] == ["datagen_202301010000"]
    assert new.exists() and not old.exists()


def test_ingest_pipeline_exactly_once(spark, tmp_path):
    """Land files -> ingest -> land more -> ingest again: each row loads
    exactly once (the checkpoint replaces the mtime heuristic whose
    race can skip files, SURVEY §3 EP2)."""
    landing, table_dir = str(tmp_path / "landing"), str(tmp_path / "table")
    ckpt, ledger = str(tmp_path / "ckpt"), str(tmp_path / "ledger")

    batch1 = generate_survey(spark, 300, seed=1)
    write_survey_csv(batch1, landing, stamp="datagen_t0")
    pipe = IngestPipeline(spark, landing, table_dir, ckpt, ledger_path=ledger)
    pipe.run_available()
    assert pipe.table().count() == 300

    write_survey_csv(generate_survey(spark, 200, seed=2), landing, stamp="datagen_t1")
    pipe.run_available()
    assert pipe.table().count() == 500  # no re-load of batch1 (exactly-once)

    led = Ledger(spark, ledger)
    assert led.read().filter(F.col("is_apply") == 1).count() >= 2


def test_ingest_pipeline_survives_process_restart(spark, tmp_path):
    """A NEW IngestPipeline instance on the same checkpoint (process
    restart) resumes without re-loading or skipping: rows stay
    exactly-once across the restart boundary."""
    landing, table_dir = str(tmp_path / "landing"), str(tmp_path / "table")
    ckpt, ledger = str(tmp_path / "ckpt"), str(tmp_path / "ledger")

    write_survey_csv(generate_survey(spark, 250, seed=5), landing,
                     stamp="datagen_t0")
    IngestPipeline(spark, landing, table_dir, ckpt,
                   ledger_path=ledger).run_available()

    # "restart": a brand-new pipeline object, same checkpoint
    pipe2 = IngestPipeline(spark, landing, table_dir, ckpt,
                           ledger_path=ledger)
    pipe2.run_available()  # nothing new landed: must be a no-op
    assert pipe2.table().count() == 250

    write_survey_csv(generate_survey(spark, 100, seed=6), landing,
                     stamp="datagen_t1")
    pipe2.run_available()
    assert pipe2.table().count() == 350


# ---------------------------------------------- histogram / stratified / paths

def test_hist_bins_partition_the_table(spark):
    from lakehouse_automation_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = sorted(REGISTRY["agg_hist_bins"].fn(spark, sf).collect(),
                  key=lambda r: r.bucket)
    li = REGISTRY["agg_hist_bins"].fn.__globals__["t"](spark, sf, "lineitem")
    total = li.count()
    assert sum(r.n for r in rows) == total          # every row binned once
    assert 1 <= len(rows) <= 20
    assert all(0 <= r.bucket <= 19 for r in rows)
    for a, b in zip(rows, rows[1:]):                # contiguous edges
        if b.bucket == a.bucket + 1:
            assert abs(a.hi_edge - b.lo_edge) < 1e-9
    import pyspark.sql.functions as F
    mn, mx = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    assert abs(rows[0].lo_edge - mn) < 1e-9
    assert abs(rows[-1].hi_edge - mx) < 1e-9 or rows[-1].bucket < 19


def test_hist_bins_single_valued_corpus(spark, tmp_path):
    """A single-valued column makes the bucket expression 0/0 = NaN,
    and under ANSI mode CAST(NaN AS INT) throws (review r7): the
    mx = mn branch must short-circuit to bucket 0, identically in the
    Spark query and the DuckDB oracle."""
    import duckdb

    from lakehouse_automation_spark.queries import REGISTRY

    df = spark.range(37).selectExpr("CAST(42.5 AS DOUBLE) AS l_extendedprice")
    df.write.parquet(str(tmp_path / "lineitem.parquet"))
    rows = REGISTRY["agg_hist_bins"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].bucket == 0 and rows[0].n == 37
    assert rows[0].lo_edge == 42.5 and rows[0].hi_edge == 42.5
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"parquet_scan('{tmp_path}/lineitem.parquet/*.parquet')")
    got = con.execute(REGISTRY["agg_hist_bins"].oracle).fetchall()
    assert [(r[0], float(r[1]), float(r[2]), r[3]) for r in got] \
        == [(0, 42.5, 42.5, 37)]


def test_stratified_topk_is_exact_k_and_stable(spark):
    from lakehouse_automation_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    out1 = REGISTRY["sample_stratified_topk"].fn(spark, sf).collect()
    out2 = REGISTRY["sample_stratified_topk"].fn(spark, sf).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # reproducible
    per = {}
    for r in out1:
        per.setdefault(r.source, set()).add(r.doc_id)
    docs = REGISTRY["sample_stratified_topk"].fn.__globals__["t"](
        spark, sf, "documents")
    import pyspark.sql.functions as F
    sizes = {r.source: r.n for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per) == {s for s, n in sizes.items() if n > 0}
    for s, ids in per.items():
        assert len(ids) == min(3, sizes[s]), s


def test_event_paths_match_python_replay(spark):
    from lakehouse_automation_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    ev = (REGISTRY["event_path_analysis"].fn.__globals__["t"](
        spark, sf, "events")
        .select("user_id", "event_id", "event_type", "ts").collect())
    seq = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        seq.setdefault(r.user_id, []).append(r.event_type)
    counts = {}
    for types in seq.values():
        for i in range(len(types) - 2):
            p = ">".join(types[i:i + 3])
            counts[p] = counts.get(p, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [(r.path, r.n) for r in sorted(
        REGISTRY["event_path_analysis"].fn(spark, sf).collect(),
        key=lambda r: r.rk)]
    assert got == want


def test_bitmap_distinct_matches_exact(spark):
    """The bitmap tier must be EXACT (that is its point vs HLL): every
    per-type count and the or-merged total equal plain countDistinct."""
    import pyspark.sql.functions as F
    from lakehouse_automation_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {r.event_type: r.n_users
           for r in REGISTRY["agg_bitmap_distinct"].fn(spark, sf).collect()}
    ev = REGISTRY["agg_bitmap_distinct"].fn.__globals__["t"](
        spark, sf, "events")
    want = {r.event_type: r.n for r in
            ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n")).collect()}
    want["__all__"] = ev.agg(
        F.countDistinct("user_id")).first()[0]
    assert got == want


def test_scan_text_roundtrip_counts(spark):
    import pyspark.sql.functions as F
    from lakehouse_automation_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    r = REGISTRY["scan_text"].fn(spark, sf).first()
    docs = REGISTRY["scan_text"].fn.__globals__["t"](spark, sf, "documents")
    assert r.n_lines == docs.count()
    assert r.total_chars == docs.agg(
        F.sum(F.length(F.regexp_replace("text", r"[\r\n]+", " ")))).first()[0]


def test_weighted_sample_favors_heavy_docs_and_is_stable(spark):
    """Priority sampling: exactly k rows, reproducible, and the
    sample's mean weight exceeds the corpus mean (heavier docs are
    likelier in) while priorities are the documented w/u form."""
    from lakehouse_automation_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    out1 = REGISTRY["sample_weighted"].fn(spark, sf).collect()
    out2 = REGISTRY["sample_weighted"].fn(spark, sf).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert len(out1) == 100
    pris = [r.priority for r in out1]
    assert pris == sorted(pris, reverse=True)
    import pyspark.sql.functions as F
    corpus_mean = (spark.read.parquet(f"{sf}/documents.parquet")
                   .agg(F.avg("n_chars")).first()[0])
    sample_mean = sum(r.n_chars for r in out1) / len(out1)
    assert sample_mean > corpus_mean


def test_gini_replays_in_python(spark):
    """Per-nation supplier-revenue gini: exact integer replay of the
    sorted-rank identity from raw lineitems (4-decimal units), plus
    the [0, 1) bound and the n=1 => 0 degenerate case."""
    from lakehouse_automation_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["agg_gini"].fn(spark, sf).collect()
    assert rows
    li = (spark.read.parquet(f"{sf}/lineitem.parquet")
          .select("l_suppkey", "l_extendedprice", "l_discount").collect())
    sup = {r.s_suppkey: r.s_nationkey for r in
           spark.read.parquet(f"{sf}/supplier.parquet").collect()}
    nat = {r.n_nationkey: r.n_name for r in
           spark.read.parquet(f"{sf}/nation.parquet").collect()}
    rev = {}
    for r in li:
        # price/discount have <= 2 decimals so the product has an
        # exact 4-decimal value; nearest-int recovers it from double
        r4 = round(r.l_extendedprice * (1 - r.l_discount) * 10000)
        rev[r.l_suppkey] = rev.get(r.l_suppkey, 0) + r4
    by_nat = {}
    for sk, r4 in rev.items():
        by_nat.setdefault(sup[sk], []).append((r4, sk))
    want = {}
    for nk, xs in by_nat.items():
        xs.sort()
        n, s = len(xs), sum(r for r, _ in xs)
        w = sum((i + 1) * r for i, (r, _) in enumerate(xs))
        want[nat[nk]] = (n, round((2 * w - (n + 1) * s) / (n * s), 6),
                         s / 10000)
    got = {r.n_name: (r.n_suppliers, r.gini, r.total_revenue)
           for r in rows}
    assert set(got) == set(want)
    for name, (n, gini, tot) in want.items():
        gn, gg, gt = got[name]
        assert (gn, gg) == (n, gini), name
        assert abs(gt - tot) < 1e-6
        assert 0.0 <= gg < 1.0
        if n == 1:
            assert gg == 0.0


def test_entropy_bounds_and_replay(spark):
    """Daily event-type entropy: 0 <= H <= ln(n_types), exact counts,
    and a float replay within the 6-dp rounding tolerance."""
    import math

    from lakehouse_automation_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["agg_entropy"].fn(spark, sf).collect()
    assert rows
    ev = (spark.read.parquet(f"{sf}/events.parquet")
          .select(F.expr("unix_micros(CAST(ts AS TIMESTAMP))"
                         " div 86400000000").alias("day"), "event_type")
          .collect())
    cnt = {}
    for r in ev:
        cnt.setdefault(r.day, {}).setdefault(r.event_type, 0)
        cnt[r.day][r.event_type] += 1
    assert {r.day for r in rows} == set(cnt)
    for r in rows:
        per = cnt[r.day]
        tot = sum(per.values())
        assert (r.n_events, r.n_types) == (tot, len(per))
        h = -sum((n / tot) * math.log(n / tot) for n in per.values())
        assert abs(r.entropy - h) < 2e-6
        assert -1e-9 <= r.entropy <= math.log(len(per)) + 1e-9


def test_rake_replays_in_python(spark):
    """Word-level RAKE: freq/degree/score replay exactly from the raw
    text (python gaps-and-islands), including the top-50 cut."""
    from lakehouse_automation_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["text_rake_keywords"].fn(spark, sf).collect()
    assert rows
    docs = spark.read.parquet(f"{sf}/documents.parquet") \
        .select("text").collect()
    freq, degree = {}, {}
    for d in docs:
        phrase = []
        for tok in d.text.split(" ") + ["the"]:  # sentinel flush
            if tok == "" or tok in ("the", "a"):
                for w in phrase:
                    freq[w] = freq.get(w, 0) + 1
                    degree[w] = degree.get(w, 0) + len(phrase)
                phrase = []
            else:
                phrase.append(tok)
    scored = sorted(((degree[w] / freq[w], w) for w in freq),
                    key=lambda t: (-t[0], t[1]))[:50]
    got = [(r.score, r.word) for r in rows]
    assert got == scored
    for r in rows:
        assert r.degree >= r.freq and r.score >= 1.0
