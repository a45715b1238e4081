"""CowTable -> Delta `_delta_log` export: protocol-level round trip.

No Delta jars ship in this sandbox (engine.session.delta_available
probes), so the primary round trip replays the exported log by hand —
parse the versioned action files, apply add/remove in order, read the
resulting file set — which is exactly what a Delta reader does before
any Delta-specific code runs. A skipif-gated test reads the export
with real delta-spark the moment the jars land.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_automation_spark.engine.session import delta_available
from lakehouse_automation_spark.tableformat import CowTable


def _df(spark, rows, schema="k long, seg string, val long"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture
def exported(spark, tmp_path):
    """A table exercising every convertible op: create, append, COW
    merge, delete, and an additive schema evolution."""
    t = CowTable.create(
        spark, _df(spark, [(i, "a", i * 10) for i in range(10)]),
        str(tmp_path / "t"), stats_cols=["k"])
    t.append(_df(spark, [(10 + i, "b", i) for i in range(5)]))
    t.merge(_df(spark, [(3, "A", -3), (99, "new", 0)]), "k")
    t.delete_where(F.col("seg") == "b")
    t.append(spark.createDataFrame(
        [(200, "c", 1, "extra")], "k long, seg string, val long, note string"))
    log_dir = t.to_delta_manifest()
    return t, log_dir


def _replay(log_dir):
    """(live_files, actions_by_version) after applying the log in
    order — the protocol part of any Delta reader."""
    live: set[str] = set()
    by_version: dict[int, list[dict]] = {}
    for fn in sorted(os.listdir(log_dir)):
        if not fn.endswith(".json"):
            continue
        v = int(fn[:-5])
        actions = [json.loads(line)
                   for line in open(os.path.join(log_dir, fn))
                   if line.strip()]
        by_version[v] = actions
        for a in actions:
            if "add" in a:
                live.add(a["add"]["path"])
            elif "remove" in a:
                live.discard(a["remove"]["path"])
    return live, by_version


def test_export_rows_round_trip(spark, exported):
    """Reading exactly the live file set the log yields must equal the
    CowTable's own snapshot read — rows, including the evolved column."""
    t, log_dir = exported
    live, _ = _replay(log_dir)
    got = (spark.read.option("mergeSchema", "true")
           .parquet(*[os.path.join(t.path, p) for p in sorted(live)]))
    want = t.read(merge_schema=True)
    key = lambda r: (r["k"],)
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)


def test_export_protocol_shape(spark, exported):
    t, log_dir = exported
    live, by_version = _replay(log_dir)
    # one Delta version per retained manifest, renumbered from 0
    assert sorted(by_version) == list(range(len(t.history())))
    v0 = by_version[0]
    assert "protocol" in v0[0] and v0[0]["protocol"]["minReaderVersion"] == 1
    assert "metaData" in v0[1] and "schemaString" in v0[1]["metaData"]
    # metaData re-emitted ONLY on the schema-evolution version
    meta_versions = [v for v, acts in by_version.items()
                     if any("metaData" in a for a in acts)]
    assert meta_versions == [0, max(by_version)]
    # the evolved schema names the added column
    evolved = next(a for a in by_version[max(by_version)] if "metaData" in a)
    assert "note" in evolved["metaData"]["schemaString"]
    # every live file exists on disk; every add carries stats with
    # numRecords and the manifest's [min, max] for the stats column
    for v, acts in by_version.items():
        for a in acts:
            if "add" not in a:
                continue
            assert os.path.exists(os.path.join(t.path, a["add"]["path"]))
            stats = json.loads(a["add"]["stats"])
            assert stats["numRecords"] > 0
            if "minValues" in stats:
                assert "k" in stats["minValues"]
    # COW versions must produce removes (merge + delete both rewrite)
    assert any(any("remove" in a for a in acts)
               for acts in by_version.values())


def test_export_numrecords_totals(spark, exported):
    """Sum of live adds' numRecords == the table's row count (the
    invariant Delta uses for metadata-only COUNT(*))."""
    t, log_dir = exported
    live, by_version = _replay(log_dir)
    num = {}
    for acts in by_version.values():
        for a in acts:
            if "add" in a:
                num[a["add"]["path"]] = json.loads(a["add"]["stats"])["numRecords"]
    assert sum(num[p] for p in live) == t.read(merge_schema=True).count()


def test_reexport_after_vacuum_clears_stale_versions(spark, tmp_path):
    """A re-export after VACUUM emits fewer, renumbered versions; stale
    higher-numbered files from the previous export must be cleared or
    a reader replays diffs against vacuumed (deleted) data."""
    t = CowTable.create(
        spark, _df(spark, [(i, "a", i) for i in range(8)]),
        str(tmp_path / "t"))
    t.append(_df(spark, [(100, "b", 1)]))
    t.compact(n_files=1)
    log_dir = t.to_delta_manifest()
    assert len([f for f in os.listdir(log_dir) if f.endswith(".json")]) == 3
    t.vacuum(retain_versions=1, grace_s=0)
    t.to_delta_manifest()
    jsons = sorted(f for f in os.listdir(log_dir) if f.endswith(".json"))
    assert jsons == ["0" * 20 + ".json"], jsons  # renumbered, no stale tail
    live, _ = _replay(log_dir)
    got = (spark.read.parquet(*[os.path.join(t.path, p) for p in sorted(live)])
           .collect())
    assert sorted(r["k"] for r in got) == sorted(
        r["k"] for r in t.read().collect())


def test_export_actions_match_delta_protocol_schema(spark, exported):
    """Jar-free half of the native-Delta round trip (review r7):
    validate every exported action against the documented action
    schema in delta.io's PROTOCOL.md — the structural contract a real
    Delta reader enforces before any data I/O. The skipif-gated
    native read below remains the full proof where jars exist."""
    t, log_dir = exported
    jsons = sorted(f for f in os.listdir(log_dir) if f.endswith(".json"))
    # file naming: 20-digit zero-padded versions, contiguous from 0
    assert jsons == [f"{i:020d}.json" for i in range(len(jsons))]

    known = {"protocol", "metaData", "add", "remove",
             "commitInfo", "txn", "cdc"}
    live: set[str] = set()
    meta_ids = []
    protocols = []
    for i, fn in enumerate(jsons):
        for line in open(os.path.join(log_dir, fn)):
            if not line.strip():
                continue
            action = json.loads(line)
            # exactly ONE action per line, of a spec-known type
            assert len(action) == 1 and set(action) <= known, action
            kind, body = next(iter(action.items()))
            if kind == "protocol":
                protocols.append((i, body))
                assert isinstance(body["minReaderVersion"], int)
                assert isinstance(body["minWriterVersion"], int)
                assert body["minReaderVersion"] >= 1
                assert body["minWriterVersion"] >= 1
            elif kind == "metaData":
                meta_ids.append(body["id"])
                assert body["format"]["provider"] == "parquet"
                assert isinstance(body["format"].get("options", {}), dict)
                assert isinstance(body["partitionColumns"], list)
                assert isinstance(body["configuration"], dict)
                schema = json.loads(body["schemaString"])
                assert schema["type"] == "struct"
                assert schema["fields"], "empty schema"
                for f in schema["fields"]:
                    assert set(f) >= {"name", "type", "nullable",
                                      "metadata"}, f
            elif kind == "add":
                path = body["path"]
                assert path and "\\" not in path  # forward slashes only
                assert isinstance(body["partitionValues"], dict)
                assert isinstance(body["size"], int) and body["size"] > 0
                assert isinstance(body["modificationTime"], int)
                assert isinstance(body["dataChange"], bool)
                assert path not in live, f"double-add of live {path}"
                live.add(path)
                # stats is a JSON *string* (spec), numRecords matches
                # the actual parquet footer, min/max keys align
                assert isinstance(body["stats"], str)
                stats = json.loads(body["stats"])
                full = os.path.join(t.path, path)
                assert os.path.getsize(full) == body["size"]
                import pyarrow.parquet as pq
                assert stats["numRecords"] \
                    == pq.ParquetFile(full).metadata.num_rows
                if "minValues" in stats:
                    assert set(stats["minValues"]) \
                        == set(stats["maxValues"])
            elif kind == "remove":
                path = body["path"]
                assert path in live, f"remove of non-live {path}"
                live.remove(path)
                assert isinstance(body["deletionTimestamp"], int)
                assert isinstance(body["dataChange"], bool)
    # protocol: exactly once, version 0, and it led the log
    assert [v for v, _ in protocols] == [0]
    # table id stable across metaData re-emissions
    assert len(set(meta_ids)) == 1 and meta_ids


@pytest.mark.skipif(not delta_available(),
                    reason="Delta jars not shipped in this runtime; install is "
                           "provably impossible here — pypi.org is "
                           "unreachable (DNS 'Name or service not "
                           "known', probed r8)")
def test_export_reads_as_native_delta(spark, exported):
    """With real delta-spark on the classpath the export IS a Delta
    table."""
    t, _ = exported
    got = spark.read.format("delta").load(t.path)
    assert got.count() == t.read(merge_schema=True).count()
