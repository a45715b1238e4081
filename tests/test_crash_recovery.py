"""CowTable crash-recovery: a writer killed at ANY point around the
atomic manifest publish must leave readers on a committed snapshot —
never a partial commit — and leave the table fully operational.

The commit point is the ``os.link`` create-if-absent in
``CowTable._try_commit`` (tableformat.py): everything before it is
invisible (at worst an orphan data chunk for vacuum, exactly the
atomicity contract the reference gets from ``sys.heatwave_load``,
check_lakehouse.py:146-150); everything after it is durable. These
tests inject a crash on each side of that line for every write op,
plus mid-VACUUM death with a concurrent time-travel reader.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lakehouse_automation_spark.tableformat import CowTable


class _Crash(RuntimeError):
    """Stands in for the writer process dying."""


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, val long")


def _rows(t, version=None):
    return sorted(
        (r.k, r.seg, r.val) for r in t.read(version=version).collect()
    )


@pytest.fixture
def tbl(spark, tmp_path):
    return CowTable.create(
        spark,
        _df(spark, [(i, "a" if i % 2 == 0 else "b", i * 10)
                    for i in range(10)]),
        str(tmp_path / "t"),
    )


def _run_op(spark, t, op):
    if op == "append":
        t.append(_df(spark, [(100, "c", 1), (101, "c", 2)]))
    elif op == "merge":
        t.merge(_df(spark, [(0, "A", -1), (99, "new", 0)]), "k")
    elif op == "delete":
        t.delete_where(F.col("seg") == "b")
    elif op == "compact":
        t.compact(n_files=1)
    else:  # pragma: no cover - parametrize guard
        raise AssertionError(op)


@pytest.mark.parametrize("op", ["append", "merge", "delete", "compact"])
def test_crash_between_data_write_and_publish(spark, tbl, monkeypatch, op):
    """Writer dies AFTER its data chunk is on disk but BEFORE the
    manifest publish: readers stay on the old snapshot, the orphan
    chunk is grace-protected then vacuumable, and re-running the op
    succeeds."""
    before = _rows(tbl)
    chunks_before = set(tbl.manifest()["chunks"])

    def die(self, *a, **kw):
        raise _Crash("killed before manifest publish")

    monkeypatch.setattr(CowTable, "_try_commit", die)
    with pytest.raises(_Crash):
        _run_op(spark, tbl, op)
    monkeypatch.undo()

    # no partial commit: version and visible rows are untouched
    assert tbl.version() == 0
    assert _rows(tbl) == before
    # the dead writer's chunk is on disk but unreferenced
    on_disk = {e for e in os.listdir(tbl.path)
               if e.startswith("d") and os.path.isdir(os.path.join(tbl.path, e))}
    orphans = on_disk - chunks_before
    assert len(orphans) == 1, "each op stages exactly one chunk"
    # grace period protects a possibly-in-flight chunk ...
    assert tbl.vacuum(retain_versions=10)[1] == 0
    assert orphans < {e for e in os.listdir(tbl.path)}
    # ... past the grace age it is reclaimed, and nothing live is
    live, removed = tbl.vacuum(retain_versions=10, grace_s=0)
    assert removed == 1
    assert _rows(tbl) == before
    # the table is fully operational: the same op re-runs to completion
    _run_op(spark, tbl, op)
    assert tbl.version() == 1
    assert _rows(tbl) != before or op == "compact"  # compact keeps rows


@pytest.mark.parametrize("op", ["append", "merge", "delete", "compact"])
def test_crash_just_after_publish_is_durable(spark, tbl, monkeypatch, op):
    """Writer dies immediately AFTER the os.link publish: the commit is
    durable — the snapshot flips atomically from old to new with no
    intermediate state observable."""
    before = _rows(tbl)
    real = CowTable._try_commit

    def die_after(self, *a, **kw):
        ok = real(self, *a, **kw)
        if ok:
            raise _Crash("killed right after manifest publish")
        return ok  # lost races keep retrying as normal

    monkeypatch.setattr(CowTable, "_try_commit", die_after)
    with pytest.raises(_Crash):
        _run_op(spark, tbl, op)
    monkeypatch.undo()

    assert tbl.version() == 1, "the link IS the commit point"
    after = _rows(tbl)
    if op == "append":
        assert after == sorted(before + [(100, "c", 1), (101, "c", 2)])
    elif op == "merge":
        got = dict(((k, (s, v)) for k, s, v in after))
        assert got[0] == ("A", -1) and got[99] == ("new", 0)
    elif op == "delete":
        assert after == [r for r in before if r[1] != "b"]
    else:  # compact rewrites, rows identical
        assert after == before
    # time travel to the pre-crash snapshot still works
    assert _rows(tbl, version=0) == before


def test_leaked_tmp_manifest_is_inert(spark, tbl):
    """Process death between staging the temp manifest and the link
    leaks a ``.tmp-*`` file in _log (the finally-unlink never ran).
    It must be invisible to version discovery and harmless to the next
    writer."""
    log_dir = os.path.join(tbl.path, "_log")
    with open(os.path.join(log_dir, ".tmp-99999-dead-1"), "w") as fh:
        fh.write('{"version": 1, "op": "append", "chunks": []}')
    assert tbl.version() == 0  # not mistaken for a commit
    tbl.append(_df(spark, [(100, "c", 1)]))
    assert tbl.version() == 1
    assert tbl.read().count() == 11


def test_crash_mid_vacuum_resumes(spark, tbl, monkeypatch):
    """VACUUM dies after reclaiming only some of the dead chunks: every
    RETAINED snapshot — including one a concurrent time-travel reader
    is holding — stays exactly readable, and re-running vacuum
    completes the reclamation idempotently."""
    tbl.append(_df(spark, [(100, "c", 1)]))          # v1
    tbl.compact(n_files=1)                           # v2: unreferences v0/v1 chunks
    tbl.append(_df(spark, [(200, "d", 2)]))          # v3
    v2_rows, v3_rows = _rows(tbl, 2), _rows(tbl, 3)
    reader_v2 = tbl.read(version=2)                  # concurrent time-travel reader

    calls = {"n": 0}
    real_rmtree = shutil.rmtree

    def die_after_first(path, *a, **kw):
        if calls["n"] >= 1:
            raise _Crash("killed mid-vacuum")
        calls["n"] += 1
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(shutil, "rmtree", die_after_first)
    with pytest.raises(_Crash):
        tbl.vacuum(retain_versions=2, grace_s=0)
    monkeypatch.undo()

    # retained snapshots are untouched by the partial vacuum
    assert _rows(tbl, 2) == v2_rows
    assert _rows(tbl, 3) == v3_rows
    assert sorted((r.k, r.seg, r.val) for r in reader_v2.collect()) == v2_rows
    # re-run completes: remaining dead chunk + pre-horizon manifests go
    live, removed = tbl.vacuum(retain_versions=2, grace_s=0)
    assert removed == 1  # the one the crash left behind
    assert _rows(tbl, 2) == v2_rows and _rows(tbl, 3) == v3_rows
    with pytest.raises(FileNotFoundError):
        tbl.manifest(0)
    # history() lists exactly the snapshots still readable
    assert [m["version"] for m in tbl.history()] == [2, 3]
