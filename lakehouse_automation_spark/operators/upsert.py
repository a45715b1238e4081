"""Keyed upsert (MERGE emulation) — the lakehouse refresh primitive.

The reference's incremental load re-loads new files into the external
table via ``sys.heatwave_load`` (check_lakehouse.py:149). On Spark the
transactional form is Delta ``MERGE INTO``; the Delta jars are not in
this image (SURVEY §1.2), so the same semantics are composed from
primitives:

  result = updates ∪ (base ⟕anti updates on key)

i.e. updated keys win, unmatched base rows survive — upsert semantics
with one anti-join (shuffle on the key, or broadcast when the update
batch is small, which is the common incremental case and is hinted
here). When the Delta jars ARE present (engine.session.delta_available)
``delta_merge_upsert`` runs the real transactional ``DeltaTable.merge``
against a Delta table path; call sites pick the branch via the probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, key: str | list[str],
                 broadcast_updates: bool = True) -> DataFrame:
    """UPSERT ``updates`` into ``base`` on ``key`` (updates win)."""
    keys = [key] if isinstance(key, str) else list(key)
    upd_keys = updates.select(*keys).distinct()
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    survivors = base.join(upd_keys, on=keys, how="left_anti")
    return survivors.unionByName(updates)


def delta_merge_upsert(spark: SparkSession, table_path: str,
                       updates: DataFrame, key: str | list[str]) -> None:
    """ACID MERGE into a Delta table at ``table_path`` — the
    transactional analog of the reference's external-table refresh
    (``sys.heatwave_load`` with refresh_external_tables,
    check_lakehouse.py:146-150). Requires delta-spark; callers gate on
    ``engine.session.delta_available()`` and fall back to
    :func:`merge_upsert`. Kept import-local so the module loads in
    Delta-less environments (this sandbox)."""
    from delta.tables import DeltaTable  # noqa: PLC0415 — gated import

    keys = [key] if isinstance(key, str) else list(key)
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    (DeltaTable.forPath(spark, table_path).alias("t")
     .merge(updates.alias("s"), cond)
     .whenMatchedUpdateAll()
     .whenNotMatchedInsertAll()
     .execute())
