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
here). At 100 TB with Delta available, swap `merge_upsert` for
``DeltaTable.merge``; call sites don't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, key: str | list[str],
                 broadcast_updates: bool = True) -> DataFrame:
    """UPSERT ``updates`` into ``base`` on ``key`` (updates win)."""
    keys = [key] if isinstance(key, str) else list(key)
    upd_keys = updates.select(*keys).distinct()
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    survivors = base.join(upd_keys, on=keys, how="left_anti")
    return survivors.unionByName(updates)
