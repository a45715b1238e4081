"""Tracked persist: cache mid-plan tables with a release hook.

Several operators build a mid-plan table consumed by 2-3 downstream
subtrees (LSH bucket tables, capped shingle tables). Leaving them
unpersisted recomputes the whole upstream pipeline once per consumer —
Spark's ReuseExchange does NOT cover it once AQE converts the
self-joins to broadcast joins (each broadcast side re-executes the
subtree; measured 8 full shingle-pipeline executions in one
ngram-jaccard query). A bare ``persist()`` fixes the recompute but
leaks storage across long many-key sweeps (round-1 review flagged it).

``tracked_persist`` is the middle path: persist, remember the handle,
and let harnesses (``bench.py``, ``tools/oracle_check.py``) call
``release_persisted()`` between keys. A sweep that never calls it
degrades to LRU eviction under memory pressure — the same behavior as
a bare persist, never worse. At 100-TB scale these mid-plan tables are
instead written to storage (checkpoint) and the hook is a no-op.

Threading: the module-level registries are UNSYNCHRONIZED — the
driver-side query builders here are single-threaded by design (one
sweep/bench process building plans sequentially; executor parallelism
happens JVM-side, not in this module). Callers running query builders
from multiple Python threads must serialize around these helpers.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []
_KEYED: dict[tuple, DataFrame] = {}
_SCALARS: dict[tuple, object] = {}


def plan_key(df: DataFrame) -> tuple:
    """Memoization key for a keyed persist. ``semanticHash`` alone is a
    32-bit plan hash — two different corpora (or a rewritten file
    behind an identical-looking plan) could collide and silently serve
    the wrong cached table. Pair it with the analyzed plan string,
    which names the concrete input paths, so aliasing requires a
    same-plan same-path collision. Expression ids (``#123``) are
    stripped first: they are allocated fresh for every plan BUILD, so
    leaving them in turns every repeat invocation into a cache miss
    (measured: the two LSH bench keys doubled when the raw string went
    into the key)."""
    try:
        plan = re.sub(r"#\d+", "#",
                      df._jdf.queryExecution().analyzed().toString())
    except Exception:  # Connect or API drift: fall back to schema
        plan = df.schema.json()
    return (df.semanticHash(), plan)


def memo_scalar(key: tuple, compute: Callable[[], object]) -> object:
    """Memoize a driver-side scalar derived from a persisted table's
    input (e.g. the LSH corpus count that sizes the banding tier) under
    the SAME lifecycle as the keyed persists: cleared together by
    :func:`release_persisted`, so a scalar can never outlive the cached
    table it describes. Exists because an action like ``count()`` is a
    full corpus scan that ``tracked_persist_keyed`` alone cannot dedupe
    — the r14 forced-blocklocal path paid it on every invocation.

    Staleness contract (ADVICE r16): a memoized scalar reflects the
    corpus AS OF the first computation in the current lifecycle. A
    library caller that REWRITES the files behind the same input path
    mid-lifecycle must call :func:`release_persisted` first (exactly
    as it must for the keyed persists, whose plan keys have the same
    same-plan-same-path blind spot); the harnesses here release
    between keys and — since r17 — between timed bench runs."""
    if key in _SCALARS:
        return _SCALARS[key]
    val = compute()
    _SCALARS[key] = val
    return val


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + remember the handle for :func:`release_persisted`."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def tracked_persist_keyed(key: tuple, make: Callable[[], DataFrame]) -> DataFrame:
    """Memoized tracked persist. Spark's CacheManager dedupes repeated
    persists of the SAME plan, but plans containing a fresh
    ``createDataFrame`` LocalRelation (e.g. the LSH plane table) never
    canonicalize equal — every call would cache ANOTHER copy (measured:
    one new persistent RDD per bench iteration, with runtimes degrading
    as storage filled). Keying on (operator, input semantic hash)
    returns the already-persisted table instead."""
    df = _KEYED.get(key)
    if df is not None:
        return df
    df = make().persist()
    _PERSISTED.append(df)
    _KEYED[key] = df
    return df


def release_persisted(blocking: bool = True) -> int:
    """Unpersist every tracked DataFrame and drop the memo scalars.
    Returns the number of state entries released (persisted tables +
    memoized scalars — callers like bench.py use a nonzero return as
    "this key carries build-once state", so memo-only keys must count
    too). Blocking by default so the cleanup cost lands HERE, not
    smeared into whatever the caller times next (async unpersist
    measurably polluted neighboring bench keys). Safe to call at any
    time; plans that re-execute later simply recompute."""
    n = len(_SCALARS)
    for df in _PERSISTED:
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    _PERSISTED.clear()
    _KEYED.clear()
    _SCALARS.clear()
    return n
