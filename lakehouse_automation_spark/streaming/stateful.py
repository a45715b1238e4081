"""Custom stateful streaming operator: per-user running totals via
``applyInPandasWithState`` — the Spark-native form of "custom stateful
operator" (the reference's only state is its SQLite ledger + seen-file
mtime heuristic, check_lakehouse.py:99-123; a native engine needs
user-defined state machines over unbounded streams).

Design for scale: state is partitioned by the group key (one shuffle),
each group's state is a fixed-size tuple (count, cents) independent of
stream length, and late/replayed rows fold in idempotently because the
update is additive over exactly-once micro-batches. The same per-group
fold runs in batch via ``applyInPandas`` (queries/streaming_batch.py's
``stream_custom_state``), so the oracle gate covers the semantics and
the live stream is asserted in tests/test_streaming_state.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, cents_sum bigint"
STATE_SCHEMA = "n bigint, cents bigint"


# Representable-cents domain: |value| <= 1e15 keeps cents within
# int64 with headroom. The single <= predicate is FALSE for NaN and
# ±Inf in pandas, Spark SQL, and DuckDB alike (all three order NaN
# above every number, and abs(inf) exceeds any finite bound), so one
# expression excludes every IEEE edge value identically in all three
# engines — no isfinite() spelling differences to reconcile. A value
# outside the domain folds as NULL (skipped by SUM), never a crash:
# before this guard a single Inf in a micro-batch killed the stream
# with pandas IntCastingNaNError (round-9 extremes probe).
CENTS_MAX_ABS = 1e15


def _cents(values: "pd.Series") -> "pd.Series":
    """Integer cents with HALF-AWAY-FROM-ZERO rounding — pandas'
    ``.round()`` is banker's (half-to-even), which silently diverges
    from Spark's ``F.round`` and DuckDB's ``round`` (both half-away
    for positives) on exact .5-cent boundaries. The test corpora carry
    2-decimal values so all three agree today; a finer-grained corpus
    would trip the gate, hence the explicit form."""
    import numpy as np

    v = (values.where(values.abs() <= CENTS_MAX_ABS)) * 100
    # float64 with NaN preserved, not int64: NULL and out-of-domain
    # values are data (SQL SUM skips them; a NULL- or Inf-bearing
    # batch must not crash the fold)
    return pd.Series(np.sign(v) * np.floor(np.abs(v) + 0.5),
                     index=values.index)


def _check_bigint(s: int | None) -> int | None:
    """The cents columns are declared BIGINT (state, output, and the
    oracle's final CAST): a sum past ±2^63 cannot be represented
    end-to-end — DuckDB's HUGEINT->BIGINT cast aborts, and pandas->
    Arrow serialization would raise an opaque overflow. Fail HERE with
    a named contract error instead (the in-process Python-int sum is
    exact, so this is a representability limit, not a wrap)."""
    if s is not None and not (-(2 ** 63) <= s < 2 ** 63):
        raise OverflowError(
            f"cents sum {s} exceeds the BIGINT output contract "
            "(|cents| < 2^63); with the 1e17-cent domain max this "
            "takes ~10^2 max-magnitude rows per group — widen the "
            "output column to decimal or tighten the ingest domain")
    return s


def _addn(a: int | None, b: int | None) -> int | None:
    """SQL-SUM-style accumulate: NULL contributes nothing, and a sum
    that never saw a value stays NULL."""
    return _check_bigint(b if a is None else a if b is None else a + b)


def _fold_batch(pdf: pd.DataFrame) -> tuple[int, int | None]:
    """(rows, exact integer cents or None) for one pandas chunk —
    COUNT(*) counts every row; the cents sum skips NULLs and is NULL
    when the chunk carries no non-null value (SQL SUM semantics).
    The accumulate runs in unbounded Python ints after the NULLs are
    dropped: _cents returns float64 only to carry NaN, a float64 SUM
    is exact only to 2^53, and a numpy int64 sum WRAPS silently past
    2^63 (the oracle's SUM(BIGINT) widens to HUGEINT — ~92 rows at the
    1e17-cent domain max would wrap) — Python ints can't overflow."""
    c = _cents(pdf["value"]).dropna()
    if len(c) == 0:
        return len(pdf), None
    return len(pdf), _check_bigint(sum(int(x) for x in c))


def update_user_totals(key: tuple, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function: fold this micro-batch's
    rows for one user into (n, cents) state, emit the running total."""
    n, cents = state.get if state.exists else (0, None)
    for pdf in pdfs:
        dn, dc = _fold_batch(pdf)
        n, cents = n + dn, _addn(cents, dc)
    state.update((n, cents))
    yield pd.DataFrame({
        "user_id": [key[0]], "n_events": [n], "cents_sum": [cents],
    })


def user_totals_stream(events_stream: DataFrame) -> DataFrame:
    """Stateful per-user running totals over a STREAMING events frame.
    One shuffle on user_id; O(1) state per user."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """The SAME per-group fold in batch (applyInPandas) — the
    deterministic restatement the oracle gate checks."""
    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        n, cents = _fold_batch(pdf)
        return pd.DataFrame({
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [n], "cents_sum": [cents],
        })

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandas(fold, OUTPUT_SCHEMA)
    )


# ---------------------------------------------- transformWithState (Spark 4)

TWS_OUTPUT_SCHEMA = ("user_id bigint, n_events bigint, cents_sum bigint, "
                     "cents_max bigint")


class UserTotalsProcessor(StatefulProcessor):
    """``StatefulProcessor`` for ``transformWithStateInPandas`` —
    Spark 4's successor API to applyInPandasWithState (typed state
    variables, timers, TTL; requires the RocksDB state store). Two
    named ValueStates per user — additive (n, cents) totals and a
    running max — demonstrate the composed-state-variable model the
    old single-tuple GroupState can't express. State stays O(1) per
    key; the shuffle is the groupBy key only. A static module-level
    subclass: the processor is PICKLED to the python worker, so a
    dynamically-built class (unpicklable by reference) crashes the
    TransformWithStateInPySpark driver worker."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n bigint, cents bigint")
        self._vmax = handle.getValueState("vmax", "m bigint")

    def handleInputRows(self, key, rows, timer_values):
        n, cents = self._totals.get() if self._totals.exists() else (0, None)
        m = self._vmax.get()[0] if self._vmax.exists() else None
        for pdf in rows:
            dn, dc = _fold_batch(pdf)
            n, cents = n + dn, _addn(cents, dc)
            bmax = _cents(pdf["value"]).max()  # NaN when all-NULL chunk
            if not pd.isna(bmax):
                m = int(bmax) if m is None else max(m, int(bmax))
        self._totals.update((n, cents))
        self._vmax.update((m,))
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n],
            "cents_sum": [cents], "cents_max": [m],
        })

    def close(self) -> None:
        pass


def user_totals_tws_stream(events_stream: DataFrame) -> DataFrame:
    """Stateful per-user totals+max over a STREAMING frame via
    transformWithStateInPandas. Caller must enable the RocksDB state
    store provider (transformWithState requires it):
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
    """
    proc = UserTotalsProcessor()
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def user_totals_tws_batch(events: DataFrame) -> DataFrame:
    """The SAME fold in batch (applyInPandas) — the deterministic
    restatement the oracle gate checks for ``stream_tws_state``."""
    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        n, cents = _fold_batch(pdf)
        m = _cents(pdf["value"]).max()  # NaN when no in-domain value
        return pd.DataFrame({
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [n], "cents_sum": [cents],
            "cents_max": [None if pd.isna(m) else int(m)],
        })

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandas(fold, TWS_OUTPUT_SCHEMA)
    )
