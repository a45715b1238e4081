"""As-of (latest-before) join — a composition operator Spark lacks.

SURVEY §4 flags as-of join as the one relational operator with no
native Catalyst node. The naive window trick (equi-join then
row_number over ts-diff) multiplies rows before pruning them —
O(|L|x|R per key|) shuffle volume, hopeless at 100 TB.

This implementation uses the union-scan pattern instead:

1. tag right rows side=0, left rows side=1;
2. union them (cheap, no shuffle);
3. one hash shuffle on the key + one in-partition sort by
   (ts, side);
4. ``last(value, ignorenulls)`` over rows UNBOUNDED PRECEDING..CURRENT
   carries the most recent right-side value forward;
5. keep left rows.

Cost: exactly one shuffle of |L|+|R| rows — the same cost as the
equi-join itself, with zero row multiplication. Skewed keys can be
handled upstream by pre-filtering right to the left key set
(left-semi) or salting; not needed at bench scale.

Tie semantics: a right row with ts equal to the left ts IS matched
(inclusive, side 0 sorts before side 1) — matching DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts`` so oracles compare exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_value: str | None = None,
    right_value_as: str = "asof_value",
) -> DataFrame:
    """Left as-of join: attach the latest right-side value at-or-before
    each left row's timestamp, per key.

    ``right_value`` defaults to the right timestamp itself (the common
    "when did X last happen" case).
    """
    keys = [on] if isinstance(on, str) else list(on)
    rv = right_value or right_ts

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.col(rv).alias("__rv"),
        F.lit(0).alias("__side"),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(right_value_as, F.last("__rv", ignorenulls=True).over(w))
    return carried.filter(F.col("__side") == 1).drop("__ts", "__side", "__rv")
