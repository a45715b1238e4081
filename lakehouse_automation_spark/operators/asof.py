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
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left as-of join: attach the nearest right-side value per key —
    latest at-or-before the left timestamp (``direction="backward"``,
    default, DuckDB ``l.ts >= r.ts``) or earliest at-or-after it
    (``"forward"``, DuckDB ``l.ts <= r.ts``; pandas merge_asof
    parity). Forward is the same single-shuffle union-scan with the
    scan order reversed — cost is identical.

    ``tolerance_s`` (pandas merge_asof's ``tolerance``): a match
    farther than this many seconds from the left timestamp is nulled
    out. The matched right timestamp rides the same carried struct, so
    tolerance adds no extra shuffle or join.

    ``right_value`` defaults to the right timestamp itself (the common
    "when did X last happen" case).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
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
    # right rows carry (matched_ts, value) as ONE struct so tolerance
    # can see how far the match is; left rows contribute null and
    # last(ignorenulls) skips them
    unioned = unioned.withColumn(
        "__pair",
        F.when(F.col("__side") == 0,
               F.struct(F.col("__ts").alias("mts"),
                        F.col("__rv").alias("mv"))))

    ts_order = (F.col("__ts").asc() if direction == "backward"
                else F.col("__ts").desc())
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__m", F.last("__pair", ignorenulls=True).over(w))
    val = F.col("__m.mv")
    if tolerance_s is not None:
        # seconds for temporal types (ntz and DATE both need the
        # two-step cast — neither casts to double directly), identity
        # for numerics
        dt_ts = dict(unioned.dtypes)["__ts"]
        is_temporal = dt_ts.startswith("timestamp") or dt_ts == "date"

        def secs(c: Column) -> Column:
            return (c.cast("timestamp").cast("double") if is_temporal
                    else c.cast("double"))

        gap = F.abs(secs(F.col("__ts")) - secs(F.col("__m.mts")))
        val = F.when(gap <= float(tolerance_s), val)
    return (
        carried.filter(F.col("__side") == 1)
        .withColumn(right_value_as, val)
        .drop("__ts", "__side", "__rv", "__pair", "__m")
    )
