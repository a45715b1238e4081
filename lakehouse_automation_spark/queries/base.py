"""Registry plumbing + determinism helpers shared by all query modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..engine.catalog import table

# ---------------------------------------------------------------- registry

@dataclass(frozen=True)
class Q:
    """One named operator: Spark impl + optional DuckDB oracle SQL."""
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to REGISTRY.

    The registered callable tunes the session first: the driver hands
    us ITS OWN vanilla SparkSession, and several runtime confs (ns-
    timestamp parquet reads, UTC tz, AQE) must hold for any key that
    touches the session outside the catalog loader.
    """
    def wrap(fn):
        from functools import wraps

        from ..engine.session import tune_session

        @wraps(fn)
        def tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = Q(fn=tuned, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn
    return wrap


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand for the normalized catalog load."""
    return table(spark, sf_dir, name)


# ------------------------------------------------------- determinism helpers

def dec(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Cast to DECIMAL so downstream SUMs are exact and order-independent.

    Double -> decimal rounds half-up in both Spark and DuckDB; testdata
    money columns are 2-decimal values so the cast is lossless.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: str | Column, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Exact decimal SUM surfaced as DOUBLE (stable across engines)."""
    return F.sum(dec(col, prec, scale)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum, then one double divide.

    Oracle-side mirror: CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)/COUNT(*).
    """
    return (F.sum(dec(col, prec, scale)).cast("double") / F.count(F.lit(1))).alias(alias)
