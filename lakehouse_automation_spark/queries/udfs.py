"""UDF / UDAF / UDTF surface (SURVEY §2.3 "UDF/UDAF/UDTF surface").

The reference's extension point is stored procedures passed through to
the server (lib/commondb.py:110-124). Spark-native that surface is:

- ``F.udf`` + ``spark.udf.register`` — row-at-a-time Python, SQL-
  callable (`udf_sql_register`);
- scalar ``@pandas_udf`` — Arrow-batched, vectorized in pandas/numpy,
  the right Python hot path (`udf_pandas_scalar`);
- ``GroupedData.applyInPandas`` — grouped-map "UDAF-ish" table
  function (`udf_grouped_map`);
- Python ``@udtf`` (Spark 3.5+) — row→rows table function with
  LATERAL SQL syntax (`udtf_lateral`);
- ``mapInPandas`` — partition-wise table function, demonstrated by the
  multimodal decode keys (operators/multimodal.py).

Every computation here is integer/hash-based so DuckDB replays it
EXACTLY — same trick as the dedup operators' md5-derived hashes: no
float summation order, no locale, no RNG.

Scale notes: Python UDFs serialize rows across the JVM↔Python
boundary; pandas UDFs amortize it via Arrow batches (~10-100x). All
four keys restrict driver-visible output to aggregates or small
slices; nothing collects an unbounded set.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .base import register, t

# Knuth-style multiplicative constants: products stay < 2^63 for any
# plausible length, so int64 arithmetic is exact in numpy AND DuckDB.
_MULT = 2_654_435_761
_MOD = 2_147_483_647


@register(
    "udf_pandas_scalar",
    oracle=f"""
    SELECT doc_id,
           (length(text) * {_MULT}) % {_MOD} AS len_hash
    FROM documents
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar ``@pandas_udf``: Arrow ships the text column to Python in
    columnar batches, pandas/numpy computes the whole batch vectorized
    — no per-row Python. The hash is exact int64, so the DuckDB oracle
    replays it bit-for-bit."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def len_hash(text: pd.Series) -> pd.Series:
        # nullable Int64, not int64: a NULL text must propagate to a
        # NULL hash (the oracle's length(NULL) is NULL), and NaN →
        # .astype("int64") raises on a null-bearing batch
        return (text.str.len().astype("Int64") * _MULT) % _MOD

    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", len_hash(F.col("text")).alias("len_hash"))
    )


@register(
    "udf_sql_register",
    oracle=f"""
    SELECT ((length(trim(text, ' ')) * {_MULT}) % {_MOD}) % 16 AS shard,
           COUNT(*) AS n
    FROM documents GROUP BY 1
    """,
)
def udf_sql_register(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``spark.udf.register``: a Python UDF made SQL-callable, invoked
    from a ``spark.sql`` string like any built-in (the reference's
    users call server-side functions through the SQL passthrough,
    lib/commondb.py:81-89). Row-at-a-time Python is the SLOW path —
    registered here to prove the surface, with the output immediately
    aggregated so only 16 rows cross back."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")

    def shard_of(text: str) -> int | None:
        # SQL NULL-in → NULL-out: a row UDF receives None and must
        # hand it back (the oracle's trim/length propagate NULL)
        if text is None:
            return None
        # strip SPACES only, and pin the oracle to the same charset
        # with trim(text, ' '): DuckDB's DEFAULT trim also eats
        # \t \n \r \v \f (Python's bare strip() would too), so on
        # tab/NBSP-padded text the engines shard docs differently
        # unless both drop exactly 0x20 (round-8 dirty-text catch).
        return ((len(text.strip(" ")) * _MULT) % _MOD) % 16

    spark.udf.register("las_shard", shard_of, "long")
    return spark.sql(
        "SELECT las_shard(text) AS shard, COUNT(*) AS n "
        "FROM documents_v GROUP BY shard"
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN abs(value) <= 1e15
                         THEN CAST(round(value * 100) AS BIGINT) END)
                AS BIGINT) AS cents_sum,
           CAST(MIN(user_id) AS BIGINT) AS min_user
    FROM events GROUP BY event_type
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInPandas`` grouped-map: one pandas DataFrame per group
    (the UDAF/UDTF middle ground). Money sums run in integer cents so
    pandas and DuckDB agree exactly. Shuffles once on the group key;
    each group must fit one executor's memory — the contract callers
    accept when they choose grouped-map over built-in aggs."""
    ev = t(spark, sf_dir, "events").select("event_type", "value", "user_id")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # the ONE pinned cents fold (streaming/stateful.py _cents):
        # half-away-from-zero rounding (pandas .round() is banker's and
        # diverges from the oracle's round() on exact .5-cent
        # boundaries), the CENTS_MAX_ABS domain guard (NaN/±Inf/huge
        # fold as NULL, int(inf) would kill the executor), and an
        # unbounded-Python-int accumulate (numpy int64 wraps silently
        # past 2^63; the oracle's SUM widens to HUGEINT). SQL SUM
        # semantics: skip NULLs, all-NULL group sums to NULL.
        from ..streaming.stateful import _cents, _check_bigint

        c = _cents(pdf["value"]).dropna()
        return pd.DataFrame({
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [len(pdf)],
            "cents_sum": [_check_bigint(sum(int(x) for x in c))
                          if len(c) else None],
            "min_user": [int(pdf["user_id"].min())],
        })

    return ev.groupBy("event_type").applyInPandas(
        stats, "event_type string, n bigint, cents_sum bigint, min_user bigint"
    )


@register(
    "udtf_lateral",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(len(toks))) AS INT) AS pos,
           unnest(toks) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 5)
    """,
)
def udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python ``@udtf`` called with LATERAL SQL syntax: one input row →
    N output rows (tokenizer shape). Row-at-a-time Python, so the
    input is a 5-doc slice — at corpus scale this job belongs to the
    JVM-side explode/split (text_pipeline) or mapInPandas; the key
    proves the registration + lateral-join surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            # NULL text → zero rows, matching the oracle's
            # unnest(string_split(NULL, ' ')) producing nothing
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("las_tokenize", Tokenize)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        "SELECT d.doc_id, tk.pos, tk.token "
        "FROM documents_v d, LATERAL las_tokenize(d.text) tk "
        "WHERE d.doc_id < 5"
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           round(exp(avg(CASE WHEN l_quantity > 0 AND l_quantity <= 1e15
                         THEN ln(l_quantity) END)), 6) AS geo_mean_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom AGGREGATE via a pandas GROUPED_AGG UDF — the last cell
    of the UDF matrix (scalar / grouped-map / UDTF / SQL-registered
    are the other keys): a geometric mean, which no built-in provides.
    Arrow ships each group's column once; the Python function reduces
    it to a scalar (series-to-scalar contract), so this behaves like
    a first-class agg in groupBy/agg — including partial application
    to window frames. 6-dp rounding absorbs the summation-order drift
    between numpy's mean and the oracle's sequential avg."""
    import numpy as np

    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float | None:
        # geo-mean's mathematical domain, pinned on both engines: only
        # positive in-range values (the > 0 / <= 1e15 pair is FALSE for
        # NaN and ±Inf everywhere) — DuckDB's ln() RAISES on negatives
        # where numpy would quietly emit NaN, so an unguarded version
        # isn't even comparable on dirty input
        v = v.astype("float64")
        v = v[(v > 0) & (v <= 1e15)]
        if len(v) == 0:
            return None
        return float(np.exp(np.log(v).mean()))

    li = t(spark, sf_dir, "lineitem")
    # Spark refuses pandas + JVM aggregates in ONE agg
    # (INVALID_PANDAS_UDF_PLACEMENT): the exact count joins back from
    # its own aggregation — both group on the same key, and the join
    # sides are #groups-sized.
    geo = (li.groupBy("l_returnflag")
           .agg(F.round(geo_mean("l_quantity"), 6).alias("geo_mean_qty")))
    cnt = (li.groupBy("l_returnflag")
           .agg(F.count(F.lit(1)).alias("n")))
    # null-safe join: NULL is a legitimate group key, and a plain
    # equi-join would silently drop that group from the result
    return (cnt.alias("c").join(
                geo.alias("g"),
                F.col("c.l_returnflag").eqNullSafe(F.col("g.l_returnflag")))
            .select("c.l_returnflag", "n", "geo_mean_qty"))
