"""Scalar-function packs (SURVEY §2.3 "Scalar functions").

The MySQL built-in surface the reference's SQL passthrough exposes
(lib/commondb.py:81-108), re-expressed with pyspark.sql.functions —
all JVM-side, whole-stage-codegen'd; zero Python in the row path.

Engine-parity notes per pack are inline: every expression is chosen so
Spark and DuckDB produce bit-identical values (same 1-based indexing,
same IEEE op order, natural log rounded to absorb libm ulp drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .base import register, t


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           -- '||', not concat(): DuckDB's concat() SKIPS NULL args,
           -- Spark's concat propagates NULL (the SQL-standard rule)
           c_name || '#' || c_mktsegment              AS tagged,
           upper(c_mktsegment)                        AS seg_upper,
           substring(c_name, 1, 8)                    AS name_prefix,
           strpos(c_name, '1')                        AS pos_one,
           length(trim(c_name, ' '))                  AS name_len,
           regexp_extract(c_name, '([0-9]+)', 1)      AS name_digits,
           regexp_replace(c_name, '[0-9]', '#', 'g')  AS name_masked,
           len(string_split(c_name, '0'))             AS n_zero_splits
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack: concat/upper/substr/instr/trim/regex/split.
    ``instr`` is the reference's success-substring test
    (check_lakehouse.py:114) made relational."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("tagged"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.instr(F.col("c_name"), "1").alias("pos_one"),
        F.length(F.trim(F.col("c_name"))).alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
        F.size(F.split("c_name", "0")).cast("bigint").alias("n_zero_splits"),
    )


@register(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                  AS o_year,
           month(o_orderdate)                                 AS o_month,
           quarter(o_orderdate)                               AS o_quarter,
           date_trunc('month', o_orderdate)                   AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           strftime(o_orderdate, '%Y-%m')                     AS ym
    FROM orders
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime pack: extract/trunc/add/diff/format — the reference's
    minute-stamp + mtime-window arithmetic (datagen.py:65,
    check_lakehouse.py:109) generalized."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.quarter(d).alias("o_quarter"),
        F.date_trunc("month", d).alias("month_start"),
        # ltrim('+'): a far-future placeholder (9999-12-31) + 30 days
        # overflows into year 10000, which Spark's formatter spells
        # ISO-8601-expanded ('+10000-01-30') while DuckDB spells plain
        # ('10000-01-30') — same date VALUE, different spelling (found
        # by the r11 relational time-edge gate). Both engines agree on
        # the plain form once the sign prefix is stripped.
        F.regexp_replace(F.date_format(F.date_add(d.cast("date"), 30),
                                       "yyyy-MM-dd"),
                         r"^\+", "").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias("days_to_y2k"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           -- integer-returning fns carry the money-domain guard (an
           -- Inf/NaN/1e300 cannot land in BIGINT in either engine);
           -- sqrt/ln carry their own mathematical domain (DuckDB
           -- errors on negatives where Spark yields NaN/NULL)
           CAST(floor(CASE WHEN abs(l_extendedprice) <= 1e15
                      THEN l_extendedprice END / 10) AS BIGINT)
             AS price_div10,
           CAST(ceil(CASE WHEN abs(l_quantity) <= 1e15
                     THEN l_quantity END / 7) AS BIGINT) AS qty_div7,
           abs(l_quantity - 25)               AS qty_dev,
           l_orderkey % 7                     AS key_mod7,
           power(l_linenumber, 2)             AS line_sq,
           CASE WHEN l_quantity >= 0 THEN sqrt(l_quantity) END
             AS qty_sqrt,
           CASE WHEN l_extendedprice > 0
                THEN round(ln(l_extendedprice), 6) END AS price_ln,
           -- sign(NaN) diverges (Spark NaN, DuckDB 0): domain-guard it
           CASE WHEN abs(l_discount) <= 1e15
                THEN CAST(sign(l_discount - 0.05) AS DOUBLE) END
             AS disc_sign
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack. floor/ceil/abs/mod/sqrt are IEEE-exact in both
    engines; ln is rounded to absorb libm last-ulp differences."""
    li = t(spark, sf_dir, "lineitem")
    from .base import dguard

    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.floor(dguard(price) / 10).alias("price_div10"),
        F.ceil(dguard(qty) / 7).alias("qty_div7"),
        F.abs(qty - 25).alias("qty_dev"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.pow(F.col("l_linenumber"), 2).alias("line_sq"),
        F.when(qty >= 0, F.sqrt(qty)).alias("qty_sqrt"),
        F.when(price > 0, F.round(F.log(price), 6)).alias("price_ln"),
        F.when(F.abs(F.col("l_discount")) <= 1e15,
               F.signum(F.col("l_discount") - 0.05)).alias("disc_sign"),
    )


@register(
    "fn_cond_null",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'MACHINERY')                    AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'NONE')  AS seg_filled,
           greatest(c_acctbal, 0.0)                             AS bal_floor0,
           least(c_acctbal, 1000.0)                             AS bal_cap1k,
           CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END        AS bal_is_null
    FROM customer
    """,
)
def fn_cond_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE/NULLIF/GREATEST/LEAST/IS NULL pack."""
    c = t(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.coalesce(seg_or_null, F.lit("NONE")).alias("seg_filled"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap1k"),
        F.when(F.col("c_acctbal").isNull(), 1).otherwise(0).alias("bal_is_null"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')            AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (the reference passes its
    load options as a JSON doc, check_lakehouse.py:146-147)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_int"),
    )


@register(
    "fn_array_map",
    oracle="""
    SELECT vec_id,
           len(embedding)                                        AS dim,
           CAST(embedding[1] AS DOUBLE)                          AS first_elem,
           CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
             + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head4_sum,
           len(list_filter(embedding, x -> x > 0))               AS n_positive
    FROM embeddings
    """,
)
def fn_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array pack over embeddings: size/element_at/filter-lambda.
    All higher-order functions run JVM-side (no Python)."""
    e = t(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        el(1).alias("first_elem"),
        (el(1) + el(2) + el(3) + el(4)).alias("head4_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )


@register(
    "fn_explode",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id < 50)
    GROUP BY token
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of a split — the table-function shape (UDTF
    surface) over documents."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name)          AS name_md5,
           sha256(c_name)       AS name_sha256,
           length(c_name)       AS name_len
    FROM customer
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash pack (dedup/bucketing primitives). md5/sha256 are
    specification-fixed so they oracle exactly; xxhash64/hash are
    Spark-internal (used by the minhash path, tested separately)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.length("c_name").cast("bigint").alias("name_len"),
    )


@register(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity - l_quantity = 0 THEN NULL
                ELSE l_extendedprice / (l_quantity - l_quantity)
           END AS div_by_zero,
           try_cast(l_returnflag AS INT) AS flag_as_int,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                -- trunc() first: Spark's try_cast(double AS BIGINT)
                -- TRUNCATES where DuckDB's ROUNDS; trunc(±Inf/NaN)
                -- stays non-finite so try_cast still NULLs it
                ELSE CAST(floor(try_cast(trunc(l_quantity) AS BIGINT)
                          / (l_linenumber - 1)) AS BIGINT) END AS qty_per_prev
    FROM lineitem
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI mode (Spark 4 default): plain
    ``/ 0`` and bad casts THROW; ``try_divide``/``try_cast`` return
    NULL instead — the difference between a 100-TB job dying at hour
    three on one malformed row and the row nulling out. The oracle
    restates each try_* as its CASE-guarded equivalent.

    Scale note: try_cast pays a caught-JVM-exception per FAILING row
    (here every row — l_returnflag is never numeric — hence this key's
    outsized baseline, ~10x a plain projection of the same table).
    That cost model is right when failures are rare, which is the
    production case the operator exists for; a pipeline expecting
    mostly-bad values should pre-filter with a regex instead of
    leaning on try_cast as a parser."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.try_divide(F.col("l_extendedprice"),
                     F.col("l_quantity") - F.col("l_quantity"))
         .alias("div_by_zero"),
        F.expr("try_cast(l_returnflag AS INT)").alias("flag_as_int"),
        F.floor(F.try_divide(F.expr("try_cast(l_quantity AS BIGINT)"),
                             F.col("l_linenumber") - 1))
         .cast("long").alias("qty_per_prev"),
    )
