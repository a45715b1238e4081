"""Text-analysis + deduplication keys over ``documents`` (SURVEY §2.3
"LLM-data-pipeline extensions").

The reference feeds a lakehouse whose downstream is analytic SQL
(lib/commondb.py:81-108); a training-data lakehouse additionally needs
text hygiene: token stats, language ID, quality scoring, fingerprinting,
and exact/fuzzy dedup. All implementations are pure DataFrame
composition (operators/dedup.py) — JVM-side, no Python row path — and
every key here has an exact DuckDB oracle: the hashes are md5-derived
(specification-fixed), the minhash/simhash constants are shared between
the Spark code and the generated oracle SQL, and every float is either
a single integer-exact division or explicitly rounded.

The sf0.01 corpus contains ~25 planted near-duplicate pairs (3-word-
shingle Jaccard >= 0.5); the fuzzy-dedup keys surface exactly those.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.dedup import (
    CONTENT_NORM_SQL,
    MERSENNE31,
    MINHASH_A,
    MINHASH_B,
    N_BANDS,
    ROWS_PER_BAND,
    SIMHASH_BITS,
    SIMHASH_CHUNKS,
    content_norm_col,
    exact_dedup_groups,
    minhash_buckets,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    portable_hash_sql,
    shingles_sql,
    simhash_df,
    tokens_col,
)
from .base import register, t
from ..operators.plancapture import capture_plan

# DuckDB replica of content_norm_col over the documents.text column
# (see operators/dedup.py for why every rule pins an explicit charset).
_NORM_MD5_SQL = "md5(" + CONTENT_NORM_SQL.format(col="text") + ")"

P = MERSENNE31

# Shared oracle CTEs -------------------------------------------------------
# Tokens in scope as list<varchar> column `t`; shingle hashes mod 2^31-1
# mirror operators/dedup.py::shingle_hashes_col exactly.

_TOKS = "SELECT doc_id, text, string_split(text, ' ') AS t FROM documents"


def _hashes_cte(k: int) -> str:
    return (
        f"SELECT doc_id, list_distinct(list_transform({shingles_sql(k)}, "
        f"s -> {portable_hash_sql('s')} % {P})) AS hs FROM ({_TOKS})"
    )


# ------------------------------------------------------------- token stats

@register(
    "text_tokenize_stats",
    oracle=f"""
    SELECT doc_id,
           length(text)                                  AS n_chars_calc,
           len(t)                                        AS n_tokens,
           len(list_distinct(t))                         AS n_distinct,
           CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
           CAST(length(text) - (len(t) - 1) AS DOUBLE) / len(t) AS avg_token_len,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens
    FROM ({_TOKS})
    """,
)
def text_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counting: whitespace tokens, distinct tokens,
    type-token ratio, mean token length, and a BPE-ish regex token
    count (letter runs / digit runs / single symbols). All JVM-side;
    divisions are single IEEE ops so the oracle matches bit-exact."""
    d = t(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    n_tok = F.size(toks)
    n_chars = F.length("text")
    return d.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars_calc"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tok).alias("ttr"),
        ((n_chars - (n_tok - 1)).cast("double") / n_tok).alias("avg_token_len"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        .cast("bigint").alias("n_bpe_tokens"),
    )


# ------------------------------------------------------------- language ID

_MARKERS = {
    "en": ("the", "a"),
    "de": ("und", "der", "die"),
    "fr": ("le", "la", "les"),
    "es": ("el", "los", "las"),
    "zh": ("的", "是"),
}


@register(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh,
           CASE WHEN s_en = g THEN 'en' WHEN s_de = g THEN 'de'
                WHEN s_fr = g THEN 'fr' WHEN s_es = g THEN 'es'
                ELSE 'zh' END AS pred_lang,
           CASE WHEN (CASE WHEN s_en = g THEN 'en' WHEN s_de = g THEN 'de'
                WHEN s_fr = g THEN 'fr' WHEN s_es = g THEN 'es'
                ELSE 'zh' END) = lang THEN 1 ELSE 0 END AS is_match
    FROM (
      SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh,
             greatest(s_en, s_de, s_fr, s_es, s_zh) AS g
      FROM (
        SELECT doc_id, lang,
    """
    + ",\n".join(
        f"           len(list_filter(t, x -> x IN "
        f"({', '.join(repr(m) for m in ms)}))) AS s_{lang}"
        for lang, ms in _MARKERS.items()
    )
    + """
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)
      )
    )
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: per-language stopword-marker counts,
    argmax with a fixed tiebreak order (en>de>fr>es>zh). The n-gram
    profile degenerates to marker counting on this synthetic corpus;
    with a real corpus the marker lists are per-language char n-grams."""
    d = t(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    def marker_count(ms):
        return F.size(F.filter(toks, lambda x: x.isin(*ms))).cast("bigint")

    scores = {
        lang: marker_count(ms).alias(f"s_{lang}") for lang, ms in _MARKERS.items()
    }
    scored = d.select("doc_id", "lang", *scores.values())
    g = F.greatest(*[F.col(f"s_{lang}") for lang in _MARKERS])
    pred = F.when(F.col("s_en") == g, "en")
    for lang in ("de", "fr", "es"):
        pred = pred.when(F.col(f"s_{lang}") == g, lang)
    pred = pred.otherwise("zh")
    return scored.select(
        "*",
        pred.alias("pred_lang"),
        F.when(pred == F.col("lang"), 1).otherwise(0).alias("is_match"),
    )


# ----------------------------------------------------------- quality score

@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, n_tokens, stop_cnt, stop_ratio, mean_tok_len, n_short,
           CASE WHEN n_tokens >= 20 AND stop_ratio >= 0.02 AND stop_ratio <= 0.5
                THEN 'good'
                WHEN n_tokens >= 10 THEN 'fair' ELSE 'low' END AS quality
    FROM (
      SELECT doc_id,
             len(t) AS n_tokens,
             len(list_filter(t, x -> x IN ('the', 'a'))) AS stop_cnt,
             CAST(len(list_filter(t, x -> x IN ('the', 'a'))) AS DOUBLE)
               / len(t) AS stop_ratio,
             CAST(length(text) - (len(t) - 1) AS DOUBLE) / len(t) AS mean_tok_len,
             len(list_filter(t, x -> length(x) <= 2)) AS n_short
      FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
    )
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: stopword ratio, mean token length,
    short-token count, bucketed verdict — the standard cheap pre-filter
    before expensive dedup/classification passes at corpus scale."""
    d = t(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    n_tok = F.size(toks)
    stop_cnt = F.size(F.filter(toks, lambda x: x.isin("the", "a")))
    stop_ratio = stop_cnt.cast("double") / n_tok
    base = d.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        stop_cnt.cast("bigint").alias("stop_cnt"),
        stop_ratio.alias("stop_ratio"),
        ((F.length("text") - (n_tok - 1)).cast("double") / n_tok).alias("mean_tok_len"),
        F.size(F.filter(toks, lambda x: F.length(x) <= 2))
        .cast("bigint").alias("n_short"),
    )
    return base.select(
        "*",
        F.when(
            (F.col("n_tokens") >= 20)
            & (F.col("stop_ratio") >= 0.02) & (F.col("stop_ratio") <= 0.5),
            "good",
        ).when(F.col("n_tokens") >= 10, "fair").otherwise("low").alias("quality"),
    )


# ------------------------------------------------------------- fingerprint

@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           -- a NULL doc tokenizes to an EMPTY shingle list on the
           -- Spark side (0 shingles), while split(NULL) is NULL here
           COALESCE(len(hs), 0) AS n_shingles,
           list_min(hs)       AS fingerprint,
           list_min(hs) % 1024 AS fp_bucket
    FROM ({_hashes_cte(3)})
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: min over 3-word-shingle
    hashes (a 1-perm minhash — the winnowing degenerate case), plus a
    1024-way bucket for fingerprint-based clustering/partitioning."""
    from ..operators.dedup import shingle_hashes_col

    d = t(spark, sf_dir, "documents")
    # two-step projection: tokens then hashes land as materialized
    # attributes, so the 3 references below don't re-shingle the doc
    hs = (
        d.select("doc_id", tokens_col(F.col("text")).alias("_toks"))
        .select("doc_id", shingle_hashes_col(F.col("_toks"), 3).alias("_hs"))
    )
    return hs.select(
        "doc_id",
        F.size("_hs").cast("bigint").alias("n_shingles"),
        F.array_min("_hs").alias("fingerprint"),
        (F.array_min("_hs") % 1024).alias("fp_bucket"),
    )


# ------------------------------------------------------------- exact dedup

@register(
    "text_exact_dedup",
    oracle=f"""
    SELECT {_NORM_MD5_SQL} AS content_md5,
           count(*)    AS n_docs,
           min(doc_id) AS keeper_id
    FROM documents
    GROUP BY 1
    """,
)
def text_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: md5 over normalized text, keeper = min id.
    One hash-shuffle on a 16-byte key; the cheapest dedup tier."""
    return exact_dedup_groups(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------- n-gram Jaccard

_NGRAM_PAIRS_SQL = f"""
    WITH sh AS (SELECT doc_id, unnest(hs) AS sh FROM ({_hashes_cte(3)})),
    rare AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 100),
    shr AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
    sz AS (SELECT doc_id, count(*) AS sz FROM shr GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM shr a JOIN shr b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_shared, sa.sz AS sz_a, sb.sz AS sz_b,
           CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
    FROM inter
    JOIN sz sa ON id_a = sa.doc_id
    JOIN sz sb ON id_b = sb.doc_id
    WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.2
"""


@register("text_ngram_jaccard", oracle=_NGRAM_PAIRS_SQL)
def text_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-word-shingle Jaccard via an inverted-
    index join (no cross join; hot shingles capped at df<=100). Finds
    the corpus's planted near-duplicates (~25 pairs at sf0.01)."""
    return ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), k=3, threshold=0.2, max_shingle_df=100
    )


@register(
    "text_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    )
    SELECT node AS doc_id, MIN(r) AS cluster_id,
           CAST(CASE WHEN MIN(r) = node THEN 1 ELSE 0 END AS INT) AS is_keeper
    FROM reach GROUP BY node
    """,
)
def text_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION step: exact-Jaccard near-dup pairs form a
    graph; connected components (iterative min-label propagation,
    operators/dedup.py::neardup_clusters — the large-star/small-star
    shape) collapse each family to one cluster id, keeper = the
    minimum member. The oracle replays the transitive closure with a
    recursive CTE, so the clustering is hash-checked end to end — a
    full fuzzy-dedup pipeline (shingle -> candidate -> verify ->
    cluster -> keeper) with exact cross-engine verification."""
    from ..operators.dedup import neardup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), k=3, threshold=0.2, max_shingle_df=100
    )
    return neardup_clusters(pairs)


# ----------------------------------------------------------------- minhash

def _minhash_sig_sql() -> str:
    mins = ",\n".join(
        f"           list_min(list_transform(hs, x -> ({a} * x + {b}) % {P}))"
        f" AS mh_{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    # len(hs) >= 1 mirrors the Spark side's explode (zero-shingle docs
    # have no signature).
    return (
        f"SELECT doc_id,\n{mins}\n    FROM ({_hashes_cte(3)})"
        f" WHERE len(hs) >= 1"
    )


def _minhash_buckets_sql() -> str:
    bands = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {band} AS band_id, "
        + portable_hash_sql(
            "concat_ws('_', "
            + ", ".join(
                f"mh_{band * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            )
            + ")"
        )
        + " AS band_hash FROM sig"
        for band in range(N_BANDS)
    )
    return f"WITH sig AS ({_minhash_sig_sql()})\n{bands}"


@register("text_minhash_dedup", oracle=_minhash_buckets_sql())
def text_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH bucket table: 16 universal-hash minima over 3-word
    shingles, banded 4x4 (Jaccard s-curve threshold ~0.71). One row per
    (doc, band); docs sharing a bucket are near-dup candidates. At
    corpus scale this shuffles on band_hash only — never all-pairs."""
    return minhash_buckets(t(spark, sf_dir, "documents"), k=3)


@register(
    "text_minhash_pairs",
    oracle=f"""
    WITH buckets AS ({_minhash_buckets_sql()})
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM buckets l
    JOIN buckets r ON l.band_id = r.band_id AND l.band_hash = r.band_hash
                   AND l.doc_id < r.doc_id
    """,
)
def text_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct candidate near-dup pairs from MinHash-LSH bucket
    collisions — the planted ~0.98-Jaccard pairs all collide in >=1
    band; random pairs (J~0.02) essentially never do."""
    return minhash_candidate_pairs(t(spark, sf_dir, "documents"), k=3)


# ----------------------------------------------------------------- simhash

def _simhash_sql() -> str:
    chunk_w = SIMHASH_BITS // SIMHASH_CHUNKS
    sums = ",\n".join(
        f"             CAST(sum(tf * (2 * ((h >> {j}) & 1) - 1)) AS BIGINT)"
        f" AS s_{j}"
        for j in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    chunks = ",\n".join(
        f"           (simhash >> {c * chunk_w}) & {(1 << chunk_w) - 1}"
        f" AS chunk_{c}"
        for c in range(SIMHASH_CHUNKS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, tok, count(*) AS tf, {portable_hash_sql('tok')} AS h
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    sums AS (
      SELECT doc_id,
{sums}
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, simhash,
{chunks}
    FROM (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM sums)
    """


@register("text_simhash", oracle=_simhash_sql())
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signatures + 8-bit chunks for banded near-dup
    search (equal chunk => hamming<=3 candidates, pigeonhole). One
    explode + one grouped aggregation with 32 conditional sums —
    map-side partials, a single shuffle on doc_id."""
    return simhash_df(t(spark, sf_dir, "documents"))


# -------------------------------------------------- repetition (Gopher-style)

@register(
    "text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tok_stats AS (
      SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct
      FROM toks GROUP BY doc_id
    ),
    grams AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           LATERAL (SELECT unnest(range(1, len(t))) AS i)
    ),
    gram_counts AS (
      SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram
    ),
    gram_stats AS (
      SELECT doc_id, MAX(c) AS top_gram, SUM(c) AS n_grams
      FROM gram_counts GROUP BY doc_id
    )
    SELECT t.doc_id,
           t.n_tokens,
           ROUND(1.0 - CAST(t.n_distinct AS DOUBLE) / t.n_tokens, 9) AS dup_token_frac,
           ROUND(CAST(g.top_gram AS DOUBLE) / g.n_grams, 9) AS top_2gram_frac
    FROM tok_stats t JOIN gram_stats g USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals (the Gopher-rules family): duplicate-token
    fraction and most-frequent-2-gram fraction per doc — the standard
    cheap detectors for degenerate/boilerplate text before it poisons
    a training set. Two explode+agg pipelines joined on doc_id; both
    fractions are exact small rationals rounded at 9 dp."""
    d = t(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens_col(F.col("text")).alias("_toks"))
    tok = toked.select("doc_id", F.explode("_toks").alias("tok"))
    tok_stats = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
    )
    grams = toked.select(
        "doc_id",
        # guard the 1-token doc: sequence(1, 0) counts DOWN to [1, 0]
        # and element_at(_toks, 0) throws — same short-doc pitfall
        # shingles_col guards. explode(array()) then drops the doc,
        # matching the oracle's empty range(1, 1) + inner join.
        F.explode(F.expr(
            "CASE WHEN size(_toks) >= 2 THEN "
            "transform(sequence(1, size(_toks) - 1), "
            "i -> concat_ws(' ', element_at(_toks, i), element_at(_toks, i + 1))) "
            "ELSE array() END"
        )).alias("gram"),
    )
    gram_stats = (
        grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_gram"), F.sum("c").alias("n_grams"))
    )
    return (
        tok_stats.join(gram_stats, "doc_id")
        .select(
            "doc_id", "n_tokens",
            F.round(F.lit(1.0) - F.col("n_distinct").cast("double")
                    / F.col("n_tokens"), 9).alias("dup_token_frac"),
            F.round(F.col("top_gram").cast("double") / F.col("n_grams"), 9)
            .alias("top_2gram_frac"),
        )
    )


# ------------------------------------------------------------ PII / redaction

@register(
    "text_pii_redact",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, 'https?://[^ ]+')) AS n_urls,
           len(regexp_extract_all(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+')) AS n_emails,
           len(regexp_extract_all(text, '[0-9]+')) AS n_number_runs,
           md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS redacted_md5
    FROM documents
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing pass: count URL / email / digit-run matches
    and hash the digit-redacted text — the scan-and-scrub shape every
    training-data pipeline runs (real deployments swap in their own
    pattern packs; the plumbing — JVM regex over the scan, no Python —
    is what scales). Redaction is verified end-to-end by hashing the
    redacted text in both engines."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"https?://[^ ]+"), 0))
        .cast("bigint").alias("n_urls"),
        F.size(F.regexp_extract_all(
            "text", F.lit(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"), 0))
        .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]+"), 0))
        .cast("bigint").alias("n_number_runs"),
        F.md5(F.regexp_replace("text", r"[0-9]+", "#")).alias("redacted_md5"),
    )


# -------------------------------------------------------- curation pipeline

@register(
    "curate_pipeline",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    ),
    clusters AS (SELECT node AS doc_id, MIN(r) AS cluster_id
                 FROM reach GROUP BY node),
    exact AS (
      SELECT doc_id,
             MIN(doc_id) OVER (
               PARTITION BY {_NORM_MD5_SQL}
             ) AS exact_keeper
      FROM documents
    ),
    q AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 20
                       AND CAST(len(list_filter(t, x -> x IN ('the', 'a'))) AS DOUBLE)
                           / len(t) BETWEEN 0.02 AND 0.5
                  THEN 'good'
                  WHEN len(t) >= 10 THEN 'fair' ELSE 'low' END AS quality
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    )
    SELECT d.doc_id, q.quality,
           CAST(CASE WHEN e.exact_keeper = d.doc_id THEN 1 ELSE 0 END AS INT)
             AS exact_keeper,
           CAST(CASE WHEN c.cluster_id IS NULL OR c.cluster_id = d.doc_id
                     THEN 1 ELSE 0 END AS INT) AS fuzzy_keeper,
           CASE WHEN q.quality = 'low' THEN 'low_quality'
                WHEN e.exact_keeper != d.doc_id THEN 'exact_dup'
                WHEN c.cluster_id IS NOT NULL AND c.cluster_id != d.doc_id
                  THEN 'near_dup'
                ELSE 'kept' END AS verdict
    FROM documents d
    JOIN exact e USING (doc_id)
    JOIN q USING (doc_id)
    LEFT JOIN clusters c USING (doc_id)
    """,
)
def curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation: the decision query a training-data pipeline
    exists for. Per document: quality bucket (stopword/length
    heuristics), exact-dedup keeper (md5 groups), fuzzy-dedup keeper
    (shingle -> candidate -> exact-Jaccard verify -> connected
    components), and the final verdict with a drop reason (first
    matching rule: low_quality > exact_dup > near_dup > kept). Every
    stage is the already-verified operator; the oracle replays the
    whole composition — including the recursive-CTE clustering — so
    the end-to-end decision is hash-checked, not just the parts."""
    from ..operators.dedup import neardup_clusters, ngram_jaccard_pairs

    d = t(spark, sf_dir, "documents")
    # ONE documents scan feeds the quality bucket, the exact-dedup
    # hash, and the base row set (they were three separate scans + two
    # doc_id equi-joins): quality is a narrow projection, the exact
    # keeper is a min-over-window on the content hash computed in the
    # same pass, and the join keys ride along. Only the fuzzy cluster
    # table still joins (it comes from the pair/CC pipeline).
    toks = tokens_col(F.col("text"))
    n_tok = F.size(toks)
    stop_ratio = (F.size(F.filter(toks, lambda x: x.isin("the", "a")))
                  .cast("double") / n_tok)
    eq = d.select(
        "doc_id",
        F.md5(content_norm_col("text")).alias("_content_md5"),
        F.when((n_tok >= 20) & (stop_ratio >= 0.02) & (stop_ratio <= 0.5), "good")
        .when(n_tok >= 10, "fair").otherwise("low").alias("quality"),
    ).select(
        "doc_id", "quality",
        F.min("doc_id").over(Window.partitionBy("_content_md5"))
        .alias("exact_keeper"),
    ).filter(F.col("doc_id").isNotNull())
    # ^ NULL-doc_id parity with the oracle's inner `JOIN ... USING
    # (doc_id)` (and the pre-fusion plan's equi-joins), which drop a
    # NULL key. min() already ignores NULLs, so filtering after the
    # window leaves every surviving row's exact_keeper unchanged.
    # (doc_id is the documents table's unique key by the testdata
    # contract; a DUPLICATED doc_id would have produced k^3 join
    # fan-out in the old shape — out of contract either way.)
    clusters = neardup_clusters(
        ngram_jaccard_pairs(d, k=3, threshold=0.2, max_shingle_df=100)
    ).select("doc_id", "cluster_id")
    out = eq.join(clusters, "doc_id", "left")
    return out.select(
        "doc_id", "quality",
        (F.col("exact_keeper") == F.col("doc_id")).cast("int")
        .alias("exact_keeper"),
        (F.col("cluster_id").isNull()
         | (F.col("cluster_id") == F.col("doc_id"))).cast("int")
        .alias("fuzzy_keeper"),
        F.when(F.col("quality") == "low", "low_quality")
        .when(F.col("exact_keeper") != F.col("doc_id"), "exact_dup")
        .when(F.col("cluster_id").isNotNull()
              & (F.col("cluster_id") != F.col("doc_id")), "near_dup")
        .otherwise("kept").alias("verdict"),
    )


# ------------------------------------------------------------------- tfidf

@register(
    "tfidf_keywords",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT doc_id, term, tf, df, score, rk
    FROM (
      SELECT t.doc_id, t.term, t.tf, d.df,
             CAST(t.tf * n.n AS DOUBLE) / d.df AS score,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY CAST(t.tf * n.n AS DOUBLE) / d.df DESC, t.term
             ) AS rk
      FROM tf t JOIN df d USING (term) CROSS JOIN n
    )
    WHERE rk <= 5
    """,
)
def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 keywords per doc by tf * (N/df) — a linear idf variant
    chosen because tf*N is integer-exact and one double division
    matches the oracle bit-for-bit (ln-based idf differs in last-ulp
    between libm builds). term-asc tiebreak makes ranks deterministic.

    Plan shape (r15): the corpus is scanned and tokenized ONCE. The
    original plan fed the exploded token table into two different
    aggregations (tf and a count_distinct df), which cannot share an
    exchange — two full scan+explode passes over the corpus, the
    dominant cost at scale. Since tf holds exactly one row per
    distinct (doc, term), df is just count(*) of tf per term, so tf
    is persisted (the standard multi-consumer mid-table checkpoint,
    cf. text_ngram_jaccard's shingle table) and df derives from it
    with a map-side-partial agg. A count-over-window(term) variant
    avoids the join entirely but puts every row of a hot (stopword)
    term into one unsplittable window partition; the join shape keeps
    AQE's skew-split available, so it wins at 100 TB even though the
    two measure within noise of each other locally.

    The tf persist is KEYED on the corpus plan (r16, ADVICE r15): an
    unkeyed tracked_persist caches a fresh copy per invocation, so a
    harness looping this key without an intervening release_persisted
    degrades to LRU eviction pressure — the same leak the LSH
    operators closed with keyed persists."""
    from ..operators.cache import plan_key, tracked_persist_keyed

    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    tf = tracked_persist_keyed(
        ("tfidf_tf", plan_key(d)),
        lambda: tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    # one row per (doc, term) in tf => count(*) == count_distinct(doc)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.count()  # scalar: one job over parquet footers; fine at any scale
    scored = (
        tf.join(df, "term")
        .withColumn("score", (F.col("tf") * F.lit(n)).cast("double") / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


# ------------------------------------------------------------------- BM25

_BM25_TERMS = ("join", "filter", "stream")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "text_bm25_rank",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS doclen FROM toks GROUP BY doc_id),
    g AS (SELECT COUNT(*) AS n_docs, AVG(doclen) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok IN {_BM25_TERMS} GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               ln((g.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * tf.tf * ({_BM25_K1} + 1)
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                  + {_BM25_B} * dl.doclen / g.avgdl))
             ) AS s
      FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN g
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score_r, rk FROM (
      SELECT doc_id, ROUND(s, 6) AS score_r,
             row_number() OVER (ORDER BY ROUND(s, 6) DESC, doc_id) AS rk
      FROM scored)
    WHERE rk <= 20
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) document ranking for a fixed query — the
    lexical-retrieval complement to tfidf_keywords and the vector
    top-k tiers. All corpus statistics stay in the plan; nothing is
    collected. Scores round to 6 dp before ranking so Spark's
    Math.log and DuckDB's libm ln cannot flip the order on a last-ulp
    difference; ties break on doc_id in both engines.

    Plan shape (r15): ONE scan+tokenize pass. The original plan fed
    the exploded token table into two aggregations (doc lengths and
    per-term tf) and then re-executed both subtrees for their
    downstream aggs (n_docs/avgdl from dl, df from tf) — up to four
    corpus tokenize passes in the executed plan. Because the query is
    a FIXED term list, doclen AND the per-term tfs pivot into one
    groupBy(doc_id) aggregation, persisted doc-sized (narrow ints —
    unlike tfidf's tf table this checkpoint is cheap even locally);
    the global stats (n_docs, avgdl, each term's df) fold into a
    single 1-row agg over it, broadcast back, and the score is a sum
    of per-term guarded contributions — no joins at all. Measured
    faster at bench scale AND ~4x less scan work at cluster scale.
    The per_doc persist is keyed on the corpus plan (r16, same
    rationale as tfidf_keywords above)."""
    from ..operators.cache import plan_key, tracked_persist_keyed

    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    per_doc = tracked_persist_keyed(
        ("bm25_per_doc", plan_key(d)),
        lambda: toks.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("doclen"),
            *[F.sum(F.when(F.col("tok") == term, 1).otherwise(0))
              .alias(f"tf_{i}")
              for i, term in enumerate(_BM25_TERMS)]))
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl"),
        *[F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
          for i in range(len(_BM25_TERMS))])
    k1, b = _BM25_K1, _BM25_B
    contribs = [
        F.when(
            F.col(f"tf_{i}") > 0,
            F.log((F.col("n_docs") - F.col(f"df_{i}") + 0.5)
                  / (F.col(f"df_{i}") + 0.5) + 1)
            * F.col(f"tf_{i}") * (k1 + 1)
            / (F.col(f"tf_{i}")
               + k1 * (1 - b + b * F.col("doclen") / F.col("avgdl"))))
        .otherwise(F.lit(0.0))
        for i in range(len(_BM25_TERMS))]
    # doc-set selection is an EXPLICIT match predicate (any query term
    # present), not the sign of the summed score: the log(x+1) idf
    # variant happens to be strictly positive, but classic BM25 idf
    # goes negative for df > n_docs/2, and coupling selection to the
    # formula's sign would silently drop matching docs on a formula
    # swap (ADVICE r15). Filtering per_doc BEFORE the broadcast join
    # also keeps non-matching docs out of the scoring projection.
    matches = functools.reduce(
        lambda a, b: a | b,
        [F.col(f"tf_{i}") > 0 for i in range(len(_BM25_TERMS))])
    scored = (
        per_doc.filter(matches)
        .crossJoin(F.broadcast(stats))
        .select("doc_id", sum(contribs[1:], contribs[0]).alias("s"))
    )
    # global top-k the scale-safe way: orderBy+limit plans as
    # TakeOrderedAndProject (per-partition heaps + driver merge of 20
    # rows); the ranking window then runs over only the 20 survivors,
    # never a single-partition pass over the whole corpus.
    top = (
        scored.select("doc_id", F.round("s", 6).alias("score_r"))
        .orderBy(F.col("score_r").desc(), F.col("doc_id"))
        .limit(20)
    )
    return top.withColumn("rk", F.row_number().over(
        Window.orderBy(F.col("score_r").desc(), F.col("doc_id"))))


# ------------------------------------------------- curation (round 5)
# The three steps between "deduped corpus" and "training batches":
# benchmark decontamination, mixture sampling, sequence packing
# (operators/curation.py; scale shapes documented there).

@register(
    "text_decontaminate",
    oracle=f"""
    WITH h AS ({_hashes_cte(5)}),
    ex AS (SELECT doc_id, unnest(hs) AS hh FROM h),
    eh AS (SELECT DISTINCT hh FROM ex WHERE doc_id % 20 = 7)
    SELECT ex.doc_id, COUNT(DISTINCT ex.hh) AS n_shared
    FROM ex JOIN eh ON ex.hh = eh.hh
    WHERE ex.doc_id % 20 <> 7
    GROUP BY ex.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 20 == 7 stand in
    for the eval/benchmark set; every TRAINING doc sharing >=1 distinct
    5-word-shingle hash with any eval doc is flagged with its distinct
    shared-shingle count. 5-gram granularity keeps hits to REAL
    leakage (at sf0.01 exactly the planted near-dup partners of eval
    docs, sharing hundreds of shingles each — 3-grams over the small
    synthetic vocab would drown that in background collisions). The
    eval hash set is broadcast (benchmark suites are tiny vs the
    corpus); the corpus side is one explode + broadcast join +
    groupBy — linear, never corpus x eval."""
    from ..operators.curation import decontaminate_hits

    return decontaminate_hits(
        t(spark, sf_dir, "documents"),
        eval_pred=F.col("doc_id") % 20 == 7, k=5)


@register(
    "mixture_sample",
    oracle=f"""
    WITH d AS (
      SELECT source,
             LEAST(100, 5 * (CAST(substr(source, 4) AS INT) + 1)) AS rate_pct,
             {portable_hash_sql("source || ':' || CAST(doc_id AS VARCHAR)")}
               % 100 AS h
      FROM documents)
    SELECT source, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN h < rate_pct THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM d GROUP BY source
    """,
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixture sampling: each source gets a target
    rate (here 5%*(index+1), capped at 100 — src0 nearly drops out,
    src19 is kept whole) and docs keep iff md5(source:doc_id)%100 <
    rate. Hash-based keeps are the reproducible-at-scale alternative
    to rand() sampling (stable across runs/engines/cluster layouts);
    the projection is stateless and inline — no shuffle before the
    per-source audit counts returned here."""
    from ..operators.curation import mixture_sample_counts

    idx = F.regexp_extract(F.col("source"), r"src(\d+)", 1).cast("int")
    return mixture_sample_counts(
        t(spark, sf_dir, "documents"),
        rate_pct=F.least(F.lit(100), (idx + 1) * 5))


@register(
    "pack_sequences",
    oracle="""
    WITH tk AS (
      SELECT doc_id, doc_id % 8 AS bucket,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT *, SUM(n_tokens) OVER (
        PARTITION BY bucket ORDER BY doc_id
        ROWS UNBOUNDED PRECEDING) AS cum
      FROM tk)
    SELECT doc_id, bucket, n_tokens,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_start,
           CAST((cum - 1) // 2048 AS BIGINT) AS seq_end
    FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: docs are concatenated in
    doc_id order inside hash buckets and split into 2048-token
    training sequences; each doc reports the sequence span its tokens
    occupy (seq_start != seq_end = boundary straddle). Window cumsum
    is integer-exact, so the oracle replays it bit-for-bit. Buckets
    bound the sort: parallelism = n_buckets and no global sort — at
    100 TB raise n_buckets so each bucket's window fits an executor."""
    from ..operators.curation import pack_sequences as _pack

    return _pack(t(spark, sf_dir, "documents"), budget=2048, n_buckets=8)


# ---------------------------------------------- incremental (cross-run) dedup

@register(
    "text_incremental_dedup",
    oracle=f"""
    WITH buckets AS ({_minhash_buckets_sql()}),
    h AS (
      SELECT doc_id,
             {_NORM_MD5_SQL} AS m
      FROM documents
    ),
    exact AS (
      SELECT DISTINCT b.doc_id FROM h b JOIN h c ON b.m = c.m
      WHERE b.doc_id % 10 >= 8 AND c.doc_id % 10 < 8
    ),
    near AS (
      SELECT DISTINCT l.doc_id
      FROM buckets l JOIN buckets r
        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
      WHERE l.doc_id % 10 >= 8 AND r.doc_id % 10 < 8
    )
    SELECT h.doc_id,
           CASE WHEN h.doc_id IN (SELECT doc_id FROM exact) THEN 'exact_dup'
                WHEN h.doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'
                ELSE 'new' END AS verdict
    FROM h WHERE h.doc_id % 10 >= 8
    """,
)
def text_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run incremental dedup: a new batch (doc_id%10>=8) deduped
    against a PERSISTED index of the existing corpus (doc_id%10<8) —
    the continuous-ingestion pattern, where re-shingling 100 TB of
    already-ingested text per day is not an option. The index is two
    parquet tables written once per corpus generation: the exact tier
    (distinct content md5, ~16 B/doc) and the fuzzy tier (MinHash-LSH
    band buckets, 4 rows/doc); the batch run touches ONLY the index —
    never the corpus text. Verdict precedence exact_dup > near_dup >
    new. Both tiers are md5-derived, so the oracle replays the whole
    pipeline, persisted round-trip included."""
    import shutil
    import tempfile

    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    batch = docs.filter(F.col("doc_id") % 10 >= 8)

    def content_md5(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id", F.md5(content_norm_col("text")).alias("content_md5"))

    root = tempfile.mkdtemp(prefix="las_dedup_idx_")
    try:
        # ---- index build (the once-per-corpus side) ----
        (content_md5(corpus).select("content_md5").distinct()
         .write.parquet(f"{root}/md5"))
        minhash_buckets(corpus, k=3).write.parquet(f"{root}/buckets")

        # ---- batch run (reads the index, not the corpus) ----
        idx_md5 = spark.read.parquet(f"{root}/md5")
        idx_buckets = spark.read.parquet(f"{root}/buckets")
        exact_ids = (
            content_md5(batch)
            .join(idx_md5, "content_md5", "left_semi")
            .select("doc_id").withColumn("is_exact", F.lit(True))
        )
        near_ids = (
            minhash_buckets(batch, k=3)
            .join(idx_buckets.select("band_id", "band_hash"),
                  ["band_id", "band_hash"], "left_semi")
            .select("doc_id").distinct().withColumn("is_near", F.lit(True))
        )
        return (
            batch.select("doc_id")
            .join(exact_ids, "doc_id", "left")
            .join(near_ids, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("is_exact"), "exact_dup")
                 .when(F.col("is_near"), "near_dup")
                 .otherwise("new").alias("verdict"))
            .transform(lambda d: capture_plan(
                "text_incremental_dedup:verdict", d))
            .localCheckpoint(eager=True)  # index scratch deleted below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ------------------------------------------------------- chunking (RAG prep)

# chunk geometry: 64-token windows, 16-token overlap (stride 48) —
# shared between the Spark impl and the oracle
_CHUNK_LEN = 64
_CHUNK_STRIDE = 48
_CHUNK_OVERLAP = _CHUNK_LEN - _CHUNK_STRIDE


@register(
    "text_chunk_split",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), starts AS (
      SELECT doc_id, toks, n, unnest(range(0, n, {_CHUNK_STRIDE})) AS s
      FROM d
    )
    SELECT doc_id, CAST(s / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(least(s + {_CHUNK_LEN}, n) - s AS BIGINT) AS n_tokens,
           md5(array_to_string(
                 list_slice(toks, s + 1, least(s + {_CHUNK_LEN}, n)),
                 ' ')) AS chunk_md5
    FROM starts
    WHERE s = 0 OR s + {_CHUNK_OVERLAP} < n
    """,
)
def text_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (RAG / long-context prep):
    64-token windows at stride 48, tail windows that would contain
    only the previous chunk's overlap are dropped. Pure JVM array ops
    — tokens materialized ONCE per doc (the re-tokenization trap), a
    single explode of the start offsets, no Python path, parallelism =
    #docs. Chunk text crosses the gate as md5 so the output stays
    narrow at any document size."""
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    starts = d.select(
        "doc_id", "toks", "n",
        F.explode(F.sequence(
            F.lit(0), F.col("n") - 1, F.lit(_CHUNK_STRIDE))).alias("s"))
    return (
        starts
        .filter((F.col("s") == 0)
                | (F.col("s") + _CHUNK_OVERLAP < F.col("n")))
        .select(
            "doc_id",
            (F.col("s") / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            (F.least(F.col("s") + _CHUNK_LEN, F.col("n")) - F.col("s"))
             .cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(
                " ", F.slice("toks", F.col("s") + 1, F.lit(_CHUNK_LEN))))
             .alias("chunk_md5"))
    )


# ---------------------------------------- unigram LM scoring (CCNet-style)

@register(
    "text_unigram_logprob",
    oracle="""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY doc_id, tok
    ), cnt AS (
      SELECT tok, SUM(tf) AS c FROM tf GROUP BY tok
    ), tot AS (
      SELECT SUM(c) AS total FROM cnt
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           round(SUM(tf.tf * ln(cnt.c / tot.total)) / SUM(tf.tf), 6)
             AS avg_logprob
    FROM tf JOIN cnt USING (tok) CROSS JOIN tot
    GROUP BY tf.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring, unigram tier (the CCNet /
    Gopher perplexity-filter pattern with the LM trained on the corpus
    itself — fully deterministic, no external model): per-doc mean
    token log-probability under the corpus unigram distribution.
    Low-scoring docs are gibberish / rare-token soup; high scorers are
    stopword-heavy boilerplate — both ends get filtered in a real
    pipeline. Shape at 100 TB: one tf aggregation (doc_id, tok), one
    vocabulary aggregation, a shuffle join on tok (vocab ≪ corpus),
    one doc_id agg. ln() is rounded at 6 dp in both engines (the
    text_bm25_rank convention) so libm last-ulp noise never reaches
    the hash."""
    from ..operators.cache import tracked_persist

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks"))
    # tf feeds BOTH the vocabulary agg and the per-doc join — persist
    # or the explode+agg runs twice (the shingle-table rule)
    tf = tracked_persist(
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    )
    cnt = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    tot = cnt.agg(F.sum("c").alias("total"))
    return (
        tf.join(cnt, "tok").crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf")
                      * F.log(F.col("c") / F.col("total")))
                / F.sum("tf"), 6).alias("avg_logprob"))
    )


@register(
    "text_substring_dedup",
    oracle="""
    WITH w AS (
      SELECT doc_id, md5(substr(text, CAST(off AS INT), 40)) AS h
      FROM documents,
           LATERAL unnest(generate_series(1, length(text) - 39, 10)) AS u(off)
      WHERE length(text) >= 40
    ), d AS (
      SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT w.doc_id, COUNT(*) AS n_windows,
           CAST(COUNT(d.h) AS BIGINT) AS n_dup_windows,
           CAST(COUNT(d.h) AS DOUBLE) / COUNT(*) AS dup_frac
    FROM w LEFT JOIN d ON w.h = d.h
    GROUP BY w.doc_id
    """,
)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-SPAN detection (the substring tier of train-data
    dedup, after Lee et al.'s "Deduplicating Training Data Makes
    Language Models Better"): 40-char windows at stride 10 over every
    doc; a window is a dup span iff the identical text occurs in >= 2
    DISTINCT docs (internal repetition is text_repetition's job);
    each doc reports its duplicated-window fraction — the boilerplate/
    template score that exact- and near-dedup both miss when only a
    SPAN is shared.

    Scale shape: windows shuffle on md5(window) — 16-byte keys instead
    of raw 40-char spans, computed identically in both engines so the
    oracle replays the exact grouping (a suffix-array would find every
    duplicated substring; stride-10 fixed windows are the
    shuffle-bounded approximation, rows = n_chars/10). The dup-hash
    re-attach is HINTED shuffle_hash: the dup set is HAVING-pruned but
    still CORPUS-PROPORTIONAL (every replica of a template repeats its
    cross-doc spans — measured 5.9k hashes at sf0.1 -> 257k at sf3),
    and the planner kept broadcasting it at 30x data for a measured
    1.4x slowdown; at 100 TB that broadcast is an OOM.

    Plan shape (r16): the window table is derived ONCE and persisted
    (keyed on the corpus plan). The previous plan counted on
    ReuseExchange to cover the wins side of the re-attach join, but
    the executed plan showed TWO full scan+explode+md5 passes — the
    dup side exchanges count-distinct PARTIAL-AGG rows, not raw
    (doc_id, h) rows, so the exchanges never canonicalize equal and
    nothing was reused. Caught by tools/plan_lint.py (the mechanized
    r15 multi-scan audit rule) on the published sf0.1 plan; the same
    defect class as r15's tfidf_keywords. The cached (doc_id, h)
    mid-table is narrower than the re-derivation it replaces; at
    100 TB it checkpoints to storage per the cache.py contract."""
    from ..operators.cache import plan_key, tracked_persist_keyed

    d0 = t(spark, sf_dir, "documents")
    docs = d0.filter(F.length("text") >= 40)
    wins = tracked_persist_keyed(
        ("subdup_wins", plan_key(d0)),
        lambda: (docs
                 .select("doc_id", "text",
                         F.explode(F.sequence(F.lit(1),
                                              F.length("text") - 39,
                                              F.lit(10))).alias("off"))
                 .select("doc_id",
                         F.md5(F.expr("substring(text, off, 40)"))
                         .alias("h"))))
    dup = (wins.groupBy("h")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2)
           .select("h", F.lit(1).alias("isdup")))
    return (wins.join(dup.hint("shuffle_hash"), "h", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_windows"),
                 F.count("isdup").cast("long").alias("n_dup_windows"),
                 (F.count("isdup").cast("double") / F.count(F.lit(1)))
                 .alias("dup_frac")))


@register(
    "text_rake_keywords",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ), ns AS (
      SELECT doc_id, tok, pos,
             pos - row_number() OVER (
               PARTITION BY doc_id ORDER BY pos) AS g
      FROM toks WHERE tok <> '' AND tok NOT IN ('the', 'a')
    ), occ AS (
      SELECT doc_id, tok,
             CAST(COUNT(*) OVER (PARTITION BY doc_id, g) AS BIGINT)
               AS plen
      FROM ns
    ), words AS (
      SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS degree
      FROM occ GROUP BY 1
    )
    SELECT word, freq, degree,
           CAST(degree AS DOUBLE) / freq AS score
    FROM words
    ORDER BY score DESC, word
    LIMIT 50
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, word-level): candidate
    phrases are maximal stopword-free token runs (gaps-and-islands on
    token position — the corpus stopwords are 'the'/'a', matching
    `text_quality_score`); word degree sums the lengths of every
    phrase containing the word, and score = degree/freq favors words
    that live in long multi-word phrases — the unsupervised keyword
    tier between `tfidf_keywords` (corpus-statistical) and
    `text_bm25_rank` (query-relevance).

    Exactness: freq and degree are pure integers; score is one exact
    division; ORDER BY (score, word) is a total order so the LIMIT cut
    is deterministic.

    100-TB shape: tokens explode inline (no materialized token
    table); BOTH windows (phrase grouping, phrase length) ride one
    doc_id Exchange — the (doc_id, phrase) window needs only a sort,
    not a second shuffle, because doc partitioning already co-locates
    phrases; the word agg partial-combines to vocab size; the final
    ORDER BY + LIMIT plans as TakeOrderedAndProject."""
    toks = (t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.posexplode(F.split("text", " "))
                    .alias("pos", "tok")))
    ns = toks.filter((F.col("tok") != "")
                     & ~F.col("tok").isin("the", "a"))
    wg = Window.partitionBy("doc_id").orderBy("pos")
    grp = ns.withColumn("g", F.col("pos") - F.row_number().over(wg))
    occ = grp.withColumn(
        "plen", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "g")))
    words = occ.groupBy(F.col("tok").alias("word")).agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("degree"))
    return (words.select(
        "word", "freq", "degree",
        (F.col("degree").cast("double") / F.col("freq")).alias("score"))
        .orderBy(F.desc("score"), F.asc("word"))
        .limit(50))


# ------------------------------------------------ collocations (lift/PMI)

@register(
    "text_collocations",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), uni AS (
      SELECT unnest(t) AS tok FROM toks
    ), ucnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY tok
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM uni
    ), big AS (
      SELECT t[i] AS x, t[i+1] AS y, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
      GROUP BY 1, 2
    )
    SELECT b.x, b.y, b.c_xy, cx.c AS c_x, cy.c AS c_y,
           (CAST(b.c_xy AS DOUBLE) * CAST(tot.n AS DOUBLE))
             / (CAST(cx.c AS DOUBLE) * CAST(cy.c AS DOUBLE)) AS lift
    FROM big b
    JOIN ucnt cx ON cx.tok = b.x
    JOIN ucnt cy ON cy.tok = b.y
    CROSS JOIN tot
    WHERE b.c_xy >= 5
    ORDER BY lift DESC, x, y
    LIMIT 100
    """,
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top corpus collocations by bigram lift — the PMI-family
    association score P(xy)/(P(x)P(y)) that surfaces multi-word
    expressions ("new york", "machine learning") for tokenizer vocab
    building and phrase mining. Ranking by the RAW lift ratio rather
    than its log keeps the score monotone-identical to PMI while
    avoiding the one cross-engine hazard: ln() is not guaranteed
    bit-identical between libm implementations, but the counts are
    exact integers and the ratio is ONE shared IEEE expression
    (two multiplies, one divide, same order in both engines). The
    c_xy >= 5 support floor is the standard collocation noise gate —
    and the scale lever: it prunes the singleton-pair tail (the vast
    majority of distinct bigrams) before any join.

    100-TB shape: unigram and bigram counts partial-combine before
    their token-keyed shuffles; the support floor cuts the bigram
    side before the two vocabulary-sized attach joins; the 1-row
    total broadcasts; the final ORDER BY + LIMIT plans as
    TakeOrderedAndProject (per-partition top-k, no global sort)."""
    from ..operators.cache import tracked_persist

    toked = (t(spark, sf_dir, "documents")
             .select("doc_id", tokens_col(F.col("text")).alias("_toks")))
    toked = tracked_persist(toked)
    uni = toked.select(F.explode("_toks").alias("tok"))
    uni = tracked_persist(uni)
    ucnt = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.count(F.lit(1)).alias("n"))
    big = (toked.select(F.explode(F.expr(
        "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)),"
        " (tk, j) -> struct(tk AS x, element_at(_toks, j + 2) AS y))"))
        .alias("g"))
        .select("g.x", "g.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= 5))
    cx = ucnt.select(F.col("tok").alias("x"), F.col("c").alias("c_x"))
    cy = ucnt.select(F.col("tok").alias("y"), F.col("c").alias("c_y"))
    return (big.join(cx, "x").join(cy, "y")
            .crossJoin(F.broadcast(tot))
            .select("x", "y", "c_xy", "c_x", "c_y",
                    ((F.col("c_xy").cast("double")
                      * F.col("n").cast("double"))
                     / (F.col("c_x").cast("double")
                        * F.col("c_y").cast("double"))).alias("lift"))
            .orderBy(F.desc("lift"), F.asc("x"), F.asc("y"))
            .limit(100))


@register(
    "text_vocab_stats",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS tk
      FROM documents
    ), cnt AS (
      SELECT source, tk, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax_count,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS hapax_share,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS type_token_ratio
    FROM cnt GROUP BY source
    """,
)
def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary statistics: token count, vocabulary
    size, hapax legomena count/share, and type-token ratio — the
    corpus-QA panel that flags template-generated or truncated
    sources (low TTR, low hapax share) before they skew a training
    mixture. Counts exact; the two ratios are single shared IEEE
    divides on exact integers.

    100-TB shape: the (source, token) count partial-combines before
    its shuffle; the per-source rollup collapses vocab-sized input
    to |sources| rows — raw text is scanned once, and nothing
    vocabulary-sized leaves the executors."""
    cnt = (t(spark, sf_dir, "documents")
           .select("source",
                   F.explode(F.split(F.col("text"), " ")).alias("tk"))
           .groupBy("source", "tk")
           .agg(F.count(F.lit(1)).alias("c")))
    return (cnt.groupBy("source")
            .agg(F.sum("c").alias("n_tokens"),
                 F.count(F.lit(1)).alias("vocab_size"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                 .cast("long").alias("hapax_count"))
            .select("source", "n_tokens", "vocab_size", "hapax_count",
                    (F.col("hapax_count").cast("double")
                     / F.col("vocab_size").cast("double"))
                    .alias("hapax_share"),
                    (F.col("vocab_size").cast("double")
                     / F.col("n_tokens").cast("double"))
                    .alias("type_token_ratio")))


@register(
    "text_vocab_coverage",
    oracle="""
    WITH cnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY tok
    ), rk AS (
      SELECT c,
             row_number() OVER (ORDER BY c DESC, tok) AS rnk,
             CAST(SUM(c) OVER (
               ORDER BY c DESC, tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(SUM(c) OVER () AS BIGINT) AS total
      FROM cnt
    )
    SELECT CAST(sz AS BIGINT) AS vocab_size,
           CAST(MAX(CASE WHEN rnk <= sz THEN cum END) AS BIGINT)
             AS covered_tokens,
           CAST(MAX(total) AS BIGINT) AS total_tokens,
           CAST(MAX(CASE WHEN rnk <= sz THEN cum END) AS DOUBLE)
             / CAST(MAX(total) AS DOUBLE) AS coverage
    FROM rk, LATERAL (SELECT unnest([100, 1000, 10000, 100000]) AS sz)
    WHERE rnk <= sz
    GROUP BY sz
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass coverage at vocab sizes 100/1k/10k/100k — the
    tokenizer-sizing curve ("what fraction of the corpus does a
    top-N vocabulary cover"), the decision input for vocab budgets
    and OOV policies. Tokens rank by (count DESC, token) so ties are
    deterministic; the cumulative mass at each cut is an exact
    integer; coverage is one shared IEEE divide per row. Cuts where
    the vocabulary is smaller than the cut report the full-vocab
    mass (coverage 1.0).

    100-TB shape: the unigram count partial-combines before its
    token-keyed shuffle; the rank/cumsum window runs over the VOCAB
    (vocab-sized, not corpus-sized — and the production form would
    pre-prune with a count floor); the output is 4 rows."""
    from ..operators.cache import tracked_persist

    cnt = (t(spark, sf_dir, "documents")
           .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    wr = Window.orderBy(F.desc("c"), F.asc("tok"))
    wcum = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy()
    rk = (cnt.withColumn("rnk", F.row_number().over(wr))
          .withColumn("cum", F.sum("c").over(wcum))
          .withColumn("total", F.sum("c").over(wtot)))
    rk = tracked_persist(rk)   # four cut filters read it
    sizes = rk.sparkSession.createDataFrame(
        [(100,), (1000,), (10000,), (100000,)], ["vocab_size"])
    return (rk.crossJoin(F.broadcast(sizes))
            .filter(F.col("rnk") <= F.col("vocab_size"))
            .groupBy("vocab_size")
            .agg(F.max(F.when(F.col("rnk") <= F.col("vocab_size"),
                              F.col("cum"))).alias("covered_tokens"),
                 F.max("total").alias("total_tokens"))
            .select(F.col("vocab_size").cast("long").alias("vocab_size"),
                    "covered_tokens", "total_tokens",
                    (F.col("covered_tokens").cast("double")
                     / F.col("total_tokens").cast("double"))
                    .alias("coverage")))
