"""Multimodal-column keys (SURVEY §2.3 extensions; operators/multimodal.py).

``mm_decode_features`` exercises the REAL Arrow/mapInPandas decode
path — Python receives columnar batches of binary payloads — with a
deterministic fake codec, so the DuckDB oracle replays it exactly and
the driver's hash-compare applies to a Pandas-UDF pipeline too.
``mm_frame_sample`` is the JVM-side frame-index explode that feeds a
per-frame decoder. The real codec is stubbed
(operators/multimodal.py::decode_real) pending image/audio libs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import portable_hash_sql
from ..operators.multimodal import (
    audio_resample_meta,
    decode_features,
    frame_sample,
    media_table,
    resize_payloads,
)
from .base import register, t

_H = portable_hash_sql("text")


@register(
    "mm_decode_features",
    oracle=f"""
    SELECT doc_id,
           octet_length(encode(text))            AS n_bytes,
           h % 640 + 1                           AS fake_width,
           h % 480 + 1                           AS fake_height,
           octet_length(encode(text)) // 256 + 1 AS n_frames
    FROM (SELECT doc_id, text, {_H} AS h FROM documents)
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> features through mapInPandas (Arrow batches,
    no per-row Python). The fake codec derives features from payload
    bytes via the portable md5 hash, so this Pandas-UDF pipeline is
    hash-checked against SQL like every JVM-side key."""
    return decode_features(media_table(t(spark, sf_dir, "documents")))


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, frame_idx, frame_idx * 256 AS byte_offset
    FROM (SELECT doc_id,
                 unnest(range(0, octet_length(encode(text)) // 256 + 1, 4))
                   AS frame_idx
          FROM documents)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling: JVM-side sequence+explode produces
    (doc_id, frame_idx, byte_offset) so a frame decoder touches only
    sampled offsets — the explode stays ahead of Python at any scale."""
    return frame_sample(media_table(t(spark, sf_dir, "documents")))


@register(
    "mm_resize",
    oracle="""
    SELECT doc_id, 128 AS out_width, 96 AS out_height,
           -- CASE, not bare least(): DuckDB's least() SKIPS NULL args,
           -- but a NULL payload must resize to NULL bytes, not 12288
           CASE WHEN text IS NULL THEN NULL
                ELSE least(octet_length(encode(text)), 128 * 96)
           END AS out_bytes
    FROM documents
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing: binary -> binary through mapInPandas
    (Arrow batches). The gate checks the metadata columns (the fake
    resampler's byte math is SQL-replayable); the payload_out column
    itself round-trips executor-side only."""
    out = resize_payloads(media_table(t(spark, sf_dir, "documents")),
                          width=128, height=96)
    return out.select("doc_id", "out_width", "out_height", "out_bytes")


@register(
    "mm_audio_resample",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) // 2 AS src_samples,
           (octet_length(encode(text)) // 2) * 16000 // 44100 AS dst_samples,
           44100 AS src_hz, 16000 AS dst_hz
    FROM documents
    """,
)
def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resample metadata (16-bit PCM 44.1k -> 16k): exact integer
    sample math, JVM-side; the heavy resampler drops into the same
    mapInPandas slot as mm_resize when codec libs exist."""
    return audio_resample_meta(media_table(t(spark, sf_dir, "documents")))


@register(
    "mm_exact_dedup",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id, md5(text) AS payload_md5,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ), grp AS (
      SELECT payload_md5,
             CAST(MIN(n_bytes) AS BIGINT) AS n_bytes,
             CAST(COUNT(*) AS BIGINT) AS n_copies,
             CAST(MIN(doc_id) AS BIGINT) AS keeper_id
      FROM sig GROUP BY 1
    )
    SELECT s.doc_id, s.payload_md5, g.n_copies, g.keeper_id,
           CAST(CASE WHEN s.doc_id = g.keeper_id THEN 1 ELSE 0 END
                AS INT) AS is_keeper
    FROM sig s JOIN grp g ON s.payload_md5 = g.payload_md5
    """,
)
def mm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BINARY-payload dedup over the multimodal table — the
    byte-identical tier every media pipeline runs first (re-crawled
    images, re-encoded uploads): md5 of the payload BYTES groups
    copies, smallest doc_id is the keeper. The signature is computed
    on the binary column (the text-bytes stand-in, like every mm_*
    key), so the same plan applies to real image/audio payloads
    unchanged; the oracle replays it as md5 of the identical UTF-8
    bytes.

    100-TB shape: one scan computes 16-byte signatures map-side —
    the shuffle carries (md5, doc_id), never payloads; the group agg
    partial-combines; the membership re-attach is a signature-keyed
    equi-join (nothing broadcast corpus-side)."""
    from ..operators.multimodal import media_table
    from ..operators.cache import tracked_persist

    media = media_table(t(spark, sf_dir, "documents"))
    sig = (media.select("doc_id",
                        F.md5("payload").alias("payload_md5"),
                        "n_bytes"))
    sig = tracked_persist(sig)   # grouped + re-attach sides
    grp = (sig.groupBy("payload_md5")
           .agg(F.min("n_bytes").alias("n_bytes"),
                F.count(F.lit(1)).alias("n_copies"),
                F.min("doc_id").alias("keeper_id")))
    return (sig.select("doc_id", "payload_md5")
            .join(grp.select("payload_md5", "n_copies", "keeper_id"),
                  "payload_md5")
            .select("doc_id", "payload_md5", "n_copies", "keeper_id",
                    F.when(F.col("doc_id") == F.col("keeper_id"), 1)
                    .otherwise(0).cast("int").alias("is_keeper")))
