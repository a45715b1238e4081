"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

A training-data lakehouse carries image/audio/video as ``binary``
columns with metadata; the engine's job is schema, partitioning, and
Arrow-batched Python decode — the actual codec is a library call. The
container ships no image/audio libs, so the real tier resolves PIL
when present and otherwise the vendored pure-stdlib PNG codec
(operators/_png.py) — real decoding either way (PNG-only in the
vendored tier; audio still has no real tier, soundfile being
unvendorable). The Spark-side plumbing — binary column, mapInPandas
signature, Arrow batch shape, deterministic fake decode — is real and
fully tested independent of codec.

The fake decode derives every feature from the payload bytes alone
(md5-based, same portable hash as operators/dedup.py), so a DuckDB
oracle can replay it and the driver's hash-compare stays exact.

Scale notes: payloads never cross the driver; mapInPandas streams
Arrow batches executor-side, and ``spark.sql.execution.arrow
.maxRecordsPerBatch`` bounds batch memory. Partition by a content-hash
bucket of the payload for even sizes (payload skew, not row skew, is
what kills multimodal jobs).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

FRAME_BYTES = 256          # fake codec: one "frame" per 256 payload bytes
FRAME_STRIDE = 4           # sample every 4th frame

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, fake_width bigint, fake_height bigint, "
    "n_frames bigint"
)


def media_table(docs: DataFrame) -> DataFrame:
    """documents -> a multimodal table: (doc_id, payload: binary,
    media_type, n_bytes). Text bytes stand in for image bytes — the
    schema and everything downstream is payload-agnostic."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


def _fake_decode_one(
    payload: bytes | None,
) -> tuple[int | None, int | None, int | None, int | None]:
    """Deterministic fake codec: features from the payload bytes only.
    Same 60-bit md5 hash as the SQL engines compute. A NULL payload
    (absent/corrupt media — routine at ingest scale) decodes to NULL
    features, never a stage-killing exception; the oracle's
    octet_length(NULL)/md5(NULL) propagate the same way."""
    if payload is None:
        return None, None, None, None
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    n_bytes = len(payload)
    return n_bytes, h % 640 + 1, h % 480 + 1, n_bytes // FRAME_BYTES + 1


def _image_codec():
    """Resolve the real image codec. Prefers PIL.Image (full format
    coverage) the moment it lands in the environment; otherwise falls
    back to the vendored pure-stdlib PNG codec (operators/_png.py —
    CRC-checked, inflate + inverse-filter decode, written from the
    public PNG spec because pip install is impossible here, probed
    r8). Both expose the same open()/new()/width/height/mode surface,
    so every real-decode entry point is codec-agnostic."""
    try:
        import PIL.Image
        return PIL.Image
    except ImportError:
        pass
    try:
        from . import _png
        return _png
    except ImportError:  # slimmed build without the vendored codec
        return None


# True whenever ANY real codec resolves — constant-True since the PNG
# codec was vendored (round 9); kept because a slimmed build that
# drops _png.py degrades through the ``codec is None`` guards below
# (the fallback import above returns None instead of failing the
# module import, so that path is actually reachable).
# NOTE: the vendored tier decodes PNG only — a non-PNG payload raises
# ValueError from the decoder (a real decode failure), it does NOT
# fall back to the fake tier; callers wanting the deterministic fake
# features must call decode_features explicitly.
HAS_IMAGE_CODEC = _image_codec() is not None

REAL_DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, mode string"
)


def _decode_with(codec, payload: bytes | None, full: bool = False) -> dict:
    """One payload through an already-resolved codec (batch loops
    resolve the codec once, not per row). A NULL payload decodes to
    NULL features in the REAL tier too — the same absent-media
    contract as the fake tier, at the shared per-payload level so
    every real-decode entry point inherits it. ``full=False`` takes
    the metadata fast path when the codec offers one; ``full=True``
    forces the pixel-level decode (inflate + unfilter in the vendored
    tier) for callers whose point IS pixel verification."""
    import io

    if payload is None:
        return {"n_bytes": None, "width": None, "height": None,
                "mode": None}
    # Metadata fast path: the vendored codec's read_header() runs the
    # full structural/CRC pass without the per-byte unfilter loops —
    # the metadata-only feature extract must not cost a full pixel
    # decode per payload. PIL has no such entry point but its open()
    # is already lazy (header read; pixels decode on .load()).
    read_header = None if full else getattr(codec, "read_header", None)
    if read_header is not None:
        width, height, mode = read_header(io.BytesIO(payload))
        return {"n_bytes": len(payload), "width": width,
                "height": height, "mode": mode}
    with codec.open(io.BytesIO(payload)) as img:
        if full and hasattr(img, "load"):
            img.load()  # PIL: force the lazy pixel decode too
        return {
            "n_bytes": len(payload),
            "width": img.width,
            "height": img.height,
            "mode": img.mode,
        }


def decode_real(payload: bytes) -> dict:
    """Real decode path: the resolved codec (PIL when shipped, else
    the vendored PNG codec) FULLY decodes the actual image — pixel
    inflate + unfilter in the vendored tier, forced .load() under PIL
    — so a CRC-valid-yet-semantically-corrupt deflate stream raises
    here (the per-payload pixel-verification tier;
    decode_features_real is the cheaper metadata tier). Raises
    NotImplementedError only if no codec resolves at all, so callers
    can fall back to the deterministic fake tier (which stays the
    oracle either way)."""
    codec = _image_codec()
    if codec is None:  # unreachable today (_png is vendored); kept so
        # a future slimmed build degrades loudly, not with AttributeError
        raise NotImplementedError(
            "image codec not available in this runtime; "
            "use the deterministic fake decode for plumbing tests"
        )
    return _decode_with(codec, payload, full=True)


def decode_features_real(media: DataFrame, full: bool = False) -> DataFrame:
    """Arrow-batched REAL decode via mapInPandas — same plumbing shape
    as decode_features (the fake/oracle tier), but each payload goes
    through the actual codec (PIL when shipped, else the vendored
    PNG-only codec). The verification tier is an EXPLICIT parameter
    (ADVICE r10 — round 9 decoded pixels unconditionally; round 10
    silently downgraded everyone to metadata-only):

    - ``full=False`` (default) — METADATA tier: a structurally corrupt
      payload (bad signature, truncated chunk, failed CRC — including
      over the IDAT bytes) raises ValueError executor-side, but pixel
      data is never inflated/unfiltered (PIL's open() is equally
      lazy), so a CRC-valid-yet-semantically-corrupt deflate stream
      passes.
    - ``full=True`` — PIXEL-VERIFICATION tier (the round-9 contract):
      every payload is fully inflated + unfiltered (``.load()`` under
      PIL), so semantic deflate corruption raises too, at full decode
      cost per payload.

    The NotImplementedError guard fires only in a build with no codec
    at all."""
    if not HAS_IMAGE_CODEC:
        raise NotImplementedError(
            "decode_features_real requires an image codec (PIL)"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = _image_codec()  # resolved once per task, not per row
        for pdf in batches:
            feats = [_decode_with(codec, p, full=full) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats, columns=["n_bytes", "width", "height", "mode"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return media.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=REAL_DECODE_SCHEMA
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode via mapInPandas: bytes in, features out.

    This is the genuine hot path shape for multimodal work — Python
    only sees columnar Arrow batches, never per-row round trips."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode_one(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats, columns=["n_bytes", "fake_width", "fake_height", "n_frames"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return media.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=DECODE_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id bigint, out_width int, out_height int, out_bytes bigint, "
    "payload_out binary"
)
PCM_BYTES_PER_SAMPLE = 2


def resize_payloads(media: DataFrame, width: int = 128,
                    height: int = 96) -> DataFrame:
    """Image-resize plumbing via mapInPandas: binary in -> binary out
    plus the new dimensions. The fake "resample" keeps a deterministic
    byte slice sized to the target (out = min(n_bytes, width*height)),
    so output metadata is pure arithmetic a SQL oracle replays; swap
    ``_fake_resize_one`` for a PIL call when the runtime ships it.
    Binary payloads stream executor-side in Arrow batches — the shape
    that survives 100 TB of images."""

    def _fake_resize_one(payload: bytes | None) -> bytes | None:
        # NULL payload resizes to NULL, not a crash — absent media is
        # data, and the target dims are still the stage's metadata
        return None if payload is None else payload[: width * height]

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_fake_resize_one(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "out_width": width, "out_height": height,
                "out_bytes": [None if o is None else len(o) for o in out],
                "payload_out": out,
            })

    return media.select("doc_id", "payload").mapInPandas(
        resize_batches, schema=RESIZE_SCHEMA)


def audio_resample_meta(media: DataFrame, src_hz: int = 44_100,
                        dst_hz: int = 16_000) -> DataFrame:
    """Audio-resample metadata, JVM-side: treat the payload as 16-bit
    PCM at ``src_hz`` and compute the sample counts a real resampler
    (soundfile/torchaudio — not in this runtime) would produce. The
    arithmetic is exact integers, so the oracle replays it; the heavy
    branch plugs into the same mapInPandas shape as resize_payloads."""
    n_samples = F.expr(f"n_bytes div {PCM_BYTES_PER_SAMPLE}")
    # all-integer arithmetic (div, not /): bit-identical in DuckDB
    dst = F.expr(f"(n_bytes div {PCM_BYTES_PER_SAMPLE}) * {dst_hz} div {src_hz}")
    return media.select(
        "doc_id",
        n_samples.cast("bigint").alias("src_samples"),
        dst.cast("bigint").alias("dst_samples"),
        F.lit(src_hz).alias("src_hz"),
        F.lit(dst_hz).alias("dst_hz"),
    )


def frame_sample(media: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Sampled frame index table: every ``stride``-th frame with its
    byte offset — the JVM-side companion to a per-frame decode (the
    explode happens before Python ever gets involved, so the decode
    UDF receives exactly the frames it must touch)."""
    n_frames = F.expr(f"n_bytes div {FRAME_BYTES}") + 1
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(stride)))
    return media.select(
        "doc_id", idx.alias("frame_idx")
    ).withColumn("byte_offset", F.col("frame_idx") * FRAME_BYTES)
