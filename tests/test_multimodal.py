"""Multimodal plumbing tests: binary schema, Arrow batch shape through
mapInPandas, the deterministic fake codec, and the real-codec stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_automation_spark.operators.multimodal import (
    FRAME_BYTES,
    _fake_decode_one,
    decode_features,
    decode_real,
    frame_sample,
    media_table,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return media_table(docs).cache()


def test_media_schema_binary(media):
    dt = dict(media.dtypes)
    assert dt["payload"] == "binary"
    assert dt["n_bytes"] == "bigint"


def test_decode_matches_reference_impl(media):
    sample = media.orderBy("doc_id").limit(5).collect()
    decoded = {r.doc_id: r for r in decode_features(media).collect()}
    for row in sample:
        want = _fake_decode_one(bytes(row.payload))
        got = decoded[row.doc_id]
        assert (got.n_bytes, got.fake_width, got.fake_height, got.n_frames) == want


def test_decode_runs_in_batches_not_rows(spark, media):
    """mapInPandas must see a handful of Arrow batches, not 500
    single-row calls: count batches via an accumulator."""
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for pdf in batches:
            acc.add(1)
            yield pdf[["doc_id"]]

    media.select("doc_id", "payload").repartition(2).mapInPandas(
        counting, "doc_id bigint"
    ).count()
    assert 0 < acc.value <= 10


def test_frame_sample_offsets(media):
    rows = frame_sample(media).filter(F.col("doc_id") == 0).collect()
    n_bytes = media.filter(F.col("doc_id") == 0).head().n_bytes
    n_frames = n_bytes // FRAME_BYTES + 1
    assert [r.frame_idx for r in rows] == list(range(0, n_frames, 4))
    assert all(r.byte_offset == r.frame_idx * FRAME_BYTES for r in rows)


def test_real_decode_decodes_actual_images():
    """The real tier decodes ACTUAL image bytes in every environment:
    PIL when shipped, else the vendored stdlib PNG codec
    (operators/_png.py) — no skip. And without ANY codec (a future
    slimmed build, simulated by monkeypatching the resolver) it must
    fail loudly, never return a silent fake result."""
    import io

    from lakehouse_automation_spark.operators import multimodal

    codec = multimodal._image_codec()
    buf = io.BytesIO()
    codec.new("RGB", (12, 7)).save(buf, format="PNG")
    got = decode_real(buf.getvalue())
    assert (got["width"], got["height"], got["mode"]) == (12, 7, "RGB")


def test_real_decode_fails_loudly_without_any_codec(monkeypatch):
    from lakehouse_automation_spark.operators import multimodal

    monkeypatch.setattr(multimodal, "_image_codec", lambda: None)
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"\x89PNG...")


def _png_bytes(w, h):
    import io

    from lakehouse_automation_spark.operators.multimodal import _image_codec

    buf = io.BytesIO()
    _image_codec().new("RGB", (w, h)).save(buf, format="PNG")
    return buf.getvalue()


def test_real_decode_features_end_to_end(spark):
    """The Arrow-batched real-decode path must produce per-payload
    image headers through mapInPandas (un-gated in round 9: the
    vendored PNG codec replaced the PIL skip; executors resolve the
    same codec per task)."""
    from lakehouse_automation_spark.operators.multimodal import decode_features_real

    media = spark.createDataFrame(
        [(0, _png_bytes(8, 4)), (1, _png_bytes(3, 9)), (2, None)],
        "doc_id bigint, payload binary"
    )
    rows = {r.doc_id: r for r in decode_features_real(media).collect()}
    assert (rows[0].width, rows[0].height) == (8, 4)
    assert (rows[1].width, rows[1].height) == (3, 9)
    assert rows[2].width is None  # NULL payload -> NULL features


def test_real_decode_verification_tier_is_explicit(spark):
    """ADVICE r10: the pixel-verification tier must be an explicit
    opt-in, not an inherited downgrade. A PNG whose chunk CRCs are all
    valid but whose deflate stream is semantically SHORT (inflates to
    1 B where the IHDR promises 6 B) passes the default METADATA tier
    — read_header never inflates pixels — but must raise executor-side
    under decode_features_real(..., full=True), the round-9 contract."""
    import io
    import struct
    import zlib

    from lakehouse_automation_spark.operators import _png
    from lakehouse_automation_spark.operators.multimodal import (
        decode_features_real)

    buf = io.BytesIO()
    buf.write(b"\x89PNG\r\n\x1a\n")
    _png._write_chunk(buf, b"IHDR",
                      struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
    _png._write_chunk(buf, b"IDAT", zlib.compress(b"\x00"))  # 1 B != 6 B
    _png._write_chunk(buf, b"IEND", b"")
    sly = buf.getvalue()

    media = spark.createDataFrame([(0, sly)],
                                  "doc_id bigint, payload binary")
    rows = decode_features_real(media).collect()  # metadata tier: passes
    assert (rows[0].width, rows[0].height) == (2, 2)
    with pytest.raises(Exception, match="inflates|expected"):
        decode_features_real(media, full=True).collect()
