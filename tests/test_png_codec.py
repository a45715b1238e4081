"""Unit tests for the vendored pure-stdlib PNG codec
(operators/_png.py): encode/decode round-trips, all five inverse
scanline filters against an independently computed forward filter,
and loud failure on every corruption class a real payload stream
contains. If PIL is ever installed it cross-checks the vendored
encoder's output against PIL's decoder."""

from __future__ import annotations

import io
import struct
import zlib

import pytest

from lakehouse_automation_spark.operators import _png


def _rt(img):
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    buf.seek(0)
    return _png.open(buf)


@pytest.mark.parametrize("mode,channels", [("L", 1), ("LA", 2),
                                           ("RGB", 3), ("RGBA", 4)])
def test_roundtrip_preserves_pixels_every_mode(mode, channels):
    w, h = 5, 3
    pixels = bytes(range(w * h * channels))
    back = _rt(_png.PngImage(w, h, mode, pixels))
    assert (back.width, back.height, back.mode) == (w, h, mode)
    assert back.pixels == pixels


def _forward_filter(ftype, line, prev, bpp):
    """Spec §6 forward direction, written independently of the
    decoder's inverse (the test's reference implementation)."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_inverse_filters_recover_forward_filtered_scanlines(ftype):
    """Hand-build an IDAT whose every scanline uses filter ``ftype``
    and check the decoder reconstructs the original pixels."""
    w, h, bpp = 4, 3, 3  # RGB
    stride = w * bpp
    pixels = bytes((7 * i + 3) % 256 for i in range(stride * h))
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = pixels[y * stride:(y + 1) * stride]
        raw += bytes([ftype]) + _forward_filter(ftype, line, prev, bpp)
        prev = line
    buf = io.BytesIO()
    buf.write(b"\x89PNG\r\n\x1a\n")
    _png._write_chunk(buf, b"IHDR",
                      struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    _png._write_chunk(buf, b"IDAT", zlib.compress(bytes(raw)))
    _png._write_chunk(buf, b"IEND", b"")
    buf.seek(0)
    assert _png.open(buf).pixels == pixels


def test_corruption_raises_not_garbage():
    buf = io.BytesIO()
    _png.new("RGB", (6, 6), color=9).save(buf, format="PNG")
    good = buf.getvalue()

    with pytest.raises(ValueError, match="signature"):
        _png.open(io.BytesIO(b"GIF89a" + good[6:]))
    flipped = bytearray(good)
    flipped[40] ^= 0xFF  # inside IDAT body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        _png.open(io.BytesIO(bytes(flipped)))
    with pytest.raises(ValueError, match="truncated|IEND"):
        _png.open(io.BytesIO(good[:30]))
    # IHDR lies about the height -> inflated size check trips
    lying = bytearray(good)
    struct.pack_into(">I", lying, 8 + 8 + 4, 99)  # height field
    body = bytes(lying[16:16 + 13])
    struct.pack_into(">I", lying, 16 + 13,
                     zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="inflates"):
        _png.open(io.BytesIO(bytes(lying)))


def test_decompression_bomb_raises_before_allocating():
    """A tiny payload whose deflate stream inflates far past the
    IHDR-derived size must raise — not allocate executor memory. The
    bounded inflate caps allocation at expected+1 bytes."""
    buf = io.BytesIO()
    buf.write(b"\x89PNG\r\n\x1a\n")
    _png._write_chunk(buf, b"IHDR",
                      struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
    _png._write_chunk(buf, b"IDAT", zlib.compress(b"\x00" * 10_000_000))
    _png._write_chunk(buf, b"IEND", b"")
    assert len(buf.getvalue()) < 20_000  # ~1000:1 crafted ratio
    buf.seek(0)
    with pytest.raises(ValueError, match="bomb"):
        _png.open(buf)


def test_absurd_ihdr_dimensions_hit_size_ceiling():
    buf = io.BytesIO()
    buf.write(b"\x89PNG\r\n\x1a\n")
    _png._write_chunk(buf, b"IHDR",
                      struct.pack(">IIBBBBB", 60_000, 60_000, 8, 6, 0, 0, 0))
    _png._write_chunk(buf, b"IDAT", zlib.compress(b"\x00"))
    _png._write_chunk(buf, b"IEND", b"")
    buf.seek(0)
    with pytest.raises(ValueError, match="ceiling"):
        _png.open(buf)


def test_read_header_fast_path_matches_open_and_checks_crcs():
    buf = io.BytesIO()
    _png.new("RGBA", (9, 4), color=3).save(buf, format="PNG")
    good = buf.getvalue()
    assert _png.read_header(io.BytesIO(good)) == (9, 4, "RGBA")
    # the fast path still runs the full structural pass: an IDAT-body
    # bit flip fails its chunk CRC even though pixels are never inflated
    flipped = bytearray(good)
    flipped[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _png.read_header(io.BytesIO(bytes(flipped)))
    with pytest.raises(ValueError, match="signature"):
        _png.read_header(io.BytesIO(b"GIF89a" + good[6:]))


def test_out_of_scope_features_raise_notimplemented():
    def with_ihdr(depth, interlace):
        buf = io.BytesIO()
        buf.write(b"\x89PNG\r\n\x1a\n")
        _png._write_chunk(buf, b"IHDR", struct.pack(
            ">IIBBBBB", 2, 2, depth, 2, 0, 0, interlace))
        _png._write_chunk(buf, b"IDAT", zlib.compress(b"\x00" * 14))
        _png._write_chunk(buf, b"IEND", b"")
        buf.seek(0)
        return buf

    with pytest.raises(NotImplementedError, match="depth"):
        _png.open(with_ihdr(16, 0))
    with pytest.raises(NotImplementedError, match="interlace"):
        _png.open(with_ihdr(8, 1))


def test_crosscheck_against_pil_when_available():
    PIL = pytest.importorskip("PIL.Image")
    buf = io.BytesIO()
    _png.new("RGB", (12, 7), color=5).save(buf, format="PNG")
    buf.seek(0)
    with PIL.open(buf) as img:
        assert (img.width, img.height, img.mode) == (12, 7, "RGB")


def test_truncated_deflate_with_complete_output_still_raises():
    """A deflate stream cut after emitting all expected bytes but
    before its final-block/adler32 trailer must raise: the chunk CRC
    is re-stamped over the truncated body (structurally valid), so
    only the decompressobj eof check can catch it — the contract the
    old whole-buffer zlib.decompress enforced implicitly."""
    buf = io.BytesIO()
    _png.new("RGB", (6, 6), color=9).save(buf, format="PNG")
    good = buf.getvalue()
    # locate the IDAT chunk and cut the last 4 bytes of its body
    # (the zlib adler32 trailer), restamping length + CRC
    pos = good.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", good[pos:pos + 4])
    body = good[pos + 8:pos + 8 + length]
    cut = body[:-4]
    rebuilt = io.BytesIO()
    rebuilt.write(good[:pos])
    _png._write_chunk(rebuilt, b"IDAT", cut)
    rebuilt.write(good[pos + 12 + length:])  # IEND
    out = io.BytesIO(rebuilt.getvalue())
    with pytest.raises(ValueError, match="truncated IDAT deflate"):
        _png.open(out)
