"""Minimal pure-stdlib PNG codec (zlib + struct), written from the
public PNG specification (W3C PNG, RFC 2083): the vendored fallback
that lets the REAL image-decode tier run in runtimes that cannot
``pip install pillow`` (this container: pypi.org unreachable, probed
round 8). It exposes the small PIL-shaped surface the multimodal
operators use — ``open(fp)`` / ``new(mode, size)`` returning an object
with ``width``/``height``/``mode``, context-manager close, and
``save(fp, format="PNG")`` — nothing else.

It is a REAL decoder, not a header sniffer: chunk CRCs are verified,
the IDAT stream is inflated (bounded by the IHDR-derived size, so a
crafted high-ratio deflate stream raises instead of OOMing the
executor), and every scanline is run through the spec's inverse
filters (None/Sub/Up/Average/Paeth), so a truncated or corrupt
payload raises instead of yielding plausible garbage. Scope is
deliberately tight: 8-bit depth, no interlace (Adam7 raises), no
ancillary-chunk interpretation — enough to round-trip the pipeline's
own images and decode well-formed baseline PNGs. ``read_header()``
is the metadata fast path: the same structural/CRC pass without the
pixel inflate+unfilter cost (the per-byte Python loops).

Encoding writes filter-0 scanlines with one zlib IDAT — the simplest
spec-valid stream (any decoder, incl. PIL, reads it back).
"""

from __future__ import annotations

import struct
import zlib
from typing import BinaryIO

_SIG = b"\x89PNG\r\n\x1a\n"
#: IHDR color type -> mode name (PIL-compatible), and channel counts
_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_CHANNELS = {"L": 1, "P": 1, "LA": 2, "RGB": 3, "RGBA": 4}


class PngImage:
    """A decoded (or to-be-encoded) image: dimensions, mode, and raw
    8-bit pixel bytes in scanline order (width * channels per row)."""

    def __init__(self, width: int, height: int, mode: str,
                 pixels: bytes | None = None):
        if mode not in _CHANNELS:
            raise ValueError(f"unsupported mode {mode!r}")
        if width < 1 or height < 1:
            raise ValueError("empty image")
        self.width, self.height, self.mode = width, height, mode
        n = width * height * _CHANNELS[mode]
        self.pixels = bytes(n) if pixels is None else bytes(pixels)
        if len(self.pixels) != n:
            raise ValueError(
                f"pixel buffer {len(self.pixels)} B != {n} B expected "
                f"for {width}x{height} {mode}")

    # the operators use the codec inside ``with codec.open(...) as img``
    def __enter__(self) -> "PngImage":
        return self

    def __exit__(self, *exc) -> None:
        pass

    @property
    def size(self) -> tuple[int, int]:
        return self.width, self.height

    def save(self, fp: BinaryIO, format: str = "PNG") -> None:
        if format.upper() != "PNG":
            raise ValueError("this codec writes PNG only")
        if self.mode == "P":
            raise ValueError("palette encode unsupported (decode-only)")
        color_type = {"L": 0, "LA": 4, "RGB": 2, "RGBA": 6}[self.mode]
        stride = self.width * _CHANNELS[self.mode]
        raw = b"".join(
            b"\x00" + self.pixels[y * stride:(y + 1) * stride]
            for y in range(self.height))
        fp.write(_SIG)
        _write_chunk(fp, b"IHDR", struct.pack(
            ">IIBBBBB", self.width, self.height, 8, color_type, 0, 0, 0))
        _write_chunk(fp, b"IDAT", zlib.compress(raw, 6))
        _write_chunk(fp, b"IEND", b"")


def new(mode: str, size: tuple[int, int], color: int = 0) -> PngImage:
    """PIL-shaped constructor: a solid-``color`` image (one byte value
    replicated across channels — enough for test fixtures)."""
    w, h = size
    return PngImage(w, h, mode,
                    bytes([color & 0xFF]) * (w * h * _CHANNELS[mode]))


#: Hard ceiling on decoded pixel-buffer size (256 MiB). A crafted IHDR
#: claiming absurd dimensions must not turn the bounded inflate below
#: into a multi-GiB allocation; real pipeline images are far smaller.
MAX_DECODED_BYTES = 1 << 28


def _walk_chunks(data: bytes):
    """Shared structural pass for open()/read_header(): verify the
    signature and EVERY chunk CRC, parse + validate IHDR, and return
    ``(width, height, mode, idat_parts, plte)``. Raises ValueError on
    structural corruption, NotImplementedError on out-of-scope spec
    features (16-bit depth, Adam7 interlace) — the same contract on
    both entry points."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte, ended = 8, None, [], None, False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {ctype!r} chunk")
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"IHDR body is {len(body)} B, not 13")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended:
        raise ValueError("missing IHDR or IEND")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad IHDR compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlace not supported")
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} not supported")
    if color_type not in _MODES:
        raise ValueError(f"bad color type {color_type}")
    mode = _MODES[color_type]
    if mode == "P" and plte is None:
        raise ValueError("palette image without PLTE")
    if not idat:
        raise ValueError("no IDAT chunk")
    return width, height, mode, idat, plte


def read_header(fp: BinaryIO) -> tuple[int, int, str]:
    """Metadata fast path: ``(width, height, mode)`` after the full
    structural pass (signature, every chunk CRC incl. IDAT bytes,
    IHDR validation) but WITHOUT inflating or unfiltering pixel data —
    O(payload) CRC instead of seconds of per-byte Python unfiltering.
    It cannot detect a CRC-valid-but-semantically-corrupt deflate
    stream; callers needing pixel-level verification use open()."""
    width, height, mode, _, _ = _walk_chunks(fp.read())
    return width, height, mode


def open(fp: BinaryIO) -> PngImage:  # noqa: A001 — PIL-compatible name
    """Decode a baseline PNG: verify signature + chunk CRCs, inflate
    IDAT (bounded by the IHDR-derived size — a crafted high-ratio
    deflate stream raises instead of exhausting executor memory),
    inverse-filter every scanline. Raises ValueError on any
    structural corruption, NotImplementedError on spec features
    outside this codec's scope (16-bit, interlace)."""
    width, height, mode, idat, _ = _walk_chunks(fp.read())
    bpp = _CHANNELS[mode]
    stride = width * bpp
    expected = (stride + 1) * height
    if expected > MAX_DECODED_BYTES:
        raise ValueError(
            f"{width}x{height} {mode} decodes to {expected} B, over the "
            f"codec's {MAX_DECODED_BYTES} B ceiling")
    # Bounded inflate: never allocate past expected+1 bytes, whatever
    # the deflate stream claims (decompression-bomb guard).
    d = zlib.decompressobj()
    try:
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as e:  # keep the documented ValueError contract
        raise ValueError(f"corrupt IDAT deflate stream: {e}") from e
    if len(raw) > expected or d.unconsumed_tail:
        raise ValueError(
            f"IDAT inflates past the {expected} B expected for "
            f"{width}x{height} {mode} (decompression bomb?)")
    if len(raw) != expected:
        raise ValueError(
            f"IDAT inflates to {len(raw)} B, expected "
            f"{expected} B for {width}x{height} {mode}")
    if not d.eof:
        # the stream produced exactly the expected bytes but never
        # reached its final block / adler32 trailer — a truncated
        # deflate stream must raise (zlib.decompress did; the bounded
        # decompressobj form must keep that contract)
        raise ValueError("truncated IDAT deflate stream (no final "
                         "block/adler32 trailer)")
    return PngImage(width, height, mode,
                    _unfilter(raw, height, stride, bpp))


def _write_chunk(fp: BinaryIO, ctype: bytes, body: bytes) -> None:
    fp.write(struct.pack(">I", len(body)) + ctype + body
             + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytes:
    """Inverse scanline filters, PNG spec §6 (Recon functions)."""
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:                                   # None
            pass
        elif ftype == 1:                                 # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:                                 # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:                                 # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:                                 # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ftype}")
        out += line
        prev = line
    return bytes(out)
