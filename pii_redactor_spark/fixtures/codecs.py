"""Minimal image codecs + perceptual hash — stdlib/NumPy only.

No image library (PIL/opencv) exists in this environment, so:

* **PNG**: a real, spec-compliant encoder/decoder for 8-bit RGB with filter
  type 0 (the only filter this engine emits).  Output opens in any PNG viewer;
  the decoder handles the engine's own files and raises for foreign filters.
* **jpeg**: a REAL baseline JFIF encoder/decoder (round 4 — see
  ``fixtures/jpeg.py``): BT.601 YCbCr, 8x8 DCT, Annex-K quant/Huffman
  tables, byte stuffing; output opens in any external viewer.  Quality 98
  measures >= 43 dB PSNR on the worst case (uniform noise), clearing the
  PSNR>=40 lossy gate.  Progressive (SOF2) streams decode too since
  round 5.  The pre-round-4 fake (``LQI1``) remains decodable so old
  cached fixtures stay readable; hierarchical/arithmetic foreign JPEGs
  raise ``NotImplementedError`` loudly.
* **gif** (round 5): a real GIF89a codec (``fixtures/gif.py``) — full LZW
  with growing code widths and deferred clear, 4-pass interlacing,
  transparency, sub-rectangle frames, disposal methods, animation.
  Paletted content (<= 256 unique colors) round-trips byte-exact.
* **webp** (round 5): a real VP8L lossless codec (``fixtures/webp.py``) —
  canonical prefix codes, LZ77 with the 2D distance neighborhood, color
  cache, meta-prefix groups, and all four transforms (predictor, color,
  subtract-green, palette with sub-byte bundling).  Round-trips any RGB
  image byte-exact; lossy VP8 and animation refuse loudly.
* **phash**: 64-bit average-hash of the decoded pixels (8x8 block means
  thresholded at their mean), matching the input_hint's ``phash:int64``.

The pipeline itself must never re-encode pixels (BASELINE.md image-integrity
gate); these codecs exist for fixture generation and for the integrity tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 pixels as a truecolor PNG (filter 0, lossless)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`encode_png` (8-bit RGB, filter 0)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise NotImplementedError(
                    "engine PNGs are 8-bit RGB; foreign PNGs need an image lib"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    rows = raw.reshape(h, w * 3 + 1)
    if (rows[:, 0] != 0).any():
        raise NotImplementedError("only filter type 0 is supported")
    return rows[:, 1:].reshape(h, w, 3).copy()


_LQI_MAGIC = b"LQI1"
_QSTEP = 5
# Default encode quality for the real JPEG path: 98 measures >= 43 dB
# PSNR even on uniform noise (the worst case), clearing the north rule's
# >= 40 dB lossy gate with margin.
JPEG_QUALITY = 98


def encode_lossy(pixels: np.ndarray, quality: int = JPEG_QUALITY) -> bytes:
    """REAL baseline JFIF encode (round-4; fixtures/jpeg.py) — the LQI1
    fake this replaced remains decodable for old cached fixtures."""
    from .jpeg import encode_jpeg

    return encode_jpeg(pixels, quality)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:4] == _LQI_MAGIC:  # pre-round-4 cached fixtures
        h, w = struct.unpack(">HH", data[4:8])
        quant = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8)
        recon = quant.astype(np.uint16) * _QSTEP + _QSTEP // 2
        return np.clip(recon, 0, 255).astype(np.uint8).reshape(h, w, 3)
    raise ValueError("not a JPEG (or legacy LQI1) payload")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_lossy(data)
    if fmt == "gif":  # round 5: real GIF89a (LZW/interlace/animation)
        from .gif import decode_gif

        return decode_gif(data)
    if fmt == "webp":  # round 5: real VP8L lossless (lossy VP8 refuses)
        from .webp import decode_webp

        return decode_webp(data)
    raise NotImplementedError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit average hash of the pixels, as a signed int64 for Spark."""
    gray = pixels.astype(np.float64).mean(axis=2)
    if gray.shape[0] < 8 or gray.shape[1] < 8:  # tiny rasters: edge-pad
        gray = np.pad(
            gray,
            ((0, max(0, 8 - gray.shape[0])), (0, max(0, 8 - gray.shape[1]))),
            mode="edge",
        )
    h, w = gray.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    value = np.uint64(0)
    for bit in bits:
        value = (value << np.uint64(1)) | np.uint64(bool(bit))
    return int(value.astype(np.int64))


def phash_prefix(phash: int, bits: int = 8) -> int:
    """Partition key: top ``bits`` of the unsigned phash (FIXTURES.md §1)."""
    return (phash & 0xFFFFFFFFFFFFFFFF) >> (64 - bits)
