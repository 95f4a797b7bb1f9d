"""WebP lossless (VP8L) codec tests (round 5) — round trips through our
own encoder with every stream feature switched on individually and in
combination (prefix-code variants, LZ77 + neighborhood distances, color
cache, meta-prefix groups, all four transforms incl. sub-byte palette
bundling), plus container/corruption behavior: lossy VP8 and animation
refuse with ``NotImplementedError``; corrupt bytes always normalize to
``ValueError`` (the ADVICE-r4 KeyError lesson, applied from the start).

Reference parity note: the reference repo is text-only; this backs the
north rule's multimodal axis (SURVEY §2 A8 image integrity, §2.9
generators) — decoded-pixel verification over binary image columns.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pii_redactor_spark.fixtures.codecs import decode_image, psnr
from pii_redactor_spark.fixtures.webp import (
    _DIST_MAP,
    _plane_code_to_distance,
    _prefix_token,
    _prefix_value,
    decode_webp,
    decode_webp_frames,
    encode_webp,
    encode_webp_animation,
)

RNG = np.random.default_rng(20260818)


def _rgb(h, w, rng=RNG):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _paletted(h, w, ncolors, rng=RNG):
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncolors, (h, w))]


def _runny(rng=RNG):
    """Blocky content with long horizontal + vertical runs for LZ77."""
    base = rng.integers(0, 256, (8, 4, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 8, axis=1), 4, axis=0)


# --------------------------------------------------------------------------
# round trips (VP8L is lossless: every one must be byte-exact)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (3, 7), (16, 16), (33, 29),
                                   (64, 64)])
def test_roundtrip_plain(shape):
    img = _rgb(*shape)
    out = decode_webp(encode_webp(img))
    assert np.array_equal(out, img)
    assert psnr(out, img) == float("inf")


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_every_predictor_mode(mode):
    # 33x29 makes block edges, first row/column, and the rightmost
    # column's top-right wraparound all non-trivial
    img = _rgb(33, 29)
    out = decode_webp(encode_webp(img, predictor=mode))
    assert np.array_equal(out, img)


def test_roundtrip_subtract_green_and_color_transform():
    img = _rgb(32, 32)
    assert np.array_equal(
        decode_webp(encode_webp(img, subtract_green=True)), img)
    # color-transform deltas are signed int8 semantics: exercise both signs
    for cte in ((13, 250, 7), (255, 1, 128), (0, 0, 0)):
        assert np.array_equal(
            decode_webp(encode_webp(img, color_transform=cte)), img)


def test_roundtrip_color_cache_and_lz77():
    img = _runny()
    for kw in (dict(cache_bits=1), dict(cache_bits=6), dict(cache_bits=11),
               dict(lz77=True), dict(lz77=True, cache_bits=4)):
        assert np.array_equal(decode_webp(encode_webp(img, **kw)), img), kw


def test_roundtrip_meta_prefix_groups():
    img = _rgb(32, 32)
    for groups in (2, 3, 5):
        assert np.array_equal(
            decode_webp(encode_webp(img, groups=groups)), img)


@pytest.mark.parametrize("ncolors", [2, 4, 13, 64, 250])
def test_roundtrip_palette_all_bundling_widths(ncolors):
    # 2 -> 8px/byte, 4 -> 4px/byte, 13 -> 2px/byte, 64/250 -> unbundled;
    # width 37 is deliberately not a multiple of any bundle size
    img = _paletted(21, 37, ncolors)
    assert np.array_equal(decode_webp(encode_webp(img, palette=True)), img)
    assert np.array_equal(
        decode_webp(encode_webp(img, palette=True, lz77=True)), img)


def test_roundtrip_feature_combination():
    img = _runny()
    data = encode_webp(img, subtract_green=True, predictor=11,
                       cache_bits=4, lz77=True, groups=2)
    assert np.array_equal(decode_webp(data), img)


def test_roundtrip_degenerate_codes():
    # solid color: single-symbol (zero-bit) codes on every channel
    solid = np.full((16, 16, 3), 123, np.uint8)
    assert np.array_equal(decode_webp(encode_webp(solid)), solid)
    # grayscale: r == g == b correlations
    gray = np.repeat(_rgb(16, 16)[:, :, :1], 3, axis=2)
    assert np.array_equal(decode_webp(encode_webp(gray)), gray)
    # two-color checkerboard: simple two-symbol codes
    checker = np.zeros((9, 9, 3), np.uint8)
    checker[(np.indices((9, 9)).sum(axis=0) % 2) == 1] = 255
    assert np.array_equal(decode_webp(encode_webp(checker)), checker)


def test_decode_image_dispatch():
    img = _paletted(24, 24, 16)
    assert np.array_equal(
        decode_image(encode_webp(img, palette=True), "webp"), img)


# --------------------------------------------------------------------------
# the LZ77 machinery itself
# --------------------------------------------------------------------------


def test_prefix_token_value_inverse():
    class FakeBR:
        def __init__(self, payload):
            self.payload = payload

        def read(self, n):
            assert n >= 0
            return self.payload & ((1 << n) - 1)

    for value in list(range(1, 70)) + [127, 128, 1000, 4096]:
        code, payload, bits = _prefix_token(value)
        assert 0 <= code < 40
        assert payload < (1 << bits) if bits else payload == 0
        assert _prefix_value(FakeBR(payload), code) == value


def test_distance_map_matches_published_table():
    # spot rows deeper than the module-level assertion's first 16
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert _DIST_MAP[22] == (0, 4)          # d^2 = 16 block
    assert _DIST_MAP[34] == (0, 5)          # d^2 = 25: y descending
    assert _DIST_MAP[35] == (3, 4)
    assert _DIST_MAP[39] == (5, 0)
    assert _DIST_MAP[96] == (8, 0)          # the lone x = 8 on row 0
    assert all(-7 <= x <= 8 and 0 <= y <= 7 for x, y in _DIST_MAP)
    # short distances never map below 1
    assert _plane_code_to_distance(2, 4) == 1    # (-1, 1) on a 2-wide image
    assert _plane_code_to_distance(10, 121) == 1
    assert _plane_code_to_distance(10, 1) == 10  # (0, 1) = one row up


# --------------------------------------------------------------------------
# container + corruption behavior
# --------------------------------------------------------------------------


def _riff(*chunks: tuple[bytes, bytes]) -> bytes:
    body = b"WEBP"
    for tag, payload in chunks:
        body += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_lossy_vp8_refuses_loudly():
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(_riff((b"VP8 ", b"\x00" * 32)))


def test_lossy_animation_refuses_loudly():
    # an ANMF frame whose stream is lossy VP8 refuses; garbage ANMF is
    # a plain parse error
    vp8_frame = (b"\x00" * 16
                 + b"VP8 " + struct.pack("<I", 8) + b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(_riff((b"VP8X", b"\x00" * 10),
                          (b"ANIM", b"\x00" * 6),
                          (b"ANMF", vp8_frame)))
    with pytest.raises(ValueError):
        decode_webp(_riff((b"VP8X", b"\x00" * 10),
                          (b"ANIM", b"\x00" * 6),
                          (b"ANMF", b"\x00" * 40)))


def test_vp8x_wrapped_lossless_decodes():
    img = _rgb(8, 8)
    vp8l = encode_webp(img)
    payload = vp8l[20:]  # strip RIFF/WEBP/VP8L framing down to the stream
    (size,) = struct.unpack("<I", vp8l[16:20])
    assert len(payload) >= size
    data = _riff((b"VP8X", b"\x00" * 10), (b"VP8L", payload[:size]))
    assert np.array_equal(decode_webp(data), img)


def test_not_a_webp():
    with pytest.raises(ValueError):
        decode_webp(b"")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_webp(_riff((b"EXIF", b"\x00" * 4)))  # no image chunk at all


def test_truncation_always_valueerror():
    img = _rgb(24, 24)
    data = encode_webp(img, cache_bits=4, lz77=True)
    for cut in range(12, len(data), 7):
        with pytest.raises(ValueError):
            decode_webp(data[:cut])


def test_bitflip_fuzz_never_raises_foreign_exceptions():
    """Every corrupt stream must decode (harmlessly wrong pixels are fine
    for a damaged-but-parseable stream) or raise ValueError — never
    KeyError/IndexError/struct.error, which would crash the Spark task
    instead of hitting the poison-row guard."""
    img = _paletted(16, 16, 7)
    data = bytearray(encode_webp(img, palette=True, lz77=True))
    rng = np.random.default_rng(99)
    for _ in range(300):
        i = int(rng.integers(12, len(data)))
        bit = 1 << int(rng.integers(0, 8))
        data[i] ^= bit
        try:
            decode_webp(bytes(data))
        except ValueError:
            pass
        except NotImplementedError:
            pass
        finally:
            data[i] ^= bit


def test_dimension_limits():
    with pytest.raises(ValueError):
        encode_webp(np.zeros((0, 4, 3), np.uint8))


# --------------------------------------------------------------------------
# animated lossless WebP (VP8X/ANIM/ANMF)
# --------------------------------------------------------------------------


def test_animation_roundtrip_full_canvas():
    frames = [_rgb(12, 18, np.random.default_rng(i)) for i in range(5)]
    data = encode_webp_animation(frames, duration_ms=40)
    got = decode_webp_frames(data)
    assert len(got) == 5
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)
    # decode_webp on an animation shows the first frame (GIF parity)
    assert np.array_equal(decode_webp(data), frames[0])


def test_animation_subrect_compositing():
    """Frame 2 paints only a 4x6 patch at (2, 4); the viewer-shown frame
    is frame 1 with the patch overwritten."""
    base = _rgb(10, 10, np.random.default_rng(0))
    patch = _rgb(4, 6, np.random.default_rng(1))
    data = encode_webp_animation(
        [base, patch], offsets=[(0, 0), (4, 2)], canvas=(10, 10))
    got = decode_webp_frames(data)
    assert np.array_equal(got[0], base)
    expect = base.copy()
    expect[2:6, 4:10] = patch
    assert np.array_equal(got[1], expect)


def test_animation_dispose_to_background():
    """With dispose-to-background, frame N+1 composites over the disposed
    (background-filled) rectangle, not over frame N's pixels."""
    f0 = np.full((8, 8, 3), 200, np.uint8)
    f1 = np.full((4, 4, 3), 50, np.uint8)
    data = encode_webp_animation(
        [f0, f1, f1], offsets=[(0, 0), (0, 0), (4, 4)], canvas=(8, 8),
        dispose_to_background=True)
    got = decode_webp_frames(data)
    assert np.array_equal(got[0], f0)               # shown before disposal
    # frame 1: whole canvas was disposed to background (black) after f0
    expect1 = np.zeros((8, 8, 3), np.uint8)
    expect1[0:4, 0:4] = 50
    assert np.array_equal(got[1], expect1)
    # frame 2: f1's rect was disposed, then drawn at (4, 4)
    expect2 = np.zeros((8, 8, 3), np.uint8)
    expect2[4:8, 4:8] = 50
    assert np.array_equal(got[2], expect2)


def test_animation_odd_offset_rejected():
    with pytest.raises(ValueError, match="even"):
        encode_webp_animation(
            [np.zeros((4, 4, 3), np.uint8)] * 2,
            offsets=[(0, 0), (1, 0)], canvas=(8, 8))


def test_static_decode_webp_frames_single():
    img = _rgb(9, 9)
    frames = decode_webp_frames(encode_webp(img))
    assert len(frames) == 1 and np.array_equal(frames[0], img)


# --------------------------------------------------------------------------
# Spark-side plumbing: webp rows flow through the batch decode operator
# --------------------------------------------------------------------------


def test_sample_frames_animated_webp(spark):
    """Animated lossless WebP samples every Nth composited frame as PNG,
    mirroring the GIF path (a composited frame has no standalone byte
    representation inside the container)."""
    from pii_redactor_spark.fixtures.codecs import decode_png
    from pii_redactor_spark.operators.vision import sample_frames

    frames = [_rgb(12, 18, np.random.default_rng(i)) for i in range(7)]
    data = encode_webp_animation(frames)
    vids = spark.createDataFrame(
        [("vw", bytearray(data), "webp")],
        "video_id string, bytes binary, fmt string",
    )
    rows = sorted(sample_frames(vids, every_n=3).collect(),
                  key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in rows] == [0, 3, 6]
    for r in rows:
        assert (r["h"], r["w"]) == (12, 18)
        assert np.array_equal(decode_png(bytes(r["bytes"])),
                              frames[r["frame_no"]])


def test_decode_stats_webp_rows(spark):
    from pii_redactor_spark.fixtures.codecs import phash64
    from pii_redactor_spark.operators.vision import decode_stats

    rows = []
    for i in range(6):
        px = _paletted(16, 16, 11, np.random.default_rng(i))
        rows.append((f"w{i}", bytearray(encode_webp(px, palette=True)),
                     "webp", phash64(px)))
    rows.append(("poison", bytearray(b"RIFF\x00\x00\x00\x00WEBPVP8 "),
                 "webp", 0))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, phash long")
    got = {r["image_id"]: r for r in decode_stats(df).collect()}
    assert sum(1 for r in got.values() if r["decoded"]) == 6
    assert not got["poison"]["decoded"]
    for i in range(6):
        r = got[f"w{i}"]
        assert r["w"] == 16 and r["h"] == 16
        assert r["phash_dist"] == 0      # lossless: phash recomputes exactly
        assert r["phash_check"]
