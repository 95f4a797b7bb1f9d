"""GIF89a codec tests (round 5) — round trips through our own encoder
plus HAND-ASSEMBLED streams (sub-rectangle frames, transparency,
disposal methods, deferred-clear LZW) for the decoder paths a viewer
needs but our encoder never emits, mirroring the progressive-JPEG
restart-marker test strategy.

Reference parity note: the reference repo is text-only; this backs the
north rule's multimodal axis (SURVEY §2 A8 image integrity, §2.9
generators) — decoded-pixel verification over binary image columns.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pii_redactor_spark.fixtures.gif import (
    _color_table_bytes,
    _lzw_compress,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
)

RNG = np.random.default_rng(20260818)


def _paletted(h, w, ncolors, rng=RNG):
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncolors, (h, w))]


# --------------------------------------------------------------------------
# round trips through our encoder
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shape,ncolors", [
    ((48, 37), 64),    # odd width: sub-block + bit-packing edges
    ((9, 2), 2),       # min-code-size floor (spec says mcs >= 2)
    ((5, 5), 1),       # single-color: palette padded to 2 entries
    ((31, 63), 250),   # palette just under the 256 limit, 8-bit codes
])
def test_roundtrip_exact_paletted(shape, ncolors):
    img = _paletted(*shape, ncolors)
    out = decode_gif(encode_gif(img))
    assert np.array_equal(out, img)  # GIF is lossless for paletted content


def test_roundtrip_interlaced():
    for h in (8, 9, 3, 17):  # heights exercising all four interlace passes
        img = _paletted(h, 21, 32)
        out = decode_gif(encode_gif(img, interlace=True))
        assert np.array_equal(out, img)


def test_roundtrip_code_width_growth_and_clear_reset():
    # 128x128 of 256-color noise forces codes through every width 9..12
    # and past 4096 table entries, so the encoder's CLEAR-reset path runs.
    img = _paletted(128, 128, 256)
    data = encode_gif(img)
    assert np.array_equal(decode_gif(data), img)


def test_quantization_bound_above_256_colors():
    # >256 unique colors -> uniform 6x7x6 palette; cell-center quantization
    # bounds the per-channel error at half a cell (22 for R/B, 19 for G).
    img = RNG.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    out = decode_gif(encode_gif(img))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err[:, :, 0].max() <= 22
    assert err[:, :, 1].max() <= 19
    assert err[:, :, 2].max() <= 22


def test_animation_roundtrip_and_netscape_loop():
    frames = [_paletted(20, 24, 64) for _ in range(5)]
    data = encode_gif_animation(frames, delay_cs=5, loop=3)
    assert b"NETSCAPE2.0" in data
    dec = decode_gif_frames(data)
    assert len(dec) == 5
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    # loop=None omits the application extension entirely
    assert b"NETSCAPE2.0" not in encode_gif_animation(frames, loop=None)


def test_animation_local_color_tables():
    # second frame's palette differs -> carried as a local color table
    f1 = _paletted(16, 16, 16)
    f2 = 255 - f1
    dec = decode_gif_frames(encode_gif_animation([f1, f2]))
    assert np.array_equal(dec[0], f1)
    assert np.array_equal(dec[1], f2)


def test_decode_image_dispatch_and_phash():
    from pii_redactor_spark.fixtures.codecs import decode_image, phash64

    img = _paletted(32, 32, 64)
    out = decode_image(encode_gif(img), "gif")
    assert np.array_equal(out, img)
    assert phash64(out) == phash64(img)  # lossless => identical phash


# --------------------------------------------------------------------------
# hand-assembled streams: decoder paths our encoder never emits
# --------------------------------------------------------------------------


def _assemble(
    sw, sh, gct, frames, *, bg_index=0, trailer=True
) -> bytes:
    """Build a GIF89a stream from module primitives: ``frames`` is a list
    of dicts with keys left/top/indices (2-D), optional palette (local
    color table), transparent, disposal, delay_cs."""
    table, size_field = _color_table_bytes(gct)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | size_field, bg_index, 0)
    out += table
    for fr in frames:
        transparent = fr.get("transparent")
        disposal = fr.get("disposal", 0)
        if transparent is not None or "delay_cs" in fr or disposal:
            packed = (disposal & 0x7) << 2
            tix = 0
            if transparent is not None:
                packed |= 1
                tix = transparent
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", packed, fr.get("delay_cs", 0), tix
            ) + b"\x00"
        idx = np.asarray(fr["indices"], dtype=np.uint8)
        h, w = idx.shape
        lct = fr.get("palette")
        desc = 0
        lct_bytes = b""
        pal = lct if lct is not None else gct
        if lct is not None:
            lct_bytes, lsize = _color_table_bytes(lct)
            desc |= 0x80 | lsize
        out += b"\x2c" + struct.pack(
            "<HHHHB", fr["left"], fr["top"], w, h, desc
        ) + lct_bytes
        mcs = max(2, (max(len(pal), 2) - 1).bit_length())
        out.append(mcs)
        comp = _lzw_compress(idx.reshape(-1), mcs)
        for i in range(0, len(comp), 255):
            chunk = comp[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    if trailer:
        out.append(0x3B)
    return bytes(out)


_PAL4 = np.array(
    [[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], dtype=np.uint8
)


def test_subrectangle_frame_composites_over_previous():
    base = np.zeros((8, 8), dtype=np.uint8)
    patch = np.full((3, 4), 2, dtype=np.uint8)
    data = _assemble(8, 8, _PAL4, [
        {"left": 0, "top": 0, "indices": base},
        {"left": 2, "top": 3, "indices": patch, "delay_cs": 5},
    ])
    dec = decode_gif_frames(data)
    expect = _PAL4[base].copy()
    assert np.array_equal(dec[0], expect)
    expect[3:6, 2:6] = _PAL4[2]
    assert np.array_equal(dec[1], expect)


def test_transparent_index_shows_previous_pixels():
    base = np.full((6, 6), 1, dtype=np.uint8)
    patch = np.array([[3, 0], [0, 3]], dtype=np.uint8)  # 0 = transparent
    data = _assemble(6, 6, _PAL4, [
        {"left": 0, "top": 0, "indices": base},
        {"left": 1, "top": 1, "indices": patch, "transparent": 0,
         "delay_cs": 1},
    ])
    dec = decode_gif_frames(data)
    expect = _PAL4[base].copy()
    expect[1, 1] = _PAL4[3]
    expect[2, 2] = _PAL4[3]  # transparent cells keep the frame-1 pixels
    assert np.array_equal(dec[1], expect)


def test_disposal_restore_background_and_previous():
    base = np.full((5, 5), 1, dtype=np.uint8)
    dot = np.full((2, 2), 2, dtype=np.uint8)
    tail = np.full((1, 1), 3, dtype=np.uint8)
    # disposal=2: after frame 2 the dot's region resets to the background
    # color; disposal=3: after frame 2 the whole canvas restores to frame 1.
    for disposal, patch_expected in ((2, _PAL4[0]), (3, _PAL4[1])):
        data = _assemble(5, 5, _PAL4, [
            {"left": 0, "top": 0, "indices": base},
            {"left": 1, "top": 1, "indices": dot, "disposal": disposal,
             "delay_cs": 1},
            {"left": 4, "top": 4, "indices": tail, "delay_cs": 1},
        ])
        dec = decode_gif_frames(data)
        assert np.array_equal(dec[1][1:3, 1:3], np.tile(_PAL4[2], (2, 2, 1)))
        expect = _PAL4[base].copy()
        expect[1:3, 1:3] = patch_expected
        expect[4, 4] = _PAL4[3]
        assert np.array_equal(dec[2], expect)


def test_foreign_extensions_are_skipped():
    img = _paletted(7, 9, 8)
    data = encode_gif(img)
    # splice a comment extension and an unknown application extension
    # between the color table and the image descriptor
    cut = data.index(b"\x2c")
    comment = b"\x21\xfe\x05hello\x00"
    foreign = b"\x21\xff\x0bFOREIGNAPP0\x04\xde\xad\xbe\xef\x00"
    spliced = data[:cut] + comment + foreign + data[cut:]
    assert np.array_equal(decode_gif(spliced), img)


def test_deferred_clear_stream():
    # Foreign encoders may let the table fill at 4096 and keep emitting
    # 12-bit codes without a CLEAR; our decoder must keep decoding with
    # the frozen table.  Build such a stream with a no-reset compressor.
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, (96, 96), dtype=np.uint8).reshape(-1)
    clear, eoi = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table, next_code, width = {}, eoi + 1, 9
    emit(clear, width)
    prev = int(idx[0])
    for k in idx[1:].tolist():
        e = table.get((prev, k))
        if e is not None:
            prev = e
            continue
        emit(prev, width)
        if next_code < 4096:  # table full -> just stop adding (deferred)
            table[(prev, k)] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        prev = k
    emit(prev, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    assert next_code == 4096  # the stream really did saturate the table

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    gct, size_field = _color_table_bytes(pal)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 96, 96, 0x80 | size_field, 0, 0)
    gif += gct
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 96, 96, 0) + b"\x08"
    comp = bytes(out)
    for i in range(0, len(comp), 255):
        chunk = comp[i:i + 255]
        gif.append(len(chunk))
        gif += chunk
    gif += b"\x00\x3b"
    assert np.array_equal(decode_gif(bytes(gif)), pal[idx.reshape(96, 96)])


# --------------------------------------------------------------------------
# corruption: everything normalizes to ValueError
# --------------------------------------------------------------------------


def test_corruption_normalizes_to_valueerror():
    img = _paletted(24, 24, 32)
    data = encode_gif(img)
    sos = data.index(b"\x2c")
    cases = [
        b"",                          # empty
        b"NOTAGIF",                   # bad signature
        data[:13],                    # truncated global color table
        data[:20],                    # mid-color-table
        data[:sos + 5],               # truncated image descriptor
        data[:len(data) // 2],        # mid-LZW-stream
        data[:sos] + b"\x7f" + data[sos + 1:],  # unknown block type
    ]
    for bad in cases:
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_truncated_animation_raises_but_complete_first_frame_decodes():
    frames = [_paletted(12, 12, 16) for _ in range(3)]
    data = encode_gif_animation(frames)
    # dropping the trailer: decode_gif (viewer semantics — first frame is
    # intact) succeeds; decode_gif_frames refuses the partial animation
    assert np.array_equal(decode_gif(data[:-1]), frames[0])
    with pytest.raises(ValueError):
        decode_gif_frames(data[:-1])


def test_lzw_code_beyond_table_raises():
    img = _paletted(8, 8, 4)
    data = bytearray(encode_gif(img))
    # corrupt the first LZW data byte to an out-of-range code pattern
    pos = data.index(b"\x2c") + 10 + 2  # descriptor + mcs + subblock len
    data[pos] = 0xFF
    data[pos + 1] = 0xFF
    with pytest.raises(ValueError):
        decode_gif(bytes(data))


# --------------------------------------------------------------------------
# Spark operator: animated-GIF frame sampling
# --------------------------------------------------------------------------


def test_sample_frames_gif(spark):
    from pii_redactor_spark.fixtures.codecs import decode_png
    from pii_redactor_spark.operators.vision import sample_frames

    frames = [_paletted(16, 12, 32) for _ in range(7)]
    anim = encode_gif_animation(frames, delay_cs=4)
    df = spark.createDataFrame(
        [("g1", bytearray(anim), "gif")], "video_id string, bytes binary, fmt string"
    )
    rows = sample_frames(df, every_n=3).orderBy("frame_no").collect()
    assert [r.frame_no for r in rows] == [0, 3, 6]
    for r in rows:
        assert (r.w, r.h) == (12, 16)
        # sampled frames re-encode as lossless PNG of the composited frame
        assert np.array_equal(decode_png(bytes(r.bytes)), frames[r.frame_no])


def test_sample_frames_foreign_codec_still_refuses(spark):
    from pii_redactor_spark.operators.vision import sample_frames

    df = spark.createDataFrame(
        [("v1", bytearray(b"\x00\x00\x00\x20ftypisom"), "mp4")],
        "video_id string, bytes binary, fmt string",
    )
    with pytest.raises(Exception, match="ffmpeg|NotImplementedError"):
        sample_frames(df, every_n=2).collect()
