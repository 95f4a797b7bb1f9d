"""FLAC codec tests — byte-exact lossless round trips across bit depths
/ channel layouts / stereo decorrelation modes, subframe-type selection,
decoder-only header paths via hand-assembled streams (the technique the
progressive-JPEG restart tests established), loud failures on
corruption, and the Spark cross-container (WAV==FLAC) integration."""

import hashlib
import struct

import numpy as np
import pytest

from pii_redactor_spark.fixtures import flac as F
from pii_redactor_spark.fixtures.flac import (
    decode_flac,
    encode_flac,
    parse_streaminfo,
)

# --- helpers -------------------------------------------------------------


def _sine(n, freq=440.0, rate=44_100, amp=8000, seed=None, ch=1):
    t = np.arange(n, dtype=np.float64)
    x = amp * np.sin(2 * np.pi * freq * t / rate)
    if seed is not None:
        x = x + np.random.default_rng(seed).integers(-64, 64, n)
    x = x.astype(np.int16)
    return np.stack([x // (c + 1) for c in range(ch)], axis=1)


def _subframe_bits(x, bps):
    """Encode one subframe with the module's own writer and return
    (chosen subframe-type code, wasted-bit flag, decoded samples)."""
    wr = F._Writer()
    F._encode_subframe(wr, np.asarray(x, np.int64), bps)
    wr.align()
    rd = F._Reader(bytes(wr.buf))
    peek = F._Reader(bytes(wr.buf))
    peek.read(1)
    sft = peek.read(6)
    wasted_flag = peek.read(1)
    out = F._read_subframe(rd, len(x), bps)
    return sft, wasted_flag, out


def _hand_stream(sub_builders, *, n, ch, bps, rate, bs_code, bs_field=None,
                 rate_code=0, rate_field=None, chan_code=None, blocking=0,
                 number=0, md5=True, bps_code=None, total=None,
                 extra_meta=b""):
    """Assemble STREAMINFO + one frame from module primitives, with every
    header code choosable — covers decoder paths the encoder never emits
    (odd blocksize codes, variable-blocksize numbering, long UTF-8
    numbers, inline rate fields)."""
    wr = F._Writer()
    wr.write(0b11111111111110, 14)
    wr.write(0, 1)
    wr.write(blocking, 1)
    wr.write(bs_code, 4)
    wr.write(rate_code, 4)
    wr.write(ch - 1 if chan_code is None else chan_code, 4)
    wr.write(0 if bps_code is None else bps_code, 3)
    wr.write(0, 1)
    for b in F._utf8_encode(number):
        wr.write(b, 8)
    if bs_code == 6:
        wr.write(bs_field, 8)
    elif bs_code == 7:
        wr.write(bs_field, 16)
    if rate_code == 12:
        wr.write(rate_field, 8)
    elif rate_code in (13, 14):
        wr.write(rate_field, 16)
    hdr = bytes(wr.buf)
    assert wr.nb == 0
    wr.write(F._crc8(hdr), 8)
    expected = []
    for build in sub_builders:
        expected.append(build(wr))
    wr.align()
    frame = bytes(wr.buf)
    frame += struct.pack(">H", F._crc16(frame))
    samples = np.stack(expected, axis=1)
    info = bytearray()
    info += struct.pack(">HH", n, n)
    info += b"\x00\x00\x00" * 2
    nt = n if total is None else total
    raw = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | nt
    info += raw.to_bytes(8, "big")
    info += (
        hashlib.md5(F._md5_bytes(samples.astype(np.int64), bps)).digest()
        if md5 else b"\x00" * 16
    )
    last = 0x00 if extra_meta else 0x80
    blob = (
        b"fLaC" + bytes([last]) + struct.pack(">I", 34)[1:] + bytes(info)
        + extra_meta + frame
    )
    return blob, samples


def _const_sub(value, n, bps):
    def build(wr):
        wr.write(0, 1)
        wr.write(0, 6)
        wr.write(0, 1)
        wr.write(value, bps)
        return np.full(n, value, np.int64)
    return build


# --- lossless round trips ------------------------------------------------


@pytest.mark.parametrize(
    "dtype,lo,hi,ch",
    [
        (np.int8, -128, 128, 1),
        (np.int8, -128, 128, 2),
        (np.int16, -32768, 32768, 1),
        (np.int16, -32768, 32768, 2),
        (np.int16, -32768, 32768, 5),
        (np.int16, -32768, 32768, 8),
    ],
)
def test_round_trip_byte_exact(dtype, lo, hi, ch):
    rng = np.random.default_rng(ch)
    samples = rng.integers(lo, hi, (6000, ch)).astype(dtype)
    dec, rate = decode_flac(encode_flac(samples, 44_100))
    assert rate == 44_100
    assert dec.dtype == samples.dtype and (dec == samples).all()


def test_24bit_round_trip_wav_convention():
    rng = np.random.default_rng(24)
    w = (rng.integers(-(2**23), 2**23, (4000, 2), dtype=np.int64) << 8)
    w = w.astype(np.int32)
    dec, rate = decode_flac(encode_flac(w, 48_000))
    assert rate == 48_000
    assert dec.dtype == np.int32 and (dec == w).all()


@pytest.mark.parametrize(
    "mode", ["indep", "left_side", "right_side", "mid_side", "auto"]
)
def test_stereo_modes_all_lossless(mode):
    rng = np.random.default_rng(9)
    left = _sine(10_000, seed=1)[:, 0]
    right = (left * 0.7).astype(np.int16) + rng.integers(
        -30, 30, 10_000
    ).astype(np.int16)
    st = np.stack([left, right], axis=1)
    dec, _ = decode_flac(encode_flac(st, 44_100, stereo_mode=mode))
    assert (dec == st).all()


def test_correlated_stereo_compresses_and_decorrelates():
    """auto must pick a side mode on near-identical channels and beat
    independent coding."""
    left = _sine(20_000, seed=2)[:, 0]
    st = np.stack([left, left + 1], axis=1).astype(np.int16)
    auto = encode_flac(st, 44_100)
    indep = encode_flac(st, 44_100, stereo_mode="indep")
    assert len(auto) < len(indep)
    assert len(auto) < st.nbytes // 4


@pytest.mark.parametrize("n", [1, 2, 5, F.BLOCKSIZE - 1, F.BLOCKSIZE,
                               F.BLOCKSIZE + 1, 3 * F.BLOCKSIZE + 17])
def test_odd_lengths_round_trip(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-2000, 2000, (n, 1)).astype(np.int16)
    dec, _ = decode_flac(encode_flac(x, 32_000))
    assert dec.shape == (n, 1) and (dec == x).all()


@pytest.mark.parametrize("rate", [8_000, 44_100, 96_000, 11_025, 100_000])
def test_sample_rates_round_trip(rate):
    x = _sine(512)
    dec, r = decode_flac(encode_flac(x, rate))
    assert r == rate and (dec == x).all()


def test_streaminfo_fields():
    x = _sine(9000, ch=2)
    info = parse_streaminfo(encode_flac(x, 22_050))
    assert info["sample_rate"] == 22_050
    assert info["channels"] == 2
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 9000
    assert info["min_blocksize"] == info["max_blocksize"] == F.BLOCKSIZE


# --- subframe-type selection --------------------------------------------


def test_constant_subframe_chosen_for_dc():
    sft, _, out = _subframe_bits(np.full(256, -7), 16)
    assert sft == 0 and (out == -7).all()


def test_verbatim_chosen_for_full_entropy_noise():
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, 256)
    sft, _, out = _subframe_bits(x, 16)
    assert sft == 1 and (out == x).all()


def test_fixed_chosen_for_polynomial():
    i = np.arange(256, dtype=np.int64)
    x = 3 * i - 1000  # order-2 differences are exactly zero
    sft, _, out = _subframe_bits(x, 16)
    assert 8 <= sft <= 12 and (out == x).all()


def test_lpc_chosen_for_noisy_tone():
    """A tone plus mild noise defeats the fixed difference predictors
    (differencing amplifies noise) but not an order-8 LPC."""
    t = np.arange(4096, dtype=np.float64)
    rng = np.random.default_rng(5)
    x = (8000 * np.sin(2 * np.pi * 220 * t / 44_100)
         + rng.normal(0, 40, 4096)).astype(np.int64)
    sft, _, out = _subframe_bits(x, 16)
    assert sft >= 32 and (out == x).all()


def test_wasted_bits_detected_and_restored():
    x = (np.arange(256, dtype=np.int64) - 128) << 5
    sft, wasted_flag, out = _subframe_bits(x, 16)
    assert wasted_flag == 1 and (out == x).all()


def test_rice_escape_round_trips():
    """One huge-magnitude partition among small ones makes the 5-bit raw
    escape cheaper than any Rice parameter for that partition."""
    rng = np.random.default_rng(3)
    x = rng.integers(-1, 2, 4096).astype(np.int64)
    x[2048:2304] = rng.integers(-30000, 30000, 256)
    plan = F._rice_cost_plan(x, 0, 4096)
    kinds = {p[0] for p in plan[2]}
    assert "esc" in kinds and "rice" in kinds
    wr = F._Writer()
    F._write_residual(wr, plan)
    wr.align()
    out = F._read_residual(F._Reader(bytes(wr.buf)), 4096, 0)
    assert (out == x).all()
    sft, _, out2 = _subframe_bits(x, 16)  # fixed-0 + escapes beats verbatim
    assert sft == 8 and (out2 == x).all()


# --- decoder-only header paths (hand-assembled streams) ------------------


@pytest.mark.parametrize(
    "bs_code,bs_field,n",
    [
        (1, None, 192),
        (2, None, 576),
        (5, None, 4608),
        (6, 99, 100),
        (7, 999, 1000),
        (8, None, 256),
        (15, None, 32768),
    ],
)
def test_blocksize_codes_decode(bs_code, bs_field, n):
    blob, samples = _hand_stream(
        [_const_sub(5, n, 16)], n=n, ch=1, bps=16, rate=8_000,
        bs_code=bs_code, bs_field=bs_field,
    )
    dec, rate = decode_flac(blob)
    assert rate == 8_000
    assert dec.shape == (n, 1) and (dec[:, 0] == 5).all()


@pytest.mark.parametrize(
    "rate_code,rate_field,expect",
    [(12, 32, 32_000), (13, 12_345, 12_345), (14, 4_410, 44_100)],
)
def test_inline_rate_fields_parse(rate_code, rate_field, expect):
    """Frame-level rate fields must parse (frame rate describes the frame;
    the stream rate still comes from STREAMINFO)."""
    blob, _ = _hand_stream(
        [_const_sub(1, 192, 16)], n=192, ch=1, bps=16, rate=expect,
        bs_code=1, rate_code=rate_code, rate_field=rate_field,
    )
    dec, rate = decode_flac(blob)
    assert rate == expect and dec.shape == (192, 1)


def test_variable_blocksize_numbering_and_long_utf8():
    """Blocking strategy 1 carries a sample number — use one needing the
    5-byte UTF-8 form (> 2^21)."""
    blob, _ = _hand_stream(
        [_const_sub(-3, 192, 16)], n=192, ch=1, bps=16, rate=16_000,
        bs_code=1, blocking=1, number=(1 << 24) + 12345,
    )
    dec, _ = decode_flac(blob)
    assert (dec[:, 0] == -3).all()


@pytest.mark.parametrize("bps_code,bps,dtype", [(2, 12, np.int16),
                                                (5, 20, np.int32),
                                                (7, 32, np.int32)])
def test_decode_only_bit_depths(bps_code, bps, dtype):
    lim = 1 << (bps - 1)
    blob, _ = _hand_stream(
        [_const_sub(-(lim // 2), 192, bps)], n=192, ch=1, bps=bps,
        rate=8_000, bs_code=1, bps_code=bps_code,
    )
    dec, _ = decode_flac(blob)
    assert dec.dtype == dtype and (dec[:, 0] == -(lim // 2)).all()


def test_five_bit_rice_method_decodes():
    """Residual method 1 (5-bit parameters, k up to 30) — hand-written
    order-0 fixed subframe, k=17 needs the wide parameter field."""
    rng = np.random.default_rng(7)
    res = rng.integers(-(1 << 19), 1 << 19, 192).astype(np.int64)

    def build(wr):
        wr.write(0, 1)
        wr.write(8, 6)  # fixed order 0
        wr.write(0, 1)
        u = (res << 1) ^ (res >> 63)
        wr.write(1, 2)  # method 1
        wr.write(0, 4)  # partition order 0
        wr.write(17, 5)
        for uu in u.tolist():
            wr.write_unary(uu >> 17)
            wr.write(uu, 17)
        return res

    blob, _ = _hand_stream([build], n=192, ch=1, bps=24, rate=8_000,
                           bs_code=1)
    dec, _ = decode_flac(blob)
    assert (dec[:, 0] == (res << 8).astype(np.int32)).all()


def test_hand_written_lpc_order2():
    """Order-2 LPC with integer coefficients [2, -1], shift 0 — an exact
    linear extrapolator; decoder-side orders differ from the encoder's
    fixed order-8 choice."""
    n = 192
    x = (7 * np.arange(n) - 300).astype(np.int64)  # exactly linear
    res = x[2:] - (2 * x[1:-1] - x[:-2])
    assert (res == 0).all()

    def build(wr):
        wr.write(0, 1)
        wr.write(32 + 1, 6)  # LPC order 2
        wr.write(0, 1)
        for v in x[:2].tolist():
            wr.write(v, 16)
        wr.write(3, 4)   # precision 4 bits
        wr.write(0, 5)   # shift 0
        wr.write(2, 4)   # c0 = 2
        wr.write(-1, 4)  # c1 = -1
        wr.write(0, 2)   # rice method 0
        wr.write(0, 4)   # partition order 0
        wr.write(0, 4)   # k = 0
        for _ in range(n - 2):
            wr.write_unary(0)
        return x

    blob, _ = _hand_stream([build], n=n, ch=1, bps=16, rate=8_000,
                           bs_code=1)
    dec, _ = decode_flac(blob)
    assert (dec[:, 0] == x.astype(np.int16)).all()


def test_zero_width_escaped_partition_is_zeros():
    def build(wr):
        wr.write(0, 1)
        wr.write(8, 6)  # fixed order 0
        wr.write(0, 1)
        wr.write(0, 2)
        wr.write(0, 4)
        wr.write(15, 4)  # 4-bit escape marker
        wr.write(0, 5)   # raw width 0 -> all-zero residual
        return np.zeros(192, np.int64)

    blob, _ = _hand_stream([build], n=192, ch=1, bps=16, rate=8_000,
                           bs_code=1)
    dec, _ = decode_flac(blob)
    assert (dec == 0).all()


def test_foreign_metadata_blocks_skipped():
    """PADDING + VORBIS_COMMENT blocks between STREAMINFO and frames."""
    pad = bytes([0x01]) + struct.pack(">I", 10)[1:] + b"\x00" * 10
    vc = bytes([0x84]) + struct.pack(">I", 4)[1:] + b"abcd"
    blob, _ = _hand_stream(
        [_const_sub(9, 192, 16)], n=192, ch=1, bps=16, rate=8_000,
        bs_code=1, extra_meta=pad + vc,
    )
    dec, _ = decode_flac(blob)
    assert (dec[:, 0] == 9).all()


def test_zeroed_md5_skips_verification():
    blob, _ = _hand_stream(
        [_const_sub(2, 192, 16)], n=192, ch=1, bps=16, rate=8_000,
        bs_code=1, md5=False,
    )
    dec, _ = decode_flac(blob)
    assert (dec[:, 0] == 2).all()


def test_unknown_total_samples_decodes_to_stream_end():
    blob, _ = _hand_stream(
        [_const_sub(4, 192, 16)], n=192, ch=1, bps=16, rate=8_000,
        bs_code=1, md5=False, total=0,
    )
    dec, _ = decode_flac(blob)
    assert dec.shape == (192, 1) and (dec[:, 0] == 4).all()


# --- loud failures -------------------------------------------------------


def _good_blob():
    return encode_flac(_sine(6000, seed=4), 44_100)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"RIFF" + b[4:], "fLaC magic"),
        (lambda b: b[:50], "truncated"),
        (lambda b: b[:4] + bytes([0x7F]) + b[5:], "type 127"),
    ],
)
def test_structural_corruption_raises_valueerror(mutate, msg):
    with pytest.raises(ValueError, match=msg):
        decode_flac(mutate(_good_blob()))


def test_frame_corruption_normalizes_to_valueerror():
    blob = bytearray(_good_blob())
    info = parse_streaminfo(bytes(blob))
    for off in (info["frames_offset"] + 2, info["frames_offset"] + 40,
                len(blob) - 3):
        bad = bytearray(blob)
        bad[off] ^= 0x55
        with pytest.raises(ValueError):
            decode_flac(bytes(bad))


def test_md5_mismatch_detected():
    blob = bytearray(_good_blob())
    blob[26] ^= 0xFF  # inside the STREAMINFO MD5 field (offset 8+18)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))


def test_encode_input_validation():
    with pytest.raises(ValueError, match="dtype"):
        encode_flac(np.zeros(10, np.float32), 8_000)
    with pytest.raises(ValueError, match="n >= 1"):
        encode_flac(np.zeros((0, 1), np.int16), 8_000)
    with pytest.raises(ValueError, match="8 channels"):
        encode_flac(np.zeros((10, 9), np.int16), 8_000)
    with pytest.raises(ValueError, match="sample rate"):
        encode_flac(np.zeros(10, np.int16), 0)
    with pytest.raises(ValueError, match="not encodable"):
        encode_flac(np.zeros(10, np.int16), 999_983)
    with pytest.raises(ValueError, match="stereo_mode"):
        encode_flac(np.zeros((10, 2), np.int16), 8_000, stereo_mode="ms")
    with pytest.raises(ValueError, match="24-bit"):
        encode_flac(np.full((10, 1), 3, np.int32), 8_000)


# --- Spark integration: cross-container parity ---------------------------


def test_decode_audio_dispatch():
    from pii_redactor_spark.fixtures.wav import encode_wav
    from pii_redactor_spark.operators.audio import decode_audio

    x = _sine(2000, ch=2)
    for blob in (encode_wav(x, 16_000), encode_flac(x, 16_000)):
        dec, rate = decode_audio(blob)
        assert rate == 16_000 and (dec.astype(np.int64) == x).all()
    with pytest.raises(NotImplementedError, match="magic"):
        decode_audio(b"OggS" + b"\x00" * 64)


def test_wav_and_flac_same_pcm_identical_stats_and_fingerprint(spark):
    """The same clip shipped as WAV and as FLAC must produce identical
    quantized metrics AND an identical spectral fingerprint — that is
    what makes cross-container near-dup detection work."""
    from pii_redactor_spark.fixtures.wav import encode_wav
    from pii_redactor_spark.operators.audio import (
        audio_fingerprints,
        audio_stats,
    )

    clips = [
        _sine(24_000, freq=330.0, seed=11, ch=2),
        _sine(16_000, freq=1200.0, seed=12, ch=1),
    ]
    rows = []
    for i, x in enumerate(clips):
        rows.append((f"wav_{i}", bytearray(encode_wav(x, 16_000))))
        rows.append((f"flac_{i}", bytearray(encode_flac(x, 16_000))))
    rows.append(("poison", bytearray(b"fLaC" + b"\x00" * 20)))
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")

    stats = {r["audio_id"]: r for r in audio_stats(df).collect()}
    assert not stats["poison"]["ok"]
    for i in range(len(clips)):
        w, f = stats[f"wav_{i}"], stats[f"flac_{i}"]
        for col in ("sample_rate", "channels", "n_samples", "duration_ms",
                    "clipping_ppm", "rms_centi_db", "zero_cross_permille"):
            assert w[col] == f[col], col

    fps = {r["audio_id"]: r["fingerprint"]
           for r in audio_fingerprints(df).collect() if r["ok"]}
    for i in range(len(clips)):
        assert fps[f"wav_{i}"] == fps[f"flac_{i}"]


def test_flac_int8_stats_scaled_correctly():
    """int8 FLAC decode must hit the signed-8-bit branch of _to_float —
    a full-scale int8 square wave is clipping, a quiet one is not."""
    from pii_redactor_spark.operators.audio import _measure

    loud = np.where(np.arange(4000) % 2 == 0, 127, -128).astype(
        np.int8
    ).reshape(-1, 1)
    dec, rate = decode_flac(encode_flac(loud, 8_000))
    m = _measure(dec, rate)
    assert m[5] >= 499_000  # clipping_ppm: the -128 half rail clips
    quiet = (loud // 16).astype(np.int8)
    dec2, _ = decode_flac(encode_flac(quiet, 8_000))
    m2 = _measure(dec2, 8_000)
    assert m2[5] == 0
    assert m2[6] < m[6] - 2000  # ~ -24 dB quieter in centi-dB
