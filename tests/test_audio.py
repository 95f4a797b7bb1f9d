"""Audio axis tests — WAV codec exactness, quantized signal stats vs
hand-computed values, the metadata-only quality gate (incl. NULL
parity), chunking, resample, and poison-row survival through Spark."""

import math
import struct

import numpy as np
import pytest

from pii_redactor_spark.fixtures.wav import decode_wav, encode_wav

# --- codec ---------------------------------------------------------------


@pytest.mark.parametrize(
    "dtype,lo,hi",
    [
        (np.uint8, 0, 255),
        (np.int16, -32768, 32767),
        (np.int32, -(2**31), 2**31 - 1),
    ],
)
def test_pcm_round_trip_byte_exact(dtype, lo, hi):
    rng = np.random.default_rng(3)
    for ch in (1, 2, 6):
        samples = rng.integers(lo, hi, (777, ch)).astype(dtype)
        dec, rate = decode_wav(encode_wav(samples, 44_100))
        assert rate == 44_100
        assert dec.dtype == samples.dtype and (dec == samples).all()


def test_float32_round_trip_byte_exact():
    rng = np.random.default_rng(5)
    samples = rng.normal(0, 0.25, (500, 2)).astype(np.float32)
    dec, rate = decode_wav(encode_wav(samples, 16_000))
    assert rate == 16_000
    assert dec.dtype == np.float32
    assert (dec.view(np.uint32) == samples.view(np.uint32)).all()


def test_mono_1d_input_becomes_column():
    samples = np.arange(100, dtype=np.int16)
    dec, _ = decode_wav(encode_wav(samples, 8_000))
    assert dec.shape == (100, 1) and (dec[:, 0] == samples).all()


def test_foreign_chunks_skipped_and_24bit_widens():
    """Hand-built stream: LIST chunk before fmt, 24-bit PCM, odd-size
    chunk word alignment — the RIFF walker must handle all three."""
    frames = np.array([[1], [-1], [8388607], [-8388608]], np.int32)
    payload = b"".join(
        int(v).to_bytes(3, "little", signed=True) for v in frames[:, 0]
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 22_050, 22_050 * 3, 3, 24)
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd+pad
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    dec, rate = decode_wav(data)
    assert rate == 22_050 and dec.dtype == np.int32
    assert (dec[:, 0] == frames[:, 0] * 256).all()  # widened << 8


def test_extensible_wrapper_unwraps_to_pcm():
    samples = np.arange(-50, 50, dtype=np.int16).reshape(-1, 1)
    data = bytearray(encode_wav(samples, 48_000))
    i = data.find(b"fmt ")
    # rewrite fmt as WAVE_FORMAT_EXTENSIBLE (0xFFFE) + 10-byte tail whose
    # SubFormat leads with the wrapped code (1 = PCM)
    # 16-byte base + cbSize + validBits + channelMask + 16-byte SubFormat
    # GUID whose leading 2 bytes are the wrapped format code (1 = PCM)
    fmt = (
        struct.pack("<HHIIHHHHI", 0xFFFE, 1, 48_000, 96_000, 2, 16,
                    22, 16, 0x4)
        + struct.pack("<H", 1) + b"\x00" * 14
    )
    rebuilt = (
        bytes(data[:i]) + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + bytes(data[i + 8 + 16:])
    )
    rebuilt = (
        b"RIFF" + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    )
    dec, _ = decode_wav(rebuilt)
    assert (dec == samples).all()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"JUNK" + d[4:],                       # bad magic
        lambda d: d[:-3],                                # truncated data
        lambda d: d.replace(b"data", b"datx", 1),        # missing data
        lambda d: d.replace(b"fmt ", b"fmtx", 1),        # missing fmt
    ],
)
def test_corrupt_wav_raises_valueerror(mutate):
    data = encode_wav(np.zeros((10, 1), np.int16), 8_000)
    with pytest.raises(ValueError):
        decode_wav(mutate(data))


def test_compressed_formats_refuse_loudly():
    data = bytearray(encode_wav(np.zeros((10, 1), np.int16), 8_000))
    i = data.find(b"fmt ") + 8
    data[i:i + 2] = struct.pack("<H", 2)  # ADPCM format code
    with pytest.raises(NotImplementedError, match="format code 2"):
        decode_wav(bytes(data))


# --- stats ----------------------------------------------------------------


def test_audio_stats_known_signal(spark):
    """A full-scale int16 square wave: RMS = 0 dBFS (within LSB), 100%
    clipping, ~2*f zero crossings/s — every quantized metric checkable
    by hand."""
    from pii_redactor_spark.operators.audio import audio_stats

    rate, secs, f = 16_000, 2, 100
    t = np.arange(rate * secs)
    square = np.where((t * f * 2 // rate) % 2 == 0, 32767, -32768)
    wav = encode_wav(square.astype(np.int16), rate)
    df = spark.createDataFrame(
        [("a1", bytearray(wav)), ("bad", bytearray(b"RIFFjunk"))],
        "audio_id string, bytes binary",
    )
    rows = {r["audio_id"]: r for r in audio_stats(df).collect()}
    a = rows["a1"]
    assert a["ok"] and a["sample_rate"] == rate
    assert a["n_samples"] == rate * secs
    assert a["duration_ms"] == secs * 1000
    assert a["clipping_ppm"] == 1_000_000          # every sample at rail
    assert -2 <= a["rms_centi_db"] <= 0            # 0 dBFS within LSB
    # square wave at f Hz crosses zero 2f times/s => 2f/rate per sample
    assert abs(a["zero_cross_permille"] - round(2000 * f / rate)) <= 1
    bad = rows["bad"]
    assert not bad["ok"] and bad["sample_rate"] is None


def test_audio_stats_silence_floor(spark):
    from pii_redactor_spark.operators.audio import audio_stats

    wav = encode_wav(np.zeros((8_000, 1), np.int16), 8_000)
    df = spark.createDataFrame(
        [("s", bytearray(wav))], "audio_id string, bytes binary"
    )
    row = audio_stats(df).collect()[0]
    assert row["rms_centi_db"] == -9600 and row["clipping_ppm"] == 0


# --- quality gate ----------------------------------------------------------


def test_audio_quality_flags_each_gate(spark):
    from pii_redactor_spark.operators.audio import (
        audio_quality_flags,
        with_audio_quality,
    )

    rows = [
        # (id, rate, ch, dur_ms, clip_ppm, rms_cdb, expected_flags_csv)
        ("clean", 16_000, 1, 5_000, 0, -1_200, ""),
        ("short", 44_100, 2, 100, 0, -1_200, "too_short"),
        ("long", 44_100, 2, 300_000, 0, -1_200, "too_long"),
        ("rate", 8_000, 1, 5_000, 0, -1_200, "bad_rate"),
        ("chans", 48_000, 6, 5_000, 0, -1_200, "bad_channels"),
        ("clip", 48_000, 1, 5_000, 500_000, -100, "clipped"),
        ("quiet", 48_000, 1, 5_000, 0, -8_000, "silent"),
        ("nullm", None, 1, 5_000, 0, -1_200, "null_metadata"),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows],
        "audio_id string, sample_rate int, channels int, "
        "duration_ms bigint, clipping_ppm int, rms_centi_db int",
    )
    import pyspark.sql.functions as F

    got = {
        r["audio_id"]: r["csv"]
        for r in df.select(
            "audio_id",
            F.array_join(audio_quality_flags(), ",").alias("csv"),
        ).collect()
    }
    for rid, *_rest, want in rows:
        assert got[rid] == want, (rid, got[rid], want)
    kept = (
        with_audio_quality(df.withColumn("keep", F.lit(True)),
                           keep_col="keep")
        .where("keep").select("audio_id").collect()
    )
    assert [r["audio_id"] for r in kept] == ["clean"]


# --- chunking + resample -----------------------------------------------------


def test_chunk_audio_windows_and_tail(spark):
    from pii_redactor_spark.operators.audio import chunk_audio

    rate = 8_000
    samples = np.arange(rate * 2 + 1234, dtype=np.int16).reshape(-1, 1)
    df = spark.createDataFrame(
        [("a", bytearray(encode_wav(samples, rate))),
         ("junk", bytearray(b"not a wav"))],
        "audio_id string, bytes binary",
    )
    rows = sorted(
        chunk_audio(df, chunk_ms=1_000).collect(),
        key=lambda r: r["chunk_no"],
    )
    assert [r["audio_id"] for r in rows] == ["a", "a", "a"]
    assert [r["n_samples"] for r in rows] == [rate, rate, 1234]
    rebuilt = np.concatenate(
        [decode_wav(bytes(r["bytes"]))[0] for r in rows]
    )
    assert (rebuilt == samples).all()  # lossless split


def test_resample_preserves_tone_and_duration(spark):
    from pii_redactor_spark.operators.audio import resample_audio

    rate, target, f = 48_000, 16_000, 440
    t = np.arange(rate) / rate
    tone = (0.5 * np.sin(2 * np.pi * f * t) * 32767).astype(np.int16)
    df = spark.createDataFrame(
        [("a", bytearray(encode_wav(tone, rate)))],
        "audio_id string, bytes binary",
    )
    row = resample_audio(df, target).collect()[0]
    assert row["sample_rate"] == target
    out, _ = decode_wav(bytes(row["bytes"]))
    assert out.shape[0] == target  # 1 second stays 1 second
    # dominant DFT bin still at 440 Hz
    spec = np.abs(np.fft.rfft(out[:, 0].astype(np.float64)))
    assert abs(int(np.argmax(spec)) - f) <= 1


# --- bench corpus fixture --------------------------------------------------


def test_audio_corpus_row_deterministic_and_typed():
    """Same id => identical bytes (any-parallelism determinism contract);
    decodable rows parse with the real codec; the kind wheel plants every
    gate (probabilistic mix checked over a 400-row slice)."""
    from collections import Counter

    from pii_redactor_spark.fixtures.audio_corpus import generate_audio_row
    from pii_redactor_spark.operators.audio import decode_audio

    a = generate_audio_row("au0000000007")
    b = generate_audio_row("au0000000007")
    assert a["bytes"] == b["bytes"] and a["kind"] == b["kind"]
    kinds = Counter()
    containers = Counter()
    for i in range(400):
        row = generate_audio_row(f"au{i:010d}")
        kinds[row["kind"]] += 1
        if row["kind"] == "corrupt":
            with pytest.raises((ValueError, NotImplementedError)):
                decode_audio(row["bytes"])
        else:
            containers[bytes(row["bytes"][:4])] += 1
            samples, rate = decode_audio(row["bytes"])
            assert samples.shape[0] >= 1 and rate >= 8000
    # every signal kind present at its rough expectation; both container
    # families planted (10% FLAC band => >10 of 400 w.h.p.)
    assert containers[b"fLaC"] > 10, containers
    assert containers[b"RIFF"] > 250, containers
    for kind in ("tone", "noise", "clipped", "silence"):
        assert kinds[kind] > 10, kinds


def test_audio_corpus_cache_regenerates_on_fingerprint_change(
    spark, tmp_path
):
    from pii_redactor_spark.fixtures import audio_corpus as ac

    out = str(tmp_path / "aufx")
    p1 = ac.ensure_cached_audio_corpus(spark, out, 64, partitions=4)
    first = sorted(
        f.name for f in (tmp_path / "aufx" / "audio").glob("*.parquet")
    )
    # fresh marker: second call must NOT regenerate (same file listing,
    # same mtimes)
    import os

    mt = {f: os.path.getmtime(str(tmp_path / "aufx" / "audio" / f))
          for f in first}
    p2 = ac.ensure_cached_audio_corpus(spark, out, 64, partitions=4)
    assert p1 == p2
    for f in first:
        assert os.path.getmtime(str(tmp_path / "aufx" / "audio" / f)) == \
            mt[f]
    # row-count change regenerates
    ac.ensure_cached_audio_corpus(spark, out, 32, partitions=4)
    n = spark.read.parquet(p1).count()
    assert n == 32


def test_chunk_audio_bounded_flush_preserves_all_chunks(spark):
    """A single clip whose fan-out exceeds the 2048-row flush slice must
    still emit every chunk exactly once (the bounded-buffer path)."""
    rng = np.random.default_rng(11)
    pcm = (rng.normal(0, 0.2, 8000 * 30).clip(-1, 1) * 32767).astype(
        np.int16
    )
    from pii_redactor_spark.operators.audio import chunk_audio

    df = spark.createDataFrame(
        [("big", bytearray(encode_wav(pcm, 8000)))],
        "audio_id string, bytes binary",
    )
    out = chunk_audio(df, chunk_ms=10).toPandas()
    # 30 s at 10 ms windows = 3000 full windows (240000 / 80)
    assert len(out) == 3000
    assert sorted(out["chunk_no"]) == list(range(3000))
    assert (out["n_samples"] == 80).all()


# --- spectral fingerprint ---------------------------------------------------


def _tone_clip(seed: int, n: int = 32000, rate: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = np.zeros(n)
    for _ in range(4):
        x += rng.uniform(0.1, 0.3) * np.sin(
            2 * np.pi * rng.uniform(100, 3000) * t + rng.uniform(0, 6.28)
        )
    return np.clip(x, -1, 1).astype(np.float32)


def test_fingerprint_deterministic_and_exactly_gain_invariant():
    from pii_redactor_spark.operators.audio import _spectral_fingerprint

    x = _tone_clip(5)
    fp1 = _spectral_fingerprint(x[:, None], 16000)
    fp2 = _spectral_fingerprint(x[:, None], 16000)
    assert fp1 == fp2
    # global gain shifts every cell's log energy and the median equally:
    # the median-relative bits are EXACTLY unchanged (float samples, so
    # no quantization noise muddies the claim)
    fp_half = _spectral_fingerprint((0.5 * x)[:, None], 16000)
    assert fp_half == fp1


def test_fingerprint_separates_noisy_copy_from_other_content():
    from pii_redactor_spark.operators.audio import _spectral_fingerprint

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    base = _tone_clip(5)
    rng = np.random.default_rng(99)
    noisy = np.clip(
        base + rng.normal(0, 0.01, base.shape), -1, 1
    ).astype(np.float32)
    fp_base = _spectral_fingerprint(base[:, None], 16000)
    fp_noisy = _spectral_fingerprint(noisy[:, None], 16000)
    assert ham(fp_base, fp_noisy) <= 4, ham(fp_base, fp_noisy)
    for other_seed in (6, 7, 8):
        fp_other = _spectral_fingerprint(
            _tone_clip(other_seed)[:, None], 16000
        )
        assert ham(fp_base, fp_other) > 4, (other_seed,
                                            ham(fp_base, fp_other))


def test_audio_neardup_pipeline_finds_planted_pair(spark):
    from pii_redactor_spark.operators.audio import (
        audio_fingerprints,
        audio_neardup_pairs,
    )

    base = _tone_clip(5)
    rng = np.random.default_rng(42)
    noisy = np.clip(
        base + rng.normal(0, 0.01, base.shape), -1, 1
    ).astype(np.float32)
    rows = [
        ("a", bytearray(encode_wav(base, 16000))),
        ("a_noisy", bytearray(encode_wav(noisy, 16000))),
        ("b", bytearray(encode_wav(_tone_clip(7), 16000))),
        ("poison", bytearray(b"RIFFnope")),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    fps = audio_fingerprints(df).toPandas()
    assert set(fps[~fps["ok"]]["audio_id"]) == {"poison"}
    pairs = audio_neardup_pairs(
        audio_fingerprints(df), max_hamming=4
    ).toPandas()
    assert len(pairs) == 1
    assert {pairs.iloc[0]["id_a"], pairs.iloc[0]["id_b"]} == \
        {"a", "a_noisy"}


# --- G.711 telephony WAV (mu-law / A-law) -----------------------------------


def _g711_wav(fmt_code: int, payload: bytes, ch: int = 1,
              rate: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_code, ch, rate, rate * ch, ch, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_g711_tables_match_cpython_reference():
    """Both 256-entry G.711 expansion tables are bit-exact against
    CPython's audioop (the long-standing reference implementation)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    from pii_redactor_spark.fixtures.wav import _ALAW_TABLE, _MULAW_TABLE

    allb = bytes(range(256))
    assert (np.frombuffer(audioop.ulaw2lin(allb, 2), "<i2")
            == _MULAW_TABLE).all()
    assert (np.frombuffer(audioop.alaw2lin(allb, 2), "<i2")
            == _ALAW_TABLE).all()


@pytest.mark.parametrize("fmt_code,name", [(7, "mulaw"), (6, "alaw")])
def test_g711_wav_decodes_to_int16(fmt_code, name):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    rng = np.random.default_rng(17)
    pcm = (rng.normal(0, 0.3, 4000).clip(-1, 1) * 32767).astype("<i2")
    conv = audioop.lin2ulaw if name == "mulaw" else audioop.lin2alaw
    payload = conv(pcm.tobytes(), 2)
    dec, rate = decode_wav(_g711_wav(fmt_code, payload))
    assert rate == 8000 and dec.dtype == np.int16
    assert dec.shape == (4000, 1)
    # companding is lossy but bounded: worst-case segment step
    err = np.abs(dec[:, 0].astype(np.int32) - pcm.astype(np.int32))
    assert err.max() <= 1024, err.max()
    # and re-expanding OUR way matches audioop's expansion bit-exactly
    back = audioop.ulaw2lin(payload, 2) if name == "mulaw" else \
        audioop.alaw2lin(payload, 2)
    assert (dec[:, 0] == np.frombuffer(back, "<i2")).all()


def test_g711_stereo_and_guards():
    payload = bytes(range(64)) * 2
    dec, _ = decode_wav(_g711_wav(7, payload, ch=2))
    assert dec.shape == (64, 2)
    with pytest.raises(ValueError):
        decode_wav(_g711_wav(7, payload[:-1], ch=2))  # ragged frames
    bad = _g711_wav(7, payload)
    # declare 16-bit G.711: contradiction must refuse
    idx = bad.index(b"fmt ") + 8 + 14
    bad = bad[:idx] + struct.pack("<H", 16) + bad[idx + 2:]
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_g711_encoder_round_trip_and_reference_agreement():
    """encode_wav_g711: idempotent on representable levels, bounded
    round-trip error, and near-total byte agreement with audioop's coder
    (disagreements are nearest-level vs segment-threshold choices at
    exact quantization boundaries — expansions differ by at most one
    segment step)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    from pii_redactor_spark.fixtures.wav import encode_wav_g711

    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, 50000).astype(np.int16)
    for law, lin2 in (("mulaw", audioop.lin2ulaw), ("alaw",
                                                    audioop.lin2alaw)):
        dec, rate = decode_wav(encode_wav_g711(pcm, 8000, law))
        assert rate == 8000
        err = np.abs(dec[:, 0].astype(int) - pcm.astype(int))
        assert err.max() <= 1024, (law, err.max())
        dec2, _ = decode_wav(encode_wav_g711(dec[:, 0], 8000, law))
        assert (dec2 == dec).all(), law
        ref = np.frombuffer(lin2(pcm.tobytes(), 2), np.uint8)
        payload = encode_wav_g711(pcm, 8000, law)
        ours = payload[payload.index(b"data") + 8:
                       payload.index(b"data") + 8 + 50000]
        agree = (np.frombuffer(ours, np.uint8) == ref).mean()
        assert agree > 0.97, (law, agree)
    with pytest.raises(ValueError):
        encode_wav_g711(pcm.astype(np.int32), 8000)
    with pytest.raises(ValueError):
        encode_wav_g711(pcm, 8000, law="dpcm")


def test_ima_adpcm_step_function_matches_audioop():
    """The IMA expansion recursion is bit-exact against CPython's
    audioop DVI coder (audioop packs first-nibble-HIGH; WAV blocks pack
    LOW — same arithmetic, verified here on a 2000-sample stream)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    from pii_redactor_spark.fixtures.wav import _ima_decode_nibbles

    rng = np.random.default_rng(0)
    pcm = rng.integers(-20000, 20000, 2000).astype("<i2")
    packed, _ = audioop.lin2adpcm(pcm.tobytes(), 2, None)
    ref = np.frombuffer(audioop.adpcm2lin(packed, 2, None)[0], "<i2")
    nibs = []
    for b in packed:
        nibs += [b >> 4, b & 0xF]
    assert (np.array(_ima_decode_nibbles(nibs, 0, 0)) == ref).all()


@pytest.mark.parametrize("ch", [1, 2])
def test_ima_adpcm_wav_round_trip_bounded(ch):
    """encode_wav_adpcm -> decode_wav: 4-bit ADPCM is lossy with a
    cold-start adaptation transient (the step size ramps from 7), so the
    bound is split: steady state (past sample 100) stays within ~3% of
    full scale and ~-40 dB RMS; the transient may overshoot."""
    from pii_redactor_spark.fixtures.wav import encode_wav_adpcm

    t = np.arange(16000) / 16000
    pcm = ((0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 1333 * t)) * 32767).astype(np.int16)
    x = pcm if ch == 1 else np.stack([pcm, np.roll(pcm, 3)], axis=1)
    dec, rate = decode_wav(encode_wav_adpcm(x, 16000))
    assert rate == 16000 and dec.dtype == np.int16 and dec.shape[1] == ch
    ref = (x if ch > 1 else x[:, None])[:16000].astype(int)
    err = np.abs(dec[:16000].astype(int) - ref)
    assert err[100:].max() <= 1500, err[100:].max()
    assert np.sqrt((err[100:] ** 2).mean()) < 600
    # blocks zero-pad the tail: length rounds UP to whole blocks
    assert dec.shape[0] >= 16000


def test_ima_adpcm_guards():
    from pii_redactor_spark.fixtures.wav import encode_wav_adpcm

    pcm = np.zeros(1000, np.int16)
    wav = encode_wav_adpcm(pcm, 8000)
    with pytest.raises(ValueError):
        decode_wav(wav[:60] + wav[64:])  # mangled block structure
    with pytest.raises(ValueError):
        encode_wav_adpcm(pcm.astype(np.float32), 8000)
    with pytest.raises(ValueError):
        encode_wav_adpcm(pcm, 8000, samples_per_block=100)  # not 8k+1
    # step index > 88 in a block header must refuse
    bad = bytearray(wav)
    di = bad.index(b"data") + 8
    bad[di + 2] = 120
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))
