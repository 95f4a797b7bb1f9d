"""Real baseline JPEG codec (fixtures/jpeg.py): round-trip fidelity, spec
structure, restart resync, 4:2:0, and honest failure guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pii_redactor_spark.fixtures.codecs import psnr
from pii_redactor_spark.fixtures.jpeg import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    QUANT_LUM,
    ZIGZAG,
    _quality_scale,
    _seg,
    decode_jpeg,
    encode_jpeg,
)

RNG = np.random.default_rng(11)


def _noise(h, w):
    return RNG.integers(0, 255, (h, w, 3)).astype(np.uint8)


def _smooth(h, w):
    base = RNG.integers(0, 255, (h // 16 + 2, w // 16 + 2, 3)).astype(float)
    img = np.kron(base, np.ones((16, 16, 1)))[:h, :w, :]
    return np.clip(img + RNG.normal(0, 3, img.shape), 0, 255).astype(
        np.uint8
    )


def test_psnr_gate_at_fixture_quality():
    """The north rule's lossy gate: >= 40 dB.  Uniform noise is the
    worst case for DCT quantization — if it clears, everything does."""
    px = _noise(64, 64)
    out = decode_jpeg(encode_jpeg(px, quality=98))
    assert psnr(px, out) >= 40.0


@pytest.mark.parametrize("shape", [(8, 8), (33, 17), (64, 64), (50, 70)])
@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_round_trip_shapes(shape, subsampling):
    px = _smooth(*shape)
    out = decode_jpeg(encode_jpeg(px, 95, subsampling=subsampling))
    assert out.shape == px.shape
    assert psnr(px, out) >= 30.0


def test_deterministic_bytes():
    px = _smooth(40, 24)
    assert encode_jpeg(px, 92) == encode_jpeg(px, 92)


def test_stream_is_structurally_real_jpeg():
    """SOI/EOI framing plus every mandatory baseline segment, so any
    external decoder accepts the file."""
    b = encode_jpeg(_smooth(24, 24), 90)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4",
                   b"\xff\xda"):
        assert marker in b, marker
    assert b"JFIF\x00" in b
    assert b.count(b"\xff\xdb") >= 2 and b.count(b"\xff\xc4") >= 4


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_restart_markers_resync(subsampling):
    """DRI/RSTn streams decode to the identical pixels as the unmarked
    stream (DC predictors reset at every boundary)."""
    px = _smooth(64, 48)
    plain = decode_jpeg(encode_jpeg(px, 95, subsampling=subsampling))
    marked_bytes = encode_jpeg(
        px, 95, restart_interval=3, subsampling=subsampling
    )
    assert b"\xff\xdd" in marked_bytes            # DRI present
    assert b"\xff\xd0" in marked_bytes            # at least RST0
    assert np.array_equal(plain, decode_jpeg(marked_bytes))


def test_420_chroma_really_subsampled():
    """4:2:0 files must be materially smaller (half the chroma blocks) —
    the point of the layout."""
    px = _smooth(64, 64)
    assert len(encode_jpeg(px, 95, subsampling="420")) < 0.85 * len(
        encode_jpeg(px, 95, subsampling="444")
    )


def test_quality_dial_monotone():
    px = _noise(32, 32)
    sizes = [len(encode_jpeg(px, q)) for q in (50, 75, 92, 98)]
    psnrs = [psnr(px, decode_jpeg(encode_jpeg(px, q)))
             for q in (50, 75, 92, 98)]
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)


def test_grayscale_single_component_decodes():
    """The decoder handles 1-component baseline streams (a real web-scrape
    case); built here from the module's own primitives."""
    from pii_redactor_spark.fixtures.jpeg import (
        _BitWriter,
        _build_encode_table,
        _encode_block,
        _encode_plane_coeffs,
    )

    gray = np.clip(
        np.add.outer(np.arange(16) * 8, np.arange(16) * 8), 0, 255
    ).astype(np.uint8)
    q = _quality_scale(QUANT_LUM, 95)
    zz = _encode_plane_coeffs(gray.astype(np.float64), q)
    dc = _build_encode_table(DC_LUM_BITS, DC_LUM_VALS)
    ac = _build_encode_table(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    pred = 0
    for n in range(zz.shape[0]):
        pred = _encode_block(bw, zz[n].tolist(), pred, dc, ac)
    bw.flush()
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + q[ZIGZAG].astype(np.uint8).tobytes())
    out += _seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00] + DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += _seg(0xC4, bytes([0x10] + AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out + b"\xff\xd9"
    px = decode_jpeg(bytes(out))
    assert px.shape == (16, 16, 3)
    # gray replicated across channels, close to the source
    assert np.array_equal(px[..., 0], px[..., 1])
    assert float(np.abs(px[..., 0].astype(int) - gray.astype(int)).mean()) < 4


def test_honest_guards():
    px = _smooth(16, 16)
    good = bytearray(encode_jpeg(px, 95))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01" + bytes(good[2:]))    # no SOI
    i = good.find(b"\xff\xc0")
    # a baseline stream merely RELABELED SOF2 is structurally corrupt as
    # progressive (its single scan claims band 0..63 interleaved, illegal
    # for SOF2) — must be a ValueError, never a wrong image
    forged = bytearray(good)
    forged[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(forged))
    # genuinely out-of-scope SOF markers still refuse loudly
    hier = bytearray(good)
    hier[i + 1] = 0xC3                                 # SOF3 lossless
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(hier))


def test_codecs_entry_points_use_real_jpeg():
    """fixtures.codecs lossy path emits genuine JFIF now; legacy LQI1
    payloads stay decodable for pre-round-4 cached fixtures."""
    import zlib

    from pii_redactor_spark.fixtures.codecs import (
        decode_image,
        decode_lossy,
        encode_lossy,
    )

    px = _noise(24, 24)
    data = encode_lossy(px)
    assert data[:2] == b"\xff\xd8"
    assert psnr(px, decode_image(data, "jpeg")) >= 40.0
    legacy = (b"LQI1" + struct.pack(">HH", 4, 4)
              + zlib.compress(bytes(48)))
    assert decode_lossy(legacy).shape == (4, 4, 3)


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2 permits 0xFF fill bytes before any marker — real
    camera/libjpeg files contain them; the decoder, the restart resync,
    and the MJPEG segment walker must all skip them (round-4 review)."""
    from pii_redactor_spark.operators.vision import split_mjpeg_frames

    px = _noise(24, 24)
    ref = decode_jpeg(encode_jpeg(px, 95))
    b = bytearray(encode_jpeg(px, 95))
    i = b.find(b"\xff\xc0")
    b[i:i] = b"\xff\xff"                   # fill before SOF0
    j = len(b) - 2
    b[j:j] = b"\xff\xff\xff"               # fill before EOI
    assert np.array_equal(decode_jpeg(bytes(b)), ref)
    assert len(split_mjpeg_frames(bytes(b) * 2)) == 2
    br = bytearray(encode_jpeg(px, 95, restart_interval=2))
    k = br.find(b"\xff\xd0")
    br[k:k] = b"\xff\xff"                  # fill before RST0
    assert np.array_equal(decode_jpeg(bytes(br)), ref)


@pytest.mark.parametrize("cut", [4, 20, 100, -3])
def test_truncation_raises_valueerror_never_indexerror(cut):
    """Corrupt web-scrape bytes must surface as ValueError — the poison-row
    guards in operators.vision catch (NotImplementedError, ValueError);
    a leaking IndexError would kill the whole batch stage."""
    from pii_redactor_spark.operators.vision import split_mjpeg_frames

    b = encode_jpeg(_smooth(24, 24), 95)
    cut = cut if cut > 0 else len(b) + cut
    with pytest.raises(ValueError):
        decode_jpeg(b[:cut])
    with pytest.raises(ValueError):
        split_mjpeg_frames(b[:cut])


def test_decode_stats_survives_truncated_jpeg(spark):
    """End-to-end poison-row contract with the REAL codec: a truncated
    JPEG row comes back decoded=false; healthy rows are unaffected."""
    import numpy as np

    from pii_redactor_spark.fixtures.codecs import phash64
    from pii_redactor_spark.operators.vision import decode_stats

    rng = np.random.default_rng(3)
    px = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    good = encode_jpeg(px, 98)
    rows = [
        ("ok", bytearray(good), "jpeg", phash64(px)),
        ("trunc", bytearray(good[: len(good) // 2]), "jpeg", 0),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, phash long"
    )
    got = {r["image_id"]: r for r in decode_stats(df).collect()}
    assert got["ok"]["decoded"] is True
    assert got["trunc"]["decoded"] is False
    assert got["trunc"]["w"] is None


def _strip_segments(b: bytes, marker: int) -> bytes:
    """Remove every segment with the given marker byte from a JFIF stream
    (segment walker over the pre-SOS header region)."""
    out = bytearray(b[:2])
    pos = 2
    while pos < len(b) - 1:
        assert b[pos] == 0xFF
        m = b[pos + 1]
        if m == 0xDA:                       # SOS: keep the rest verbatim
            out += b[pos:]
            break
        (ln,) = struct.unpack(">H", b[pos + 2:pos + 4])
        if m != marker:
            out += b[pos:pos + 2 + ln]
        pos += 2 + ln
    return bytes(out)


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: _strip_segments(b, 0xC4), "Huffman table"),
        (lambda b: _strip_segments(b, 0xDB), "quantization table"),
    ],
)
def test_stripped_tables_raise_valueerror(mutate, msg):
    """ADVICE r4 (medium): corrupt streams with a stripped DHT/DQT or an
    SOS referencing an unknown component id must normalize to ValueError
    (descriptive), never KeyError — the poison-row guards catch only
    (NotImplementedError, ValueError)."""
    b = encode_jpeg(_smooth(24, 24), 95)
    bad = mutate(b)
    with pytest.raises(ValueError, match=msg):
        decode_jpeg(bad)


def test_sos_unknown_component_raises_valueerror():
    b = bytearray(encode_jpeg(_smooth(24, 24), 95))
    i = b.find(b"\xff\xda")
    # SOS payload: len(2) ns(1) then (cs, tdta) pairs — mangle the first
    # component selector to an id the SOF never declared.
    b[i + 5] = 0x77
    with pytest.raises(ValueError, match="undeclared component"):
        decode_jpeg(bytes(b))


def test_poison_guard_survives_stripped_dht(spark):
    """End-to-end: a stripped-DHT row must flag decoded=false instead of
    crashing the Spark task (the exact ADVICE failure mode)."""
    from pii_redactor_spark.operators.vision import decode_stats

    good = encode_jpeg(_smooth(16, 16), 98)
    rows = [
        ("ok", bytearray(good), "jpeg", 0),
        ("no_dht", bytearray(_strip_segments(good, 0xC4)), "jpeg", 0),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, phash long"
    )
    got = {r["image_id"]: r for r in decode_stats(df).collect()}
    assert got["ok"]["decoded"] is True
    assert got["no_dht"]["decoded"] is False


# --- progressive (SOF2) — round 5 -------------------------------------------


@pytest.mark.parametrize("shape", [(8, 8), (33, 41), (64, 64), (50, 70)])
@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_progressive_decodes_identical_to_baseline(shape, subsampling):
    """The progressive encode carries the SAME quantized coefficients as
    the baseline encode, so the decoded pixels must be bit-identical —
    any encoder/decoder asymmetry in the successive-approximation or
    EOB-run logic breaks this exact equality."""
    px = _smooth(*shape)
    base = decode_jpeg(encode_jpeg(px, 85, subsampling=subsampling))
    prog = decode_jpeg(
        encode_jpeg(px, 85, subsampling=subsampling, progressive=True)
    )
    assert np.array_equal(base, prog)


def test_progressive_noise_and_extreme_qualities():
    """Noise at high quality exercises dense AC refinement (correction
    bits); low quality exercises long EOB runs."""
    px = _noise(48, 80)
    for q in (35, 75, 98):
        base = decode_jpeg(encode_jpeg(px, q))
        prog = decode_jpeg(encode_jpeg(px, q, progressive=True))
        assert np.array_equal(base, prog), f"quality {q}"


def test_progressive_constant_image_pure_eob_runs():
    """A constant image makes every AC band empty: the whole scan is one
    EOBn run with extension bits — the run-length edge path."""
    px = np.full((40, 56, 3), 137, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, 70))
    prog = decode_jpeg(encode_jpeg(px, 70, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_stream_structure():
    """Structurally a real progressive JFIF: SOF2 marker, ten SOS scans
    (libjpeg's default script), per-scan optimized DHT segments, PSNR
    gate intact."""
    px = _noise(64, 64)
    data = encode_jpeg(px, 98, progressive=True)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    n_sos = data.count(b"\xff\xda")
    assert n_sos >= 10                  # marker bytes can also occur in
    assert psnr(px, decode_jpeg(data)) >= 40.0


def test_progressive_deterministic_and_smaller_on_smooth():
    px = _smooth(96, 96)
    a = encode_jpeg(px, 85, progressive=True)
    assert a == encode_jpeg(px, 85, progressive=True)
    # optimized per-scan tables: progressive should not blow up the size
    # (on smooth content it is typically SMALLER than baseline)
    assert len(a) < 1.2 * len(encode_jpeg(px, 85))


@pytest.mark.parametrize("cut_frac", [0.2, 0.5, 0.9])
def test_progressive_truncation_raises_valueerror(cut_frac):
    px = _noise(40, 40)
    data = encode_jpeg(px, 85, progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(data[: int(len(data) * cut_frac)])


def test_progressive_refuses_restart_interval_encode():
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(_noise(16, 16), 85, restart_interval=4,
                    progressive=True)


def test_progressive_through_vision_operators(spark):
    """decode_stats must treat a progressive row exactly like a baseline
    row: decoded=true, phash consistent with the same pixels."""
    from pii_redactor_spark.fixtures.jpeg import encode_jpeg as enc
    from pii_redactor_spark.operators.vision import decode_stats, phash64

    px = _smooth(32, 32)
    ph = phash64(decode_jpeg(enc(px, 92)))
    rows = [
        ("base", bytearray(enc(px, 92)), "jpeg", ph),
        ("prog", bytearray(enc(px, 92, progressive=True)), "jpeg", ph),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, phash long"
    )
    got = {r["image_id"]: r for r in decode_stats(df).collect()}
    assert got["base"]["decoded"] is True
    assert got["prog"]["decoded"] is True
    # identical pixels -> identical recomputed phash distance
    assert got["prog"]["phash_dist"] == got["base"]["phash_dist"] == 0


def test_progressive_restart_markers_decode():
    """The progressive decoder's restart path (next_segment + state
    reset per T.81 G.2): the encoder refuses DRI+progressive, so build a
    2-scan single-component SOF2 stream by hand from module primitives —
    DC scan and AC scan, each split by an RST0 marker every 4 blocks —
    and pin the pixels against the plain baseline decode."""
    from pii_redactor_spark.fixtures.jpeg import (
        QUANT_LUM,
        _BitWriter,
        _build_encode_table,
        _encode_plane_coeffs,
        _optimal_huffman,
        _quality_scale,
        _seg,
    )

    gray = np.clip(
        np.add.outer(np.arange(16) * 9, np.arange(32) * 4), 0, 255
    ).astype(np.uint8)
    q = _quality_scale(QUANT_LUM, 90)
    zz = _encode_plane_coeffs(gray.astype(np.float64), q).tolist()
    assert len(zz) == 8                                # 2x4 blocks
    from pii_redactor_spark.fixtures.jpeg import (
        _tokens_ac_first,
        _tokens_dc_first,
    )

    geom = [(1, 1, 4)]                                 # bw=4 blocks/row
    ri = 4                                             # restart interval

    def scan_bytes(tok_segments, table_class):
        # one optimized table over all segments' symbols
        freqs: dict[int, int] = {}
        for toks in tok_segments:
            for t in toks:
                if t[0] == "s":
                    freqs[t[2]] = freqs.get(t[2], 0) + 1
        bits, vals = _optimal_huffman(freqs or {0: 1})
        enc = _build_encode_table(bits, vals)
        body = bytearray()
        for i, toks in enumerate(tok_segments):
            if i:
                body += bytes([0xFF, 0xD0 + (i - 1) % 8])
            bw = _BitWriter()
            bw.write_many(
                [enc[t[2]] if t[0] == "s" else (t[1], t[2]) for t in toks]
            )
            bw.flush()
            body += bw.out
        dht = _seg(0xC4, bytes([table_class] + bits) + bytes(vals))
        return dht, bytes(body)

    # DC scan (Ss=Se=0, Ah=Al=0): restart resets the predictor, so each
    # segment's tokens are generated independently (pred starts at 0)
    dc_segs = [
        _tokens_dc_first([zz[s:s + ri]], (0,), [(1, 1, ri)], 0, False,
                         ri, ri)
        for s in range(0, 8, ri)
    ]
    dc_dht, dc_body = scan_bytes(dc_segs, 0x00)
    # AC scan (Ss=1..63, Ah=Al=0): EOB run state resets per segment
    ac_segs = [_tokens_ac_first(zz[s:s + ri], 1, 63, 0)
               for s in range(0, 8, ri)]
    ac_dht, ac_body = scan_bytes(ac_segs, 0x10)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + q[ZIGZAG].astype(np.uint8).tobytes())
    out += _seg(0xC2, struct.pack(">BHHB", 8, 16, 32, 1)
                + bytes([1, 0x11, 0]))
    out += _seg(0xDD, struct.pack(">H", ri))           # DRI
    out += dc_dht
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    out += dc_body
    out += ac_dht
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    out += ac_body
    out += b"\xff\xd9"
    px = decode_jpeg(bytes(out))
    assert px.shape == (16, 32, 3)
    # same coefficients as a baseline single-scan encode -> compare to
    # the grayscale baseline decode of the same plane
    assert np.array_equal(px[..., 0], px[..., 1])
    err = np.abs(px[..., 0].astype(int) - gray.astype(int)).mean()
    assert err < 6.0


def test_progressive_fuzzed_corruption_never_leaks_raw_errors():
    """Web-scrape poison-row contract over the SOF2 path: any byte
    mutation must decode, raise ValueError, or raise NotImplementedError
    — never IndexError/KeyError/struct.error (the vision guards catch
    only the first two)."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(px, 80, progressive=True))
    for trial in range(60):
        bad = bytearray(data)
        mode = trial % 3
        if mode == 0:                                  # flip one byte
            i = int(rng.integers(2, len(bad)))
            bad[i] ^= int(rng.integers(1, 256))
        elif mode == 1:                                # truncate
            bad = bad[: int(rng.integers(4, len(bad)))]
        else:                                          # splice garbage
            i = int(rng.integers(2, len(bad)))
            bad[i:i] = bytes(rng.integers(0, 256, 8, dtype=np.uint8))
        try:
            decode_jpeg(bytes(bad))
        except (ValueError, NotImplementedError):
            pass
