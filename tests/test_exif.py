"""Exif metadata: parse/build round trips, PII scrub, orientation.

The image-modality PII surface (GPS, serials, owner names, MakerNote,
IFD1 thumbnail, XMP) — the byte-stream counterpart of the caption
scrub's entity classes.  The load-bearing invariants:

* scrub never changes decoded pixels (entropy stream copied verbatim),
* scrub is idempotent,
* every malformed input raises ValueError and nothing else (the
  poison-row guards catch exactly that),
* orientation normalization transforms compose to identity with their
  Exif inverses.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pii_redactor_spark.fixtures import exif as E
from pii_redactor_spark.fixtures.jpeg import decode_jpeg, encode_jpeg


def _px(h=16, w=24, seed=3):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


def _full_ifds(orientation=6):
    return {
        "ifd0": {
            t.tag: t
            for t in [
                E.ExifTag(E.TAG_MAKE, E.TYPE_ASCII, "ExampleCam"),
                E.ExifTag(E.TAG_MODEL, E.TYPE_ASCII, "X100"),
                E.ExifTag(E.TAG_ORIENTATION, E.TYPE_SHORT, [orientation]),
                E.ExifTag(0x013B, E.TYPE_ASCII, "Jane Photographer"),
                E.ExifTag(0x8298, E.TYPE_ASCII, "(c) Jane P."),
                E.ExifTag(0x0132, E.TYPE_ASCII, "2026:08:19 10:00:00"),
            ]
        },
        "exif": {
            0xA431: E.ExifTag(0xA431, E.TYPE_ASCII, "SN-12345"),
            0xA435: E.ExifTag(0xA435, E.TYPE_ASCII, "LENS-9"),
            0xA430: E.ExifTag(0xA430, E.TYPE_ASCII, "Jane"),
            0x9003: E.ExifTag(0x9003, E.TYPE_ASCII, "2026:08:19 10:00:00"),
            0x927C: E.ExifTag(0x927C, E.TYPE_UNDEFINED, b"\x01\x02secret"),
            0x9286: E.ExifTag(0x9286, E.TYPE_UNDEFINED, b"ASCII\x00\x00\x00hi"),
            0xA420: E.ExifTag(0xA420, E.TYPE_ASCII, "deadbeef"),
        },
        "gps": {
            1: E.ExifTag(1, E.TYPE_ASCII, "N"),
            2: E.ExifTag(2, E.TYPE_RATIONAL, [(40, 1), (44, 1), (3000, 100)]),
            3: E.ExifTag(3, E.TYPE_ASCII, "E"),
            4: E.ExifTag(4, E.TYPE_RATIONAL, [(73, 1), (59, 1), (0, 1)]),
        },
    }


def _tagged_jpeg(orientation=6, quality=95):
    jp = encode_jpeg(_px(), quality=quality)
    return jp, E.insert_exif(jp, _full_ifds(orientation))


# ---------------------------------------------------------------------------
# TIFF build/parse round trips


def test_build_parse_round_trip_all_types():
    ifds = {
        "ifd0": {
            t.tag: t
            for t in [
                E.ExifTag(0x0100, E.TYPE_LONG, [640]),
                E.ExifTag(0x0101, E.TYPE_SHORT, [480, 7, 9]),
                E.ExifTag(0x010F, E.TYPE_ASCII, "abc"),
                E.ExifTag(0x9999, E.TYPE_UNDEFINED, b"\x00\xff\x10"),
                E.ExifTag(0x9998, E.TYPE_BYTE, b"\x05"),
                E.ExifTag(0x9997, E.TYPE_SLONG, [-5, 6]),
                E.ExifTag(0x9996, E.TYPE_SRATIONAL, [(-1, 3)]),
                E.ExifTag(0x9995, E.TYPE_RATIONAL, [(1, 2), (3, 4)]),
                E.ExifTag(0x9994, E.TYPE_SBYTE, [-3, 4]),
                E.ExifTag(0x9993, E.TYPE_SSHORT, [-300, 12]),
                E.ExifTag(0x9992, E.TYPE_FLOAT, [0.5, -2.25]),
                E.ExifTag(0x9991, E.TYPE_DOUBLE, [40.7437]),
            ]
        },
        "exif": {},
        "gps": {},
    }
    parsed = E.parse_tiff(E.build_tiff(ifds))
    for tag, want in ifds["ifd0"].items():
        assert parsed["ifd0"][tag] == want
    assert parsed["exif"] == {} and parsed["gps"] == {}


def test_inline_vs_offset_values():
    # <=4 bytes inline, >4 bytes out-of-line with word padding; both must
    # survive, including an odd-length ASCII forcing a pad byte.
    ifds = {
        "ifd0": {
            1: E.ExifTag(1, E.TYPE_ASCII, "ab"),        # 3B inline
            2: E.ExifTag(2, E.TYPE_ASCII, "abcd"),      # 5B offset, odd pad
            3: E.ExifTag(3, E.TYPE_SHORT, [1, 2]),      # 4B inline
            4: E.ExifTag(4, E.TYPE_SHORT, [1, 2, 3]),   # 6B offset
        },
        "exif": {},
        "gps": {},
    }
    parsed = E.parse_tiff(E.build_tiff(ifds))
    for tag, want in ifds["ifd0"].items():
        assert parsed["ifd0"][tag] == want


def test_parse_big_endian_stream():
    # Hand-assembled MM stream: one IFD, orientation=8 (builder is
    # canonical little-endian, so the MM path only exists in the parser).
    ifd = struct.pack(">H", 1) + struct.pack(
        ">HHI4s", E.TAG_ORIENTATION, E.TYPE_SHORT, 1,
        struct.pack(">H", 8) + b"\x00\x00",
    ) + struct.pack(">I", 0)
    data = struct.pack(">2sHI", b"MM", 42, 8) + ifd
    parsed = E.parse_tiff(data)
    assert parsed["ifd0"][E.TAG_ORIENTATION].values == [8]


def test_thumbnail_ifd1_parsed():
    # IFD0 with next-IFD pointer to IFD1 holding an embedded "JPEG".
    thumb = b"\xff\xd8thumbnail-bytes\xff\xd9"
    ifd0 = struct.pack("<H", 1) + struct.pack(
        "<HHI4s", E.TAG_ORIENTATION, E.TYPE_SHORT, 1,
        struct.pack("<H", 1) + b"\x00\x00",
    )
    ifd1_off = 8 + len(ifd0) + 4
    ifd1 = struct.pack("<H", 2)
    thumb_off = ifd1_off + 2 + 24 + 4
    ifd1 += struct.pack("<HHII", E.TAG_JPEG_IF, E.TYPE_LONG, 1, thumb_off)
    ifd1 += struct.pack("<HHII", E.TAG_JPEG_IF_LEN, E.TYPE_LONG, 1,
                        len(thumb))
    ifd1 += struct.pack("<I", 0)
    data = (struct.pack("<2sHI", b"II", 42, 8) + ifd0
            + struct.pack("<I", ifd1_off) + ifd1 + thumb)
    parsed = E.parse_tiff(data)
    assert parsed["thumbnail"] == thumb


# ---------------------------------------------------------------------------
# JPEG insert / extract / scrub


def test_insert_extract_pixels_untouched():
    jp, jx = _tagged_jpeg()
    parsed = E.extract_exif(jx)
    assert parsed["ifd0"][E.TAG_MAKE].values == "ExampleCam"
    assert parsed["gps"][2].values[0] == (40, 1)
    assert E.orientation_of(jx) == 6
    assert E.extract_exif(jp) is None and E.orientation_of(jp) == 1
    assert np.array_equal(decode_jpeg(jx), decode_jpeg(jp))


def test_scrub_removes_pii_keeps_rest():
    jp, jx = _tagged_jpeg()
    clean, rep = E.scrub_exif(jx)
    assert rep["had_exif"] and rep["had_gps"]
    assert rep["orientation"] == 6
    for name in ("GPS", "Artist", "Copyright", "MakerNote",
                 "UserComment", "ImageUniqueID", "CameraOwnerName",
                 "BodySerialNumber", "LensSerialNumber"):
        assert name in rep["removed"], name
    parsed = E.extract_exif(clean)
    assert not parsed["gps"]
    assert 0xA431 not in parsed["exif"] and 0x013B not in parsed["ifd0"]
    # non-PII survives: device, orientation, timestamps (default policy)
    assert parsed["ifd0"][E.TAG_MAKE].values == "ExampleCam"
    assert parsed["ifd0"][E.TAG_ORIENTATION].values == [6]
    assert parsed["exif"][0x9003].values == "2026:08:19 10:00:00"
    # and the pixels are byte-identical
    assert np.array_equal(decode_jpeg(clean), decode_jpeg(jp))


def test_scrub_policy_flags():
    _, jx = _tagged_jpeg()
    clean, _ = E.scrub_exif(jx, strip_device=True, strip_timestamps=True)
    parsed = E.extract_exif(clean)
    assert E.TAG_MAKE not in parsed["ifd0"]
    assert 0x0132 not in parsed["ifd0"] and 0x9003 not in parsed["exif"]


def test_scrub_idempotent():
    _, jx = _tagged_jpeg()
    once, _ = E.scrub_exif(jx)
    twice, rep2 = E.scrub_exif(once)
    assert twice == once
    assert not rep2["had_gps"] and rep2["removed"] == []


def test_scrub_drops_thumbnail():
    # Splice a hand-built IFD1 (with embedded thumbnail) onto a built
    # TIFF by rewriting IFD0's next-IFD pointer — the builder itself
    # never emits IFD1, which is the point of the scrub contract.
    jp = encode_jpeg(_px(), quality=95)
    tiff = bytearray(E.build_tiff(_full_ifds()))
    (n,) = struct.unpack_from("<H", tiff, 8)
    next_ptr_at = 8 + 2 + 12 * n
    thumb = b"\xff\xd8tiny\xff\xd9"
    ifd1_off = len(tiff)
    thumb_off = ifd1_off + 2 + 24 + 4
    ifd1 = struct.pack("<H", 2)
    ifd1 += struct.pack("<HHII", E.TAG_JPEG_IF, E.TYPE_LONG, 1, thumb_off)
    ifd1 += struct.pack("<HHII", E.TAG_JPEG_IF_LEN, E.TYPE_LONG, 1,
                        len(thumb))
    ifd1 += struct.pack("<I", 0)
    struct.pack_into("<I", tiff, next_ptr_at, ifd1_off)
    tiff += ifd1 + thumb
    payload = b"Exif\x00\x00" + bytes(tiff)
    jx = (jp[:2]
          + struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload
          + jp[2:])
    assert E.extract_exif(jx)["thumbnail"] == thumb
    clean, rep = E.scrub_exif(jx)
    assert rep["had_thumbnail"] and "Thumbnail" in rep["removed"]
    assert E.extract_exif(clean)["thumbnail"] is None
    assert E.extract_exif(clean)["ifd1"] == {}


def test_scrub_drops_xmp():
    jp = encode_jpeg(_px(), quality=95)
    xmp = (b"http://ns.adobe.com/xap/1.0/\x00"
           b"<x:xmpmeta><gps>40.7,-73.9</gps></x:xmpmeta>")
    seg = struct.pack(">BBH", 0xFF, 0xE1, len(xmp) + 2) + xmp
    jx = jp[:2] + seg + jp[2:]
    clean, rep = E.scrub_exif(jx)
    assert "XMP" in rep["removed"]
    assert b"xmpmeta" not in clean
    assert np.array_equal(decode_jpeg(clean), decode_jpeg(jp))
    kept, rep2 = E.scrub_exif(jx, drop_xmp=False)
    assert b"xmpmeta" in kept and "XMP" not in rep2["removed"]


# ---------------------------------------------------------------------------
# Poison inputs: ValueError and nothing else


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:20],                              # truncated TIFF
        lambda b: b"XX" + b[2:],                       # bad byte order
        lambda b: b[:2] + struct.pack("<H", 41) + b[4:],  # bad magic
        lambda b: b[:4] + struct.pack("<I", 10**6) + b[8:],  # IFD0 OOB
    ],
)
def test_parse_tiff_poison(mutate):
    good = E.build_tiff(_full_ifds())
    with pytest.raises(ValueError):
        E.parse_tiff(mutate(good))


def test_scrub_non_jpeg_raises_value_error():
    with pytest.raises(ValueError):
        E.scrub_exif(b"not a jpeg at all")


def test_exif_fuzz_value_error_only():
    # Bit-flips over the APP1 region must raise ValueError or succeed —
    # never KeyError/struct.error/IndexError (the r4 ADVICE failure
    # class for decode_jpeg).
    _, jx = _tagged_jpeg()
    rng = np.random.default_rng(11)
    for _ in range(300):
        buf = bytearray(jx)
        i = int(rng.integers(2, min(len(buf), 400)))
        buf[i] ^= 1 << int(rng.integers(0, 8))
        try:
            E.scrub_exif(bytes(buf))
        except ValueError:
            pass


def test_normalize_orientation_inverses_and_shapes():
    a = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    for o, inv in [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 8),
                   (7, 7), (8, 6)]:
        once = E.normalize_orientation(a, o)
        if o in (5, 6, 7, 8):
            assert once.shape == (4, 2, 3)
        back = E.normalize_orientation(once, inv)
        assert np.array_equal(back, a), (o, inv)
    with pytest.raises(ValueError):
        E.normalize_orientation(a, 9)


def test_normalize_orientation_hand_case():
    # 2x2: [[a,b],[c,d]]; orientation 6 (stored 90 CCW) -> display
    # rotates 90 CW: [[c,a],[d,b]]; transverse (7) flips the
    # anti-diagonal: [[d,b],[c,a]].
    a = np.array([[[1], [2]], [[3], [4]]], dtype=np.uint8)
    assert E.normalize_orientation(a, 6)[:, :, 0].tolist() == [[3, 1], [4, 2]]
    assert E.normalize_orientation(a, 7)[:, :, 0].tolist() == [[4, 2], [3, 1]]
    assert E.normalize_orientation(a, 5)[:, :, 0].tolist() == [[1, 3], [2, 4]]


# ---------------------------------------------------------------------------
# PNG / WebP / GIF carriers


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload)))


def test_scrub_png_text_and_exif_chunk():
    from pii_redactor_spark.fixtures.codecs import decode_png, encode_png

    png = encode_png(_px())
    tiff = E.build_tiff(_full_ifds(orientation=3))
    # splice tEXt + iTXt + eXIf right after IHDR (sig 8 + IHDR 25)
    cut = 8 + 25
    tagged = (png[:cut]
              + _png_chunk(b"tEXt", b"Author\x00Jane Photographer")
              + _png_chunk(b"iTXt", b"XML:com.adobe.xmp\x00\x00\x00\x00\x00<x/>")
              + _png_chunk(b"eXIf", tiff)
              + png[cut:])
    clean, rep = E.scrub_png_metadata(tagged)
    assert rep["had_exif"] and rep["had_gps"] and rep["orientation"] == 3
    for name in ("tEXt", "iTXt", "GPS", "Artist", "BodySerialNumber"):
        assert name in rep["removed"], name
    assert b"Jane Photographer" not in clean
    assert b"eXIf" in clean  # scrubbed-and-rebuilt, orientation survives
    assert np.array_equal(decode_png(clean), decode_png(png))
    # idempotent, and a plain PNG is untouched
    again, rep2 = E.scrub_png_metadata(clean)
    assert again == clean and not rep2["had_gps"]
    same, rep3 = E.scrub_png_metadata(png)
    assert same == png and rep3["removed"] == []


def test_scrub_png_poison():
    with pytest.raises(ValueError):
        E.scrub_png_metadata(b"not a png")
    from pii_redactor_spark.fixtures.codecs import encode_png

    png = encode_png(_px())
    with pytest.raises(ValueError):
        E.scrub_png_metadata(png[:20])  # truncated chunk


def test_scrub_webp_exif_xmp_chunks():
    from pii_redactor_spark.fixtures.webp import decode_webp, encode_webp

    wp = encode_webp(_px())
    tiff = E.build_tiff(_full_ifds(orientation=6))

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    # rebuild container: VP8X (EXIF+XMP flags set) + image chunks + metadata
    h, w = _px().shape[:2]
    vp8x = struct.pack("<B3s", 0x0C, b"\x00\x00\x00")
    vp8x += struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
    body = (chunk(b"VP8X", vp8x) + wp[12:]
            + chunk(b"EXIF", b"Exif\x00\x00" + tiff)
            + chunk(b"XMP ", b"<x:xmpmeta gps='40.7,-73.9'/>"))
    tagged = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    clean, rep = E.scrub_webp_metadata(tagged)
    assert rep["had_exif"] and rep["had_gps"] and rep["orientation"] == 6
    assert "EXIF" in rep["removed"] and "XMP" in rep["removed"]
    assert b"xmpmeta" not in clean and b"Exif\x00\x00" not in clean
    # VP8X flags cleared, RIFF size consistent, pixels identical
    vp8x_off = clean.index(b"VP8X") + 8
    assert clean[vp8x_off] & 0x0C == 0
    assert struct.unpack("<I", clean[4:8])[0] == len(clean) - 8
    assert np.array_equal(decode_webp(clean), decode_webp(wp))
    again, rep2 = E.scrub_webp_metadata(clean)
    assert again == clean and rep2["removed"] == []
    with pytest.raises(ValueError):
        E.scrub_webp_metadata(b"RIFFxxxxNOPE")


def test_scrub_gif_comment_and_xmp():
    from pii_redactor_spark.fixtures.gif import decode_gif, encode_gif

    gf = encode_gif(_px())
    # comment extension + XMP application extension + NETSCAPE (kept),
    # spliced right after header + GCT, before the image descriptor
    packed = gf[10]
    hdr_end = 13 + (3 * (2 << (packed & 0x07)) if packed & 0x80 else 0)
    comment = b"\x21\xfe" + bytes([25]) + b"shot by Jane at the cabin" + b"\x00"
    xmp_payload = b"<x:xmpmeta gps='40.7'/>"
    # magic trailer: 0x01 then 255..0 descending (spec hack) — makes the
    # generic sub-block walk terminate correctly
    trailer = b"\x01" + bytes(range(255, -1, -1))
    xmp = b"\x21\xff\x0bXMP DataXMP" + xmp_payload + trailer + b"\x00"
    netscape = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    tagged = gf[:hdr_end] + comment + xmp + netscape + gf[hdr_end:]
    clean, rep = E.scrub_gif_metadata(tagged)
    assert "Comment" in rep["removed"] and "XMP" in rep["removed"]
    assert b"Jane" not in clean and b"xmpmeta" not in clean
    assert b"NETSCAPE2.0" in clean
    assert np.array_equal(decode_gif(clean), decode_gif(gf))
    again, rep2 = E.scrub_gif_metadata(clean)
    assert again == clean and rep2["removed"] == []
    with pytest.raises(ValueError):
        E.scrub_gif_metadata(b"GIF89a\x00")


# ---------------------------------------------------------------------------
# Spark operator


def test_scrub_image_metadata_spark(spark):
    from pii_redactor_spark.operators.vision import scrub_image_metadata

    from pii_redactor_spark.fixtures.codecs import encode_png

    jp, jx = _tagged_jpeg()
    png = encode_png(_px())
    png_tagged = (png[:33]
                  + _png_chunk(b"tEXt", b"Author\x00Jane")
                  + png[33:])
    rows = [
        ("with_gps", bytearray(jx), "jpeg"),
        ("plain", bytearray(jp), "jpeg"),
        ("png_row", bytearray(png_tagged), "png"),
        ("bmp_row", bytearray(b"BM fake"), "bmp"),
        ("corrupt", bytearray(b"\xff\xd8\xff"), "jpeg"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {r["image_id"]: r for r in scrub_image_metadata(df).collect()}
    assert out["with_gps"]["had_gps"] and out["with_gps"]["flag"] == "ok"
    assert out["with_gps"]["orientation"] == 6
    assert "GPS" in out["with_gps"]["removed"]
    clean = bytes(out["with_gps"]["bytes"])
    assert E.extract_exif(clean)["gps"] == {}
    assert np.array_equal(decode_jpeg(clean), decode_jpeg(jp))
    assert out["plain"]["flag"] == "ok" and not out["plain"]["had_exif"]
    assert bytes(out["plain"]["bytes"]) == jp
    assert out["png_row"]["flag"] == "ok"
    assert "tEXt" in out["png_row"]["removed"]
    assert b"Jane" not in bytes(out["png_row"]["bytes"])
    assert out["bmp_row"]["flag"] == "unsupported_fmt"
    assert out["corrupt"]["flag"] == "corrupt"
    assert bytes(out["corrupt"]["bytes"]) == b"\xff\xd8\xff"


def test_with_metadata_scrub_in_place(spark):
    from pii_redactor_spark.operators.vision import with_metadata_scrub

    jp, jx = _tagged_jpeg()
    df = spark.createDataFrame(
        [("a", bytearray(jx), "jpeg", "a cat", 7),
         ("b", bytearray(jp), "jpeg", "a dog", 8)],
        "image_id string, bytes binary, fmt string, caption string, "
        "phash long",
    )
    out = {r["image_id"]: r for r in with_metadata_scrub(df).collect()}
    # in-place: bytes column replaced, every other column passed through
    assert out["a"]["caption"] == "a cat" and out["a"]["phash"] == 7
    assert out["a"]["meta_had_gps"] and "GPS" in out["a"]["meta_removed"]
    assert E.extract_exif(bytes(out["a"]["bytes"]))["gps"] == {}
    assert np.array_equal(
        decode_jpeg(bytes(out["a"]["bytes"])), decode_jpeg(jp)
    )
    assert bytes(out["b"]["bytes"]) == jp and not out["b"]["meta_had_gps"]


def test_pipeline_materialize_scrubs_metadata(spark, tmp_root):
    from pii_redactor_spark.fixtures.codecs import phash64, phash_prefix
    from pii_redactor_spark.pipeline.run import run_pipeline

    jp, jx = _tagged_jpeg()
    ph = phash64(_px())
    rows = [
        (f"img{i}", bytearray(jx if i % 2 else jp), 24, 16, "jpeg",
         f"caption {i} with email a{i}@example.com", ph, phash_prefix(ph))
        for i in range(8)
    ]
    src = f"{tmp_root}/exif_pipe_src"
    spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, phash_prefix int",
    ).write.mode("overwrite").parquet(src)
    out = f"{tmp_root}/exif_pipe_out"
    summary = run_pipeline(
        spark, src, out, materialize_bytes=True, scrub_metadata=True
    )
    assert summary["n_in"] == 8
    data = spark.read.parquet(f"{out}/data")
    got = {r["image_id"]: r for r in data.collect()}
    for i in range(8):
        b = bytes(got[f"img{i}"]["bytes"])
        parsed = E.extract_exif(b)
        if i % 2:
            assert got[f"img{i}"]["meta_had_gps"]
            assert parsed is not None and parsed["gps"] == {}
        else:
            assert parsed is None
        assert np.array_equal(decode_jpeg(b), decode_jpeg(jp))
    # decisions mode refuses by contract
    with pytest.raises(ValueError, match="materialize"):
        run_pipeline(spark, src, f"{tmp_root}/exif_pipe_bad",
                     materialize_bytes=False, scrub_metadata=True)


def test_scrub_exif_progressive_jpeg():
    # Progressive streams carry MULTIPLE SOS segments; the walker stops
    # at the first and copies the remaining scan sequence verbatim, so
    # the scrub must leave a multi-scan file decodable and bit-identical.
    jp = encode_jpeg(_px(), quality=90, progressive=True)
    jx = E.insert_exif(jp, _full_ifds(orientation=8))
    clean, rep = E.scrub_exif(jx)
    assert rep["had_gps"] and rep["orientation"] == 8
    assert E.extract_exif(clean)["gps"] == {}
    assert np.array_equal(decode_jpeg(clean), decode_jpeg(jp))


# ---------------------------------------------------------------------------
# Property: arbitrary well-formed tag sets round-trip through build/parse

from hypothesis import given, settings
from hypothesis import strategies as st


def _tag_strategy():
    ascii_text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=24,
    )
    u16 = st.integers(0, 0xFFFF)
    u32 = st.integers(0, 0xFFFFFFFF)
    i32 = st.integers(-(2**31), 2**31 - 1)
    by_type = st.one_of(
        st.tuples(st.just(E.TYPE_ASCII), ascii_text),
        st.tuples(st.just(E.TYPE_BYTE),
                  st.binary(min_size=1, max_size=12)),
        st.tuples(st.just(E.TYPE_UNDEFINED),
                  st.binary(min_size=1, max_size=12)),
        st.tuples(st.just(E.TYPE_SHORT),
                  st.lists(u16, min_size=1, max_size=6)),
        st.tuples(st.just(E.TYPE_LONG),
                  st.lists(u32, min_size=1, max_size=4)),
        st.tuples(st.just(E.TYPE_SLONG),
                  st.lists(i32, min_size=1, max_size=4)),
        st.tuples(st.just(E.TYPE_SSHORT),
                  st.lists(st.integers(-(2**15), 2**15 - 1),
                           min_size=1, max_size=6)),
        st.tuples(st.just(E.TYPE_SBYTE),
                  st.lists(st.integers(-128, 127),
                           min_size=1, max_size=8)),
        st.tuples(st.just(E.TYPE_RATIONAL),
                  st.lists(st.tuples(u32, u32), min_size=1, max_size=3)),
        st.tuples(st.just(E.TYPE_SRATIONAL),
                  st.lists(st.tuples(i32, i32), min_size=1, max_size=3)),
        st.tuples(st.just(E.TYPE_DOUBLE),
                  st.lists(st.floats(allow_nan=False, allow_infinity=False,
                                     width=64),
                           min_size=1, max_size=3)),
    )
    # avoid the pointer tags (rebuilt from structure, not round-tripped)
    tag_id = st.integers(1, 0xFFFF).filter(
        lambda t: t not in (E.TAG_EXIF_IFD, E.TAG_GPS_IFD)
    )
    return st.tuples(tag_id, by_type)


@settings(max_examples=60, deadline=None)
@given(
    ifd0=st.dictionaries(st.integers(1, 3), _tag_strategy(),
                         min_size=0, max_size=6),
    exif=st.dictionaries(st.integers(1, 3), _tag_strategy(),
                         min_size=0, max_size=4),
    gps=st.dictionaries(st.integers(1, 3), _tag_strategy(),
                        min_size=0, max_size=4),
)
def test_build_parse_round_trip_property(ifd0, exif, gps):
    def mk(d):
        out = {}
        for _, (tid, (typ, vals)) in d.items():
            if typ == E.TYPE_BYTE or typ == E.TYPE_UNDEFINED:
                vals = bytes(vals)
            elif typ == E.TYPE_SBYTE or typ == E.TYPE_SSHORT:
                vals = list(vals)
            out[tid] = E.ExifTag(tid, typ, vals)
        return out

    ifds = {"ifd0": mk(ifd0), "exif": mk(exif), "gps": mk(gps)}
    parsed = E.parse_tiff(E.build_tiff(ifds))
    for key in ("ifd0", "exif", "gps"):
        want = dict(ifds[key])
        # the builder adds pointer tags to ifd0 when sub-IFDs exist;
        # ignore them in the comparison
        got = {
            t: v for t, v in parsed[key].items()
            if t not in (E.TAG_EXIF_IFD, E.TAG_GPS_IFD)
        }
        want = {
            t: v for t, v in want.items()
            if t not in (E.TAG_EXIF_IFD, E.TAG_GPS_IFD)
        }
        assert got == want, (key, got, want)


def test_metadata_scrub_passes_integrity_gate(spark):
    """Composition: the north-star differential-diff gate
    (verify_integrity, A8) over a metadata-scrubbed table — every
    container's scrubbed bytes must decode to the exact source pixels
    (PSNR inf / allclose), proving the scrub touched only metadata."""
    from pii_redactor_spark.fixtures.codecs import encode_png
    from pii_redactor_spark.fixtures.gif import encode_gif
    from pii_redactor_spark.fixtures.webp import encode_webp
    from pii_redactor_spark.operators.vision import (
        scrub_image_metadata,
        verify_integrity,
    )

    _, jx = _tagged_jpeg()
    png = encode_png(_px())
    png_tagged = png[:33] + _png_chunk(b"tEXt", b"Author\x00Jane") + png[33:]
    gf = encode_gif(_px())
    note = b"\x21\xfe\x04Jane\x00"
    packed = gf[10]
    cut = 13 + (3 * (2 << (packed & 0x07)) if packed & 0x80 else 0)
    gif_tagged = gf[:cut] + note + gf[cut:]
    wp = encode_webp(_px())
    xmp = b"XMP " + struct.pack("<I", 4) + b"<x/>"
    wp_tagged = (b"RIFF" + struct.pack("<I", 4 + len(wp[12:] + xmp))
                 + b"WEBP" + wp[12:] + xmp)
    rows = [
        ("j", bytearray(jx), "jpeg"),
        ("p", bytearray(png_tagged), "png"),
        ("g", bytearray(gif_tagged), "gif"),
        ("w", bytearray(wp_tagged), "webp"),
    ]
    src = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    )
    scrubbed = scrub_image_metadata(src)
    res = {r["image_id"]: r
           for r in verify_integrity(scrubbed, src).collect()}
    assert all(res[k]["ok"] for k in "jpgw"), res


def test_decode_stats_apply_orientation(spark):
    """Orientation 6 (stored 90deg CCW): display w/h must swap relative
    to the sensor decode, channel means are rotation-invariant, and the
    phash check (raw-decode contract) still passes."""
    from pii_redactor_spark.fixtures.codecs import phash64
    from pii_redactor_spark.operators.vision import decode_stats

    jp = encode_jpeg(_px(h=16, w=24), quality=95)
    jx = E.insert_exif(jp, _full_ifds(orientation=6))
    ph = phash64(decode_jpeg(jp))
    df = spark.createDataFrame(
        [("r", bytearray(jx), "jpeg", ph)],
        "image_id string, bytes binary, fmt string, phash long",
    )
    raw = decode_stats(df).collect()[0]
    disp = decode_stats(df, apply_orientation=True).collect()[0]
    assert (raw["w"], raw["h"]) == (24, 16)
    assert (disp["w"], disp["h"]) == (16, 24)
    assert abs(raw["mean_r"] - disp["mean_r"]) < 1e-9
    assert disp["phash_check"]
