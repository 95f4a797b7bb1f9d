"""YUV4MPEG2 (``.y4m``) codec — pure NumPy, written against the public
YUV4MPEG2 stream format (mjpegtools ``y4m(5)`` man page; the de-facto
interchange format for raw video in codec test suites), the way
``fixtures/jpeg.py`` is written against ITU-T T.81 and ``fixtures/gif.py``
against the GIF89a spec.

Scope (round 5 — extends the video axis beyond Motion-JPEG and animated
GIF/WebP with the one UNCOMPRESSED video container real pipelines see):

* **Decode** handles the stream header (``W`` ``H`` ``F`` ``I`` ``A``
  ``C`` ``X`` parameters in any order, unknown tags skipped by the
  spec's rule that a parameter is one space-delimited token), per-frame
  ``FRAME`` headers with optional parameters, and the colorspaces
  ``C444``, ``C422``, ``C420jpeg`` / ``C420mpeg2`` / ``C420paldv``
  (identical plane layout, differing only in chroma *siting* — all are
  decoded with aligned nearest-neighbor upsampling) and ``Cmono``.
  Output is HxWx3 uint8 RGB via the same BT.601 full-range matrix the
  JPEG codec uses — ``C420jpeg`` *is* JPEG levels by definition.
* **Encode** emits ``C444``, ``C420jpeg``, ``C422`` or ``Cmono``
  streams from RGB frames.  Grayscale content (R==G==B) round-trips
  **byte-exact** in every colorspace (the BT.601 row sums to 1.0 and
  Cb=Cr=128 reconstructs identically); color content is bounded by the
  YCbCr uint8 rounding (±1/channel in C444) plus the 2x2 (420) / 1x2
  (422) box-mean chroma subsampling.
* Every parse failure — bad magic, truncated plane, malformed header
  token, odd dimensions in a subsampled colorspace — normalizes to
  ``ValueError`` so the poison-row guards in ``operators/vision.py``
  treat corrupt web-scrape bytes uniformly (the ADVICE-r4 KeyError
  lesson, applied from the start here).

Like the other fixture codecs this exists for fixture generation and
integrity verification; raw-plane slicing is NumPy-vectorized and fast
(no entropy coding), so unlike JPEG it has no per-symbol Python floor.

Reference parity note: the reference repo (a-agmon/pii-redactor) is
text-only; this module serves the north rule's multimodal axis (frame
sampling over binary video columns, ``operators/vision.py``).
"""

from __future__ import annotations

import numpy as np

from .jpeg import _rgb_to_ycbcr, _ycbcr_to_rgb

_MAGIC = b"YUV4MPEG2"

# colorspace -> (chroma x-subsample, chroma y-subsample); None = no chroma
_COLORSPACES = {
    "C444": (1, 1),
    "C422": (2, 1),
    "C420jpeg": (2, 2),
    "C420mpeg2": (2, 2),
    "C420paldv": (2, 2),
    "C420": (2, 2),
    "Cmono": None,
}


def _parse_params(tokens: list[bytes], *, what: str) -> dict[str, str]:
    """Space-delimited ``<tag-letter><value>`` tokens -> {tag: value}."""
    out: dict[str, str] = {}
    for tok in tokens:
        if not tok:
            raise ValueError(f"empty parameter token in {what} header")
        try:
            tag = chr(tok[0])
            out[tag] = tok[1:].decode("ascii")
        except UnicodeDecodeError as exc:
            raise ValueError(f"non-ASCII {what} header parameter") from exc
    return out


def _parse_stream_header(data: bytes) -> tuple[int, int, str, int]:
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream (magic/header missing)")
    tokens = data[:nl].split(b" ")
    if tokens[0] != _MAGIC:
        raise ValueError("not a YUV4MPEG2 stream (magic/header missing)")
    params = _parse_params(tokens[1:], what="stream")
    try:
        w = int(params["W"])
        h = int(params["H"])
    except (KeyError, ValueError) as exc:
        raise ValueError("YUV4MPEG2 header missing W/H") from exc
    if w <= 0 or h <= 0:
        raise ValueError(f"bad YUV4MPEG2 dimensions {w}x{h}")
    cs = "C" + params.get("C", "420jpeg")  # spec default is 420jpeg
    if cs not in _COLORSPACES:
        raise ValueError(f"unknown YUV4MPEG2 colorspace {cs!r}")
    sub = _COLORSPACES[cs]
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise ValueError(
            f"{cs} requires dimensions divisible by {sub[0]}x{sub[1]}, "
            f"got {w}x{h}"
        )
    return w, h, cs, nl + 1


def _plane_sizes(w: int, h: int, cs: str) -> tuple[int, ...]:
    sub = _COLORSPACES[cs]
    if sub is None:
        return (w * h,)
    cw, ch = w // sub[0], h // sub[1]
    return (w * h, cw * ch, cw * ch)


def decode_y4m_frames(data: bytes) -> list[np.ndarray]:
    """Decode every frame of a YUV4MPEG2 stream to HxWx3 uint8 RGB."""
    try:
        return _decode_inner(bytes(data))
    except ValueError:
        raise
    except (IndexError, OverflowError, MemoryError) as exc:
        raise ValueError(f"corrupt YUV4MPEG2 stream: {exc!r}") from exc


def _decode_inner(data: bytes) -> list[np.ndarray]:
    w, h, cs, pos = _parse_stream_header(data)
    sizes = _plane_sizes(w, h, cs)
    frame_bytes = sum(sizes)
    sub = _COLORSPACES[cs]
    frames: list[np.ndarray] = []
    while pos < len(data):
        nl = data.find(b"\n", pos)
        if nl < 0:
            raise ValueError("truncated YUV4MPEG2 FRAME header")
        tokens = data[pos:nl].split(b" ")
        if tokens[0] != b"FRAME":
            raise ValueError("expected FRAME marker in YUV4MPEG2 stream")
        _parse_params(tokens[1:], what="frame")  # validate, values unused
        pos = nl + 1
        if pos + frame_bytes > len(data):
            raise ValueError("truncated YUV4MPEG2 frame payload")
        y = np.frombuffer(data, np.uint8, sizes[0], pos).reshape(h, w)
        if sub is None:
            frames.append(np.repeat(y[..., None], 3, axis=-1).copy())
        else:
            cw, ch = w // sub[0], h // sub[1]
            cb = np.frombuffer(
                data, np.uint8, sizes[1], pos + sizes[0]
            ).reshape(ch, cw)
            cr = np.frombuffer(
                data, np.uint8, sizes[2], pos + sizes[0] + sizes[1]
            ).reshape(ch, cw)
            cb = np.repeat(np.repeat(cb, sub[1], 0), sub[0], 1)
            cr = np.repeat(np.repeat(cr, sub[1], 0), sub[0], 1)
            frames.append(
                _ycbcr_to_rgb(
                    y.astype(np.float64), cb.astype(np.float64),
                    cr.astype(np.float64),
                )
            )
        pos += frame_bytes
    if not frames:
        raise ValueError("YUV4MPEG2 stream has no frames")
    return frames


def _box_mean(plane: np.ndarray, sx: int, sy: int) -> np.ndarray:
    h, w = plane.shape
    return (
        plane.reshape(h // sy, sy, w // sx, sx)
        .mean(axis=(1, 3))
        .round()
        .clip(0, 255)
        .astype(np.uint8)
    )


def encode_y4m(
    frames: list[np.ndarray],
    *,
    colorspace: str = "C420jpeg",
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Encode HxWx3 uint8 RGB frames as a YUV4MPEG2 stream."""
    if not frames:
        raise ValueError("encode_y4m needs at least one frame")
    if colorspace not in _COLORSPACES:
        raise ValueError(f"unknown YUV4MPEG2 colorspace {colorspace!r}")
    h, w = frames[0].shape[:2]
    sub = _COLORSPACES[colorspace]
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise ValueError(
            f"{colorspace} requires dimensions divisible by "
            f"{sub[0]}x{sub[1]}, got {w}x{h}"
        )
    out = [
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n"
        % (w, h, fps[0], fps[1], colorspace.encode("ascii"))
    ]
    for fr in frames:
        if fr.shape[:2] != (h, w) or fr.shape[2:] != (3,):
            raise ValueError("all frames must share one HxWx3 shape")
        ycc = _rgb_to_ycbcr(fr).round().clip(0, 255).astype(np.uint8)
        out.append(b"FRAME\n")
        out.append(ycc[..., 0].tobytes())
        if sub is not None:
            out.append(_box_mean(ycc[..., 1], sub[0], sub[1]).tobytes())
            out.append(_box_mean(ycc[..., 2], sub[0], sub[1]).tobytes())
    return b"".join(out)
