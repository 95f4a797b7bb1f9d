"""WAV (RIFF/WAVE) codec — pure stdlib/NumPy, written against the public
WAVE file format (Microsoft/IBM Multimedia Programming Interface and Data
Specifications 1.0, 1991; RFC 2361 WAVE format registry) the way
``fixtures/jpeg.py`` is written against ITU-T T.81.

Scope (round 5 — opens the AUDIO leg of the multimodal axis; images and
video already decode for real):

* **Decode** walks RIFF chunks properly (fmt / data plus foreign chunks
  — LIST, fact, cue, bext — skipped by declared size with word
  alignment), and supports the PCM family real corpora carry: format 1
  (integer PCM, 8/16/24/32-bit) and format 3 (IEEE float32), plus the
  WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapper around either, any channel
  count, any sample rate.  Output dtype reflects the container exactly
  — uint8 / int16 / int32 (24-bit widened with the low byte zero, the
  lossless convention) / float32 — so integer content round-trips
  **byte-exact**.
* **Encode** emits canonical little-endian RIFF/WAVE with a single fmt
  + data pair from a (n_samples, channels) or (n_samples,) array of
  one of those dtypes.
* **G.711 telephony companding decodes for real**: format 6 (A-law)
  and 7 (µ-law) expand through the 256-entry ITU-T G.711 tables
  (computed from the public definition; tests pin them bit-exact
  against CPython's ``audioop`` reference) to int16 — the call-center /
  telephony corpora format — and a vectorized nearest-level encoder
  round-trips them.
* **IMA/DVI ADPCM (format 0x11) decodes for real**: per-block headers
  (predictor + step index), channel-interleaved 4-byte nibble words,
  the standard step/index tables — the expansion recursion is pinned
  bit-exact against ``audioop``'s DVI coder.  The per-sample loop is
  sequential by construction (predictor recursion); honest Python
  speed, like the entropy-coded image codecs.
* Every parse failure — bad magic, missing fmt/data, truncated payload,
  byte counts that contradict the declared block align, mangled ADPCM
  blocks, remaining compressed formats (MS-ADPCM/MP3 report their
  format code) — normalizes to ``ValueError`` (out-of-scope codecs
  refuse LOUDLY via ``NotImplementedError``) so poison-row guards in
  ``operators/audio.py`` treat corrupt web-scrape bytes uniformly.

Raw-sample slicing and the G.711 tables are NumPy-vectorized; only the
IMA ADPCM predictor recursion pays a per-sample Python loop.

Reference parity note: the reference repo (a-agmon/pii-redactor) is
text-only; this module serves the north rule's multimodal axis (typed
binary columns + metadata gates, ``operators/audio.py``).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3
_ALAW = 6
_MULAW = 7
_IMA_ADPCM = 0x11
_EXTENSIBLE = 0xFFFE

# IMA/DVI ADPCM tables (public spec; the step function is pinned
# bit-exact against CPython's audioop DVI coder in tests — audioop packs
# the first nibble HIGH, WAV blocks pack it LOW, same arithmetic)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_decode_nibbles(nibbles, pred: int, idx: int) -> list[int]:
    """Sequential IMA ADPCM expansion (the predictor recursion cannot be
    vectorized); plain-int locals keep the loop at the interpreter floor."""
    out = []
    step_t, idx_t = _IMA_STEP, _IMA_INDEX
    append = out.append
    for nb in nibbles:
        step = step_t[idx]
        diff = step >> 3
        if nb & 1:
            diff += step >> 2
        if nb & 2:
            diff += step >> 1
        if nb & 4:
            diff += step
        pred = pred - diff if nb & 8 else pred + diff
        if pred > 32767:
            pred = 32767
        elif pred < -32768:
            pred = -32768
        idx += idx_t[nb & 7]
        if idx < 0:
            idx = 0
        elif idx > 88:
            idx = 88
        append(pred)
    return out


def _decode_ima_adpcm(
    data_payload: bytes, ch: int, block_align: int
) -> np.ndarray:
    """WAV IMA ADPCM blocks -> (n, ch) int16: per block and channel a
    4-byte header (int16 predictor emitted as the first sample, step
    index, reserved), then nibble words interleaved 4 bytes per channel,
    LOW nibble first."""
    if block_align < 4 * ch or (block_align - 4 * ch) % (4 * ch):
        raise ValueError(
            f"IMA ADPCM block align {block_align} invalid for {ch} ch"
        )
    chans: list[list[int]] = [[] for _ in range(ch)]
    pos = 0
    n = len(data_payload)
    while pos < n:
        block = data_payload[pos:pos + block_align]
        if len(block) < 4 * ch:
            raise ValueError("truncated IMA ADPCM block header")
        preds, idxs = [], []
        for c in range(ch):
            pred, idx, _res = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError(f"IMA ADPCM step index {idx} > 88")
            preds.append(pred)
            idxs.append(idx)
            chans[c].append(pred)
        body = block[4 * ch:]
        if len(body) % (4 * ch):
            raise ValueError("IMA ADPCM block data is not whole words")
        for c in range(ch):
            nibbles = []
            for w in range(len(body) // (4 * ch)):
                for b in body[(w * ch + c) * 4:(w * ch + c) * 4 + 4]:
                    nibbles.append(b & 0x0F)
                    nibbles.append(b >> 4)
            chans[c].extend(
                _ima_decode_nibbles(nibbles, preds[c], idxs[c])
            )
        pos += block_align
    return np.array(chans, dtype=np.int16).T


def encode_wav_adpcm(samples: np.ndarray, sample_rate: int,
                     samples_per_block: int = 505) -> bytes:
    """Encode int16 samples as a WAV IMA ADPCM (format 0x11) stream —
    standard greedy quantizer against the same tables the decoder uses."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.dtype != np.int16 or arr.ndim != 2 or arr.shape[0] == 0:
        raise ValueError("ADPCM encode expects (n[, ch]) int16 samples")
    if sample_rate <= 0:
        raise ValueError(f"bad sample rate {sample_rate}")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 8k + 1")
    n, ch = arr.shape
    block_align = 4 * ch + (samples_per_block - 1) // 2 * ch
    out = bytearray()
    idxs = [0] * ch
    for lo in range(0, n, samples_per_block):
        blk = arr[lo:lo + samples_per_block]
        if blk.shape[0] < samples_per_block:  # zero-pad the final block
            pad = np.zeros(
                (samples_per_block - blk.shape[0], ch), np.int16
            )
            blk = np.vstack([blk, pad])
        nib_by_ch = []
        for c in range(ch):
            pred = int(blk[0, c])
            idx = idxs[c]
            out += struct.pack("<hBB", pred, idx, 0)
            nibs = []
            for s in blk[1:, c]:
                step = _IMA_STEP[idx]
                diff = int(s) - pred
                nb = 8 if diff < 0 else 0
                if diff < 0:
                    diff = -diff
                if diff >= step:
                    nb |= 4
                    diff -= step
                if diff >= step >> 1:
                    nb |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nb |= 1
                # reconstruct exactly as the decoder will
                step2 = _IMA_STEP[idx]
                d2 = step2 >> 3
                if nb & 1:
                    d2 += step2 >> 2
                if nb & 2:
                    d2 += step2 >> 1
                if nb & 4:
                    d2 += step2
                pred = pred - d2 if nb & 8 else pred + d2
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + _IMA_INDEX[nb & 7]))
                nibs.append(nb)
            idxs[c] = idx
            nib_by_ch.append(nibs)
        for w in range((samples_per_block - 1) // 8):
            for c in range(ch):
                chunk = nib_by_ch[c][w * 8:w * 8 + 8]
                for k in range(0, 8, 2):
                    out.append(chunk[k] | (chunk[k + 1] << 4))
    fmt = struct.pack(
        "<HHIIHHHH", _IMA_ADPCM, ch, sample_rate,
        sample_rate * block_align // samples_per_block, block_align, 4,
        2, samples_per_block,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(out)) + bytes(out)
        + (b"\x00" if len(out) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _g711_mulaw_decode_table() -> np.ndarray:
    """ITU-T G.711 mu-law byte -> int16 (the public tables, computed from
    the definition: byte is bit-inverted {sign, 3-bit exponent, 4-bit
    mantissa}; magnitude = ((2*mantissa + 33) << exponent) - 33, scaled
    by 4 to the 16-bit domain."""
    codes = np.arange(256, dtype=np.int64) ^ 0xFF
    sign = codes >> 7
    exp = (codes >> 4) & 0x07
    mant = codes & 0x0F
    mag = (((2 * mant + 33) << exp) - 33) * 4
    return np.where(sign, -mag, mag).astype(np.int16)


def _g711_alaw_decode_table() -> np.ndarray:
    """ITU-T G.711 A-law byte -> int16: byte XOR 0x55; exponent 0 is the
    linear segment (mag = 2*mant + 1), else mag = (2*mant + 33) << (exp -
    1); scaled by 8 to the 16-bit domain."""
    codes = np.arange(256, dtype=np.int64) ^ 0x55
    sign = codes >> 7
    exp = (codes >> 4) & 0x07
    mant = codes & 0x0F
    mag = np.where(exp == 0, 2 * mant + 1,
                   (2 * mant + 33) << np.maximum(exp - 1, 0))
    mag = mag * 8
    return np.where(sign, mag, -mag).astype(np.int16)


_MULAW_TABLE = _g711_mulaw_decode_table()
_ALAW_TABLE = _g711_alaw_decode_table()


def _g711_encode(pcm: np.ndarray, table: np.ndarray) -> np.ndarray:
    """int16 -> companded byte via nearest-expansion search against the
    256-entry decode table (vectorized; exactly inverts the decode for
    every representable level and picks the nearest level otherwise,
    matching the reference coder's quantization to within the shared
    segment step)."""
    order = np.argsort(table, kind="stable")
    levels = table[order].astype(np.int32)
    x = pcm.astype(np.int32)
    idx = np.searchsorted(levels, x)
    idx = np.clip(idx, 1, len(levels) - 1)
    lo = levels[idx - 1]
    hi = levels[idx]
    pick = np.where(np.abs(x - lo) <= np.abs(x - hi), idx - 1, idx)
    return order[pick].astype(np.uint8)


def encode_wav_g711(samples: np.ndarray, sample_rate: int,
                    law: str = "mulaw") -> bytes:
    """Encode int16 samples as a G.711 (format 7 mu-law / 6 A-law) WAV."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.dtype != np.int16 or arr.ndim != 2 or arr.shape[0] == 0:
        raise ValueError("G.711 encode expects (n[, ch]) int16 samples")
    if sample_rate <= 0:
        raise ValueError(f"bad sample rate {sample_rate}")
    if law == "mulaw":
        fmt_code, table = _MULAW, _MULAW_TABLE
    elif law == "alaw":
        fmt_code, table = _ALAW, _ALAW_TABLE
    else:
        raise ValueError(f"unknown companding law {law!r}")
    data = _g711_encode(arr, table).tobytes()
    n, ch = arr.shape
    fmt = struct.pack("<HHIIHH", fmt_code, ch, sample_rate,
                      sample_rate * ch, ch, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body

# dtype -> (format code, bits per sample)
_ENCODE_FORMATS = {
    np.dtype(np.uint8): (_PCM, 8),
    np.dtype(np.int16): (_PCM, 16),
    np.dtype(np.int32): (_PCM, 32),
    np.dtype(np.float32): (_IEEE_FLOAT, 32),
}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a (n,) or (n, channels) sample array as RIFF/WAVE PCM."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[0] == 0 or arr.shape[1] == 0:
        raise ValueError("samples must be (n,) or (n, channels), n >= 1")
    if arr.dtype not in _ENCODE_FORMATS:
        raise ValueError(
            f"unsupported sample dtype {arr.dtype} "
            "(uint8/int16/int32 PCM or float32)"
        )
    if sample_rate <= 0:
        raise ValueError(f"bad sample rate {sample_rate}")
    fmt_code, bits = _ENCODE_FORMATS[arr.dtype]
    n, ch = arr.shape
    block_align = ch * bits // 8
    data = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
    fmt = struct.pack(
        "<HHIIHH", fmt_code, ch, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE bytes to ((n_samples, channels) array, rate)."""
    try:
        return _decode_inner(bytes(data))
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, struct.error, OverflowError, MemoryError) as exc:
        raise ValueError(f"corrupt WAV stream: {exc!r}") from exc


def _decode_inner(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (RIFF/WAVE header missing)")
    pos = 12
    fmt_payload: bytes | None = None
    data_payload: bytes | None = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + size]
        if len(payload) != size:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            fmt_payload = payload
        elif tag == b"data":
            data_payload = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_payload is None or data_payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt_payload) < 16:
        raise ValueError("WAV fmt chunk too short")
    fmt_code, ch, rate, _byte_rate, block_align, bits = struct.unpack(
        "<HHIIHH", fmt_payload[:16]
    )
    if fmt_code == _EXTENSIBLE:
        # SubFormat GUID: first 2 bytes are the wrapped format code
        if len(fmt_payload) < 26:
            raise ValueError("WAVE_FORMAT_EXTENSIBLE fmt chunk too short")
        (fmt_code,) = struct.unpack("<H", fmt_payload[24:26])
    if fmt_code not in (_PCM, _IEEE_FLOAT, _ALAW, _MULAW, _IMA_ADPCM):
        raise NotImplementedError(
            f"WAV format code {fmt_code}: compressed audio codecs "
            "(MS-ADPCM/MP3...) are out of scope in this environment"
        )
    if ch == 0 or rate == 0:
        raise ValueError("WAV declares zero channels or sample rate")
    if fmt_code == _IMA_ADPCM:
        if bits != 4:
            raise ValueError(f"IMA ADPCM declares {bits}-bit samples")
        return _decode_ima_adpcm(data_payload, ch, block_align), rate
    if fmt_code in (_ALAW, _MULAW):
        # ITU-T G.711 telephony companding: 8-bit log-domain bytes ->
        # int16 via the 256-entry tables above (validated bit-exact
        # against CPython's audioop reference in tests)
        if bits != 8:
            raise ValueError(f"G.711 WAV declares {bits}-bit samples")
        if block_align != ch:
            raise ValueError(
                f"WAV block align {block_align} contradicts "
                f"{ch} channel(s) x 1 byte"
            )
        n_frames, rem = divmod(len(data_payload), ch)
        if rem or n_frames == 0:
            raise ValueError(
                "WAV data chunk is not a whole number of frames"
            )
        table = _ALAW_TABLE if fmt_code == _ALAW else _MULAW_TABLE
        raw = np.frombuffer(data_payload, np.uint8).reshape(n_frames, ch)
        return table[raw], rate
    if fmt_code == _IEEE_FLOAT:
        if bits != 32:
            raise NotImplementedError(f"float{bits} WAV (only float32)")
        dtype, width = np.dtype("<f4"), 4
    elif bits == 8:
        dtype, width = np.dtype(np.uint8), 1
    elif bits == 16:
        dtype, width = np.dtype("<i2"), 2
    elif bits == 24:
        dtype, width = None, 3  # widened to int32 below
    elif bits == 32:
        dtype, width = np.dtype("<i4"), 4
    else:
        raise ValueError(f"WAV declares {bits}-bit PCM")
    if block_align != ch * width:
        raise ValueError(
            f"WAV block align {block_align} contradicts "
            f"{ch} channel(s) x {width} byte(s)"
        )
    n_frames, rem = divmod(len(data_payload), block_align)
    if rem or n_frames == 0:
        raise ValueError("WAV data chunk is not a whole number of frames")
    if bits == 24:
        raw = np.frombuffer(data_payload, np.uint8).reshape(-1, 3)
        widened = np.zeros((raw.shape[0], 4), np.uint8)
        widened[:, 1:] = raw  # low byte zero: value << 8, sign preserved
        arr = widened.view("<i4").reshape(n_frames, ch)
    else:
        arr = np.frombuffer(data_payload, dtype).reshape(n_frames, ch)
    return arr.astype(dtype if bits != 24 else np.int32, copy=True), rate
