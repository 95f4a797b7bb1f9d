"""FLAC codec — pure NumPy/stdlib, written against the public FLAC
format specification (RFC 9639 / xiph.org format document) the way
``fixtures/jpeg.py`` is written against ITU-T T.81 and ``fixtures/wav.py``
against the RIFF/WAVE spec.

FLAC is the dominant *lossless* audio container in web crawls (podcast
archives, music datasets, Common Voice mirrors ship it alongside WAV),
so the audio leg of the multimodal axis decodes it for real:

* **Decode** covers the full subset real encoders emit: STREAMINFO +
  skipped foreign metadata blocks, fixed- and variable-blocksize frames,
  UTF-8-coded frame/sample numbers (through the 7-byte/36-bit form),
  all blocksize/sample-rate/sample-size header codes, CONSTANT /
  VERBATIM / FIXED (orders 0-4) / LPC (orders 1-32) subframes, wasted
  bits, both Rice residual methods (4- and 5-bit parameters) at any
  partition order including escaped (raw binary) partitions, and all
  four channel assignments (independent, left/side, right/side,
  mid/side with the official ``mid<<1|(side&1)`` reconstruction).
  CRC-8 (header), CRC-16 (frame) and the STREAMINFO MD5 of the decoded
  PCM are all verified — corruption anywhere normalizes to
  ``ValueError`` for the poison-row guards in ``operators/audio.py``.
* **Encode** is a real compressing encoder, not a stored-only shell:
  per-subframe choice among constant / verbatim / fixed orders 0-4 /
  quantized Levinson-Durbin LPC (order 8, precision 12), per-frame
  stereo decorrelation chosen by cost (independent vs left/side vs
  right/side vs mid/side), wasted-bits detection, and Rice partition
  orders 0-4 with exact per-partition parameter search plus the raw
  escape when it is cheaper.  Integer round trips are **byte-exact**
  (lossless by construction; pinned in tests), so every decoder path
  above is exercised by encoder-produced streams rather than synthetic
  mocks.

Bit depths: 8 (int8), 16 (int16) and 24.  24-bit uses the same
container convention as ``wav.py``: int32 arrays with the low byte zero
(``value << 8``), so a 24-bit WAV decoded and re-encoded as FLAC round
trips the identical array.

Performance note, same honesty as the image codecs: header/warmup/
predictor math is NumPy-vectorized (fixed-predictor reconstruction is o
cumulative sums, Rice k=0 partitions and escaped partitions decode as
single array ops), but Rice symbols with k>0 and the LPC recurrence pay
a per-sample Python loop — the interpreter floor documented in
``fixtures/jpeg.py``.  Measured on the bench corpus (mixed rates,
mono-3ch, local[32]): ~4 clips/s/core ≈ 4 audio-seconds decoded per
wall-second per core; the bench block's ``decode_stats.flac_only``
split keeps the mixed-leg number self-describing.  Like real JPEG this
is fixture/verification duty — a documented ceiling, not a production
decode claim.

Reference parity note: the reference repo (a-agmon/pii-redactor) is
text-only; this module serves the north rule's multimodal axis.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"
BLOCKSIZE = 4096
_LPC_ORDER = 8
_LPC_PRECISION = 12

# sample-rate header codes (table index -> Hz); 0 = STREAMINFO,
# 12/13/14 = trailing field, 15 = invalid
_RATE_CODES = {
    1: 88_200, 2: 176_400, 3: 192_000, 4: 8_000, 5: 16_000, 6: 22_050,
    7: 24_000, 8: 32_000, 9: 44_100, 10: 48_000, 11: 96_000,
}
_RATE_TO_CODE = {v: k for k, v in _RATE_CODES.items()}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_BPS_TO_CODE = {v: k for k, v in _BPS_CODES.items()}

_POW2 = (np.int64(1) << np.arange(39, -1, -1).astype(np.int64))


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.empty(256, np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab[b] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    tab = _CRC8_TAB
    for b in data:
        r = int(tab[r ^ b])
    return r


def _crc16(data: bytes) -> int:
    r = 0
    tab = _CRC16_TAB
    for b in data:
        r = int(tab[((r >> 8) ^ b) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


# --- UTF-8-style coded numbers (frame/sample index; up to 36 bits) ----------


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    for n, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if v < (1 << bits):
            out = bytearray(n)
            for i in range(n - 1, 0, -1):
                out[i] = 0x80 | (v & 0x3F)
                v >>= 6
            out[0] = ((0xFF << (8 - n)) & 0xFF) | v if n < 7 else 0xFE
            return bytes(out)
    raise ValueError(f"frame number {v} exceeds 36 bits")


class _Reader:
    """MSB-first bit reader over the whole stream: bits unpacked once,
    1-bit positions pre-indexed so unary (Rice quotient) reads are a
    sorted-array lookup instead of a bit-scan loop."""

    __slots__ = ("data", "bits", "ones", "n", "p")

    def __init__(self, data: bytes):
        self.data = data
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.n = int(self.bits.shape[0])
        self.p = 0

    def read(self, w: int) -> int:
        p = self.p
        if p + w > self.n:
            raise ValueError("truncated FLAC stream")
        self.p = p + w
        if w == 0:
            return 0
        return int(self.bits[p:p + w] @ _POW2[40 - w:])

    def read_signed(self, w: int) -> int:
        v = self.read(w)
        return v - (1 << w) if v >= (1 << (w - 1)) else v

    def read_unary(self) -> int:
        j = int(np.searchsorted(self.ones, self.p))
        if j >= self.ones.shape[0]:
            raise ValueError("truncated FLAC stream (unary)")
        t = int(self.ones[j])
        q = t - self.p
        self.p = t + 1
        return q

    def align(self) -> None:
        self.p = (self.p + 7) & ~7

    def byte_pos(self) -> int:
        return self.p >> 3

    def read_rice(self, k: int, m: int) -> np.ndarray:
        """m Rice(k)-coded residuals, zigzag-decoded.  k=0 is fully
        vectorized (every 1-bit is a terminator); k>0 walks the
        pre-indexed 1-positions, skipping those inside remainder fields.
        """
        if m == 0:
            return np.empty(0, np.int64)
        ones, bits, n = self.ones, self.bits, self.n
        p = self.p
        j = int(np.searchsorted(ones, p))
        no = int(ones.shape[0])
        if k == 0:
            if j + m > no:
                raise ValueError("truncated Rice partition")
            ts = ones[j:j + m].astype(np.int64)
            starts = np.empty(m, np.int64)
            starts[0] = p
            starts[1:] = ts[:-1] + 1
            u = ts - starts
            self.p = int(ts[-1]) + 1
        else:
            u = np.empty(m, np.int64)
            pw = _POW2[40 - k:]
            for i in range(m):
                if j >= no:
                    raise ValueError("truncated Rice partition")
                t = int(ones[j])
                if t + 1 + k > n:
                    raise ValueError("truncated Rice partition")
                u[i] = ((t - p) << k) | int(bits[t + 1:t + 1 + k] @ pw)
                p = t + 1 + k
                j += 1
                while j < no and ones[j] < p:
                    j += 1
            self.p = p
        return (u >> 1) ^ -(u & 1)

    def read_raw_block(self, w: int, m: int) -> np.ndarray:
        """m signed w-bit values (escaped partition / warmups), as one
        reshape + dot instead of m reads."""
        if w == 0:
            return np.zeros(m, np.int64)
        p = self.p
        if p + w * m > self.n:
            raise ValueError("truncated FLAC stream")
        self.p = p + w * m
        v = self.bits[p:p + w * m].reshape(m, w) @ _POW2[40 - w:]
        return np.where(v >= (1 << (w - 1)), v - (1 << w), v)


class _Writer:
    __slots__ = ("buf", "acc", "nb")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def write(self, v: int, w: int) -> None:
        acc = (self.acc << w) | (v & ((1 << w) - 1))
        nb = self.nb + w
        while nb >= 8:
            nb -= 8
            self.buf.append((acc >> nb) & 0xFF)
        self.acc = acc & ((1 << nb) - 1)
        self.nb = nb

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nb:
            self.write(0, 8 - self.nb)


# --- metadata -----------------------------------------------------------------


def parse_streaminfo(data: bytes) -> dict:
    """Parse the mandatory STREAMINFO block -> dict of its fields (a
    metadata-only probe, the FLAC analog of a WAV fmt read)."""
    if bytes(data[:4]) != _MAGIC:
        raise ValueError("not a FLAC stream (fLaC magic missing)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        hdr = data[pos]
        (size,) = struct.unpack(">I", b"\x00" + bytes(data[pos + 1:pos + 4]))
        payload = bytes(data[pos + 4:pos + 4 + size])
        if len(payload) != size:
            raise ValueError("truncated FLAC metadata block")
        if hdr & 0x7F == 0:
            if size != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {size}")
            info = payload
        elif hdr & 0x7F == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + size
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    raw = int.from_bytes(info[10:18], "big")
    return {
        "min_blocksize": struct.unpack(">H", info[0:2])[0],
        "max_blocksize": struct.unpack(">H", info[2:4])[0],
        "sample_rate": raw >> 44,
        "channels": ((raw >> 41) & 0x7) + 1,
        "bits_per_sample": ((raw >> 36) & 0x1F) + 1,
        "total_samples": raw & ((1 << 36) - 1),
        "md5": info[18:34],
        "frames_offset": pos,
    }


# --- decode -------------------------------------------------------------------

_FIXED_MAX_ORDER = 4


def _reconstruct_fixed(warmup: np.ndarray, res: np.ndarray,
                       order: int) -> np.ndarray:
    """Invert the order-o fixed predictor: the residual IS the o-th
    finite difference, so reconstruction is o cumulative sums seeded by
    the warmups' difference pyramid — fully vectorized."""
    if order == 0:
        return res
    cur = res
    w = warmup.astype(np.int64)
    for j in range(order - 1, -1, -1):
        g0 = int(np.diff(w, n=j)[0])
        cur = g0 + np.concatenate(([0], np.cumsum(cur)))
    return cur


def _reconstruct_lpc(warmup: np.ndarray, res: np.ndarray, coefs: list[int],
                     shift: int, m: int) -> np.ndarray:
    """s[i] = (sum c[j]*s[i-1-j]) >> shift + res  (arithmetic shift =
    Python's floor >>).  Sequential recursion, plain-int loop."""
    order = len(coefs)
    s = [int(v) for v in warmup]
    rev = list(range(1, order + 1))
    for r in res.tolist():
        acc = 0
        for j, c in zip(rev, coefs):
            acc += c * s[-j]
        s.append((acc >> shift) + r)
    return np.array(s[:m], np.int64)


def _read_subframe(rd: _Reader, bs: int, bps: int) -> np.ndarray:
    if rd.read(1):
        raise ValueError("subframe header padding bit is 1")
    sft = rd.read(6)
    wasted = 0
    if rd.read(1):
        wasted = rd.read_unary() + 1
    eb = bps - wasted
    if eb <= 0:
        raise ValueError("wasted bits exceed sample size")
    if sft == 0:  # constant
        out = np.full(bs, rd.read_signed(eb), np.int64)
    elif sft == 1:  # verbatim
        out = rd.read_raw_block(eb, bs)
    elif 8 <= sft <= 8 + _FIXED_MAX_ORDER:  # fixed
        order = sft - 8
        if order > bs:
            raise ValueError("fixed predictor order exceeds blocksize")
        warmup = rd.read_raw_block(eb, order)
        res = _read_residual(rd, bs, order)
        out = _reconstruct_fixed(warmup, res, order)
    elif sft >= 32:  # LPC
        order = sft - 31
        if order > bs:
            raise ValueError("LPC order exceeds blocksize")
        warmup = rd.read_raw_block(eb, order)
        prec = rd.read(4)
        if prec == 15:
            raise ValueError("invalid LPC precision code 15")
        prec += 1
        shift = rd.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [rd.read_signed(prec) for _ in range(order)]
        res = _read_residual(rd, bs, order)
        out = _reconstruct_lpc(warmup, res, coefs, shift, bs)
    else:
        raise ValueError(f"reserved subframe type {sft}")
    return out << wasted if wasted else out


def _read_residual(rd: _Reader, bs: int, order: int) -> np.ndarray:
    method = rd.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = rd.read(4)
    parts = 1 << po
    if bs % parts or (bs >> po) <= order:
        raise ValueError(
            f"partition order {po} invalid for blocksize {bs}"
        )
    out = []
    for i in range(parts):
        cnt = (bs >> po) - (order if i == 0 else 0)
        param = rd.read(pbits)
        if param == escape:
            out.append(rd.read_raw_block(rd.read(5), cnt))
        else:
            out.append(rd.read_rice(param, cnt))
    return np.concatenate(out) if len(out) > 1 else out[0]


def _utf8_decode(rd: _Reader) -> int:
    b0 = rd.read(8)
    if b0 < 0x80:
        return b0
    lead = 8 - (b0 ^ 0xFF).bit_length()  # count of leading 1 bits
    if lead < 2 or lead > 7:
        raise ValueError(f"invalid UTF-8 coded number lead byte {b0:#x}")
    v = b0 & (0x7F >> lead) if lead < 7 else 0
    for _ in range(lead - 1):
        c = rd.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8 coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode FLAC bytes -> ((n_samples, channels) int array, rate).

    Output dtype mirrors ``wav.decode_wav``: int8 for 8-bit streams,
    int16 for <=16, int32 for <=32 with 24-bit content widened low-byte
    zero (``<< 8``).  CRC-8/CRC-16/MD5 all verified; every parse failure
    normalizes to ``ValueError``.
    """
    try:
        return _decode_inner(bytes(data))
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, struct.error, OverflowError,
            MemoryError) as exc:
        raise ValueError(f"corrupt FLAC stream: {exc!r}") from exc


def _decode_inner(data: bytes) -> tuple[np.ndarray, int]:
    info = parse_streaminfo(data)
    rd = _Reader(data)
    rd.p = info["frames_offset"] * 8
    total = info["total_samples"]
    chunks: list[np.ndarray] = []
    got = 0
    while (got < total) if total else (rd.byte_pos() + 2 <= len(data)):
        start = rd.byte_pos()
        if rd.read(14) != 0b11111111111110:
            raise ValueError("FLAC frame sync lost")
        if rd.read(1):
            raise ValueError("frame header reserved bit set")
        rd.read(1)  # blocking strategy (frame vs sample numbering)
        bs_code = rd.read(4)
        rate_code = rd.read(4)
        chan_code = rd.read(4)
        bps_code = rd.read(3)
        if rd.read(1):
            raise ValueError("frame header reserved bit set")
        _utf8_decode(rd)
        if bs_code == 0:
            raise ValueError("reserved blocksize code 0")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = rd.read(8) + 1
        elif bs_code == 7:
            bs = rd.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if rate_code == 0:
            rate = info["sample_rate"]
        elif rate_code in _RATE_CODES:
            rate = _RATE_CODES[rate_code]
        elif rate_code == 12:
            rate = rd.read(8) * 1000
        elif rate_code == 13:
            rate = rd.read(16)
        elif rate_code == 14:
            rate = rd.read(16) * 10
        else:
            raise ValueError("invalid sample-rate code 15")
        if bps_code == 0:
            bps = info["bits_per_sample"]
        elif bps_code in _BPS_CODES:
            bps = _BPS_CODES[bps_code]
        else:
            raise ValueError(f"reserved sample-size code {bps_code}")
        crc8 = rd.read(8)
        if _crc8(data[start:rd.byte_pos() - 1]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if chan_code <= 7:
            subs = [_read_subframe(rd, bs, bps)
                    for _ in range(chan_code + 1)]
            frame = np.stack(subs, axis=1)
        elif chan_code in (8, 9, 10):
            bump0 = 1 if chan_code == 9 else 0
            bump1 = 0 if chan_code == 9 else 1
            s0 = _read_subframe(rd, bs, bps + bump0)
            s1 = _read_subframe(rd, bs, bps + bump1)
            if chan_code == 8:  # left/side
                left, right = s0, s0 - s1
            elif chan_code == 9:  # side/right
                left, right = s1 + s0, s1
            else:  # mid/side
                mid = (s0 << 1) | (s1 & 1)
                left, right = (mid + s1) >> 1, (mid - s1) >> 1
            frame = np.stack([left, right], axis=1)
        else:
            raise ValueError(f"reserved channel assignment {chan_code}")
        rd.align()
        crc16 = rd.read(16)
        if _crc16(data[start:rd.byte_pos() - 2]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        chunks.append(frame)
        got += bs
    if not chunks:
        raise ValueError("FLAC stream contains no frames")
    out = np.concatenate(chunks, axis=0)
    if total:
        out = out[:total]
    bps = info["bits_per_sample"]
    if bps <= 8:
        arr = out.astype(np.int8)
    elif bps <= 16:
        arr = out.astype(np.int16)
    elif bps == 24:
        arr = (out << 8).astype(np.int32)  # wav.py 24-bit convention
    else:
        arr = out.astype(np.int32)
    md5 = info["md5"]
    if md5 != b"\x00" * 16 and hashlib.md5(
        _md5_bytes(out, bps)
    ).digest() != md5:
        raise ValueError("FLAC MD5 signature mismatch (corrupt PCM)")
    return arr, info["sample_rate"]


def _md5_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian signed PCM, bps/8 bytes per sample —
    the spec's MD5 input (24-bit = 3 bytes, NOT the widened int32)."""
    width = (bps + 7) // 8
    flat = samples.astype(np.int64).ravel()  # row-major = interleaved
    le = np.empty((flat.shape[0], width), np.uint8)
    for b in range(width):
        le[:, b] = (flat >> (8 * b)) & 0xFF
    return le.tobytes()


# --- encode -------------------------------------------------------------------


def _rice_cost_plan(res: np.ndarray, order: int, bs: int):
    """Exact cheapest residual coding: search partition orders 0-4 and,
    per partition, the exact Rice parameter (or the 5-bit raw escape).
    Returns (method, po, [(param_or_escape, nbits, u_or_res slice)], cost).
    """
    u = (res << 1) ^ (res >> 63)  # zigzag, int64
    best = None
    for po in range(5):
        parts = 1 << po
        if bs % parts or (bs >> po) <= order:
            break
        plan = []
        total = 0
        ok = True
        lo = 0
        for i in range(parts):
            cnt = (bs >> po) - (order if i == 0 else 0)
            pu = u[lo:lo + cnt]
            pr = res[lo:lo + cnt]
            lo += cnt
            best_k, best_bits = 0, None
            for k in range(31):
                bits = cnt * (k + 1) + int((pu >> k).sum())
                if best_bits is None or bits < best_bits:
                    best_k, best_bits = k, bits
                if (1 << k) > int(pu.max(initial=0)):
                    break
            vmax = int(np.maximum(pr, -pr - 1).max(initial=0))
            esc_n = vmax.bit_length() + 1 if vmax or pr.size and int(
                pr.min(initial=0)) < 0 else (1 if np.any(pr) else 0)
            esc_bits = 5 + esc_n * cnt
            if esc_bits < best_bits:
                plan.append(("esc", esc_n, pr))
                total += esc_bits
            else:
                plan.append(("rice", best_k, pu))
                total += best_bits
            if best_k > 30:
                ok = False
        if not ok:
            continue
        max_k = max((p[1] for p in plan if p[0] == "rice"), default=0)
        method = 0 if max_k <= 14 else 1
        total += parts * (4 + method) + 2 + 4
        if best is None or total < best[3]:
            best = (method, po, plan, total)
    return best


def _write_residual(wr: _Writer, plan) -> None:
    method, po, parts, _ = plan
    pbits = 4 + method
    escape = (1 << pbits) - 1
    wr.write(method, 2)
    wr.write(po, 4)
    for kind, param, vals in parts:
        if kind == "esc":
            wr.write(escape, pbits)
            wr.write(param, 5)
            if param:
                for v in vals.tolist():
                    wr.write(v, param)
        else:
            wr.write(param, pbits)
            k = param
            for uu in vals.tolist():
                wr.write_unary(uu >> k)
                if k:
                    wr.write(uu, k)


def _levinson(ac: np.ndarray, order: int) -> np.ndarray | None:
    err = float(ac[0])
    if err <= 0.0:
        return None
    coefs = np.zeros(order)
    for i in range(order):
        acc = float(ac[i + 1])
        for j in range(i):
            acc -= coefs[j] * float(ac[i - j])
        k = acc / err
        new = coefs.copy()
        new[i] = k
        for j in range(i):
            new[j] = coefs[j] - k * coefs[i - 1 - j]
        coefs = new
        err *= 1.0 - k * k
        if err <= 0.0:
            return None
    return coefs


def _lpc_candidate(x: np.ndarray, bps: int):
    """Quantized LPC analysis: windowed autocorrelation -> Levinson ->
    precision-12 coefficients + shift -> exact integer residual via a
    vectorized sliding-window dot (floor shift, matching the decoder)."""
    m = x.shape[0]
    order = min(_LPC_ORDER, m - 1)
    if order < 1:
        return None
    xf = x.astype(np.float64) * np.hanning(m)
    nfft = 1 << int(m * 2 - 1).bit_length()
    spec = np.fft.rfft(xf, nfft)
    ac = np.fft.irfft(spec * np.conj(spec))[:order + 1]
    coefs = _levinson(ac, order)
    if coefs is None or not np.all(np.isfinite(coefs)):
        return None
    cmax = float(np.abs(coefs).max())
    if cmax <= 0.0:
        return None
    shift = _LPC_PRECISION - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    lim = 1 << (_LPC_PRECISION - 1)
    q = np.clip(np.round(coefs * (1 << shift)), -lim, lim - 1).astype(
        np.int64
    )
    if not np.any(q):
        return None
    # residual: res[i] = x[i] - ((sum_j q[j] * x[i-1-j]) >> shift), i>=o
    sw = np.lib.stride_tricks.sliding_window_view(x, order)[:-1]
    pred = np.floor_divide(sw @ q[::-1], 1 << shift)
    res = x[order:] - pred
    return q, shift, res


def _encode_subframe(wr: _Writer, x: np.ndarray, bps: int) -> None:
    m = x.shape[0]
    x = x.astype(np.int64)
    # wasted bits: trailing zeros shared by every sample
    acc = int(np.bitwise_or.reduce(x))
    wasted = 0
    if acc:
        wasted = (acc & -acc).bit_length() - 1
        wasted = min(wasted, bps - 1)
        if wasted:
            x = x >> wasted
    eb = bps - wasted

    def _header(sft: int) -> None:
        wr.write(0, 1)
        wr.write(sft, 6)
        if wasted:
            wr.write(1, 1)
            wr.write_unary(wasted - 1)
        else:
            wr.write(0, 1)

    if int(x.min()) == int(x.max()):
        _header(0)
        wr.write(int(x[0]), eb)
        return
    candidates = []  # (cost_bits, kind, payload)
    candidates.append((m * eb, "verbatim", None))
    for o in range(_FIXED_MAX_ORDER + 1):
        if o >= m:
            break
        res = np.diff(x, n=o) if o else x
        plan = _rice_cost_plan(res, o, m)
        if plan is not None:
            candidates.append((o * eb + plan[3], "fixed", (o, plan)))
    lpc = _lpc_candidate(x, eb)
    if lpc is not None:
        q, shift, res = lpc
        plan = _rice_cost_plan(res, len(q), m)
        if plan is not None:
            cost = len(q) * eb + 4 + 5 + len(q) * _LPC_PRECISION + plan[3]
            candidates.append((cost, "lpc", (q, shift, plan)))
    candidates.sort(key=lambda c: c[0])
    _, kind, payload = candidates[0]
    if kind == "verbatim":
        _header(1)
        for v in x.tolist():
            wr.write(v, eb)
    elif kind == "fixed":
        o, plan = payload
        _header(8 + o)
        for v in x[:o].tolist():
            wr.write(v, eb)
        _write_residual(wr, plan)
    else:
        q, shift, plan = payload
        o = len(q)
        _header(32 + (o - 1))
        for v in x[:o].tolist():
            wr.write(v, eb)
        wr.write(_LPC_PRECISION - 1, 4)
        wr.write(shift, 5)
        for c in q.tolist():
            wr.write(int(c), _LPC_PRECISION)
        _write_residual(wr, plan)


def _order2_cost(x: np.ndarray) -> int:
    d = np.diff(x, n=2) if x.shape[0] > 2 else x
    return int(np.abs(d).sum())


def encode_flac(samples: np.ndarray, sample_rate: int,
                stereo_mode: str = "auto") -> bytes:
    """Encode (n,) or (n, ch) int8/int16/int32 samples as FLAC.

    int32 input uses the ``wav.py`` 24-bit convention (low byte zero);
    ``stereo_mode`` pins the per-frame channel decorrelation for tests
    ('auto' | 'indep' | 'left_side' | 'right_side' | 'mid_side').
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[0] == 0 or arr.shape[1] == 0:
        raise ValueError("samples must be (n,) or (n, channels), n >= 1")
    if sample_rate <= 0 or sample_rate >= (1 << 20):
        raise ValueError(f"bad sample rate {sample_rate}")
    if arr.shape[1] > 8:
        raise ValueError("FLAC supports at most 8 channels")
    if stereo_mode not in ("auto", "indep", "left_side", "right_side",
                           "mid_side"):
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if arr.dtype == np.int8:
        bps = 8
        x = arr.astype(np.int64)
    elif arr.dtype == np.int16:
        bps = 16
        x = arr.astype(np.int64)
    elif arr.dtype == np.int32:
        if np.any(arr.astype(np.int64) & 0xFF):
            raise ValueError(
                "int32 FLAC input must carry 24-bit content "
                "(low byte zero, the wav.py convention)"
            )
        bps = 24
        x = arr.astype(np.int64) >> 8
    else:
        raise ValueError(
            f"unsupported sample dtype {arr.dtype} (int8/int16/int32)"
        )
    n, ch = x.shape
    if sample_rate in _RATE_TO_CODE:
        rate_code, rate_field = _RATE_TO_CODE[sample_rate], None
    elif sample_rate < (1 << 16):
        rate_code, rate_field = 13, sample_rate
    elif sample_rate % 10 == 0 and sample_rate // 10 < (1 << 16):
        rate_code, rate_field = 14, sample_rate // 10
    else:
        raise ValueError(f"sample rate {sample_rate} not encodable")

    body = bytearray()
    for fno, lo in enumerate(range(0, n, BLOCKSIZE)):
        blk = x[lo:lo + BLOCKSIZE]
        bs = blk.shape[0]
        wr = _Writer()
        wr.write(0b11111111111110, 14)
        wr.write(0, 1)  # reserved
        wr.write(0, 1)  # fixed blocksize strategy
        wr.write(7, 4)  # blocksize: 16-bit field at header end
        wr.write(rate_code, 4)
        if ch == 2:
            mode = stereo_mode
            if mode == "auto":
                left, right = blk[:, 0], blk[:, 1]
                side = left - right
                mid = (left + right) >> 1
                cl, cr = _order2_cost(left), _order2_cost(right)
                cs, cm = _order2_cost(side), _order2_cost(mid)
                mode = min(
                    (cl + cr, "indep"), (cl + cs, "left_side"),
                    (cr + cs, "right_side"), (cm + cs, "mid_side"),
                )[1]
            chan_code = {"indep": 1, "left_side": 8, "right_side": 9,
                         "mid_side": 10}[mode]
        else:
            mode = "indep"
            chan_code = ch - 1
        wr.write(chan_code, 4)
        wr.write(_BPS_TO_CODE[bps], 3)
        wr.write(0, 1)  # reserved
        for b in _utf8_encode(fno):
            wr.write(b, 8)
        wr.write(bs - 1, 16)
        if rate_field is not None:
            wr.write(rate_field, 16)
        hdr = bytes(wr.buf)
        assert wr.nb == 0
        wr.write(_crc8(hdr), 8)
        if ch == 2 and mode != "indep":
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if mode == "left_side":
                _encode_subframe(wr, left, bps)
                _encode_subframe(wr, side, bps + 1)
            elif mode == "right_side":
                _encode_subframe(wr, side, bps + 1)
                _encode_subframe(wr, right, bps)
            else:
                _encode_subframe(wr, (left + right) >> 1, bps)
                _encode_subframe(wr, side, bps + 1)
        else:
            for c in range(ch):
                _encode_subframe(wr, blk[:, c], bps)
        wr.align()
        frame = bytes(wr.buf)
        body += frame + struct.pack(">H", _crc16(frame))

    info = bytearray()
    info += struct.pack(">HH", BLOCKSIZE, BLOCKSIZE)
    info += b"\x00\x00\x00" * 2  # min/max framesize unknown
    raw = (sample_rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | n
    info += raw.to_bytes(8, "big")
    info += hashlib.md5(_md5_bytes(x, bps)).digest()
    return (
        _MAGIC
        + bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(info)
        + bytes(body)
    )
