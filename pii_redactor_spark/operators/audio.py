"""Audio operators over binary WAV columns — the audio leg of the
multimodal axis (images: ``operators/vision.py``; video: frame sampling
there too).  Same architecture: decode/measure ONCE at ingest into typed
metadata columns (``audio_stats``), then every corpus-scale gate is a
JVM-expression scan of narrow metadata that never touches the blob
(``audio_quality_flags``); the heavy per-byte work (chunking, resample)
is Arrow-batched ``mapInPandas`` — no row-at-a-time Python anywhere.

Determinism note: ``audio_stats`` quantizes its quality metrics to
integers at ingest — clipping as parts-per-million, loudness as
centi-dB — so downstream gates compare exact integers (immune to the
cross-engine double-rounding hazards the contract work documented) and
the metadata table stays compact at 10^12 rows.

Reference parity note: the reference repo (a-agmon/pii-redactor) is
text-only (``src/inference.py`` never opens media); this module serves
the north rule's multimodal axis alongside vision.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATS_SCHEMA = (
    "audio_id string, ok boolean, sample_rate int, channels int, "
    "n_samples bigint, duration_ms bigint, bits int, "
    "clipping_ppm int, rms_centi_db int, zero_cross_permille int"
)

CHUNK_SCHEMA = (
    "audio_id string, chunk_no int, bytes binary, "
    "n_samples bigint, sample_rate int"
)

_SILENT_CENTI_DB = -9600  # digital-silence floor (< 16-bit LSB)


def _to_float(arr: np.ndarray) -> np.ndarray:
    """Container samples -> float64 in [-1, 1] (full-scale = 1.0)."""
    if arr.dtype == np.uint8:
        return (arr.astype(np.float64) - 128.0) / 128.0
    if arr.dtype == np.int16:
        return arr.astype(np.float64) / 32768.0
    if arr.dtype == np.int32:
        return arr.astype(np.float64) / 2147483648.0
    return arr.astype(np.float64)  # float32 is already full-scale 1.0


def _measure(samples: np.ndarray, rate: int) -> tuple[int, ...]:
    """Quantized signal stats over a (n, ch) sample array."""
    x = _to_float(samples)
    n, ch = x.shape
    mono = x.mean(axis=1)
    rms = float(np.sqrt(np.mean(np.square(x))))
    rms_centi_db = (
        _SILENT_CENTI_DB if rms <= 0.0
        else max(_SILENT_CENTI_DB, round(2000.0 * math.log10(rms)))
    )
    clipping_ppm = round(1e6 * float(np.mean(np.abs(x) >= 32767 / 32768)))
    zero_cross = (
        0 if n < 2
        else round(1000.0 * float(np.mean(np.signbit(mono[1:])
                                          != np.signbit(mono[:-1]))))
    )
    return (
        rate, ch, n, n * 1000 // rate,
        int(samples.dtype.itemsize) * 8,
        int(clipping_ppm), int(rms_centi_db), int(zero_cross),
    )


def audio_stats(df: DataFrame) -> DataFrame:
    """Decode WAV blobs ONCE into the typed metadata row every later gate
    reads — (rate, channels, samples, duration, bit depth, clipping ppm,
    RMS centi-dB, zero-crossing permille).  Corrupt/out-of-scope rows
    survive as ok=false with NULL metrics (poison-row guard, same
    contract as ``vision.decode_stats``).  Input: (audio_id, bytes).
    """
    from ..fixtures.wav import decode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    samples, rate = decode_wav(bytes(data))
                    out.append((aid, True, *_measure(samples, rate)))
                except (ValueError, NotImplementedError):
                    out.append((aid, False) + (None,) * 8)
            yield pd.DataFrame(
                out,
                columns=[
                    "audio_id", "ok", "sample_rate", "channels",
                    "n_samples", "duration_ms", "bits",
                    "clipping_ppm", "rms_centi_db", "zero_cross_permille",
                ],
            )

    return df.mapInPandas(gen, schema=STATS_SCHEMA)


# --- metadata-only quality gate (JVM expressions, blob never read) -----------

AUDIO_QUALITY_FLAGS = (
    "null_metadata", "too_short", "too_long", "bad_rate",
    "bad_channels", "clipped", "silent",
)


@dataclass(frozen=True)
class AudioQualityConfig:
    """Corpus gates for web-scraped audio, LAION-style: every check runs
    on the typed metadata columns ``(sample_rate, channels, duration_ms,
    clipping_ppm, rms_centi_db)`` — never on the waveform — so at 10^12
    rows the gate is a column-pruned scan of five integer columns."""

    min_duration_ms: int = 300
    max_duration_ms: int = 240_000
    rate_allow: tuple[int, ...] = (16_000, 22_050, 44_100, 48_000)
    max_channels: int = 2
    max_clipping_ppm: int = 10_000   # >1% clipped samples => distorted
    min_rms_centi_db: int = -4_500   # quieter than -45 dBFS => silence


DEFAULT_AUDIO_QUALITY = AudioQualityConfig()


def audio_quality_flags(
    cfg: AudioQualityConfig = DEFAULT_AUDIO_QUALITY,
) -> Column:
    """``array<string>`` of failed gate names (empty array = clean clip).

    NULL metadata gets its own explicit flag for the same reason
    ``vision.image_quality_flags`` grew one: every threshold comparison
    evaluates NULL on NULL inputs, and ``array_compact`` would strip
    those — silently PASSING exactly the undecodable rows the gate
    exists to drop.
    """
    dur = F.col("duration_ms")
    cols = ("sample_rate", "channels", "duration_ms",
            "clipping_ppm", "rms_centi_db")
    null_any = F.lit(False)
    for c in cols:
        null_any = null_any | F.col(c).isNull()
    checks = [
        (null_any, "null_metadata"),
        (dur < cfg.min_duration_ms, "too_short"),
        (dur > cfg.max_duration_ms, "too_long"),
        (~F.col("sample_rate").isin(*cfg.rate_allow), "bad_rate"),
        (F.col("channels") > cfg.max_channels, "bad_channels"),
        (F.col("clipping_ppm") > cfg.max_clipping_ppm, "clipped"),
        (F.col("rms_centi_db") < cfg.min_rms_centi_db, "silent"),
    ]
    return F.array_compact(
        F.array(*[
            F.when(cond, F.lit(name)).otherwise(F.lit(None))
            for cond, name in checks
        ])
    )


def with_audio_quality(
    df: DataFrame,
    cfg: AudioQualityConfig = DEFAULT_AUDIO_QUALITY,
    keep_col: str | None = None,
) -> DataFrame:
    """Append ``audio_flags`` and — when ``keep_col`` is given — AND
    "no flags" into the existing keep/drop decision.  Pure projection."""
    out = df.withColumn("audio_flags", audio_quality_flags(cfg))
    if keep_col is not None:
        out = out.withColumn(
            keep_col, F.col(keep_col) & (F.size("audio_flags") == 0)
        )
    return out


# --- per-byte stages: chunking + resample (Arrow-batched) ---------------------


def chunk_audio(df: DataFrame, chunk_ms: int = 30_000) -> DataFrame:
    """Split each clip into fixed ``chunk_ms`` windows (the audio analog
    of video frame sampling): one output row per chunk, re-encoded as a
    standalone WAV so downstream stages need no container context.  The
    final partial chunk is kept (ASR-style), never zero-padded.  Input:
    (audio_id, bytes); corrupt rows are dropped here — run
    ``audio_stats`` first if they must be accounted.
    """
    from ..fixtures.wav import decode_wav, encode_wav

    if chunk_ms <= 0:
        raise ValueError(f"chunk_ms must be positive, got {chunk_ms}")

    cols = ["audio_id", "chunk_no", "bytes", "n_samples", "sample_rate"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Fan-out stage: one input clip can yield hundreds of chunk rows
        # (a 4-minute clip at 500 ms windows is 480), so the output is
        # flushed in bounded slices instead of buffering a whole Arrow
        # batch's fan-out in one pandas frame — at 10k-row input batches
        # the unbounded form is a per-task OOM at exactly the corpus
        # shapes chunking exists for.
        out: list[tuple] = []
        for pdf in batches:
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    samples, rate = decode_wav(bytes(data))
                except (ValueError, NotImplementedError):
                    continue
                step = max(1, rate * chunk_ms // 1000)
                for i, lo in enumerate(range(0, samples.shape[0], step)):
                    win = samples[lo:lo + step]
                    out.append(
                        (aid, i, encode_wav(win, rate),
                         win.shape[0], rate)
                    )
                if len(out) >= 2048:
                    yield pd.DataFrame(out, columns=cols)
                    out = []
        yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(gen, schema=CHUNK_SCHEMA)


def resample_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """Linear-interpolation resample to ``target_rate`` (int16 out) —
    the normalize-before-featurize step ASR/TTS corpora need.  Linear
    interpolation is the honest offline choice (no scipy in this
    environment); its first-order rolloff is documented rather than
    hidden behind a fake windowed-sinc.  Input: (audio_id, bytes);
    output replaces bytes with the resampled WAV.
    """
    from ..fixtures.wav import decode_wav, encode_wav

    if target_rate <= 0:
        raise ValueError(f"bad target rate {target_rate}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    samples, rate = decode_wav(bytes(data))
                except (ValueError, NotImplementedError):
                    continue
                x = _to_float(samples)
                n = x.shape[0]
                m = max(1, round(n * target_rate / rate))
                # sample-position grid: index i of the output sits at
                # i * (n - 1) / (m - 1) in the input (endpoints pinned)
                if m == 1 or n == 1:
                    y = np.repeat(x[:1], m, axis=0)
                else:
                    pos = np.linspace(0.0, n - 1.0, m)
                    y = np.stack(
                        [np.interp(pos, np.arange(n), x[:, c])
                         for c in range(x.shape[1])],
                        axis=1,
                    )
                pcm = np.clip(np.round(y * 32768.0), -32768, 32767)
                out.append(
                    (aid, encode_wav(pcm.astype(np.int16), target_rate),
                     m, target_rate)
                )
            yield pd.DataFrame(
                out,
                columns=["audio_id", "bytes", "n_samples", "sample_rate"],
            )

    return df.mapInPandas(
        gen,
        schema="audio_id string, bytes binary, n_samples bigint, "
               "sample_rate int",
    )
