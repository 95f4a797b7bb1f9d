"""Stateful streaming audio near-dup: a clip arriving in a LATER
micro-batch must match a near-identical clip from an earlier one (state
survives restart); unrelated clips — including independent silence
recordings — must not match, and poison rows must flow through."""

from __future__ import annotations

import numpy as np

from conftest import drain_available_now
from pii_redactor_spark.fixtures.wav import encode_wav
from pii_redactor_spark.streaming.audio_stream import audio_match_stream

SCHEMA = "audio_id string, bytes binary"


def _chirp(seed: int, n: int = 32000, rate: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = np.zeros(n)
    for _ in range(3):
        f0 = rng.uniform(100, 3000)
        f1 = f0 * rng.uniform(0.6, 1.8)
        x += rng.uniform(0.1, 0.3) * np.sin(
            2 * np.pi * (f0 * t + (f1 - f0) * t * t / (2 * t[-1]))
        )
    return np.clip(x, -1, 1).astype(np.float32)


def _wav(x: np.ndarray) -> bytearray:
    return bytearray(encode_wav(x, 16000))


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    drain_available_now(audio_match_stream(stream), out, ckpt)


def test_audio_match_stream_across_batches(spark, tmp_root):
    src = f"{tmp_root}/am_src"
    out = f"{tmp_root}/am_out"
    ckpt = f"{tmp_root}/am_ckpt"

    base = _chirp(5)
    other = _chirp(9)
    rng = np.random.default_rng(77)
    noisy = np.clip(base + rng.normal(0, 0.005, base.shape), -1, 1).astype(
        np.float32
    )
    silence = (np.random.default_rng(1).normal(0, 1e-4, 8000)
               .astype(np.float32))

    batch1 = spark.createDataFrame(
        [("a", _wav(base)), ("b", _wav(other)),
         ("sil1", _wav(silence)), ("poison", bytearray(b"RIFFnope"))],
        SCHEMA,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(src)
    _run(spark, src, out, ckpt)
    got1 = spark.read.parquet(out)
    assert got1.count() == 0  # nothing matches anything yet

    # batch 2 (fresh run restores state from the checkpoint): a noisy
    # re-encode of batch-1's "a" plus an INDEPENDENT silence recording
    # (different noise floor — must NOT match sil1; a scaled copy of the
    # SAME silence would legitimately match, by gain invariance)
    silence2 = (np.random.default_rng(2).normal(0, 1e-4, 8000)
                .astype(np.float32))
    batch2 = spark.createDataFrame(
        [("a_noisy", _wav(noisy)),
         ("sil2", _wav(silence2))],
        SCHEMA,
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    pairs = {(r["id"], r["matched_id"]) for r in rows}
    assert ("a_noisy", "a") in pairs, rows
    # at-least-once per pair, but never a wrong pair: every event is the
    # planted match
    assert {p for p in pairs} == {("a_noisy", "a")}, pairs
    assert all(r["hamming"] <= 4 for r in rows)
