"""Image-column operators: decode, feature-extract, resize, integrity.

The multimodal side of the engine (graft cell: pyspark x image).  Images are
opaque ``binary`` columns with typed metadata ``(w, h, fmt)``; every operator
here is a ``mapInPandas`` batch transform — Arrow moves whole column batches
across the JVM<->Python boundary, NumPy does the pixel math, and nothing ever
touches the driver.

Codec support mirrors the environment: the engine's own formats (the fixture
PNG subset and the ``LQI1`` lossy stand-in — ``fixtures/codecs.py``) decode
for real; foreign formats (true JPEG/WebP/video) would need an image library
this container doesn't ship, so they raise ``NotImplementedError`` from the
same code path — the Spark-side plumbing (schema, batching, partition flow)
is identical and fully tested either way.

Reference parity note: the reference pipeline never decodes pixels (it is
text-only); these operators exist for the north-star's image-integrity gate
(decoded-pixel allclose / PSNR >= 40 dB) and the training-data-pipeline
feature-extraction stages the brief calls for.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..fixtures.codecs import (
    decode_image,
    encode_png,
    phash64,
    psnr,
)

STATS_SCHEMA = (
    "image_id string, fmt string, w int, h int, decoded boolean, "
    "mean_r double, mean_g double, mean_b double, stddev double, "
    "entropy double, phash_dist int, phash_check boolean"
)

# Stored phash is computed on source pixels before encoding; lossy decode may
# flip a few border-case bits in the 8x8 block-mean comparison.
_LOSSY_PHASH_TOL = 8

RESIZE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string"
)

INTEGRITY_SCHEMA = (
    "image_id string, fmt string, ok boolean, psnr double"
)


def _entropy(pixels: np.ndarray) -> float:
    hist = np.bincount(pixels.reshape(-1), minlength=256).astype(np.float64)
    p = hist / hist.sum()
    nz = p[p > 0]
    return float(-(nz * np.log2(nz)).sum())


def decode_stats(df: DataFrame) -> DataFrame:
    """Per-image feature extraction: channel means, stddev, entropy, and a
    phash recomputation check against the stored ``phash`` column.

    Input requires columns (image_id, bytes, fmt, phash).  Rows whose format
    can't be decoded in this environment come back ``decoded = false`` with
    null features instead of failing the job — at 10^12 rows a poison row
    must never kill the stage.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt, ph in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["phash"]
            ):
                try:
                    px = decode_image(bytes(data), fmt)
                except (NotImplementedError, ValueError):
                    out.append((iid, fmt, None, None, False,
                                None, None, None, None, None, None, None))
                    continue
                means = px.reshape(-1, 3).mean(axis=0)
                dist = int(
                    bin((phash64(px) ^ int(ph)) & 0xFFFFFFFFFFFFFFFF).count("1")
                )
                tol = _LOSSY_PHASH_TOL if fmt != "png" else 0
                out.append((
                    iid, fmt, int(px.shape[1]), int(px.shape[0]), True,
                    float(means[0]), float(means[1]), float(means[2]),
                    float(px.astype(np.float64).std()),
                    _entropy(px),
                    dist,
                    dist <= tol,
                ))
            yield pd.DataFrame(
                out,
                columns=["image_id", "fmt", "w", "h", "decoded", "mean_r",
                         "mean_g", "mean_b", "stddev", "entropy",
                         "phash_dist", "phash_check"],
            )

    cols = df.select("image_id", "bytes", "fmt", "phash")
    return cols.mapInPandas(gen, schema=STATS_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Nearest-neighbor downsample to ``max_side`` and re-encode as PNG.

    Upscaling never happens (training pipelines shrink, they don't inflate).
    Output is always lossless PNG: a resize stage must not stack a second
    lossy generation on top of the source's.

    Poison rows (undecodable format/bytes) pass through untouched — original
    bytes and fmt, null dims — instead of killing the stage, mirroring
    ``decode_stats``; a resize stage must not drop data it cannot improve.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                except (NotImplementedError, ValueError):
                    out.append((iid, bytes(data), None, None, fmt))
                    continue
                h, w = px.shape[:2]
                scale = max(h, w) / max_side
                if scale > 1:
                    ys = (np.arange(int(h / scale)) * scale).astype(int)
                    xs = (np.arange(int(w / scale)) * scale).astype(int)
                    px = px[ys][:, xs]
                out.append((iid, encode_png(px),
                            int(px.shape[1]), int(px.shape[0]), "png"))
            yield pd.DataFrame(
                out, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema=RESIZE_SCHEMA
    )


def verify_integrity(df_after: DataFrame, df_before: DataFrame,
                     min_psnr_db: float = 40.0) -> DataFrame:
    """The north-star image gate as a distributed operator: join the pipeline
    output back to the source on image_id (broadcast-or-shuffle equi join —
    AQE picks) and decode both sides; ``ok`` iff pixels are allclose for
    lossless fmt / PSNR >= ``min_psnr_db`` for lossy fmt.
    """
    before = df_before.select(
        "image_id",
        df_before["bytes"].alias("bytes_before"),
        df_before["fmt"].alias("fmt_before"),
    )
    joined = df_after.select("image_id", "bytes", "fmt").join(
        before, "image_id"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, a, fa, b, fb in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"],
                pdf["bytes_before"], pdf["fmt_before"],
            ):
                pa = decode_image(bytes(a), fa)
                pb = decode_image(bytes(b), fb)
                if pa.shape != pb.shape:
                    out.append((iid, fa, False, 0.0))
                    continue
                val = psnr(pa, pb)
                lossless = fa == "png" and fb == "png"
                ok = bool(np.array_equal(pa, pb)) if lossless else bool(
                    val >= min_psnr_db
                )
                out.append((iid, fa, ok, float(min(val, 1e9))))
            yield pd.DataFrame(out, columns=["image_id", "fmt", "ok", "psnr"])

    return joined.mapInPandas(gen, schema=INTEGRITY_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — STUB.

    This container ships no video codec; the operator exists to pin the
    Spark-side contract (schema below, ``mapInPandas`` batch shape) that a
    real ffmpeg-backed worker would fill in.  Calling it raises.

    Contract: input (video_id string, bytes binary, fmt string) -> output
    (video_id string, frame_no int, bytes binary, w int, h int).
    """
    raise NotImplementedError(
        "video decode requires ffmpeg/av, not available in this environment; "
        "see module docstring for the pinned schema contract"
    )
