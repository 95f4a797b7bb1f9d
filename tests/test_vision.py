"""Vision operator tests over the synthetic image+caption fixture table."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pii_redactor_spark.fixtures.captions import CaptionConfig
from pii_redactor_spark.fixtures.codecs import decode_image
from pii_redactor_spark.fixtures.images import write_fixture_tables
from pii_redactor_spark.operators.vision import (
    decode_stats,
    resize_images,
    sample_frames,
    verify_integrity,
)

N = 300


@pytest.fixture(scope="module")
def images_df(spark, tmp_root):
    path, _ = write_fixture_tables(
        spark, f"{tmp_root}/vision_fx", N, CaptionConfig(), partitions=8
    )
    return spark.read.parquet(path)


def test_decode_stats(spark, images_df):
    stats = decode_stats(images_df).toPandas()
    assert len(stats) == N
    assert stats["decoded"].all()
    assert stats["phash_check"].all()  # stored phash matches recomputation
    assert ((stats["mean_r"] >= 0) & (stats["mean_r"] <= 255)).all()
    assert (stats["entropy"] > 0).all()
    # metadata columns agree with the table's w/h
    meta = images_df.select("image_id", "w", "h").toPandas().set_index("image_id")
    joined = stats.set_index("image_id").join(meta, rsuffix="_tbl")
    assert (joined["w"] == joined["w_tbl"]).all()
    assert (joined["h"] == joined["h_tbl"]).all()


def test_decode_stats_poison_row_survives(spark):
    df = spark.createDataFrame(
        [("bad1", bytearray(b"not an image"), "webp", 0),
         ("bad2", bytearray(b"\x89PNG but truncated"), "png", 0)],
        "image_id string, bytes binary, fmt string, phash long",
    )
    stats = decode_stats(df).toPandas().set_index("image_id")
    assert not stats["decoded"].any()
    assert stats["mean_r"].isna().all()


def test_resize_images(spark, images_df):
    small = resize_images(images_df, max_side=16)
    rows = small.collect()
    assert len(rows) == N
    for r in rows[:20]:
        assert max(r["w"], r["h"]) <= 16
        px = decode_image(bytes(r["bytes"]), "png")
        assert px.shape == (r["h"], r["w"], 3)
    # downsample preserves coarse appearance: channel means stay close
    orig = decode_stats(images_df).select("image_id", "mean_r").toPandas()
    new = decode_stats(
        small.join(images_df.select("image_id", "phash"), "image_id")
    ).select("image_id", F.col("mean_r").alias("mean_r_new")).toPandas()
    m = orig.merge(new, on="image_id")
    assert (np.abs(m["mean_r"] - m["mean_r_new"]) < 25).mean() > 0.95


def test_verify_integrity_passthrough(spark, images_df):
    res = verify_integrity(images_df, images_df).toPandas()
    assert len(res) == N
    assert res["ok"].all()
    # lossless rows report inf-clamped psnr; lossy rows >= 40 dB
    assert (res.loc[res["fmt"] == "jpeg", "psnr"] >= 40).all()


def test_verify_integrity_detects_recompression(spark, images_df):
    # simulate a buggy stage that re-encodes pixels through the lossy codec
    from collections.abc import Iterator

    import pandas as pd

    from pii_redactor_spark.fixtures.codecs import decode_image as dec
    from pii_redactor_spark.fixtures.codecs import encode_lossy

    def corrupt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["bytes"] = [
                encode_lossy(
                    np.clip(
                        dec(bytes(b), f).astype(np.int16) + 40, 0, 255
                    ).astype(np.uint8)
                )
                for b, f in zip(pdf["bytes"], pdf["fmt"])
            ]
            pdf["fmt"] = "jpeg"
            return iter([pdf[["image_id", "bytes", "fmt"]]])

    corrupted = images_df.select("image_id", "bytes", "fmt").mapInPandas(
        corrupt, schema="image_id string, bytes binary, fmt string"
    )
    res = verify_integrity(corrupted, images_df).toPandas()
    assert not res["ok"].any()  # +40 brightness shift => PSNR ~16 dB


def test_sample_frames_is_pinned_stub(spark, images_df):
    with pytest.raises(NotImplementedError, match="video decode"):
        sample_frames(images_df)


def test_resize_poison_row_passes_through(spark, images_df):
    """An undecodable row must not kill the resize stage (decode_stats
    contract): it passes through with original bytes and null dims."""
    from pyspark.sql import functions as F

    from pii_redactor_spark.operators.vision import resize_images

    poisoned = images_df.select("image_id", "bytes", "fmt").limit(4)
    # corrupt one row's format so decode_image raises
    poisoned = poisoned.withColumn(
        "fmt",
        F.when(F.monotonically_increasing_id() == 0, F.lit("webp"))
        .otherwise(F.col("fmt")),
    )
    out = resize_images(poisoned, max_side=16).collect()
    assert len(out) == 4
    bad = [r for r in out if r["w"] is None]
    good = [r for r in out if r["w"] is not None]
    assert len(bad) == 1 and bad[0]["fmt"] == "webp"
    assert bad[0]["bytes"] is not None
    assert all(r["fmt"] == "png" and r["w"] <= 16 for r in good)
