"""Image-payload quality gate + perceptual-hash near-dup (graft cell:
pyspark x image).

The gate must stay metadata-only — the plan pin below asserts the parquet
ReadSchema never includes ``bytes`` when the pipeline gates on image
quality.  The phash near-dup reuses the SimHash pigeonhole machinery over
the stored perceptual hash; recall is verified against a brute-force
popcount oracle on random hashes.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pii_redactor_spark.operators.vision import (
    ImageQualityConfig,
    dedupe_images_by_phash,
    image_quality_flags,
    phash_neardup_pairs,
    with_image_quality,
)


@pytest.fixture(scope="module")
def meta_df(spark):
    # (id, w, h, fmt, bytes, keep)
    rows = [
        ("ok",      128, 96,  "png",  b"\x00" * (128 * 96), True),
        ("small",   16,  512, "png",  b"\x00" * 64, True),       # min side 16
        ("stretch", 512, 64,  "png",  b"\x00" * 64, True),       # aspect 8
        ("webp",    128, 128, "webp", b"\x00" * 64, True),
        ("tiny_bytes", 256, 256, "jpeg", b"\x00" * 8, True),     # bpp tiny
        ("dropped", 128, 128, "png",  b"\x00" * (128 * 128), False),
    ]
    return spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, bytes binary, "
              "keep boolean"
    )


def test_flags(meta_df):
    out = {
        r["image_id"]: set(r["f"])
        for r in meta_df.select(
            "image_id", image_quality_flags().alias("f")
        ).collect()
    }
    assert out["ok"] == set()
    assert out["small"] == {"too_small", "extreme_aspect"}   # 512/16 = 32 > 4
    assert out["stretch"] == {"extreme_aspect"}
    assert out["webp"] == {"bad_format"}
    assert out["tiny_bytes"] == set()   # bytes check off by default
    assert out["dropped"] == set()


def test_bytes_plausibility_opt_in(meta_df):
    cfg = ImageQualityConfig(bytes_per_pixel_bounds=(0.01, 16.0))
    out = {
        r["image_id"]: set(r["f"])
        for r in meta_df.select(
            "image_id", image_quality_flags(cfg).alias("f")
        ).collect()
    }
    assert "bytes_implausible" in out["tiny_bytes"]   # 8 / 65536 < 0.01
    assert "bytes_implausible" not in out["ok"]


def test_keep_gate(meta_df):
    out = {
        r["image_id"]: r["keep"]
        for r in with_image_quality(meta_df, keep_col="keep").collect()
    }
    assert out["ok"] is True
    assert out["small"] is False and out["webp"] is False
    assert out["dropped"] is False       # stays dropped


def test_decisions_plan_stays_bytes_free(spark, tmp_root):
    """scrub_decisions(image_quality=...) must not widen the parquet scan to
    the binary column: ReadSchema carries w/h/fmt but never bytes."""
    from pii_redactor_spark.fixtures.captions import CaptionConfig
    from pii_redactor_spark.fixtures.images import write_fixture_tables
    from pii_redactor_spark.pipeline.run import scrub_decisions
    from pii_redactor_spark.sources import storage

    images_path, _ = write_fixture_tables(
        spark, f"{tmp_root}/iq_fx", 64, CaptionConfig(), partitions=2
    )
    src = storage.read_table(spark, images_path)
    out = scrub_decisions(src, image_quality=ImageQualityConfig(min_side=32))
    assert "image_flags" in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    for ln in scan_lines:
        assert "bytes" not in ln, f"image gate read the binary column:\n{ln}"
        assert "w:int" in ln and "fmt:string" in ln, ln
    # fixture sizes are 16..64, so min_side=32 must actually drop rows
    n_gated = out.where(
        F.array_contains("image_flags", "too_small") & ~F.col("keep")
    ).count()
    assert n_gated > 0



def test_phash_pairs_vs_bruteforce(spark):
    """Pigeonhole banding recall is exact for hamming <= max_hamming:
    compare against brute-force popcount over random 64-bit hashes plus
    planted near-dup pairs."""
    rng = random.Random(7)
    hashes = {}
    for i in range(120):
        hashes[f"i{i:03d}"] = rng.getrandbits(64) - (1 << 63)
    # plant near-dups at known distances 0, 1, 2, 3
    base = hashes["i000"]
    for d, iid in [(0, "p0"), (1, "p1"), (2, "p2"), (3, "p3")]:
        v = base
        for b in rng.sample(range(64), d):
            v ^= (1 << b)
            if v >= (1 << 63):
                v -= 1 << 64
            elif v < -(1 << 63):     # flipping bit 63 of a negative value
                v += 1 << 64
        hashes[iid] = v

    df = spark.createDataFrame(
        [(k, v) for k, v in hashes.items()], "image_id string, phash long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_neardup_pairs(df, max_hamming=2).collect()
    }

    def pop(x):
        return bin(x & ((1 << 64) - 1)).count("1")

    want = {}
    items = sorted(hashes.items())
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            d = pop(items[i][1] ^ items[j][1])
            if d <= 2:
                want[(items[i][0], items[j][0])] = d
    assert got == want
    assert ("i000", "p0") in got and got[("i000", "p0")] == 0
    assert ("i000", "p2") in got and got[("i000", "p2")] == 2
    assert ("i000", "p3") not in got            # beyond the radius


def test_dedupe_images_keeps_min_id(spark):
    rows = [
        ("a1", 100), ("a2", 100), ("a3", 101),   # cluster {a1,a2,a3}
        ("b1", 1 << 40),                          # singleton
        ("c1", -5), ("c2", -5),                   # cluster {c1,c2}
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    kept = {
        r["image_id"]
        for r in dedupe_images_by_phash(df, max_hamming=2).collect()
    }
    assert kept == {"a1", "b1", "c1"}


def test_pipeline_gate_end_to_end(spark, tmp_root):
    """run_pipeline(image_quality=...) drops gated images and the decisions
    table records why (image_flags)."""
    from pii_redactor_spark.fixtures.captions import CaptionConfig
    from pii_redactor_spark.fixtures.images import write_fixture_tables
    from pii_redactor_spark.pipeline.run import run_pipeline
    from pii_redactor_spark.sources import storage

    images_path, _ = write_fixture_tables(
        spark, f"{tmp_root}/iq_e2e_fx", 120, CaptionConfig(), partitions=2
    )
    out_dir = f"{tmp_root}/iq_e2e_out"
    run_pipeline(
        spark, images_path, out_dir, prefixes_per_commit=300,
        materialize_bytes=False,
        image_quality=ImageQualityConfig(min_side=32),
    )
    data = storage.read_table(spark, f"{out_dir}/data")
    flagged = data.where(F.size("image_flags") > 0)
    assert flagged.count() > 0
    assert flagged.where(F.col("keep")).count() == 0


def test_null_metadata_is_flagged(spark):
    """NULL w/h/fmt must flag (and gate), not sail through as clean —
    the comparisons all evaluate NULL and array_compact would strip them."""
    df = spark.createDataFrame(
        [("nw", None, 128, "png", True),
         ("nf", 128, 128, None, True),
         ("ok2", 128, 128, "png", True)],
        "image_id string, w int, h int, fmt string, keep boolean",
    )
    out = {r["image_id"]: r for r in
           with_image_quality(df, keep_col="keep").collect()}
    assert "null_metadata" in out["nw"]["image_flags"]
    assert "null_metadata" in out["nf"]["image_flags"]
    assert out["nw"]["keep"] is False and out["nf"]["keep"] is False
    assert out["ok2"]["image_flags"] == [] and out["ok2"]["keep"] is True


def test_decisions_with_bytes_plausibility(spark, tmp_root):
    """The opt-in bytes check must work on the decisions path: the scan
    widens to the binary column (its documented cost) but the output still
    drops it."""
    from pii_redactor_spark.fixtures.captions import CaptionConfig
    from pii_redactor_spark.fixtures.images import write_fixture_tables
    from pii_redactor_spark.pipeline.run import scrub_decisions
    from pii_redactor_spark.sources import storage

    images_path, _ = write_fixture_tables(
        spark, f"{tmp_root}/iq_bpp_fx", 32, CaptionConfig(), partitions=2
    )
    src = storage.read_table(spark, images_path)
    cfg = ImageQualityConfig(min_side=8, bytes_per_pixel_bounds=(1e9, 1e10))
    out = scrub_decisions(src, image_quality=cfg)
    assert "bytes" not in out.columns
    rows = out.select("image_flags", "keep").collect()   # must not raise
    assert all("bytes_implausible" in r["image_flags"] for r in rows)
    assert not any(r["keep"] for r in rows)
