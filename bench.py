"""Benchmark harness for the driver: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries are forced with a noop write (full execution, no driver collect cost).
The flagship ``doc_scrub`` runs the complete langid + quality + PII-scrub
pandas-UDF stage over the documents table — the engine's core workload; its
throughput is also reported (docs/sec) alongside the per-query seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "doc_scrub",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "top_customers_per_nation",
    "events_hourly",
    "events_running_total",
    "events_sessions",
    "doc_minhash_buckets",
    "doc_simhash_buckets",
    "doc_exact_dedup",
    "part_supplier_revenue",
    "embedding_topk",
    "embedding_lsh_hist",
    # round-3 capability (the substring/decontamination queries stay in
    # the correctness gate but out of the headline: their 40-char string
    # indexes pay multi-shuffle fixed costs that dwarf the 5k-row bench
    # corpus — see BASELINE.md round-3 notes)
    "doc_repetition_stats",
]


def force(df) -> int:
    """Fully execute a plan; returns row count via a cheap count over cached
    physical results is avoided — noop write executes every operator."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    from pii_redactor_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        app_name="pii-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    # Warm up the JVM + all Python workers once with the full UDF stage: a
    # 100 TB job amortizes worker startup over hours; the bench should
    # measure steady-state throughput, not one-time fork+import cost.
    force(qs["doc_scrub"](spark, SF_DIR))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        force(qs[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    by_length = _scrub_by_length_bucket(spark)
    image_decode = _image_decode_bench(spark)
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "scrub_docs_per_sec": round(n_docs / timings["doc_scrub"], 1),
        "scrub_by_length": by_length,
        "cpus": CPUS,
    }
    if image_decode is not None:
        out["image_decode"] = image_decode
    prev = _previous_round_timings()
    if prev:
        out["prev_delta"] = {
            name: round(timings[name] - prev[name], 3)
            for name in timings if name in prev
        }
        prev_total = sum(v for k, v in prev.items() if k in timings)
        if prev_total:
            out["prev_total_ratio"] = round(
                sum(v for k, v in timings.items() if k in prev) / prev_total,
                3,
            )
    spark.stop()
    print(json.dumps(out))


# Char-length bucket edges over the documents table (corpus spans ~44-580
# chars at bench SFs); the reference benchmarks the same short/medium/long/
# very_long shape per text (perf_test.py:204-233).
LENGTH_BUCKETS = [
    ("short", 0, 150),
    ("medium", 150, 300),
    ("long", 300, 450),
    ("very_long", 450, None),
]


def _scrub_by_length_bucket(spark) -> dict[str, dict]:
    """Scrub throughput by caption-length bucket — the reference's
    benchmark_text_lengths analog (perf_test.py:204-233) and the skew
    evidence the north rule asks for: docs/sec must degrade smoothly with
    length, not cliff on the long tail."""
    from pyspark.sql import functions as F

    from pii_redactor_spark.operators.scrub import (
        parallelize_for_udf,
        scrub_udf,
    )

    # cache the repartitioned text once: the per-bucket loop then times
    # ONLY the scrub UDF, not 4 repeated full-table scan+shuffle passes
    docs = parallelize_for_udf(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    ).cache()
    docs.count()  # materialize before any timer starts
    out: dict[str, dict] = {}
    for name, lo, hi in LENGTH_BUCKETS:
        cond = F.length("text") >= lo
        if hi is not None:
            cond = cond & (F.length("text") < hi)
        sub = docs.where(cond)
        row = sub.agg(
            F.count("*").alias("n"), F.sum(F.length("text")).alias("chars")
        ).collect()[0]
        n, chars = row["n"], row["chars"]
        if not n:
            continue
        t0 = time.perf_counter()
        force(sub.withColumn("_s", scrub_udf(F.col("text"))).select("_s.keep"))
        dt = time.perf_counter() - t0
        out[name] = {
            "n_docs": n,
            "sec": round(dt, 3),
            "docs_per_sec": round(n / dt, 1),
            # the honest cross-bucket comparator: per-doc rates are
            # fixed-overhead dominated at bench scale (each bucket pays
            # one small job), chars/sec is the work-normalized number
            "chars_per_sec": round(chars / dt, 1),
        }
    docs.unpersist()
    return out


def _image_decode_bench(spark) -> dict | None:
    """Pixel-path throughput — the image-axis companion to
    scrub_by_length: decode_stats (mapInPandas over the binary column,
    bytes never on the driver) over a cached deterministic PNG fixture
    table.  The fixture cache is keyed on the generator-source fingerprint
    (``ensure_cached_fixture``), so a generator change regenerates instead
    of silently timing stale content; generation time is excluded from the
    measurement.  Returns None (and omits the field) if anything fails —
    the headline bench must never die on the image leg."""
    try:
        from pii_redactor_spark.fixtures.images import ensure_cached_fixture
        from pii_redactor_spark.operators.vision import decode_stats

        rows = int(os.environ.get("BENCH_IMAGE_ROWS", "20000"))
        images_path = ensure_cached_fixture(
            spark, f"/root/repo/.cache/bench_img_{rows}", rows
        )
        imgs = spark.read.parquet(images_path).select(
            "image_id", "bytes", "fmt", "phash"
        )
        # warm the python workers on a slice so the timing is steady-state
        force(decode_stats(imgs.limit(512)))
        t0 = time.perf_counter()
        force(decode_stats(imgs).select("image_id"))
        dt = time.perf_counter() - t0
        return {
            "n_images": rows,
            "sec": round(dt, 3),
            "images_per_sec": round(rows / dt, 1),
        }
    except Exception as exc:
        import traceback

        print(f"# image_decode leg failed: {exc!r}", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)
        return None


def _previous_round_timings() -> dict[str, float]:
    """Per-query seconds from the latest BENCH_r{N}.json, for mechanical
    regression visibility round-over-round.  Round-1 names map onto their
    round-2 successors."""
    import glob
    import re

    renames = {"doc_scrub_nosql": "doc_scrub",
               "embedding_lsh_nosql": "embedding_lsh_hist"}
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        (re.search(r"BENCH_r(\d+)\.json$", p), p)
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
    ]
    benches = [p for m, p in sorted(
        ((m, p) for m, p in candidates if m),
        key=lambda mp: int(mp[0].group(1)),
    )]
    if not benches:
        return {}
    try:
        with open(benches[-1]) as f:
            doc = json.load(f)
        prev = doc.get("parsed", doc).get("queries", {})
    except (OSError, json.JSONDecodeError, AttributeError):
        return {}
    return {renames.get(k, k): float(v) for k, v in prev.items()}


if __name__ == "__main__":
    main()
