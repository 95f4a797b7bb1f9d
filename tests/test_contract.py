"""Driver-contract conformance: queries() vs oracle_sql() via DuckDB.

Mimics the grading driver: run each Spark query and its DuckDB oracle on the
same parquet tables, compare row count, column names, and an order-insensitive
value multiset (floats normalized).  Runs at sf0.001 in CI; the driver reruns
at sf0.01.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# The materialized scrub oracle must be built for the same scale factor the
# queries run at (the driver uses sf0.01; this suite uses sf0.001).
import os  # noqa: E402

os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _multiset(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    spark_df = q(spark, SF_DIR).toPandas()
    oracle_df = ddb.sql(entrymod.oracle_sql()[name]).df()
    s_cols, s_rows = _multiset(spark_df)
    o_cols, o_rows = _multiset(oracle_df)
    assert s_cols == o_cols, f"{name}: columns {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: rows {len(s_rows)} vs {len(o_rows)}"
    )
    mism = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatching rows; first: "
        f"{s_rows[mism[0]]} vs {o_rows[mism[0]]}"
    )


def test_every_query_runs(spark):
    """Queries without oracles still run and return sane rows."""
    oracles = entrymod.oracle_sql()
    for name, q in entrymod.queries().items():
        if name in oracles:
            continue
        df = q(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.count() > 0
    assert "scrubbed" in df.columns
    assert rows


def test_props_json_oracle_edge_semantics(spark, ddb):
    """The events_props_json oracle mirrors from_json(props, 'k INT') type
    strictness OFF the fixture's happy path: quoted numbers, non-integer
    numerics, malformed JSON, out-of-INT-range values, and NULL must all
    yield NULL on both sides (and never abort the oracle query)."""
    from pyspark.sql import functions as F

    vals = [
        '{"k": 69}', '{"k": "42"}', '{"k": 1.5}', '{"k": -3}',
        'not json', '{"k": 99999999999}', None,
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "props string")
    got_spark = [
        r.k
        for r in sdf.select(
            F.from_json("props", "k INT").getField("k").alias("k")
        ).collect()
    ]
    ddb_expr = """
        SELECT CASE WHEN JSON_VALID(props)
                     AND JSON_TYPE(props, '$.k') IN ('BIGINT', 'UBIGINT')
                    THEN TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)
               END AS k
        FROM probe ORDER BY rowid
    """
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE probe (props VARCHAR)"
    )
    con.executemany("INSERT INTO probe VALUES (?)", [(v,) for v in vals])
    got_ddb = [
        None if row[0] is None or (isinstance(row[0], float) and math.isnan(row[0])) else int(row[0])
        for row in con.sql(ddb_expr).fetchall()
    ]
    assert got_spark == got_ddb == [69, None, None, -3, None, None, None]


def test_toxicity_oracle_null_caption_parity(spark, tmp_root):
    """Round-4 review: the engine folds NULL text to '' (0 / 0.0 / '')
    while DuckDB's string_split(NULL) propagates NULL — the oracle SQL
    carries a COALESCE for parity.  The sf testdata has no NULL texts,
    so this pins the divergence case directly: both sides must agree on
    a table CONTAINING a NULL caption."""
    import duckdb as _dd

    sf_dir = f"{tmp_root}/null_sf"
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        [(1, "slow day", "en", "s", 8),
         (2, None, "en", "s", 0),
         (3, "fine text here", "en", "s", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    con = _dd.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    for name in ("doc_toxicity_scrub", "doc_toxicity_joined"):
        s_cols, s_rows = _multiset(
            entrymod.queries()[name](spark, sf_dir).toPandas()
        )
        o_cols, o_rows = _multiset(con.sql(entrymod.oracle_sql()[name]).df())
        assert s_cols == o_cols, name
        assert s_rows == o_rows, (name, s_rows, o_rows)
        # and the NULL row really scored as empty text, not NULL
        null_row = [r for r in s_rows if r[s_cols.index("doc_id")] == 2][0]
        assert null_row[s_cols.index("n_toxic")] == 0, null_row


def test_image_oracle_null_metadata_parity(spark, tmp_root):
    """ADVICE r4: for a NULL-text document the engine flags
    'null_metadata' with keep=false, while the old oracle's concat_ws
    yielded '' and keep evaluated NULL — the same NULL-parity bug class
    round 4 fixed for toxicity.  Pin the divergence case directly: both
    sides must agree on a table CONTAINING a NULL caption (the md5-derived
    metadata is NULL end-to-end for that row on both engines)."""
    import duckdb as _dd

    sf_dir = f"{tmp_root}/null_img_sf"
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        [(1, "a perfectly ordinary caption about a lake", "en", "s", 42),
         (2, None, "en", "s", 0),
         (3, "another caption, short", "en", "s", 22)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet"
    )
    con = _dd.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    name = "image_quality_flags"
    s_cols, s_rows = _multiset(
        entrymod.queries()[name](spark, sf_dir).toPandas()
    )
    o_cols, o_rows = _multiset(con.sql(entrymod.oracle_sql()[name]).df())
    assert s_cols == o_cols, (name, s_cols, o_cols)
    assert s_rows == o_rows, (name, s_rows, o_rows)
    # and the NULL row really flagged null_metadata with keep=false
    null_row = [r for r in s_rows if r[s_cols.index("image_id")] == 2][0]
    assert null_row[s_cols.index("flags_csv")] == "null_metadata", null_row
    assert null_row[s_cols.index("keep")] is False, null_row


def test_audio_oracle_null_metadata_parity(spark, tmp_root):
    """Audio axis (round 5): same NULL-parity contract as the image and
    toxicity axes — a NULL-text document must flag 'null_metadata' with
    keep=false on BOTH engines (F.get / DuckDB list[NULL] both yield
    NULL metadata; the oracle's concat_ws + COALESCE mirror the engine's
    array_compact + size==0)."""
    import duckdb as _dd

    sf_dir = f"{tmp_root}/null_audio_sf"
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        [(1, "a perfectly ordinary caption about a lake", "en", "s", 42),
         (2, None, "en", "s", 0),
         (3, "another caption, short", "en", "s", 22)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet"
    )
    con = _dd.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    for name in ("audio_quality_flags", "audio_corpus_stats"):
        s_cols, s_rows = _multiset(
            entrymod.queries()[name](spark, sf_dir).toPandas()
        )
        o_cols, o_rows = _multiset(con.sql(entrymod.oracle_sql()[name]).df())
        assert s_cols == o_cols, (name, s_cols, o_cols)
        assert s_rows == o_rows, (name, s_rows, o_rows)
    s_cols, s_rows = _multiset(
        entrymod.queries()["audio_quality_flags"](spark, sf_dir).toPandas()
    )
    null_row = [r for r in s_rows if r[s_cols.index("audio_id")] == 2][0]
    assert null_row[s_cols.index("flags_csv")] == "null_metadata", null_row
    assert null_row[s_cols.index("keep")] is False, null_row
