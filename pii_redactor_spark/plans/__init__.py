"""Plan inspection utilities — the engine's `.explain` surface as code.

Used by the plan-shape regression tests and by anyone asking "did Catalyst
do what I meant": column pruning, filter pushdown, partition pruning, UDF
node counts, join strategies.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan node (the columns actually read)."""
    return re.findall(r"ReadSchema: (\S+)", plan_str(df))


def pushed_filters(df: DataFrame) -> list[str]:
    """Contents of every PushedFilters: [...] block."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan_str(df))


def partition_filters(df: DataFrame) -> list[str]:
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", plan_str(df))


def count_nodes(df: DataFrame, node: str) -> int:
    """Occurrences of a physical node in the simple plan (one line/node)."""
    return plan_str(df, mode="simple").count(node)


def python_udf_nodes(df: DataFrame) -> int:
    """Python-evaluation nodes of any kind (Arrow-batched or row-at-a-time).

    Zero for every relational query; exactly one for the scrub stage."""
    simple = plan_str(df, mode="simple")
    return sum(
        simple.count(n)
        for n in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                  "FlatMapGroupsInPandas")
    )


def scans_read_column(df: DataFrame, column: str) -> bool:
    return any(column in s for s in read_schemas(df))
