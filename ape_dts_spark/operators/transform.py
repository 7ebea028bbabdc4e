"""User row-transform stage — the Lua processor's Spark-native equivalent.

Reference: the Lua processor (dt-pipeline/src/lua_processor.rs:16-57,117-191)
runs a user script per event with globals ``schema, tb, row_type, before,
after``; the script may mutate values, rename columns, re-route the table, or
drop the row by clearing ``row_type`` (docs/en/etl/lua.md).

Spark-native contract: the user supplies a **pandas-batch function** applied
via ``mapInPandas`` (Arrow-vectorized — the idiomatic replacement for a
per-row scripting hook; 10-100x faster than row-at-a-time UDFs). For
convenience a per-row dict API is offered too (slower, same contract as Lua).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def transform_batches(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: T.StructType | str | None = None,
) -> DataFrame:
    """Vectorized transform: fn(pandas_batch) -> pandas_batch (rows may be
    dropped/mutated; columns must match output_schema, default = input schema)."""
    schema = output_schema or df.schema

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(_apply, schema=schema)


def transform_rows(
    df: DataFrame,
    fn: Callable[[dict[str, Any]], dict[str, Any] | None],
    output_schema: T.StructType | str | None = None,
) -> DataFrame:
    """Per-row transform with the exact Lua contract: fn(row_dict) returns the
    (possibly mutated) dict, or None to drop the row. Row dicts contain the
    top-level change-event columns; ``before``/``after`` are nested dicts.

    Prefer ``transform_batches`` in hot paths — this exists for parity with the
    reference's scripting UX.
    """
    schema = output_schema or df.schema
    cols = [f.name for f in (schema if isinstance(schema, T.StructType) else df.schema)]

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for row in pdf.to_dict(orient="records"):
                res = fn(row)
                if res is not None:
                    out_rows.append(res)
            if out_rows:
                yield pd.DataFrame(out_rows, columns=cols)

    return df.mapInPandas(_apply, schema=schema)
