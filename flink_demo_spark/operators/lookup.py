"""Vectorized dimension lookup (async-I/O parity).

Reference: ``AsyncDataStream.unorderedWait`` + ``RichAsyncFunction``
dimension lookup with a thread pool and cache
(``DataStreamFunc.scala:1808-1915``,
``flink-prometheus/.../DimAsyncFunction.java:119-160``).

Spark-first replacements, fastest first:
1. broadcast join against the dimension DataFrame (pure JVM) — used
   by ``streaming_lookup_join``;
2. when the "dimension" is an external service or a Python-side
   structure, an Arrow-batched ``mapInPandas`` doing ONE vectorized
   lookup per batch (this module) — the batch amortizes the per-call
   cost exactly like the reference's async pool + cache, without
   per-row futures.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


def batch_lookup(
    df: DataFrame,
    key_col: str,
    lookup: dict,
    out_col: str = "looked_up",
    out_type: str = "string",
    default=None,
) -> DataFrame:
    """Map ``key_col`` through a broadcast dict inside mapInPandas.

    ``lookup`` is shipped once per executor via Spark's broadcast
    (the reference's dim cache); each Arrow batch is one vectorized
    ``Series.map`` call.
    """
    bc = df.sparkSession.sparkContext.broadcast(lookup)
    schema = df.schema.simpleString().removeprefix("struct<").removesuffix(">")
    out_schema = f"{schema}, {out_col} {out_type}".replace(":", " ")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = bc.value
        for pdf in batches:
            mapped = pdf[key_col].map(table)
            # pandas fillna(None) raises ValueError — misses stay NaN/None
            pdf[out_col] = mapped if default is None else mapped.fillna(default)
            yield pdf

    return df.mapInPandas(fn, out_schema)
