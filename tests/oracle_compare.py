"""Shared Spark-vs-DuckDB result comparison, mimicking the driver's
order-insensitive value check (columns sorted by name, rows sorted,
cell values normalized)."""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import pandas as pd


def _norm_cell(v: Any) -> str:
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ",".join(_norm_cell(x) for x in v.tolist()) + "]"
        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.floating):
            return _norm_cell(float(v))
        if isinstance(v, np.bool_):
            return str(bool(v))
    except ImportError:
        pass
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def diff_report(a: list, b: list, limit: int = 5) -> str:
    sa, sb = set(a), set(b)
    only_a = list(sa - sb)[:limit]
    only_b = list(sb - sa)[:limit]
    return f"spark-only rows: {only_a}\noracle-only rows: {only_b}"
