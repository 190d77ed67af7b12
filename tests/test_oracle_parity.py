"""The local correctness gate: every oracle-backed registry query must
match its DuckDB oracle at sf0.001 (the driver repeats this at sf0.01).
"""

from __future__ import annotations

import pytest

from flink_demo_spark.plans.registry import REGISTRY, _load_all

from .oracle_compare import diff_report, normalize

_load_all()
ORACLE_BACKED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_oracle_parity(name, spark, sf_dir, oracle_con):
    spec = REGISTRY[name]
    spark_rows = normalize(spec.fn(spark, sf_dir).toPandas())
    oracle_rows = normalize(oracle_con.execute(spec.oracle).df())
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: row count {len(spark_rows)} != oracle {len(oracle_rows)}\n"
        + diff_report(spark_rows, oracle_rows)
    )
    assert spark_rows == oracle_rows, f"{name}: value mismatch\n" + diff_report(
        spark_rows, oracle_rows
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
