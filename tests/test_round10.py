"""Round-10 pins: the sketch-tier DAU/WAU/MAU pair.

Both queries are oracle-less (DataSketches HLL registers are
engine-specific), so — like uv_approx_hll — their correctness evidence
is (a) an error bound against the EXACT oracle-backed twin and (b)
exact batch/streaming agreement, which HLL's order-insensitive
register max-merge guarantees for identical input.
"""

from __future__ import annotations

import math

from flink_demo_spark.plans.registry import REGISTRY, _load_all

_load_all()

# lgConfigK=12 -> relative standard error ~= 1.04 / sqrt(2^12); the
# 5x multiplier is the same slack uv_approx_hll's bound uses
RSD = 1.04 / math.sqrt(2 ** 12)


def _by_day(df):
    return {
        r["day"]: (r["dau"], r["wau"], r["mau"]) for r in df.collect()
    }


def test_dau_wau_mau_hll_error_bound(spark, sf_dir):
    exact = _by_day(REGISTRY["events_dau_wau_mau"].fn(spark, sf_dir))
    approx = _by_day(REGISTRY["events_dau_wau_mau_hll"].fn(spark, sf_dir))
    assert set(exact) == set(approx)
    for day, ex in exact.items():
        for metric, (e, a) in enumerate(zip(ex, approx[day])):
            assert e > 0
            rel = abs(a - e) / e
            assert rel <= 5 * RSD, (day, metric, a, e, rel)


def test_streaming_hll_twin_equals_batch(spark, sf_dir):
    batch = _by_day(REGISTRY["events_dau_wau_mau_hll"].fn(spark, sf_dir))
    stream = _by_day(REGISTRY["streaming_dau_wau_mau_hll"].fn(spark, sf_dir))
    assert batch == stream
