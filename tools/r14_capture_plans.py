#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query into plans/r14/.

Usage:
    python tools/r14_capture_plans.py before [query ...]
    python tools/r14_capture_plans.py after  [query ...]

With no query names, captures every bench query. Output files:
    plans/r14/<query>_<tag>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_demo_spark.plans import bench_queries  # noqa: E402
from flink_demo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")


def plan_str(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("r14-plan-capture")
    specs = bench_queries()
    for name, spec in specs.items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            txt = plan_str(df)
        except Exception as e:  # capture the failure, don't abort the sweep
            txt = f"ERROR building plan: {e}"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({tag}) — sf_dir={SF_DIR}\n\n")
            f.write(txt)
            if not txt.endswith("\n"):
                f.write("\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
