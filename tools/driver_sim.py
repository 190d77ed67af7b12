#!/usr/bin/env python
"""Simulate the verification driver exactly: load __spark_entry__ in a
PLAIN SparkSession (no engine confs — catches hidden dependencies on
the engine's session factory), run queries, and hash-compare against
their DuckDB oracles at the driver's scale factor.

    python tools/driver_sim.py q1 q2 ...     # named queries
    python tools/driver_sim.py --new         # queries with no green
                                             # CORRECTNESS_r*.json row
    python tools/driver_sim.py --all         # whole registry (slow)
    python tools/driver_sim.py --all --record PARITY_SF001_r09.json
                                             # also write a per-query
                                             # JSON record (committed
                                             # per round so the judge
                                             # can audit the full gate
                                             # without rerunning it)

Exit code 0 iff every checked query matches (rows-only queries pass
when they return >= 0 rows with a stable schema, like the driver).
"""

from __future__ import annotations

import importlib.util
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _load_normalize():
    """Reuse the suite's canonical comparator (tests/oracle_compare.py)
    — the same normalization the parity gate applies."""
    spec = importlib.util.spec_from_file_location(
        "oracle_compare", os.path.join(HERE, "tests", "oracle_compare.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.normalize, mod.diff_report


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(HERE, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # defaults mirror the real verification driver's plain session; the
    # heap knob exists for off-gate scale checks (sf1 probes need more
    # than the 1g default purely because the DATA is 100x the gate's)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config(
            "spark.driver.memory",
            os.environ.get("DRIVER_SIM_DRIVER_MEM", "1g"),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs, oracles = mod.queries(), mod.oracle_sql()

    args = sys.argv[1:]
    record_path = None
    if "--record" in args:
        i = args.index("--record")
        record_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--all" in args:
        names = list(qs)
    elif "--new" in args:
        sys.path.insert(0, HERE)
        from flink_demo_spark.plans import registry

        green = registry._previously_green()
        names = [n for n in qs if n not in green]
    else:
        names = args
        unknown = [n for n in names if n not in qs]
        if unknown or not names:
            print(f"unknown or missing query names: {unknown}")
            return 2

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    normalize, diff_report = _load_normalize()
    failed = []
    record: dict[str, dict] = {}
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = sdf.collect()
            if name not in oracles:
                print(f"  {name}: rows-only, {len(srows)} rows — OK")
                record[name] = {"status": "rows_only", "rows": len(srows)}
                continue
            cols = sorted(sdf.columns)
            cur = con.execute(oracles[name])
            ocols = sorted(d[0] for d in cur.description)
            odf = cur.df()
            if cols != ocols:
                raise AssertionError(f"columns {cols} != oracle {ocols}")
            sset = normalize(sdf.toPandas())
            oset = normalize(odf)
            if sset != oset:
                raise AssertionError(
                    f"value mismatch ({len(srows)} vs {len(odf)} rows): "
                    + diff_report(sset, oset, 2).replace("\n", " | ")
                )
            print(f"  {name}: {len(srows)} rows — MATCH")
            record[name] = {"status": "match", "rows": len(srows)}
        except Exception as e:  # keep checking the rest
            failed.append(name)
            msg = str(e).splitlines()[0][:160]
            print(f"  {name}: FAIL — {msg}")
            record[name] = {"status": "fail", "err": msg}

    if record_path:
        import json

        with open(record_path, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "n_checked": len(names),
                    "n_green": len(names) - len(failed),
                    "failed": failed,
                    "queries": record,
                },
                f,
                indent=1,
            )
            f.write("\n")

    print(
        f"{len(names) - len(failed)}/{len(names)} green at {SF_DIR}"
        + (f"; FAILED: {failed}" if failed else "")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
