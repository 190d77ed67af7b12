#!/usr/bin/env python
"""Empirical scale probe: measure headline queries at sf0.1 AND at a
10x materialized sf1, and report the observed scaling exponent per
query (t ~ sf^e  =>  e = log(t1/t0.1)/log(10)).

The driver ships parquet only up to sf0.1 (TESTDATA.md, read-only), so
sf1 is MATERIALIZED here by replicating sf0.1 tenfold with disjoint
key spaces — the same construction TPC-H itself uses across scale
factors (fixed region/nation dims, key ranges growing with SF):

- region/nation: copied unchanged (fixed dimensions at every SF);
- fact/dim keys (custkey, orderkey, partkey, suppkey, event_id,
  user_id, doc_id, vec_id): replica i adds i * (max_key + 1), so every
  intra-replica join relationship (orders->customer,
  lineitem->orders/part/supplier, events.user_id->customer) is
  preserved and cross-replica keys never collide;
- timestamps are NOT shifted: a 10x corpus over the same wall-clock
  span means 10x density per window — exactly what a bigger cluster
  sees — so windowed/streaming state grows in *keys per window*, not
  in window count;
- documents.text gets a single replica-marker token appended (replica
  0 pristine): without it every doc would gain 9 verbatim twins and
  pair-emitting dedup queries would measure a C(10,2)-inflated
  workload instead of a 10x corpus; n_chars is recomputed;
- embeddings get +1e-3 * i on dimension 0 (replica 0 pristine) for the
  same reason (cosine near-dup pair explosion).

Usage:
  python tools/scale_probe.py                 # materialize + probe top queries
  python tools/scale_probe.py --queries a,b   # explicit list
  python tools/scale_probe.py --mult 10 --out /tmp/sfprobe

Prints a markdown table (for SCALING.md) and writes SCALE_PROBE.json
next to this repo's bench artifacts.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# per-table key columns and the stride keyspace they belong to
SHIFTS = {
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "order"), ("l_partkey", "part"), ("l_suppkey", "supp")
    ],
    "events": [("event_id", "event"), ("user_id", "cust")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
}

STRIDE_SOURCE = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

# ten most expensive headline queries by the round-7/8 bench record,
# plus the round-8 exact-substring dedup (new, scale-interesting)
DEFAULT_QUERIES = [
    "embedding_kmeans",
    "streaming_hotitems_topn",
    "streaming_allowed_lateness",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "kafka_roundtrip_window",
    "profile_columns",
    "cep_order_timeout",
    "q5_regional_revenue",
    "similarity_topk",
    "dedup_exact_substring",
]


def materialize(
    mult: int,
    out_dir: str,
    density: str = "growing",
    dups_per_base: int = 2,
    tables: list[str] | None = None,
) -> None:
    """Materialize a mult-x corpus from sf0.1.

    density="growing" (default, the original construction): every
    replica of a base doc appends only a one-token marker, so ALL mult
    replicas of a base doc are mutual near-dups — duplicate density
    (replicas per duplicate group) GROWS with mult, and pair-emitting
    dedup output grows ~C(mult, 2) per base doc.

    density="constant" (round-10, the discriminating probe the round-9
    verdict asked for): replicas are grouped into mult/dups_per_base
    groups of dups_per_base. Each group g > 0 gets its docs' TOKENS
    deterministically permuted (one RNG stream per group, fixed doc
    order) — same vocabulary and length distribution, but cross-group
    word k-grams (the MinHash 3-shingles and the exact-substring
    20-gram seeds) are destroyed, so groups are NEW base docs, not
    near-dups of each other. Within a group the dups_per_base replicas
    share the permuted text and differ only by the marker token —
    genuine near-dups. Duplicate FRACTION is therefore constant in
    mult: scaling mult up models a corpus that grows by new content
    while keeping its duplicate rate, so a dedup query's output should
    grow ~linearly and a super-linear runtime exponent would be a real
    plan defect rather than output growth.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if density == "constant" and mult % dups_per_base != 0:
        raise SystemExit(
            f"--mult {mult} must be divisible by --dups-per-base {dups_per_base}"
        )

    os.makedirs(out_dir, exist_ok=True)
    strides = {}
    for space, (table, col) in STRIDE_SOURCE.items():
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"), columns=[col])
        strides[space] = int(pc.max(t.column(col)).as_py()) + 1

    for table in tables if tables is not None else TABLES:
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        src = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        if table in ("region", "nation"):
            pq.write_table(src, dst)
            continue
        base_texts = None
        group_texts: dict[int, list[str]] = {}
        if table == "documents" and density == "constant":
            base_texts = src.column("text").to_pylist()
        replicas = []
        for i in range(mult):
            rep = src
            for col, space in SHIFTS.get(table, []):
                idx = rep.schema.get_field_index(col)
                shifted = pc.add(rep.column(col), i * strides[space])
                rep = rep.set_column(idx, col, shifted.cast(src.schema.field(col).type))
            if table == "documents":
                if density == "constant":
                    g, j = divmod(i, dups_per_base)
                    if g not in group_texts:
                        if g == 0:
                            group_texts[g] = base_texts
                        else:
                            # one sequential RNG per group over docs in
                            # fixed order: deterministic, shared by every
                            # replica j of the group
                            rng = np.random.RandomState((g * 1000003) % (2**32))
                            shuffled = []
                            for t in base_texts:
                                toks = t.split()
                                rng.shuffle(toks)
                                shuffled.append(" ".join(toks))
                            group_texts[g] = shuffled
                    texts_i = group_texts[g]
                    if j > 0:
                        texts_i = [f"{t} zg{g}r{j}" for t in texts_i]
                    changed = g > 0 or j > 0
                    if changed:
                        idx = rep.schema.get_field_index("text")
                        rep = rep.set_column(
                            idx, "text", pa.array(texts_i, type=pa.string())
                        )
                        nidx = rep.schema.get_field_index("n_chars")
                        rep = rep.set_column(
                            nidx,
                            "n_chars",
                            pc.utf8_length(rep.column("text")).cast(pa.int64()),
                        )
                elif i > 0:
                    idx = rep.schema.get_field_index("text")
                    txt = pc.binary_join_element_wise(
                        rep.column("text").cast(pa.string()),
                        pa.scalar(f"zrep{i}"),
                        " ",
                    )
                    rep = rep.set_column(idx, "text", txt)
                    nidx = rep.schema.get_field_index("n_chars")
                    rep = rep.set_column(
                        nidx, "n_chars",
                        pc.utf8_length(rep.column("text")).cast(pa.int64()),
                    )
            if table == "embeddings" and i > 0:
                idx = rep.schema.get_field_index("embedding")
                col_e = rep.column("embedding").combine_chunks()
                vals = col_e.values.to_numpy(zero_copy_only=False).copy()
                offs = col_e.offsets.to_numpy(zero_copy_only=False)
                if density == "constant":
                    g, j = divmod(i, dups_per_base)
                    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 1
                    # group-level LARGE offset on a rotating dimension
                    # (cross-group cosine pairs broken), tiny within-group
                    # wiggle (replicas stay near-dups)
                    if g > 0:
                        vals[offs[:-1] + (g % dim)] += np.float32(0.05 * g)
                    if j > 0:
                        vals[offs[:-1]] += np.float32(1e-3 * j)
                else:
                    vals[offs[:-1]] += np.float32(1e-3 * i)
                new = pa.ListArray.from_arrays(
                    col_e.offsets, pa.array(vals, type=pa.float32())
                ).cast(src.schema.field("embedding").type)
                rep = rep.set_column(idx, "embedding", new)
            replicas.append(rep)
        pq.write_table(pa.concat_tables(replicas), dst)
        print(f"  materialized {table}: {sum(r.num_rows for r in replicas)} rows",
              file=sys.stderr)


def run_probe(
    queries: list[str],
    big_dir: str,
    reps: int,
    small_dir: str = SRC,
    ratio: float = 10.0,
    count_rows: bool = False,
) -> dict:
    from flink_demo_spark.plans.registry import REGISTRY, _load_all
    from flink_demo_spark.session import get_spark

    _load_all()
    spark = get_spark("scale_probe")
    spark.range(1000).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    out: dict = {
        "sf_small": small_dir,
        "sf_big": big_dir,
        "mult": ratio,
        "queries": {},
    }
    for name in queries:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"  !! unknown query {name}", file=sys.stderr)
            continue
        times = {}
        for label, d in (("small", small_dir), ("big", big_dir)):
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                spec.fn(spark, d).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            times[f"t_{label}"] = round(best, 3)
            if count_rows:
                times[f"rows_{label}"] = spec.fn(spark, d).count()
        e = math.log(times["t_big"] / times["t_small"]) / math.log(ratio)
        times["exponent"] = round(e, 3)
        if count_rows and times["rows_small"] > 0:
            times["rows_exponent"] = round(
                math.log(max(times["rows_big"], 1) / times["rows_small"])
                / math.log(ratio),
                3,
            )
        out["queries"][name] = times
        print(f"  {name}: {times['t_small']}s -> {times['t_big']}s  "
              f"e={times['exponent']}"
              + (f"  rows {times.get('rows_small')}->{times.get('rows_big')}"
                 f" re={times.get('rows_exponent')}" if count_rows else ""),
              file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sfprobe_sf1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument(
        "--small-dir",
        default=SRC,
        help="baseline directory (set to a prior probe dir for a "
        "second-decade measurement, e.g. /tmp/sfprobe_sf1)",
    )
    ap.add_argument(
        "--small-mult",
        type=int,
        default=1,
        help="the --mult that produced --small-dir (1 = pristine sf0.1); "
        "the scaling exponent uses ratio = mult / small_mult",
    )
    ap.add_argument(
        "--tag",
        default="queries",
        help="SCALE_PROBE.json key to merge results under "
        "('queries' = the first-decade record; use e.g. "
        "'second_decade' so decades don't overwrite each other)",
    )
    ap.add_argument(
        "--density",
        choices=["growing", "constant"],
        default="growing",
        help="'growing' = the original construction (every replica of a "
        "base doc is a near-dup of every other: duplicate density grows "
        "with mult); 'constant' = replicas grouped into near-dup groups "
        "of --dups-per-base, cross-group texts token-permuted so groups "
        "are NEW base docs (duplicate fraction constant in mult)",
    )
    ap.add_argument("--dups-per-base", type=int, default=2)
    ap.add_argument(
        "--tables",
        default=",".join(TABLES),
        help="comma list of tables to materialize (probing a documents-"
        "only query family doesn't need a 30x lineitem)",
    )
    ap.add_argument(
        "--count-rows",
        action="store_true",
        help="also record output-row counts at both scales and the "
        "output-size exponent (separates output growth from plan cost)",
    )
    args = ap.parse_args()

    print("materializing...", file=sys.stderr)
    materialize(
        args.mult,
        args.out,
        density=args.density,
        dups_per_base=args.dups_per_base,
        tables=[t for t in args.tables.split(",") if t],
    )
    queries = [q for q in args.queries.split(",") if q]
    ratio = args.mult / args.small_mult
    result = run_probe(
        queries, args.out, args.reps, small_dir=args.small_dir, ratio=ratio,
        count_rows=args.count_rows,
    )

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, "SCALE_PROBE.json")
    # merge per-query rows into the existing record so a partial probe
    # (e.g. only newly added queries) extends the artifact instead of
    # truncating it to the probed subset; decades live under separate
    # keys (--tag) so a second-decade run never overwrites the first
    record = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            record = json.load(f)
    merged = dict(record.get(args.tag, {}) if args.tag != "queries"
                  else record.get("queries", {}))
    merged.update(result["queries"])
    if args.tag == "queries":
        record.update({k: v for k, v in result.items() if k != "queries"})
        record["queries"] = merged
    else:
        record[args.tag] = merged
        record[f"{args.tag}_meta"] = {
            "sf_small": args.small_dir, "sf_big": args.out, "ratio": ratio,
            "density": args.density,
            "dups_per_base": (
                args.dups_per_base if args.density == "constant" else None
            ),
        }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")

    print(f"| query | small (s) | big (s) | exponent (ratio {ratio:g}) |")
    print("|---|---|---|---|")
    for n, t in merged.items():
        print(f"| {n} | {t['t_small']} | {t['t_big']} | {t['exponent']} |")


if __name__ == "__main__":
    main()
