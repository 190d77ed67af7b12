#!/usr/bin/env python
"""Knob-response measurement for streaming_dedup_minhash (round-12
verdict #5): at the sf10 constant-density corpus, raise the signature
resolution (16 -> 32 hashes at fixed bands=4, i.e. rows-per-band
4 -> 8) and measure what happens to (a) the candidate-pair volume the
in-bucket verification pays for and (b) wall time. This is the
documented escape hatch for the ~1.0 streaming exponent: random
in-bucket collisions grow with corpus size, and the standard response
is more rows per band; the recall price of the same move is published
by the registered `dedup_recall_minhash_hashes` curve.

Usage:
  python tools/minhash_knob_probe.py [sf_dir] [reps]
Defaults: /tmp/sfprobe_cd10, 2. Prints one JSON line for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(spark, sf_dir: str, num_hashes: int, bands: int):
    """streaming_dedup_minhash with parameterized signature size —
    the registered query body (plans/stream_parity.py) with
    (num_hashes, bands) lifted to arguments."""
    from pyspark.sql import functions as F

    from flink_demo_spark.catalog import load_table
    from flink_demo_spark.operators import dedup
    from flink_demo_spark.operators.text import shingles
    from flink_demo_spark.sources.streams import documents_stream
    from flink_demo_spark.streaming.runner import run_available_now

    static_docs = load_table(spark, sf_dir, "documents")
    index = (
        dedup.lsh_band_table(
            dedup.minhash_table(
                static_docs, "text", "doc_id", num_hashes, 3
            ),
            num_hashes,
            bands,
        )
        .select(F.col("doc_id").alias("doc_idx"), "band", "bucket")
        .persist()
    )
    index_sets = static_docs.select(
        F.col("doc_id").alias("doc_idx"), shingles("text", 3).alias("sh_idx")
    ).persist()

    feed = documents_stream(spark, sf_dir)
    rows = feed.select(
        F.col("doc_id").alias("doc_new"), shingles("text", 3).alias("sh")
    ).where(F.size("sh") > 0)
    sig = dedup.minhash_signature_expr(F.col("sh"), num_hashes)
    banded = rows.select(
        "doc_new",
        "sh",
        F.explode(
            dedup.lsh_band_entries_expr(sig, num_hashes, bands)
        ).alias("bb"),
    ).select("doc_new", "sh", "bb.band", "bb.bucket")

    cand = (
        banded.join(index, ["band", "bucket"])
        .where(F.col("doc_new") != F.col("doc_idx"))
        .select("doc_new", "doc_idx", "sh")
        .dropDuplicates(["doc_new", "doc_idx"])
    )
    inter = F.size(F.array_intersect("sh", "sh_idx"))
    union = F.size("sh") + F.size("sh_idx") - inter
    jac = inter / union
    verified = (
        cand.join(index_sets, "doc_idx")
        .where(jac >= 0.3)
        .select("doc_new", "doc_idx", F.round(jac, 4).alias("jaccard"))
    )
    # timed window = the streaming replay only (same surface the scale
    # probe times); candidate/verified counts run AFTER it
    t0 = time.perf_counter()
    out = run_available_now(verified, output_mode="append")
    t_stream = time.perf_counter() - t0
    n_verified = out.count()
    # candidate volume = what the verification join paid for. The feed
    # replays the SAME corpus the index was built from and the per-row
    # signature expr equals the batch minhash_table values, so the
    # directed index self-join counts exactly the stream's candidates
    # (a streaming frame can't be .count()ed after the replay).
    n_cand = (
        index.select(F.col("doc_idx").alias("doc_new"), "band", "bucket")
        .join(index, ["band", "bucket"])
        .where(F.col("doc_new") != F.col("doc_idx"))
        .select("doc_new", "doc_idx")
        .distinct()
        .count()
    )
    index.unpersist()
    index_sets.unpersist()
    return t_stream, n_cand, n_verified


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe_cd10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from flink_demo_spark.session import get_spark

    spark = get_spark("minhash_knob_probe")
    spark.range(1000).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    out: dict = {"sf_dir": sf_dir, "bands": 4, "reps": reps, "settings": {}}
    for num_hashes in (16, 32):
        best = None
        n_cand = n_ver = None
        for _ in range(reps):
            dt, n_cand, n_ver = run_variant(spark, sf_dir, num_hashes, 4)
            best = dt if best is None or dt < best else best
        out["settings"][str(num_hashes)] = {
            "rows_per_band": num_hashes // 4,
            "t_sec": round(best, 3),
            "n_candidates": int(n_cand),
            "n_verified": int(n_ver),
        }
    s16, s32 = out["settings"]["16"], out["settings"]["32"]
    out["candidate_drop_pct"] = round(
        100.0 * (s16["n_candidates"] - s32["n_candidates"])
        / max(s16["n_candidates"], 1),
        1,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
