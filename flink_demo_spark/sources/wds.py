"""WebDataset-style TAR shard sink + source.

WebDataset (tar archives of grouped sample members, one shard per
file, members keyed by a shared basename: ``000042.txt``,
``000042.cls``, ``000042.jpg`` ...) is the de-facto storage format
for large multimodal training corpora — samples stream sequentially
off object storage with no per-record metadata round-trips. This
module gives the engine both directions WITHOUT any external library:

- :func:`write_tar_shards` — distributed sink: rows hash to a shard
  by ``key % num_shards``, whole shards co-locate on one task
  (repartition on the shard id), and each task writes its shards'
  tar files directly — no driver collect, content deterministic
  (members in key order, zeroed tar metadata).
- :func:`read_tar_shards` — source: a ``binaryFile`` scan over the
  shard glob fanned out one-file-per-task, each tar walked inside an
  Arrow-batched ``mapInPandas`` emitting one row per member
  ``(shard, key, ext, data)`` — the exact decode topology a 100 TB
  WebDataset corpus needs (shards are the parallelism unit; a task
  streams one shard end to end).

Local-fs paths here; at cluster scale the same writers/readers run
against shared storage (the binaryFile source already does), and
``num_shards`` scales with corpus size so a shard stays the
~100 MB-1 GB streaming unit the format intends.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
)

MEMBER_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("key", StringType()),
        StructField("ext", StringType()),
        StructField("data", BinaryType()),
    ]
)


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    member_cols: dict[str, str],
    num_shards: int = 4,
) -> None:
    """Write ``df`` as WebDataset tar shards under ``out_dir``.

    ``member_cols`` maps extension -> binary column (e.g.
    ``{"txt": "text_bytes", "cls": "lang_bytes"}``). Shard assignment
    is ``key % num_shards``; all rows of a shard land on one task via
    a repartition on the shard id, so each tar is written exactly
    once, members sorted by key — byte-deterministic output."""
    os.makedirs(out_dir, exist_ok=True)
    # Clear stale shards: a prior run with different data or a larger
    # num_shards would leave extra .tar files that the reader's *.tar
    # glob silently picks up (ADVICE r8).
    for stale in os.listdir(out_dir):
        if stale.endswith(".tar") or stale.endswith(".tar.tmp"):
            os.remove(os.path.join(out_dir, stale))
    exts = sorted(member_cols)
    sel = [F.col(key_col).cast("long").alias("__key")] + [
        F.col(member_cols[e]).alias(f"__m_{e}") for e in exts
    ]
    parts = (
        df.select(*sel)
        # pmod, not %: Spark's % follows the dividend's sign, so a
        # negative key would yield shard -1 -> "shard--0001.tar" and a
        # negative-width member name (ADVICE r8).
        .withColumn("__shard", F.pmod(F.col("__key"), F.lit(num_shards)).cast("int"))
        .repartition(num_shards, F.col("__shard"))
    )

    def write_partition(rows) -> None:
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r["__shard"], []).append(r)
        for shard, items in by_shard.items():
            items.sort(key=lambda r: r["__key"])
            path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
            tmp = path + ".tmp"
            with tarfile.open(tmp, "w") as tf:
                for r in items:
                    for e in exts:
                        data = bytes(r[f"__m_{e}"])
                        # keys are hashed into non-negative member names so
                        # a negative key cannot produce "-0000000001.txt"
                        key = r["__key"] % (10**12)
                        info = tarfile.TarInfo(name=f"{key:012d}.{e}")
                        info.size = len(data)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        tf.addfile(info, io.BytesIO(data))
            os.replace(tmp, path)

    parts.foreachPartition(write_partition)


def read_tar_shards(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per tar member across every shard matching the glob:
    ``(shard, key, ext, data)``. binaryFile scan (one task per shard)
    + Arrow-batched tar walk — no Python row-at-a-time path."""
    bf = spark.read.format("binaryFile").load(path_glob)

    def walk(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {"shard": [], "key": [], "ext": [], "data": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        key, _, ext = m.name.rpartition(".")
                        out["shard"].append(os.path.basename(path))
                        out["key"].append(key)
                        out["ext"].append(ext)
                        out["data"].append(tf.extractfile(m).read())
            yield pd.DataFrame(out)

    return bf.select("path", "content").mapInPandas(walk, schema=MEMBER_SCHEMA)
