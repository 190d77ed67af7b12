"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star): treat
image/audio/video as `binary` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas``.

This container has no image/audio codecs, so the *decode* step is a
deterministic fake (parse pseudo-dimensions from the payload hash) —
clearly marked below. Everything around it — schema, batch iteration,
partition behavior, column pruning — is real and what matters at
100 TB: payloads stream through executors in Arrow batches, metadata
extraction never touches the driver, and downstream filters on the
metadata struct prune before any decode work.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata struct attached to every binary payload column
MEDIA_META_SCHEMA = (
    "n_bytes int, sha256 string, media_type string"
)


def attach_metadata(
    df: DataFrame, binary_col: str, media_type: str = "application/octet-stream"
) -> DataFrame:
    """Typed metadata struct from the payload — pure JVM expressions."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(F.col(binary_col)).alias("n_bytes"),
            F.sha2(F.col(binary_col), 256).alias("sha256"),
            F.lit(media_type).alias("media_type"),
        ),
    )


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """STUB: stands in for a real image decode (no codecs in this
    container). Deterministic pseudo-dimensions derived from the
    payload digest — replace with PIL/ffmpeg in production."""
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def extract_features(
    df: DataFrame, id_col: str, binary_col: str
) -> DataFrame:
    """Per-payload features via mapInPandas (Arrow batches).

    Output: (id, n_bytes, digest, width, height, aspect_milli).
    The decode inside is the stub; the plumbing (batch iterator,
    schema, column pruning before the UDF) is the real pattern.
    """
    schema = (
        f"{id_col} long, n_bytes long, digest string, "
        "width int, height int, aspect_milli long"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            ids = pdf[id_col]
            rows = []
            for i, p in zip(ids, payloads):
                b = bytes(p)
                w, h = _fake_decode_dims(b)
                rows.append(
                    (
                        int(i),
                        len(b),
                        hashlib.md5(b).hexdigest(),
                        w,
                        h,
                        int(w * 1000 // h),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_bytes", "digest", "width", "height", "aspect_milli"],
            )

    return df.select(id_col, binary_col).mapInPandas(fn, schema)


def frame_sample(
    df: DataFrame, id_col: str, binary_col: str, n_frames: int = 4
) -> DataFrame:
    """'Video' frame sampling stub: slice the payload into n_frames
    equal chunks (stands in for ffmpeg keyframe extraction); output one
    row per frame with its chunk digest — the explode-shaped output a
    real frame sampler would produce."""
    schema = f"{id_col} long, frame_no int, frame_digest string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(p)
                if not b:
                    continue
                step = max(1, len(b) // n_frames)
                for f_no in range(min(n_frames, len(b))):
                    chunk = b[f_no * step : (f_no + 1) * step]
                    rows.append(
                        (int(i), f_no, hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_no", "frame_digest"])

    return df.select(id_col, binary_col).mapInPandas(fn, schema)
