"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star): treat
image/audio/video as `binary` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas``.

This container has no image/audio codec LIBRARIES, so decode splits
in two: uncompressed binary PPM (P6) is decoded FOR REAL below
(header parse + numpy reshape + integer nearest-neighbor resize —
fully oracle-checked by query `multimodal_ppm_decode`), while
compressed formats (JPEG/PNG/video) stay behind the clearly-marked
deterministic stub. Everything around decode — schema, batch
iteration, partition behavior, column pruning — is real and what
matters at 100 TB: payloads stream through executors in Arrow
batches, metadata extraction never touches the driver, and
downstream filters on the metadata struct prune before any decode
work.
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


# ---------------------------------------------------------------------------
# REAL decode path: PPM (P6), an uncompressed public format needing no
# codec library — header parse + numpy reshape. Compressed formats
# (JPEG/PNG/...) remain environment-gated behind the stub above.
# ---------------------------------------------------------------------------


def encode_ppm(arr) -> bytes:
    """Binary PPM (P6, maxval 255) from an (h, w, 3) uint8 array."""
    h, w, c = arr.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes):
    """REAL image decode for binary PPM (P6): parse the header
    (whitespace + '#' comments per the spec), then one zero-copy numpy
    reshape of the raw RGB plane. Returns (h, w, 3) uint8."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raw = payload[pos : pos + w * h * 3]
    if len(raw) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(arr, tw: int, th: int):
    """Integer nearest-neighbor resize: target pixel (i, j) samples
    source ((i*h)//th, (j*w)//tw) — exact integer index math, so any
    engine reproduces it bit-for-bit."""
    import numpy as np

    h, w, _ = arr.shape
    rows = (np.arange(th) * h) // th
    cols = (np.arange(tw) * w) // tw
    return arr[rows][:, cols]


def ppm_features(
    df: DataFrame, id_col: str, binary_col: str, tw: int = 8, th: int = 8
) -> DataFrame:
    """REAL decode -> nearest-neighbor resize -> per-channel integer
    sums, as Arrow-batched ``mapInPandas``. Unlike ``extract_features``
    (stub dims), every byte of the payload is actually parsed; output
    is integer-exact so the whole pipeline is DuckDB-oracle-checkable."""
    schema = (
        f"{id_col} long, width int, height int, "
        "sum_r bigint, sum_g bigint, sum_b bigint"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                img = decode_ppm(bytes(p))
                h, w, _ = img.shape
                small = resize_nearest(img, tw, th).astype("int64")
                sums = small.reshape(-1, 3).sum(axis=0)
                rows.append(
                    (int(i), w, h, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return df.select(id_col, binary_col).mapInPandas(fn, schema)


def synthesize_ppm_images(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic PPM payloads from an id column (the test corpus
    carries no real images): size (16 + id%16) x (12 + id%8), pixel
    (x, y) = ((id*7 + x) % 256, (x + y) % 256, (id + 3*y) % 256) —
    closed-form integers, so an oracle can recompute any downstream
    stat without decoding bytes."""
    schema = f"{id_col} long, image binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 16 + i % 16, 12 + i % 8
                y, x = np.indices((h, w))
                img = np.stack(
                    [(i * 7 + x) % 256, (x + y) % 256, (i + 3 * y) % 256],
                    axis=-1,
                ).astype("uint8")
                rows.append((i, encode_ppm(img)))
            yield pd.DataFrame(rows, columns=[id_col, "image"])

    return df.select(id_col).mapInPandas(fn, schema)
