"""Multimodal columns (BASELINE.json north-star): image/audio/video as
opaque binary columns + typed metadata, processed with Arrow-batched
mapInPandas.

The decode step is STUBBED (this container has no image/audio libs):
`image_stats` uses a deterministic fake decode (byte statistics), and
`resize_images` interprets the payload as a raw grayscale raster and
does a real nearest-neighbor resample — codec-free but numerically
real. The Spark-side plumbing — schema, batch iteration, metadata
struct, frame-sampling plan — is real and tested; swapping the fake
interpretation for PIL/ffmpeg decode is a local change inside one
function.

Scale shape: binary payloads ride the scan (parquet binary columns),
mapInPandas processes Arrow batches with zero per-row Python overhead
beyond the batch loop, and metadata-only plans (frame sampling) never
touch the payload at all — column pruning drops it at the reader.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_fake_payload",
    "image_stats",
    "resize_images",
    "frame_sample_plan",
]

META_COLS = ("mime", "width", "height", "n_frames")


def attach_fake_payload(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Deterministic binary payload + typed metadata derived from the
    documents table — the test stand-in for real image/video bytes."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.length(F.col(text_col))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (n % 640 + 16).cast("int").alias("width"),
            (n % 480 + 16).cast("int").alias("height"),
            (n % 24 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def image_stats(media: DataFrame) -> DataFrame:
    """Per-image stats via mapInPandas over Arrow batches.

    The 'decode' is a deterministic fake (mean/max byte value + sha256)
    — replace the body of `fake_decode` with a real codec to go live.
    Output schema: doc_id, n_bytes, mean_byte, max_byte, sha256, width, height.
    """

    def fake_decode(buf: bytes) -> tuple[int, int]:
        # ONE decode call per payload, returning (byte sum, byte max);
        # swap this body for a real codec to go live. The mean derives
        # as sum/len outside the decode so the hot loop never runs
        # twice per row (len(bytes) is O(1)).
        if not buf:
            return 0, 0
        return sum(buf), max(buf)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            bufs = [b or b"" for b in pdf["payload"]]
            decoded = [fake_decode(b) for b in bufs]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": [len(b) for b in bufs],
                    # exact integer sum rides along so callers emitting
                    # a 6dp mean can round it in integer arithmetic
                    # (functions/semantics.round6_ratio)
                    "sum_byte": [s for s, _ in decoded],
                    "mean_byte": [
                        s / len(b) if b else 0.0
                        for (s, _), b in zip(decoded, bufs)
                    ],
                    "max_byte": [m for _, m in decoded],
                    "sha256": [hashlib.sha256(b).hexdigest() for b in bufs],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                }
            )
            yield out

    schema = (
        "doc_id bigint, n_bytes bigint, sum_byte bigint, mean_byte double, max_byte int, "
        "sha256 string, width int, height int"
    )
    return media.mapInPandas(batches, schema=schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize over the fake single-channel decode:
    the payload is interpreted as a row-major (meta.height x meta.width)
    grayscale image (truncated/zero-padded to fit), resampled to the
    target size, and re-emitted as bytes. Deterministic and codec-free
    — swapping the interpretation step for PIL/ffmpeg decode is a local
    change here, the Spark plumbing (Arrow batches, binary columns,
    metadata struct) is the real thing."""
    import numpy as np

    def one(buf: bytes, src_w: int, src_h: int) -> bytes:
        src_w, src_h = max(int(src_w), 1), max(int(src_h), 1)
        arr = np.frombuffer(buf or b"", dtype=np.uint8)
        need = src_w * src_h
        if len(arr) < need:
            arr = np.concatenate([arr, np.zeros(need - len(arr), dtype=np.uint8)])
        img = arr[:need].reshape(src_h, src_w)
        # nearest-neighbor index maps (floor sampling, the classic rule)
        yi = (np.arange(height) * src_h) // height
        xi = (np.arange(width) * src_w) // width
        return img[np.ix_(yi, xi)].tobytes()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        one(b, m["width"], m["height"])
                        for b, m in zip(pdf["payload"], pdf["meta"])
                    ],
                    "width": width,
                    "height": height,
                }
            )

    schema = "doc_id bigint, payload binary, width int, height int"
    return media.mapInPandas(batches, schema=schema)


def frame_sample_plan(media: DataFrame, every_n: int) -> DataFrame:
    """Metadata-only frame-sampling plan: explode frame indices
    0, every_n, 2*every_n, ... < n_frames. Never reads the payload —
    column pruning keeps the binary out of the scan entirely.

    Rows with n_frames <= 0 (possible in real ingested metadata, even
    though the fake attacher guarantees >= 1) emit zero frame rows —
    without the guard, sequence(0, -1, +step) is an illegal-boundaries
    runtime error that kills the whole job."""
    idxs = F.when(
        F.col("meta.n_frames") > 0,
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return media.select("doc_id", F.explode(idxs).alias("frame_idx"))
