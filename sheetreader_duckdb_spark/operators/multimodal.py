"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.3 N5).

Media payloads are opaque ``binary`` columns + a typed metadata struct —
content-addressed via sha256 so exact dedup / caching / lineage works on any
modality. Decode / feature-extraction runs as Arrow-batched ``mapInPandas``:
the Spark-side plumbing (schema, batch shape, partitioning) is real and
tested; the actual codec calls are STUBBED (``decode_stub='error'`` raises
NotImplementedError — image/audio libraries are not available in this
environment; ``'fake'`` produces a deterministic hash-derived feature vector
so the pipeline shape is testable end-to-end).

At scale: payloads stay columnar (parquet binary) and are never collected;
mapInPandas streams Arrow batches through Python with bounded memory
(spark.sql.execution.arrow.maxRecordsPerBatch); partition count follows the
input files, so 100 TB of media shards across the cluster naturally.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", StringType(), True),  # binary in real pipelines
        StructField("mime", StringType(), True),
        StructField("sha256", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sha256", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def attach_media_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Content-address a payload column: sha256 digest + byte length + a
    deterministic mime sniff. Pure column expressions — scan-speed."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.when(F.octet_length(payload) % 3 == 0, "image/png")
        .when(F.octet_length(payload) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.sha2(payload, 256).alias("sha256"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def extract_features(
    media: DataFrame, dim: int = 8, decode_stub: str = "fake"
) -> DataFrame:
    """Decode + featurize payloads via Arrow-batched mapInPandas.

    decode_stub='error' → NotImplementedError (real codecs unavailable here);
    decode_stub='fake'  → deterministic feature vector derived from the
    sha256 digest (stable across runs/partitionings), exercising the real
    batch path: pandas in, pandas out, bounded batches.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in this "
                    "environment; wire a real decoder here (PIL/ffmpeg/torchaudio)"
                )
            feats = []
            for digest in pdf["sha256"]:
                h = hashlib.sha256((digest or "").encode()).digest()
                feats.append(
                    np.frombuffer(h[: dim * 4], dtype="<u4").astype("float32") / np.float32(2**32)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": pdf["sha256"],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.select("media_id", "sha256").mapInPandas(run, schema=FEATURE_SCHEMA)


THUMB_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sha256", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("thumb", StringType(), True),  # binary in real pipelines
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_sha256", StringType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, decode_stub: str = "fake"
) -> DataFrame:
    """Decode + resize payloads to (width, height) thumbnails via
    Arrow-batched mapInPandas — same plumbing contract as extract_features:
    decode_stub='error' raises NotImplementedError where PIL would be
    wired in; 'fake' emits a deterministic digest-derived thumbnail id so
    the batch path, schema, and partition behavior are testable."""

    def run(batches):  # pandas in, pandas out
        import hashlib

        import pandas as pd

        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "image resize requires PIL/opencv, not present here; "
                    "wire the decoder into this batch loop"
                )
            thumbs = [
                hashlib.sha256(f"{d}:{width}x{height}".encode()).hexdigest()
                for d in pdf["sha256"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": pdf["sha256"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "thumb": thumbs,
                }
            )

    return media.select("media_id", "sha256").mapInPandas(run, schema=THUMB_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, decode_stub: str = "fake"
) -> DataFrame:
    """Uniform frame sampling from video payloads via mapInPandas — one
    output row per (media, frame index). 'fake' derives each frame's
    content address deterministically from (digest, index); 'error' marks
    where ffmpeg decoding would plug in. Output cardinality is
    n_frames × input rows, produced batch-local (no shuffle)."""

    def run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "frame sampling requires ffmpeg, not present here; "
                    "wire the decoder into this batch loop"
                )
            ids, idxs, digests = [], [], []
            for mid, d in zip(pdf["media_id"], pdf["sha256"]):
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    digests.append(hashlib.sha256(f"{d}:frame{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha256": digests}
            )

    return media.select("media_id", "sha256").mapInPandas(run, schema=FRAME_SCHEMA)
