"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.3 N5).

Media payloads are opaque ``binary`` columns + a typed metadata struct —
content-addressed via sha256 so exact dedup / caching / lineage works on any
modality. Decode / feature-extraction runs as Arrow-batched ``mapInPandas``:
the Spark-side plumbing (schema, batch shape, partitioning) is real and
tested everywhere; the codec itself is selected by ``decode_stub``:
``'real'`` lazily imports Pillow inside the executor batch loop (decode /
resize / multi-frame sampling when installed; a NotImplementedError with an
install hint when not — no module-level dependency is ever added),
``'fake'`` produces deterministic hash-derived outputs so the pipeline
shape is testable end-to-end without codecs, and ``'error'`` marks the
wiring point explicitly.

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


# Magic-byte prefixes for the container formats a media lake actually
# holds. Matched with built-in substring equality on the binary column —
# whole-stage codegen, zero Python. (`F.substring` is 1-indexed; offsets
# follow each container spec.)
_MAGIC_RULES: list[tuple[int, bytes, str]] = [
    (1, b"\x89PNG\r\n\x1a\n", "image/png"),
    (1, b"\xff\xd8\xff", "image/jpeg"),
    (1, b"GIF8", "image/gif"),
    (1, b"ID3", "audio/mpeg"),
    (1, b"OggS", "audio/ogg"),
    (1, b"fLaC", "audio/flac"),
    (1, b"\x1a\x45\xdf\xa3", "video/webm"),  # EBML (webm/mkv)
]
# RIFF and ISO-BMFF discriminate on a SECOND field past the prefix.
_RIFF_RULES: list[tuple[bytes, str]] = [
    (b"WAVE", "audio/wav"),
    (b"AVI ", "video/x-msvideo"),
    (b"WEBP", "image/webp"),
]


def sniff_mime(payload) -> "F.Column":
    """Magic-byte mime sniff over a binary column, as one codegen'd CASE.

    Covers PNG/JPEG/GIF/WEBP images, WAV/MP3/OGG/FLAC audio, and
    MP4/AVI/WEBM video: fixed prefixes, the RIFF container's format field
    (bytes 9-12), and ISO-BMFF's ``ftyp`` box (bytes 5-8 — MP4/MOV/3GP
    all land here, reported as video/mp4). Unknown payloads map to
    application/octet-stream rather than guessing.
    """
    expr = F.when(
        F.substring(payload, 5, 4) == F.lit(b"ftyp"), F.lit("video/mp4")
    )
    for fmt, mime in _RIFF_RULES:
        expr = expr.when(
            (F.substring(payload, 1, 4) == F.lit(b"RIFF"))
            & (F.substring(payload, 9, 4) == F.lit(fmt)),
            F.lit(mime),
        )
    for off, magic, mime in _MAGIC_RULES:
        expr = expr.when(
            F.substring(payload, off, len(magic)) == F.lit(magic), F.lit(mime)
        )
    return expr.otherwise(F.lit("application/octet-stream"))


def _witness_mime(payload) -> "F.Column":
    """The declared n11 oracle witness: a deterministic length-derived
    label (testdata payloads are synthetic strings, not real media), kept
    so the cross-engine hash check has a DuckDB-expressible twin."""
    return (
        F.when(F.octet_length(payload) % 3 == 0, "image/png")
        .when(F.octet_length(payload) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )


def attach_media_metadata(
    df: DataFrame, id_col: str, payload_col: str, mime_sniff: str = "magic"
) -> DataFrame:
    """Content-address a payload column: sha256 digest + byte length + a
    mime sniff. Pure column expressions — scan-speed.

    ``mime_sniff='magic'`` (default) sniffs real container magic bytes
    (``sniff_mime``); ``'witness'`` keeps the deterministic
    length-derived label the declared n11 oracle pins (synthetic
    testdata carries no real magic bytes).
    """
    if mime_sniff not in ("magic", "witness"):
        raise ValueError(f"mime_sniff must be 'magic' or 'witness', got {mime_sniff!r}")
    payload = F.col(payload_col).cast("binary")
    mime = sniff_mime(payload) if mime_sniff == "magic" else _witness_mime(payload)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        mime.alias("mime"),
        F.sha2(payload, 256).alias("sha256"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _require_pil(what: str):
    """Lazy Pillow import for decode_stub='real' paths — called inside the
    executor batch loop, so environments without the codec only pay when a
    real decode is actually requested."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError as exc:
        raise NotImplementedError(
            f"{what} requested (decode_stub='real') but Pillow is not "
            "installed; `pip install Pillow` on the executors, or use "
            "decode_stub='fake' for the deterministic digest-derived path"
        ) from exc


def extract_features(
    media: DataFrame, dim: int = 8, decode_stub: str = "fake"
) -> DataFrame:
    """Decode + featurize payloads via Arrow-batched mapInPandas.

    decode_stub='real'  → Pillow decode, lazily imported in the batch loop
    (no module-level dependency): grayscale-resize each image payload to a
    dim×1 strip, features = pixel intensities / 255. Raises
    NotImplementedError with an install hint when Pillow is absent — the
    stub surface is unchanged in codec-less environments;
    decode_stub='error' → NotImplementedError (marks the wiring point);
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
            if decode_stub == "real":
                Image = _require_pil("real image decode")
                import io

                feats = []
                for payload in pdf["payload"]:
                    img = Image.open(io.BytesIO(bytes(payload))).convert("L")
                    strip = img.resize((dim, 1))
                    feats.append(
                        np.asarray(strip, dtype="float32").reshape(dim) / np.float32(255)
                    )
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "sha256": pdf["sha256"],
                        "feature": [f.tolist() for f in feats],
                    }
                )
                continue
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

    cols = ["media_id", "sha256"] + (["payload"] if decode_stub == "real" else [])
    return media.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


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
    'real' decodes with lazily-imported Pillow, resizes, PNG-encodes, and
    content-addresses the thumbnail (``thumb`` = sha256 of the PNG bytes;
    NotImplementedError with an install hint when Pillow is absent);
    'error' raises NotImplementedError at the wiring point; 'fake' emits a
    deterministic digest-derived thumbnail id so the batch path, schema,
    and partition behavior are testable without codecs."""

    def run(batches):  # pandas in, pandas out
        import hashlib

        import pandas as pd

        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "image resize requires PIL/opencv, not present here; "
                    "wire the decoder into this batch loop"
                )
            if decode_stub == "real":
                Image = _require_pil("real image resize")
                import io

                thumbs = []
                for payload in pdf["payload"]:
                    img = Image.open(io.BytesIO(bytes(payload))).convert("RGB")
                    out = io.BytesIO()
                    img.resize((width, height)).save(out, format="PNG")
                    thumbs.append(hashlib.sha256(out.getvalue()).hexdigest())
            else:
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

    cols = ["media_id", "sha256"] + (["payload"] if decode_stub == "real" else [])
    return media.select(*cols).mapInPandas(run, schema=THUMB_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, decode_stub: str = "fake"
) -> DataFrame:
    """Uniform frame sampling from video payloads via mapInPandas — one
    output row per (media, frame index). 'real' samples n_frames uniformly
    from multi-frame payloads (animated GIF/WebP/TIFF) with lazily-imported
    Pillow, content-addressing each frame's RGB bytes — container video
    (mp4/webm) additionally needs ffmpeg, which is the same wiring point;
    NotImplementedError with an install hint when the codec is absent.
    'fake' derives each frame's content address deterministically from
    (digest, index); 'error' marks the wiring point. Output cardinality is
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
            if decode_stub == "real":
                Image = _require_pil("real frame sampling")
                import io

                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    img = Image.open(io.BytesIO(bytes(payload)))
                    total = getattr(img, "n_frames", 1)
                    # uniform positions over the clip, always n_frames rows
                    picks = [min(total - 1, (i * total) // n_frames) for i in range(n_frames)]
                    for i, pos in enumerate(picks):
                        img.seek(pos)
                        rgb = img.convert("RGB")
                        ids.append(mid)
                        idxs.append(i)
                        digests.append(hashlib.sha256(rgb.tobytes()).hexdigest())
            else:
                for mid, d in zip(pdf["media_id"], pdf["sha256"]):
                    for i in range(n_frames):
                        ids.append(mid)
                        idxs.append(i)
                        digests.append(hashlib.sha256(f"{d}:frame{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha256": digests}
            )

    cols = ["media_id", "sha256"] + (["payload"] if decode_stub == "real" else [])
    return media.select(*cols).mapInPandas(run, schema=FRAME_SCHEMA)
