"""Multimodal plumbing (SURVEY.md §2.3 N5): content addressing, feature
extraction, resize and frame-sampling — the mapInPandas batch contract is
real; codecs are stubbed ('fake' deterministic / 'error' NotImplemented)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from sheetreader_duckdb_spark.operators import multimodal as M
from sheetreader_duckdb_spark.tables import T


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    d = T(spark, sf_dir, "documents").limit(50)
    return M.attach_media_metadata(d, "doc_id", "text")


def test_features_partitioning_invariant(media):
    def key(r):
        return (r["media_id"], r["sha256"], tuple(r["feature"]))

    one = {key(r) for r in M.extract_features(media.coalesce(1), dim=4).collect()}
    many = {key(r) for r in M.extract_features(media.repartition(7), dim=4).collect()}
    assert one == many and len(one) == 50


def test_resize_deterministic_and_shaped(media):
    out = M.resize_images(media, width=32, height=16)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["width"] == 32 and r["height"] == 16 for r in rows)
    again = M.resize_images(media.repartition(5), width=32, height=16).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}


def test_sample_frames_cardinality(media):
    out = M.sample_frames(media, n_frames=3)
    assert out.count() == 150
    per = out.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] == 3 for r in per)
    # frame digests differ per index but are stable across runs
    idx0 = {r["frame_sha256"] for r in out.filter(F.col("frame_idx") == 0).collect()}
    idx1 = {r["frame_sha256"] for r in out.filter(F.col("frame_idx") == 1).collect()}
    assert idx0.isdisjoint(idx1)


@pytest.mark.parametrize("fn", [M.extract_features, M.resize_images, M.sample_frames])
def test_error_stub_raises(media, fn):
    with pytest.raises(PythonException, match="NotImplementedError"):
        fn(media.limit(2), decode_stub="error").collect()


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_real_mode_without_pillow_raises_install_hint(media):
    """decode_stub='real' in a codec-less environment must fail loudly with
    the install hint — never silently fall back to the fake path."""
    if _pil_available():
        pytest.skip("Pillow installed — covered by the real-decode tests")
    with pytest.raises(PythonException, match="Pillow is not"):
        M.extract_features(media, dim=4, decode_stub="real").collect()
    with pytest.raises(PythonException, match="Pillow is not"):
        M.resize_images(media, decode_stub="real").collect()
    with pytest.raises(PythonException, match="Pillow is not"):
        M.sample_frames(media, decode_stub="real").collect()


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_real_decode_with_pillow(spark):
    """When Pillow IS present the lazy import wires in a real decode:
    features are pixel intensities in [0, 1], thumbs content-address the
    resized PNG, frame sampling walks animated payloads."""
    import io

    from PIL import Image

    def png(color):
        img = Image.new("RGB", (8, 8), color)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, bytearray(png((255, 0, 0)))), (2, bytearray(png((0, 0, 255))))],
        "media_id long, payload binary",
    ).withColumn("sha256", F.sha2(F.col("payload"), 256))

    feats = {r["media_id"]: r["feature"] for r in M.extract_features(df, dim=4, decode_stub="real").collect()}
    assert len(feats) == 2
    assert all(0.0 <= x <= 1.0 for f in feats.values() for x in f)
    assert feats[1] != feats[2]  # different images, different features

    thumbs = M.resize_images(df, width=4, height=4, decode_stub="real").collect()
    assert len(thumbs) == 2 and all(len(r["thumb"]) == 64 for r in thumbs)
    again = M.resize_images(df, width=4, height=4, decode_stub="real").collect()
    assert {tuple(r) for r in thumbs} == {tuple(r) for r in again}

    # animated GIF: three distinct frames, sample 3 -> 3 distinct addresses
    frames_src = [Image.new("RGB", (4, 4), c) for c in ((255, 0, 0), (0, 255, 0), (0, 0, 255))]
    buf = io.BytesIO()
    frames_src[0].save(buf, format="GIF", save_all=True, append_images=frames_src[1:])
    gif = spark.createDataFrame(
        [(9, bytearray(buf.getvalue()))], "media_id long, payload binary"
    ).withColumn("sha256", F.sha2(F.col("payload"), 256))
    got = M.sample_frames(gif, n_frames=3, decode_stub="real").collect()
    assert [r["frame_idx"] for r in sorted(got, key=lambda r: r["frame_idx"])] == [0, 1, 2]
    assert len({r["frame_sha256"] for r in got}) == 3


def test_sniff_mime_magic_bytes(spark):
    """The production mime path sniffs real container magic bytes via
    built-in substring equality (zero Python): fixed prefixes, the RIFF
    format field at bytes 9-12, ISO-BMFF's ftyp box at bytes 5-8."""
    cases = [
        (b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, "image/png"),
        (b"\xff\xd8\xff\xe0\x00\x10JFIF\x00", "image/jpeg"),
        (b"GIF89a\x04\x00\x04\x00", "image/gif"),
        (b"RIFF\x24\x08\x00\x00WAVEfmt ", "audio/wav"),
        (b"RIFF\x10\x00\x00\x00AVI LIST", "video/x-msvideo"),
        (b"RIFF\x0c\x00\x00\x00WEBPVP8 ", "image/webp"),
        (b"\x00\x00\x00\x18ftypmp42\x00\x00", "video/mp4"),
        (b"\x00\x00\x00\x14ftypqt  ", "video/mp4"),  # MOV lands in BMFF too
        (b"ID3\x03\x00\x00\x00", "audio/mpeg"),
        (b"OggS\x00\x02", "audio/ogg"),
        (b"fLaC\x00\x00\x00\x22", "audio/flac"),
        (b"\x1a\x45\xdf\xa3\x42\x86", "video/webm"),
        (b"plain text, no magic", "application/octet-stream"),
        (b"RIFF\x00\x00\x00\x00????", "application/octet-stream"),  # unknown RIFF
        (b"", "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, (p, _) in enumerate(cases)],
        "media_id long, payload binary",
    )
    out = M.attach_media_metadata(df, "media_id", "payload")  # default: magic
    got = {r["media_id"]: r["mime"] for r in out.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_attach_media_metadata_witness_mode_unchanged(spark):
    """mime_sniff='witness' keeps the declared n11 oracle's
    length-derived label exactly."""
    df = spark.createDataFrame(
        [(0, "abc"), (1, "abcd"), (2, "abcde")], "media_id long, payload string"
    )
    out = M.attach_media_metadata(df, "media_id", "payload", mime_sniff="witness")
    got = {r["media_id"]: r["mime"] for r in out.collect()}
    assert got == {0: "image/png", 1: "audio/wav", 2: "video/mp4"}
    with pytest.raises(ValueError, match="mime_sniff"):
        M.attach_media_metadata(df, "media_id", "payload", mime_sniff="nope")
