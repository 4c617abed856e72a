"""Multimodal (image/audio/video) column plumbing (SURVEY §2.11 X5).

Design for 100 TB multimodal corpora: media lives in opaque ``binary``
columns (or content-addressed paths) beside typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip through Python row-at-a-time. The Spark-side plumbing here —
source schema, batch iteration, output typing, partition sizing — is real
and tested; the *codec* step is stubbed (this container ships no image/audio
libraries): :func:`decode_image_meta` computes deterministic fake features
and :func:`decode_image_real` raises ``NotImplementedError`` with the
intended implementation documented.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# binaryFile source schema: path, modificationTime, length, content.
DECODED_SCHEMA = (
    "path string, length long, format string, width int, height int, n_channels int, content_hash string"
)


def read_binary_dir(spark: SparkSession, input_dir: str, glob: str = "*") -> DataFrame:
    """Scan a directory of media files as (path, modificationTime, length,
    content) — Spark's binaryFile source; at scale, partition count follows
    maxPartitionBytes so huge corpora split evenly."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(input_dir)
    )


def _format_from_path(path: str) -> str:
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    return {"jpg": "jpeg", "jpeg": "jpeg", "png": "png", "gif": "gif", "wav": "wav", "mp4": "mp4"}.get(
        ext, "unknown"
    )


def decode_image_meta(df: DataFrame, batch_size: int = 64) -> DataFrame:
    """Arrow-batched decode returning typed per-file features.

    STUB CODEC: width/height/channels are deterministic functions of the
    content bytes (so tests are stable), not a real decode — see
    :func:`decode_image_real` for the intended implementation. Everything
    else (batch shape, schema, hashing) is the real pipeline.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for path, length, content in zip(pdf["path"], pdf["length"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                digest = hashlib.sha256(data).hexdigest()
                # Deterministic fake geometry derived from the digest.
                width = 16 + int(digest[:4], 16) % 4080
                height = 16 + int(digest[4:8], 16) % 4080
                out.append(
                    {
                        "path": path,
                        "length": int(length),
                        "format": _format_from_path(path),
                        "width": width,
                        "height": height,
                        "n_channels": 3,
                        "content_hash": digest,
                    }
                )
            yield pd.DataFrame(out, columns=[
                "path", "length", "format", "width", "height", "n_channels", "content_hash",
            ])

    cols = df.select("path", "length", "content")
    return cols.mapInPandas(decode, schema=DECODED_SCHEMA)


def decode_image_real(df: DataFrame) -> DataFrame:
    """Real codec entry point — intentionally unimplemented here.

    Intended implementation (same mapInPandas shape as decode_image_meta):
    ``PIL.Image.open(io.BytesIO(content))`` per element for images,
    ``soundfile``/``av`` for audio/video frame sampling; batch size tuned so
    decoded frames fit executor memory. The container has none of these
    libraries, so this raises rather than fake-succeeding.
    """
    raise NotImplementedError(
        "image/audio codecs unavailable in this environment; use decode_image_meta "
        "for the plumbing-true stub"
    )


_EXT_FORMAT = {"jpg": "jpeg", "jpeg": "jpeg", "png": "png", "gif": "gif", "wav": "wav", "mp4": "mp4"}


def with_media_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata columns beside the opaque binary payload (built-ins only)."""
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    fmt = F.lit("unknown")
    for e, name in _EXT_FORMAT.items():
        fmt = F.when(ext == e, name).otherwise(fmt)
    return df.withColumn("format", fmt).withColumn(
        "size_bucket",
        F.when(F.col("length") < 1024, "tiny")
        .when(F.col("length") < 1024 * 1024, "small")
        .otherwise("large"),
    )


FRAME_SCHEMA = "path string, frame_index int, frame_ts_ms long, frame_hash string"


def sample_frames(df: DataFrame, frames_per_file: int = 4, batch_size: int = 16) -> DataFrame:
    """Row-expanding decode: one input media file → N sampled-frame rows.

    The video analogue of :func:`decode_image_meta` — demonstrates the
    1-to-N ``mapInPandas`` shape (each Arrow batch of files yields a larger
    batch of frames) with the codec stubbed: frame hashes derive
    deterministically from (content digest, frame index); timestamps assume
    a nominal 1000 ms spacing. A real implementation swaps the inner loop
    for ``av``/``ffmpeg`` keyframe extraction with identical plumbing.
    """

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                digest = hashlib.sha256(data).hexdigest()
                for i in range(frames_per_file):
                    out.append(
                        {
                            "path": path,
                            "frame_index": i,
                            "frame_ts_ms": i * 1000,
                            "frame_hash": hashlib.sha256(f"{digest}:{i}".encode()).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=["path", "frame_index", "frame_ts_ms", "frame_hash"])

    return df.select("path", "content").mapInPandas(expand, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "path string, width int, height int, resized binary, content_hash string"
)


def resize_images(df: DataFrame, width: int = 224, height: int = 224, batch_size: int = 64) -> DataFrame:
    """Arrow-batched resize-to-fixed-dims (the standard model-input prep).

    STUB CODEC: the "resized" payload is a deterministic digest-derived
    byte string of the target size's hash, not real pixels — the real
    implementation swaps ONE line (PIL/cv2 resize) inside the same
    mapInPandas batch loop. Batch sizing, schema, and the
    narrow-projection-in / binary-out shape are the real pipeline:
    at scale the wide input binary column is dropped the moment this
    projection happens, and the fixed-size outputs make downstream batch
    shapes uniform.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                digest = hashlib.sha256(data).hexdigest()
                fake = hashlib.sha256(f"{digest}:{width}x{height}".encode()).digest()
                out.append(
                    {
                        "path": path,
                        "width": width,
                        "height": height,
                        "resized": fake,
                        "content_hash": digest,
                    }
                )
            yield pd.DataFrame(out, columns=["path", "width", "height", "resized", "content_hash"])

    return df.select("path", "content").mapInPandas(resize, schema=RESIZED_SCHEMA)


EMBED_SCHEMA = "path string, embedding array<float>"


def embed_media(df: DataFrame, dim: int = 64, batch_size: int = 64) -> DataFrame:
    """Media → embedding column, the bridge into the similarity operators
    (`similarity.cosine_topk` / `ann_lsh_topk` / `ivf_topk` consume the
    output directly).

    STUB MODEL: the embedding is a deterministic unit vector seeded by the
    content digest (stable across runs/machines); a real encoder swaps in
    behind the same Arrow batch loop and schema. The array<float> output
    matches the driver's `embeddings.embedding` column type exactly.
    """

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            paths, vecs = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "big") % (2**32)
                rs = np.random.RandomState(seed)
                v = rs.standard_normal(dim)
                v = (v / np.linalg.norm(v)).astype("float32")
                paths.append(path)
                vecs.append(v.tolist())
            yield pd.DataFrame({"path": paths, "embedding": vecs})

    return df.select("path", "content").mapInPandas(embed, schema=EMBED_SCHEMA)
