"""Multimodal (image/audio/video) column plumbing (SURVEY §2.11 X5).

Design for 100 TB multimodal corpora: media lives in opaque ``binary``
columns (or content-addressed paths) beside typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip through Python row-at-a-time.

Codec status: :func:`decode_image_real` is a REAL decoder — PNG decodes
with the in-module pure-python codec (:func:`png_decode`: zlib inflate +
scanline unfilter, all five filter types and color types, no external
library), Pillow extends coverage to JPEG/GIF when importable, and
per-file failures are isolated into an ``error`` column. The
oracle-backed query ``x61_multimodal_png_roundtrip`` certifies the codec
end-to-end. :func:`decode_image_meta` remains the cheap
deterministic-feature path (stable geometry derived from the content
digest) for tests and pipelines that only need plumbing-true features;
frame sampling / resize / embedding keep documented stub models behind
real Arrow batch plumbing.
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


# ---------------------------------------------------------------------------
# Real PNG codec — pure stdlib (zlib/struct) + numpy, no external libraries.
# Supports non-interlaced 8-bit PNGs in all five color types (gray, RGB,
# palette, gray+alpha, RGBA) with full scanline unfiltering. This is an
# actual pixel decode, not a header parse: decode_image_real returns real
# per-image statistics computed from the decoded pixel array.
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_encode(pixels) -> bytes:
    """Minimal PNG writer (8-bit, non-interlaced, filter 0 per scanline).

    ``pixels``: 2-D uint8 array (gray) or 3-D (h, w, channels) for RGB/RGBA.
    Used by tests and the multimodal round-trip query to fabricate REAL
    image bytes in-engine.
    """
    import struct
    import zlib

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        data = arr[:, :, None]
    else:
        h, w = arr.shape[:2]
        data = arr
    n_ch = data.shape[2]
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[n_ch]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + data[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering (types 0-4). Returns (h, w*bpp) uint8."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to an (h, w, channels) uint8 array."""
    import struct
    import zlib

    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = len(_PNG_MAGIC)
    idat = b""
    palette = None
    w = h = None
    color_type = bit_depth = interlace = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (bit_depth={bit_depth}, interlace={interlace})")
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    px = _png_unfilter(raw, w, h, n_ch).reshape(h, w, n_ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        px = palette[px[:, :, 0]]
    return px


def _luma(px: np.ndarray) -> float:
    """Mean luminance of a decoded pixel array (Rec.601 for color)."""
    if px.shape[2] == 1:
        return float(px[:, :, 0].mean())
    if px.shape[2] == 2:  # gray + alpha
        return float(px[:, :, 0].mean())
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    return float((0.299 * r + 0.587 * g + 0.114 * b).mean())


REAL_DECODED_SCHEMA = (
    "path string, format string, width int, height int, n_channels int, "
    "mean_luma double, error string"
)


def decode_image_real(df: DataFrame, batch_size: int = 64) -> DataFrame:
    """Real image decode over (path, content) binary rows.

    PNG decodes with the in-module pure-python codec (zlib inflate + scanline
    unfilter — actual pixels, real ``mean_luma``). If Pillow is importable it
    is preferred and extends coverage to JPEG/GIF/etc.; the PNG path needs no
    external library. Per-file isolation: a row that fails to decode carries
    the exception text in ``error`` instead of failing the batch (same
    contract as the ETL pipeline's per-file FALLO handling).
    """
    try:  # pragma: no cover - exercised only where Pillow exists
        from PIL import Image  # type: ignore

        _pil = Image
    except Exception:
        _pil = None

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                row = {
                    "path": path,
                    "format": "unknown",
                    "width": None,
                    "height": None,
                    "n_channels": None,
                    "mean_luma": None,
                    "error": None,
                }
                try:
                    # PNG always uses the internal codec so results are
                    # environment-invariant (Pillow's convert("RGB") would
                    # report n_channels=3 for grayscale and drop alpha for
                    # RGBA, diverging from the pure-codec values the tests
                    # and oracle pin). Pillow, when importable, only extends
                    # coverage to non-PNG formats (JPEG/GIF/...), where it
                    # keeps the image's native mode — no convert().
                    if data.startswith(_PNG_MAGIC):
                        px = png_decode(data)
                        row.update(
                            format="png",
                            width=px.shape[1],
                            height=px.shape[0],
                            n_channels=px.shape[2],
                            mean_luma=_luma(px),
                        )
                    elif _pil is not None:
                        im = _pil.open(io.BytesIO(data))
                        px = np.asarray(im, dtype=np.uint8)
                        if px.ndim == 2:
                            px = px[:, :, None]
                        row.update(
                            format=(im.format or "unknown").lower(),
                            width=px.shape[1],
                            height=px.shape[0],
                            n_channels=px.shape[2],
                            mean_luma=_luma(px),
                        )
                    else:
                        raise ValueError(
                            "unsupported format (no PNG magic, Pillow absent)"
                        )
                except Exception as e:  # per-file isolation
                    row["error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "path", "format", "width", "height", "n_channels", "mean_luma", "error",
                ],
            )

    return df.select("path", "content").mapInPandas(decode, schema=REAL_DECODED_SCHEMA)


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


# ---------------------------------------------------------------------------
# Real WAV (PCM) codec — pure stdlib (wave/struct) + numpy. The audio
# sibling of the PNG codec: decode_audio_real returns real per-file signal
# statistics computed from decoded samples.
# ---------------------------------------------------------------------------


def wav_encode(samples, sample_rate: int) -> bytes:
    """Minimal 16-bit PCM WAV writer. ``samples``: 1-D (mono) or (n, ch)
    int16 array."""
    import io
    import wave

    arr = np.asarray(samples, dtype=np.int16)
    n_ch = 1 if arr.ndim == 1 else arr.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes):
    """Decode a PCM WAV to (samples int16 ndarray (n, ch), sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width} (16-bit PCM only)")
    arr = np.frombuffer(raw, dtype=np.int16).reshape(-1, n_ch)
    return arr, rate


AUDIO_DECODED_SCHEMA = (
    "path string, sample_rate int, n_channels int, n_samples long, rms double, error string"
)


def decode_audio_real(df: DataFrame, batch_size: int = 64) -> DataFrame:
    """Real audio decode over (path, content) binary rows: 16-bit PCM WAV
    via the stdlib codec (no external library), RMS computed from decoded
    samples. Same per-file error isolation as :func:`decode_image_real`."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                row = {
                    "path": path,
                    "sample_rate": None,
                    "n_channels": None,
                    "n_samples": None,
                    "rms": None,
                    "error": None,
                }
                try:
                    arr, rate = wav_decode(data)
                    row.update(
                        sample_rate=rate,
                        n_channels=arr.shape[1],
                        n_samples=arr.shape[0],
                        rms=float(np.sqrt(np.mean(arr.astype(np.float64) ** 2))),
                    )
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=["path", "sample_rate", "n_channels", "n_samples", "rms", "error"],
            )

    return df.select("path", "content").mapInPandas(decode, schema=AUDIO_DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Real resize + real frame sampling. The reference has no multimodal path at
# all (SURVEY §2.11 X5 is a mandate row, not a parity row); these are the
# model-input-prep stages a 100 TB multimodal ingest needs, built on the
# in-module real PNG codec so the whole decode→transform→encode loop is
# certified without external libraries.
# ---------------------------------------------------------------------------


def block_mean_resize(px: np.ndarray, factor: int = 2) -> np.ndarray:
    """Exact integer area-average downsample of an (h, w, c) uint8 array.

    Each output pixel is ``floor(sum(block) / count(block))`` over a
    ``factor×factor`` block (count-weighted at the right/bottom edges), so
    the result is pure integer arithmetic — an oracle can replicate it in
    SQL with GROUP BY (x//factor, y//factor), which is exactly what
    ``x161_image_resize`` does. Vectorized via ``np.add.reduceat`` (two
    passes, no Python per-pixel loop): at Arrow batch grain this is the
    same cost profile as a real cv2/PIL area resize.
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    h, w, _ = px.shape
    a = px.astype(np.int64)
    ys = np.arange(0, h, factor)
    xs = np.arange(0, w, factor)
    sums = np.add.reduceat(np.add.reduceat(a, ys, axis=0), xs, axis=1)
    cnt_y = np.diff(np.append(ys, h))
    cnt_x = np.diff(np.append(xs, w))
    counts = np.outer(cnt_y, cnt_x)[:, :, None]
    return (sums // counts).astype(np.uint8)


RESIZED_REAL_SCHEMA = (
    "path string, in_w int, in_h int, out_w int, out_h int, "
    "resized binary, px_sum long, error string"
)


def resize_images_real(df: DataFrame, factor: int = 2, batch_size: int = 64) -> DataFrame:
    """REAL resize over (path, content) PNG rows: decode with the pure
    codec, :func:`block_mean_resize`, re-encode to PNG, and emit the
    decoded-again pixel sum — so one row certifies decode → resize →
    encode → decode. Map-only Arrow batches (zero shuffle; the wide input
    binary column is dropped at this projection), per-file error isolation
    like :func:`decode_image_real`.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                row = {
                    "path": path,
                    "in_w": None,
                    "in_h": None,
                    "out_w": None,
                    "out_h": None,
                    "resized": None,
                    "px_sum": None,
                    "error": None,
                }
                try:
                    px = png_decode(data)
                    small = block_mean_resize(px, factor=factor)
                    encoded = png_encode(small)
                    again = png_decode(encoded)
                    row.update(
                        in_w=px.shape[1],
                        in_h=px.shape[0],
                        out_w=again.shape[1],
                        out_h=again.shape[0],
                        resized=encoded,
                        px_sum=int(again.astype(np.int64).sum()),
                    )
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "path", "in_w", "in_h", "out_w", "out_h", "resized", "px_sum", "error",
                ],
            )

    return df.select("path", "content").mapInPandas(run, schema=RESIZED_REAL_SCHEMA)


# NPV ("n PNG video") container: a minimal REAL multi-frame format so frame
# sampling exercises real parsing + real per-frame decode. Layout:
# b"NPV1" | uint32 n_frames | n_frames × (uint32 byte_len | PNG bytes).
_NPV_MAGIC = b"NPV1"


def npv_encode(frames) -> bytes:
    """Pack a list of 2-D/3-D uint8 frame arrays into an NPV container."""
    import struct

    blobs = [png_encode(f) for f in frames]
    out = [_NPV_MAGIC, struct.pack(">I", len(blobs))]
    for b in blobs:
        out.append(struct.pack(">I", len(b)))
        out.append(b)
    return b"".join(out)


def npv_decode(data: bytes) -> list:
    """Unpack an NPV container to a list of decoded (h, w, c) uint8 arrays."""
    import struct

    if not data.startswith(_NPV_MAGIC):
        raise ValueError("not an NPV container")
    (n,) = struct.unpack(">I", data[4:8])
    pos = 8
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        frames.append(png_decode(data[pos : pos + ln]))
        pos += ln
    return frames


FRAME_REAL_SCHEMA = (
    "path string, n_frames int, frame_index int, width int, height int, "
    "mean_luma double, error string"
)


def sample_frames_real(df: DataFrame, every_n: int = 2, batch_size: int = 16) -> DataFrame:
    """REAL frame sampling over (path, content) NPV rows: parse the
    container, decode every ``every_n``-th frame with the real PNG codec,
    emit per-frame geometry + mean luma. The 1-to-N row expansion happens
    inside the Arrow batch (one input file → ceil(n_frames/every_n) rows)
    — the distributed shape of ffmpeg keyframe extraction, with zero
    shuffle. Container-level failures isolate to one error row per file.
    """
    import struct

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["path", "n_frames", "frame_index", "width", "height", "mean_luma", "error"]
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                try:
                    if not data.startswith(_NPV_MAGIC):
                        raise ValueError("not an NPV container")
                    (n,) = struct.unpack(">I", data[4:8])
                    pos = 8
                    for i in range(n):
                        (ln,) = struct.unpack(">I", data[pos : pos + 4])
                        pos += 4
                        blob = data[pos : pos + ln]
                        pos += ln
                        if i % every_n != 0:
                            continue  # skip without decoding — the sampling saves the decode cost
                        px = png_decode(blob)
                        out.append(
                            {
                                "path": path,
                                "n_frames": n,
                                "frame_index": i,
                                "width": px.shape[1],
                                "height": px.shape[0],
                                "mean_luma": float(px[:, :, 0].mean()),
                                "error": None,
                            }
                        )
                except Exception as e:
                    out.append(
                        {
                            "path": path,
                            "n_frames": None,
                            "frame_index": None,
                            "width": None,
                            "height": None,
                            "mean_luma": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return df.select("path", "content").mapInPandas(expand, schema=FRAME_REAL_SCHEMA)
