"""Multimodal binary-column plumbing tests (stubbed codec, real pipeline)."""

import hashlib

import pytest

from pipeline_etl_website_visits_spark.operators.multimodal import (
    decode_image_meta,
    decode_image_real,
    read_binary_dir,
    with_media_metadata,
)


@pytest.fixture()
def media_dir(tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.jpg").write_bytes(b"\xff\xd8fakejpegbytes" * 10)
    (d / "b.png").write_bytes(b"\x89PNGfakebytes" * 200)
    (d / "c.bin").write_bytes(b"opaque")
    return str(d)


def test_binary_source_and_metadata(spark, media_dir):
    df = with_media_metadata(read_binary_dir(spark, media_dir))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.jpg"]["format"] == "jpeg"
    assert rows["b.png"]["format"] == "png"
    assert rows["c.bin"]["format"] == "unknown"
    assert rows["c.bin"]["size_bucket"] == "tiny"
    assert rows["b.png"]["length"] == len(b"\x89PNGfakebytes") * 200


def test_decode_stub_deterministic(spark, media_dir):
    df = decode_image_meta(read_binary_dir(spark, media_dir))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    expected = hashlib.sha256(b"\xff\xd8fakejpegbytes" * 10).hexdigest()
    assert rows["a.jpg"]["content_hash"] == expected
    assert rows["a.jpg"]["format"] == "jpeg"
    assert 16 <= rows["a.jpg"]["width"] <= 4096
    # deterministic across runs
    again = {r["path"].rsplit("/", 1)[-1]: r for r in decode_image_meta(read_binary_dir(spark, media_dir)).collect()}
    assert again["a.jpg"]["width"] == rows["a.jpg"]["width"]


def test_real_png_roundtrip_all_color_types(spark, tmp_path):
    """png_encode → decode_image_real recovers exact geometry and mean luma
    for gray / RGB / RGBA images — a REAL pixel decode (zlib inflate +
    unfilter), not a header parse."""
    import numpy as np

    from pipeline_etl_website_visits_spark.operators.multimodal import png_encode

    d = tmp_path / "png"
    d.mkdir()
    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (13, 17), dtype=np.uint8)
    rgb = rng.randint(0, 256, (9, 5, 3), dtype=np.uint8)
    rgba = rng.randint(0, 256, (4, 8, 4), dtype=np.uint8)
    (d / "gray.png").write_bytes(png_encode(gray))
    (d / "rgb.png").write_bytes(png_encode(rgb))
    (d / "rgba.png").write_bytes(png_encode(rgba))
    (d / "junk.bin").write_bytes(b"not an image")

    out = {r["path"].rsplit("/", 1)[-1]: r for r in decode_image_real(read_binary_dir(spark, str(d))).collect()}
    g = out["gray.png"]
    assert (g["width"], g["height"], g["n_channels"], g["error"]) == (17, 13, 1, None)
    assert abs(g["mean_luma"] - gray.mean()) < 1e-9
    c = out["rgb.png"]
    assert (c["width"], c["height"], c["n_channels"], c["error"]) == (5, 9, 3, None)
    r_, g_, b_ = (rgb[:, :, i].astype(float) for i in range(3))
    assert abs(c["mean_luma"] - (0.299 * r_ + 0.587 * g_ + 0.114 * b_).mean()) < 1e-9
    a = out["rgba.png"]
    assert (a["width"], a["height"], a["n_channels"]) == (8, 4, 4)
    # per-file isolation: the junk row carries an error, the batch survives
    assert out["junk.bin"]["error"] is not None and out["junk.bin"]["width"] is None


def test_png_unfilter_all_filter_types():
    """Decode a handcrafted PNG whose scanlines use filter types 1-4
    (Sub/Up/Average/Paeth) — the encoder only emits type 0, so this pins the
    decoder against independently-constructed streams."""
    import struct
    import zlib

    import numpy as np

    from pipeline_etl_website_visits_spark.operators.multimodal import png_decode

    # 4x4 gray image, known pixels
    px = np.arange(16, dtype=np.uint8).reshape(4, 4) * 13 % 251

    # build filtered scanlines by hand
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    lines = []
    prev = np.zeros(4, dtype=np.int32)
    for y, ftype in enumerate([1, 2, 3, 4]):
        cur = px[y].astype(np.int32)
        enc = np.zeros(4, dtype=np.int32)
        for x in range(4):
            a = cur[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if ftype == 1:
                enc[x] = (cur[x] - a) % 256
            elif ftype == 2:
                enc[x] = (cur[x] - b) % 256
            elif ftype == 3:
                enc[x] = (cur[x] - ((a + b) >> 1)) % 256
            else:
                enc[x] = (cur[x] - paeth(a, b, c)) % 256
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(tag, payload):
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(
            ">I", zlib.crc32(tag + payload) & 0xFFFFFFFF
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    decoded = png_decode(data)
    assert decoded.shape == (4, 4, 1)
    assert (decoded[:, :, 0] == px).all()


def test_frame_sampling_row_expansion(spark, media_dir):
    from pipeline_etl_website_visits_spark.operators.multimodal import read_binary_dir, sample_frames

    frames = sample_frames(read_binary_dir(spark, media_dir), frames_per_file=3)
    rows = frames.collect()
    assert len(rows) == 9  # 3 files x 3 frames
    by_file = {}
    for r in rows:
        by_file.setdefault(r["path"], []).append(r)
    for path, fr in by_file.items():
        assert sorted(f["frame_index"] for f in fr) == [0, 1, 2]
        assert len({f["frame_hash"] for f in fr}) == 3  # distinct per frame
    # determinism across runs
    again = sample_frames(read_binary_dir(spark, media_dir), frames_per_file=3).collect()
    assert sorted(r["frame_hash"] for r in again) == sorted(r["frame_hash"] for r in rows)


def test_resize_stub_fixed_dims_and_determinism(spark, media_dir):
    from pipeline_etl_website_visits_spark.operators.multimodal import read_binary_dir, resize_images

    df = read_binary_dir(spark, media_dir)
    a = {r["path"]: bytes(r["resized"]) for r in resize_images(df, 224, 224).collect()}
    b = {r["path"]: bytes(r["resized"]) for r in resize_images(df, 224, 224).collect()}
    assert a == b and len(a) > 0
    rows = resize_images(df, 64, 64).collect()
    assert all(r["width"] == 64 and r["height"] == 64 for r in rows)
    # different target size => different payload (the codec saw the dims)
    c = {r["path"]: bytes(r["resized"]) for r in rows}
    assert all(a[p] != c[p] for p in a)


def test_embed_media_feeds_similarity_search(spark, media_dir):
    """The multimodal embedding output plugs directly into the similarity
    operators: unit-norm array<float>, searchable by cosine_topk."""
    import pyspark.sql.functions as F
    from pipeline_etl_website_visits_spark.operators.multimodal import read_binary_dir, embed_media
    from pipeline_etl_website_visits_spark.operators.similarity import cosine_topk

    emb = embed_media(read_binary_dir(spark, media_dir), dim=16)
    with_ids = emb.withColumn(
        "vec_id", F.row_number().over(__import__("pyspark").sql.Window.orderBy("path"))
    ).select("vec_id", F.col("embedding"))
    n = with_ids.count()
    assert n > 1
    res = cosine_topk(with_ids.limit(1), with_ids, k=min(3, n - 1)).collect()
    assert len(res) == min(3, n - 1)
    assert all(-1.0001 <= r["sim"] <= 1.0001 for r in res)


def test_real_wav_roundtrip(spark, tmp_path):
    """wav_encode → decode_audio_real recovers rate/channels/length and the
    exact RMS of known signals (sine mono + constant stereo)."""
    import numpy as np

    from pipeline_etl_website_visits_spark.operators.multimodal import wav_encode

    from pipeline_etl_website_visits_spark.operators.multimodal import decode_audio_real

    d = tmp_path / "wav"
    d.mkdir()
    t = np.arange(1600)
    sine = (np.sin(2 * np.pi * 440 * t / 16000) * 10000).astype(np.int16)
    stereo = np.full((800, 2), 1234, dtype=np.int16)
    (d / "sine.wav").write_bytes(wav_encode(sine, 16000))
    (d / "stereo.wav").write_bytes(wav_encode(stereo, 8000))
    (d / "junk.wav").write_bytes(b"RIFFnotawav")

    out = {r["path"].rsplit("/", 1)[-1]: r for r in decode_audio_real(read_binary_dir(spark, str(d))).collect()}
    s = out["sine.wav"]
    assert (s["sample_rate"], s["n_channels"], s["n_samples"], s["error"]) == (16000, 1, 1600, None)
    assert abs(s["rms"] - float(np.sqrt(np.mean(sine.astype(np.float64) ** 2)))) < 1e-9
    st = out["stereo.wav"]
    assert (st["sample_rate"], st["n_channels"], st["n_samples"]) == (8000, 2, 800)
    assert abs(st["rms"] - 1234.0) < 1e-9
    assert out["junk.wav"]["error"] is not None


def test_block_mean_resize_exact_integer_semantics():
    """floor(sum/count) per block, count-weighted at ragged edges —
    the contract the x161 oracle replicates in SQL."""
    import numpy as np

    from pipeline_etl_website_visits_spark.operators.multimodal import block_mean_resize

    rng = np.random.RandomState(7)
    for h, w, f in [(1, 1, 2), (5, 7, 2), (16, 16, 4), (3, 10, 3)]:
        px = rng.randint(0, 256, (h, w, 2)).astype(np.uint8)
        out = block_mean_resize(px, factor=f)
        oh, ow = -(-h // f), -(-w // f)
        assert out.shape == (oh, ow, 2)
        for by in range(oh):
            for bx in range(ow):
                blk = px[by * f : min((by + 1) * f, h), bx * f : min((bx + 1) * f, w)].astype(int)
                n = blk.shape[0] * blk.shape[1]
                expect = blk.reshape(n, 2).sum(axis=0) // n
                assert (out[by, bx] == expect).all(), (h, w, f, by, bx)
    with pytest.raises(ValueError):
        block_mean_resize(px, factor=0)


def test_resize_images_real_roundtrip_and_error_isolation(spark, tmp_path):
    """decode -> block-mean -> encode -> decode over real PNG bytes;
    non-PNG rows isolate into the error column instead of failing the job."""
    import numpy as np

    from pipeline_etl_website_visits_spark.operators.multimodal import (
        block_mean_resize,
        png_decode,
        png_encode,
        read_binary_dir,
        resize_images_real,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(3)
    expected = {}
    for name, (h, w) in [("a.png", (9, 5)), ("b.png", (4, 4))]:
        px = rng.randint(0, 256, (h, w)).astype(np.uint8)
        (d / name).write_bytes(png_encode(px))
        small = block_mean_resize(px[:, :, None], factor=2)
        expected[name] = (w, h, small.shape[1], small.shape[0], int(small.astype(np.int64).sum()))
    (d / "junk.bin").write_bytes(b"not a png at all")

    rows = {r["path"].rsplit("/", 1)[-1]: r for r in resize_images_real(read_binary_dir(spark, str(d)), factor=2).collect()}
    assert rows["junk.bin"]["error"] is not None and rows["junk.bin"]["px_sum"] is None
    for name, (iw, ih, ow, oh, s) in expected.items():
        r = rows[name]
        assert (r["in_w"], r["in_h"], r["out_w"], r["out_h"], r["px_sum"]) == (iw, ih, ow, oh, s)
        assert r["error"] is None
        # the emitted payload is a REAL decodable PNG of the resized image
        again = png_decode(bytes(r["resized"]))
        assert again.shape == (oh, ow, 1)
        assert int(again.astype("int64").sum()) == s


def test_sample_frames_real_decodes_only_kept_frames(spark, tmp_path):
    """NPV container parse + real per-frame decode; every_n sampling skips
    the in-between frames (their bytes are never inflated); corrupt
    containers isolate per-file."""
    import numpy as np

    from pipeline_etl_website_visits_spark.operators.multimodal import (
        npv_decode,
        npv_encode,
        read_binary_dir,
        sample_frames_real,
    )

    d = tmp_path / "vids"
    d.mkdir()
    fills = [10, 20, 30, 40, 50]
    (d / "v5.npv").write_bytes(npv_encode([np.full((2, 3), v, dtype=np.uint8) for v in fills]))
    (d / "v1.npv").write_bytes(npv_encode([np.full((4, 4), 99, dtype=np.uint8)]))
    (d / "bad.npv").write_bytes(b"NOPE")

    rows = sample_frames_real(read_binary_dir(spark, str(d), glob="*.npv"), every_n=2).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    v5 = sorted(by_file["v5.npv"], key=lambda r: r["frame_index"])
    assert [r["frame_index"] for r in v5] == [0, 2, 4]
    assert [r["mean_luma"] for r in v5] == [10.0, 30.0, 50.0]
    assert all(r["n_frames"] == 5 and (r["width"], r["height"]) == (3, 2) for r in v5)
    (v1,) = by_file["v1.npv"]
    assert (v1["frame_index"], v1["mean_luma"]) == (0, 99.0)
    (bad,) = by_file["bad.npv"]
    assert bad["error"] is not None and bad["frame_index"] is None
    # codec round-trip: decode returns every frame in order
    dec = npv_decode((d / "v5.npv").read_bytes())
    assert [int(f[0, 0, 0]) for f in dec] == fills
