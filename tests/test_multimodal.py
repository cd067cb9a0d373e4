"""Multimodal plumbing: mapInPandas schema/batching real, decode stubbed."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_spark.operators.ann import cosine_topk
from geo_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
    media_dedup_exact,
)
from geo_spark.sources.documents import synth_documents


def test_fake_features_deterministic_and_unit_norm(spark):
    docs = synth_documents(spark, 200)
    feats = extract_media_features(docs, content_col="html", id_col="url")
    rows = feats.collect()
    assert len(rows) == 200
    by_id = {r["url"]: r for r in rows}
    # deterministic: re-run gives identical vectors
    rows2 = {r["url"]: r for r in extract_media_features(docs).collect()}
    some = list(by_id)[:5]
    for u in some:
        assert by_id[u]["features"] == rows2[u]["features"]
        assert by_id[u]["content_sha256"] == rows2[u]["content_sha256"]
        v = np.asarray(by_id[u]["features"])
        assert np.linalg.norm(v) == pytest.approx(1.0, rel=1e-9)
        assert by_id[u]["n_bytes"] > 0


def test_stub_mode_raises(spark):
    docs = synth_documents(spark, 10)
    feats = extract_media_features(docs, decode="stub")
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        feats.collect()


def test_media_features_feed_ann(spark):
    """The media pipeline composes with the ANN operator end-to-end."""
    docs = synth_documents(spark, 100)
    feats = extract_media_features(docs).withColumn(
        "vec_id", F.xxhash64("url")
    ).select("vec_id", F.col("features").alias("embedding"))
    queries = feats.limit(3).select(F.col("vec_id").alias("qid"), "embedding")
    out = cosine_topk(feats, queries, k=5)
    got = out.groupBy("qid").count().collect()
    assert all(r["count"] == 5 for r in got)
    # self is always rank 1 with cosine 1
    top = out.filter("rank = 1").collect()
    for r in top:
        assert r["cosine"] == pytest.approx(1.0, rel=1e-12)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 3500), (2, 0), (3, 100000)], schema="vid long, duration_ms long"
    )
    plan = frame_sample_plan(df, every_ms=1000, max_frames=16)
    got = plan.groupBy("vid").count().collect()
    counts = {r["vid"]: r["count"] for r in got}
    assert counts[1] == 4  # 0,1000,2000,3000
    assert counts[2] == 1  # just t=0
    assert counts[3] == 16  # capped


def test_media_dedup_exact(spark):
    docs = synth_documents(spark, 50)
    dup = docs.unionByName(docs.limit(10))  # 10 duplicated payloads
    out = media_dedup_exact(dup)
    assert out.count() == 50
    assert out.filter("n_copies = 2").count() == 10


def test_png_roundtrip_all_filters_and_kinds():
    import numpy as np

    from geo_spark.kernels.png import decode_png, encode_png

    rng = np.random.RandomState(11)
    for nch in (1, 2, 3, 4):
        img = rng.randint(0, 256, (13, 9, nch), dtype=np.uint8)
        for ft in range(5):
            out = decode_png(encode_png(img, filter_type=ft))
            assert out.shape == img.shape, (nch, ft)
            assert (out == img).all(), f"roundtrip mismatch nch={nch} filter={ft}"


def test_png_16bit_and_palette():
    import struct
    import zlib

    import numpy as np

    from geo_spark.kernels.png import _SIG, decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # hand-built 2x2 16-bit grayscale (big-endian samples, filter 0)
    vals = np.array([[1000, 2000], [40000, 65535]], dtype=np.uint16)
    rows = b""
    for y in range(2):
        rows += b"\x00" + vals[y].astype(">u2").tobytes()
    buf = (
        _SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    out = decode_png(buf)
    assert out.dtype == np.uint16 and (out[:, :, 0] == vals).all()

    # 2x2 palette image: indices [[0,1],[2,0]] with a 3-color palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    rows = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    buf = (
        _SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    out = decode_png(buf)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0]
    assert out[1, 0].tolist() == [0, 0, 255]


def test_png_feature_extraction_spark(spark):
    import numpy as np

    from geo_spark.kernels.png import decode_png, encode_png, png_features
    from geo_spark.operators.multimodal import extract_media_features

    rng = np.random.RandomState(3)
    rows = []
    imgs = {}
    for i in range(6):
        img = rng.randint(0, 256, (8 + i, 5 + i, 3), dtype=np.uint8)
        imgs[f"u{i}"] = img
        rows.append((f"u{i}", bytearray(encode_png(img, filter_type=i % 5))))
    rows.append(("bad", bytearray(b"not a png at all")))
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r.url: r.features
        for r in extract_media_features(df, decode="png").collect()
    }
    for i in range(6):
        exp = png_features(imgs[f"u{i}"], 32)
        assert np.allclose(got[f"u{i}"], exp, atol=0), f"u{i}"
        assert got[f"u{i}"][0] == 5 + i and got[f"u{i}"][1] == 8 + i
    assert got["bad"] is None


def test_jpeg_dc_exact_roundtrip():
    # constant 8x8 blocks whose DC is an exact multiple of the Annex-K DC
    # quant step survive the lossy pipeline EXACTLY (the jpeg_decode_stats
    # oracle's determinism contract)
    import numpy as np

    from geo_spark.kernels.jpeg import decode_jpeg, encode_jpeg

    img = np.zeros((16, 24), dtype=np.uint8)
    for by in range(2):
        for bx in range(3):
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = 128 + 14 * (by * 3 + bx)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=50)), img)


def test_jpeg_lossy_roundtrip_bounds():
    import numpy as np

    from geo_spark.kernels.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    # smooth gradient: high quality keeps error small away from block edges
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.zeros((40, 56, 3), dtype=np.uint8)
    img[:, :, 0] = (xx * 2).astype(np.uint8)
    img[:, :, 1] = (yy * 3).astype(np.uint8)
    img[:, :, 2] = 64
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 24, (err.mean(), err.max())
    # odd sizes pad and crop back
    odd = rng.integers(0, 256, (17, 19)).astype(np.uint8)
    assert decode_jpeg(encode_jpeg(odd, quality=90)).shape == (17, 19)


def test_jpeg_decodes_third_party_files():
    # files produced by other encoders (4:2:0 chroma subsampling etc.)
    import os

    from geo_spark.kernels.jpeg import decode_jpeg

    candidates = [
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "test/test_email/data/python.jpg",
    ]
    found = [p for p in candidates if os.path.exists(p)]
    if not found:
        import pytest

        pytest.skip("no third-party sample JPEGs on this host")
    for p in found:
        img = decode_jpeg(open(p, "rb").read())
        assert img.ndim in (2, 3) and img.size > 0


def test_media_features_jpeg_mode(spark):
    import numpy as np

    from geo_spark.kernels.jpeg import encode_jpeg
    from geo_spark.operators.multimodal import extract_media_features

    imgs = []
    for i in range(4):
        img = np.full((16, 16), 128 + 2 * i, dtype=np.uint8)
        imgs.append((f"u{i}", bytearray(encode_jpeg(img, quality=50))))
    imgs.append(("bad", bytearray(b"not a jpeg")))
    df = spark.createDataFrame(imgs, "url string, html binary")
    out = {r["url"]: r for r in extract_media_features(df, decode="jpeg").collect()}
    assert out["bad"]["features"] is None
    for i in range(4):
        feats = out[f"u{i}"]["features"]
        assert feats is not None and len(feats) == 32
        # png_features layout: [w, h, nch, mean/255, ...] — constant image
        assert feats[0] == 16.0 and feats[1] == 16.0 and feats[2] == 1.0
        assert abs(feats[3] - (128 + 2 * i) / 255.0) < 1e-12


def test_resize_media_box_and_nearest(spark):
    import numpy as np

    from geo_spark.kernels.jpeg import encode_jpeg
    from geo_spark.kernels.png import decode_png, encode_png
    from geo_spark.operators.multimodal import resize_media

    # PNG 16x16 with 4 constant 8x8 quadrants -> box 2x downsample is exact
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    vals = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    for b, v in enumerate(vals):
        by, bx = divmod(b, 2)
        img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
    # JPEG gray, DC-exact constant
    jimg = np.full((16, 16), 130, dtype=np.uint8)
    rows = [
        ("png", bytearray(encode_png(img))),
        ("jpg", bytearray(encode_jpeg(jimg, quality=50))),
        ("bad", bytearray(b"nope")),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in resize_media(df, width=8, height=8).collect()}
    assert out["bad"]["ok"] is False
    dec = decode_png(bytes(out["png"]["content"]))
    assert dec.shape == (8, 8, 3)
    for b, v in enumerate(vals):
        by, bx = divmod(b, 2)
        assert (dec[by * 4 : (by + 1) * 4, bx * 4 : (bx + 1) * 4] == v).all()
    jdec = decode_png(bytes(out["jpg"]["content"]))
    assert jdec.shape[:2] == (8, 8)
    assert (np.asarray(jdec).reshape(-1) == 130).all()
    # non-integer ratio -> nearest path
    out2 = resize_media(df.filter("url = 'png'"), width=5, height=7).collect()[0]
    assert decode_png(bytes(out2["content"])).shape == (7, 5, 3)


def test_jpeg_fill_bytes_before_markers():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a marker
    # code; the parser must skip them (previously misread the fill byte as
    # the marker and misparsed the segment length)
    import numpy as np

    from geo_spark.kernels.jpeg import decode_jpeg, encode_jpeg

    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8] = 128
    buf = encode_jpeg(img, quality=50)
    # insert fill bytes before every marker except the entropy-coded-data
    # region (markers after SOS would need bitstream awareness; pad the
    # header markers, which is where real encoders emit fill bytes)
    out = bytearray(buf[:2])  # SOI must open the stream unpadded
    i = 2
    sos_seen = False
    while i < len(buf):
        if not sos_seen and buf[i] == 0xFF and i + 1 < len(buf) and buf[i + 1] != 0x00:
            out += b"\xff\xff"  # two fill bytes, then the real ff+code
            if buf[i + 1] == 0xDA:
                sos_seen = True
        out.append(buf[i])
        i += 1
    padded = bytes(out)
    assert padded != buf
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(buf))
