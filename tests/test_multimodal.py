"""Multimodal operator plumbing + F8 credential attachment."""

import numpy as np
from pyspark.sql import functions as F

from wcm_spark.images import LOSSLESS_FMT, decode_image, encode_image, gen_image


def _img_df(spark, n=6):
    rows = []
    for i in range(n):
        arr = gen_image(f"mm/{i}", 24, 18)
        rows.append((f"img-{i}", encode_image(arr, LOSSLESS_FMT)))
    return spark.createDataFrame(rows, "image_id string, bytes binary")


def test_decode_image_meta(spark):
    from wcm_spark.datapipe.multimodal import decode_image_meta

    out = decode_image_meta(_img_df(spark)).collect()
    assert len(out) == 6
    assert all(r["w"] == 24 and r["h"] == 18 and r["decode_ok"] for r in out)


def test_decode_meta_undecodable_flagged(spark):
    from wcm_spark.datapipe.multimodal import decode_image_meta

    df = spark.createDataFrame(
        [("bad-1", b"\x89PNG\r\n\x1a\nnotactuallyapng")], "image_id string, bytes binary"
    )
    row = decode_image_meta(df).collect()[0]
    assert row["decode_ok"] is False and row["w"] is None


def test_resize_images(spark):
    from wcm_spark.datapipe.multimodal import resize_images

    out = resize_images(_img_df(spark), 8, 8).collect()
    for r in out:
        arr, fmt = decode_image(r["bytes"])
        assert arr.shape == (8, 8, 3) and fmt == LOSSLESS_FMT
        assert r["self_psnr"] == float("inf")  # deterministic resample


def test_video_frame_stub_shape(spark):
    from wcm_spark.datapipe.multimodal import sample_video_frames

    df = spark.createDataFrame(
        [(f"v{i}", f"payload-{i}".encode() * 20) for i in range(4)],
        "video_id string, bytes binary",
    )
    out = sample_video_frames(df, k=3).collect()
    assert len(out) == 12
    # deterministic: same payload -> same frames
    by_key = {}
    for r in out:
        arr, _ = decode_image(r["frame_bytes"])
        by_key[(r["video_id"], r["frame_no"])] = arr
    df2 = sample_video_frames(df, k=3).collect()
    for r in df2:
        arr, _ = decode_image(r["frame_bytes"])
        assert np.array_equal(arr, by_key[(r["video_id"], r["frame_no"])])


def test_audio_features_stub(spark):
    from wcm_spark.datapipe.multimodal import extract_audio_features

    df = spark.createDataFrame(
        [("a0", b"\x00" * 800), ("a1", bytes(range(256)) * 4), ("a2", b"")],
        "audio_id string, bytes binary",
    )
    rows = {r["audio_id"]: r for r in extract_audio_features(df).collect()}
    assert rows["a0"]["band_energy"] == [0.0] * 8
    assert rows["a2"]["duration_sec"] == 0.0
    assert len(rows["a1"]["band_energy"]) == 8 and all(e > 0 for e in rows["a1"]["band_energy"])


def test_credentials_attach(spark):
    """F8 (UserAgent.pm:17-31): userinfo attaches per host_key at fetch and
    never leaks into dedup or redirect history."""
    from wcm_spark.corpus import corpus_rows, seed_urls
    from wcm_spark.scheduler import CrawlConfig, Crawler

    rows = corpus_rows(1, 6)
    corpus_df = spark.createDataFrame(
        [(r["url"], r["status"], r["content_type"], r["content_length"], r["body"], r["redirect_to"]) for r in rows],
        "url string, status int, content_type string, content_length bigint, body binary, redirect_to string",
    )
    cfg = CrawlConfig(
        expected_urls=1000, use_bloom=False, max_waves=1,
        credentials={"http://site0.example.test": "user:pw"},
    )
    crawler = Crawler(spark, corpus_df, cfg)
    wave = crawler._wave_cut(crawler._seed_frontier(seed_urls(1)))
    fetched = crawler._fetch_wave(wave).collect()
    assert fetched, "seed must fetch"
    for r in fetched:
        assert r["fetch_auth_url"] == r["request_url"].replace("http://", "http://user:pw@")
        assert "user:pw" not in r["url"]  # final URL stays credential-free
