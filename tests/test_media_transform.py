"""Real pixel transforms (multimodal/transform.py): bilinear resize and
MJPEG frame sampling. Pins: exact 2× downscale degenerates to 2×2
average pooling, the hand-computed upscale phase, constant-image
invariance, the JVM target_dims twin, and sampler == direct-decode."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from shapely_spark.multimodal.jpeg import encode_jpeg
from shapely_spark.multimodal.media import decode_image, encode_ppm
from shapely_spark.multimodal.transform import (
    encode_mjpeg, mjpeg_frames, resize_bilinear, resize_image,
    resize_images, sample_frames, target_dims,
)


def test_downscale_2x_is_average_pool():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (10, 16, 3)).astype(np.uint8)
    got = resize_bilinear(img, 5, 8)
    pool = np.rint(img.astype(np.float64).reshape(5, 2, 8, 2, 3)
                   .mean(axis=(1, 3))).astype(np.uint8)
    assert np.array_equal(got, pool)


def test_upscale_2x_hand_golden():
    # 1-D [0, 100] -> 4: src offsets -0.25,0.25,0.75,1.25 (edge-clamped)
    img = np.array([[0, 100]], np.uint8)
    got = resize_bilinear(img, 1, 4)
    assert got.tolist() == [[0, 25, 75, 100]]


def test_constant_image_invariant_and_grayscale_shape():
    c = np.full((7, 13), 201, np.uint8)
    out = resize_bilinear(c, 5, 9)
    assert out.shape == (5, 9) and (out == 201).all()


def test_resize_image_aspect_rule():
    assert resize_image(np.zeros((30, 50), np.uint8), 16).shape == (9, 16)
    assert resize_image(np.zeros((50, 30), np.uint8), 16).shape == (16, 9)
    # pass-through below the cap, min-1 floor on extreme aspect
    assert resize_image(np.zeros((10, 8), np.uint8), 16).shape == (10, 8)
    assert resize_image(np.zeros((1, 500), np.uint8), 16).shape == (1, 16)


def test_target_dims_twin_matches_kernel(spark):
    rows = [(w, h) for w in (1, 7, 16, 17, 40, 333) for h in (1, 9, 16, 25, 100)]
    df = spark.createDataFrame(rows, "w int, h int")
    tw, th = target_dims(F.col("w"), F.col("h"), 16)
    got = {(r.w, r.h): (r.tw, r.th) for r in
           df.select("w", "h", tw.alias("tw"), th.alias("th")).collect()}
    for w, h in rows:
        expect = resize_image(np.zeros((h, w), np.uint8), 16).shape
        assert got[(w, h)] == (expect[1], expect[0]), (w, h)


def test_resize_images_dataframe_op(spark):
    imgs = [("u0", encode_ppm(np.full((40, 20, 3), 77, np.uint8))),
            ("u1", encode_ppm(np.full((8, 12, 3), 5, np.uint8)))]
    df = spark.createDataFrame(imgs, "url string, payload binary")
    out = {r.url: r for r in resize_images(df, max_side=16).collect()}
    assert (out["u0"].width, out["u0"].height) == (8, 16)
    assert (out["u1"].width, out["u1"].height) == (12, 8)
    dec = decode_image(bytes(out["u0"].ppm))
    assert dec.shape == (16, 8, 3) and (dec == 77).all()


def _two_level(gid, fi, w=18, h=9):
    img = np.full((h, w), (17 * gid + 23 + 31 * fi) % 256, np.uint8)
    img[:, 8:] = (29 * gid + 101 + 57 * fi) % 256
    return img


def test_mjpeg_container_seek_subset():
    frames = [b"frame-%d" % i for i in range(7)]
    blob = encode_mjpeg(frames)
    assert mjpeg_frames(blob) == frames
    assert mjpeg_frames(blob, [1, 5]) == [frames[1], frames[5]]
    assert mjpeg_frames(blob, [99]) == []
    with pytest.raises(ValueError):
        mjpeg_frames(b"RIFFxxxx")


@pytest.mark.parametrize("every", [1, 2, 3])
def test_sample_frames_matches_direct_decode(spark, every):
    payloads = []
    for gid in range(4):
        frames = [encode_jpeg(_two_level(gid, fi), quality=87)
                  for fi in range(4 + gid)]
        payloads.append((str(gid), encode_mjpeg(frames)))
    df = spark.createDataFrame(payloads, "url string, payload binary")
    rows = sample_frames(df, every=every).collect()
    got = {(r.url, r.frame_idx): (r.width, r.height, r.px_sum) for r in rows}
    expect = {}
    for gid in range(4):
        for fi in range(0, 4 + gid, every):
            dec = decode_image(encode_jpeg(_two_level(gid, fi), quality=87))
            expect[(str(gid), fi)] = (
                dec.shape[1], dec.shape[0], int(dec.astype(np.int64).sum())
            )
    assert got == expect


def test_resample_audio_exact_pow2_ratios():
    from shapely_spark.multimodal.transform import resample_audio

    x = np.array([0.0, 2.0, 6.0, 4.0, -8.0, 10.0])
    assert resample_audio(x, 16000, 8000).tolist() == [0.0, 6.0, -8.0]
    up = resample_audio(np.array([0.0, 2.0, 6.0]), 8000, 16000)
    assert up.tolist() == [0.0, 1.0, 2.0, 4.0, 6.0, 6.0]
    # non-pow2 ratio: length rule floor(n*out/in), values via lerp
    y = resample_audio(np.arange(9, dtype=float), 16000, 12000)
    assert len(y) == 6
    assert y == pytest.approx(np.arange(6) * (16000 / 12000), abs=1e-6)
    assert resample_audio(np.array([]), 16000, 8000).shape == (0,)


def test_resample_audios_dataframe_op(spark):
    from shapely_spark.multimodal.media import decode_audio, encode_wav
    from shapely_spark.multimodal.transform import resample_audios

    c = (np.arange(50) % 21 - 10) * 128.0
    df = spark.createDataFrame(
        [("a", bytearray(encode_wav(c / 32768.0, 16000)), 16000)],
        "url string, payload binary, sample_rate int",
    )
    out = resample_audios(df, target_rate=8000).collect()[0]
    assert out.n_samples == 25
    dec = np.rint(decode_audio(bytes(out.wav)).astype(np.float64) * 32768.0)
    assert dec.tolist() == c[::2].tolist()
