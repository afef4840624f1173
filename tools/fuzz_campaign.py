"""Extended fuzz campaign: the suite's property invariants at a much
larger examples budget with fresh (non-derandomized) seeds.

The committed hypothesis tests pin max_examples to keep the suite fast
(~150-250 each) and pytest derandomizes them per run; this tool re-wraps
the SAME invariant bodies and geometry zoos with a big budget and true
randomness — the between-rounds bug-hunting pass that found the r3
stitching/containment counterexamples.

Usage: python tools/fuzz_campaign.py [--examples 2000]
Exit code != 0 (with a hypothesis falsifying example) means a real bug.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", type=int, default=2000)
    args = ap.parse_args()

    from hypothesis import HealthCheck, given, seed, settings

    import tests.test_overlay_consistency as ov
    import tests.test_predicate_consistency as pr

    cfg = settings(
        max_examples=args.examples,
        deadline=None,
        derandomize=False,
        suppress_health_check=list(HealthCheck),
        print_blob=True,
    )
    rnd = int.from_bytes(os.urandom(4), "big")
    campaigns = [
        ("relate/named-predicates", pr.geoms(), pr.geoms(),
         pr.test_relate_transpose_and_named_predicates),
        ("predicate lattice", pr.geoms(), pr.geoms(),
         pr.test_predicate_lattice),
        ("distance/dwithin", pr.geoms(), pr.geoms(),
         pr.test_distance_dwithin_consistency),
        ("overlay inclusion-exclusion", ov.polys(), ov.polys(),
         ov.test_overlay_inclusion_exclusion),
        ("overlay vs relate", ov.polys(), ov.polys(),
         ov.test_overlay_agrees_with_relate),
    ]
    failures = 0
    for name, sa, sb, test in campaigns:
        inner = test.hypothesis.inner_test
        runner = seed(rnd)(cfg(given(sa, sb)(inner)))
        t0 = time.time()
        try:
            runner()
            print(f"OK    {name}: {args.examples} examples "
                  f"[{time.time() - t0:.1f}s, seed={rnd}]")
        except Exception as ex:  # falsifying example printed by hypothesis
            failures += 1
            print(f"FAIL  {name}: {ex}")
    failures += _codec_campaign(max(200, args.examples // 10), rnd)
    failures += _transform_campaign(max(200, args.examples // 10), rnd)
    return 1 if failures else 0


def _transform_campaign(n: int, rnd: int) -> int:
    """Pixel/sample transform invariants at random shapes: constant
    images/signals are fixed points of bilinear resize / linear resample
    at ANY size ratio; exact 2× downscale equals average pooling; the
    JVM-free dimension rule matches the kernel; MJPEG seek returns the
    exact frame bytes for every stride."""
    import numpy as np

    from shapely_spark.multimodal.transform import (
        encode_mjpeg, mjpeg_frames, resample_audio, resize_bilinear,
        resize_image)

    rng = np.random.default_rng(rnd ^ 0x5EED)
    t0 = time.time()
    failures = 0
    for i in range(n):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        oh, ow = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        v = int(rng.integers(0, 256))
        try:
            out = resize_bilinear(np.full((h, w, 3), v, np.uint8), oh, ow)
            assert out.shape == (oh, ow, 3) and (out == v).all(), "const resize"
            img = rng.integers(0, 256, (2 * oh, 2 * ow, 3), dtype=np.uint8)
            pool = np.rint(img.astype(np.float64)
                           .reshape(oh, 2, ow, 2, 3).mean(axis=(1, 3)))
            assert (resize_bilinear(img, oh, ow) == pool.astype(np.uint8)).all(), "2x"
            cap = int(rng.integers(1, 50))
            rh, rw = resize_image(np.zeros((h, w), np.uint8), cap).shape
            m = max(h, w)
            eh, ew = ((h, w) if m <= cap
                      else (max(1, h * cap // m), max(1, w * cap // m)))
            assert (rh, rw) == (eh, ew), "dims"
            sig = np.full(int(rng.integers(1, 500)), float(v - 128))
            sr_o = int(rng.choice([4000, 8000, 11025, 16000, 44100]))
            y = resample_audio(sig, 16000, sr_o)
            assert len(y) == len(sig) * sr_o // 16000, "resample len"
            assert (y == np.float32(v - 128)).all(), "const resample"
            frames = [rng.integers(0, 256, int(rng.integers(0, 64)),
                                   dtype=np.uint8).tobytes()
                      for _ in range(int(rng.integers(1, 9)))]
            blob = encode_mjpeg(frames)
            stride = int(rng.integers(1, 4))
            keep = list(range(0, len(frames), stride))
            assert mjpeg_frames(blob, keep) == [frames[j] for j in keep], "mjpeg"
        except Exception as ex:
            failures += 1
            print(f"FAIL  transform invariants at case {i} "
                  f"(h={h}, w={w}, oh={oh}, ow={ow}): {ex!r}")
            break
    if not failures:
        print(f"OK    transform invariants: {n} cases × 6 properties "
              f"[{time.time() - t0:.1f}s, seed={rnd}]")
    return failures


def _codec_campaign(n: int, rnd: int) -> int:
    """Random-shape exact roundtrips across every lossless codec path,
    plus the progressive-JPEG == baseline contract (exact despite lossy
    coding: identical coefficients, reordered scans)."""
    import numpy as np

    from shapely_spark.multimodal.codecs import decode_gif, decode_png, encode_gif, encode_png
    from shapely_spark.multimodal.flac import decode_flac, encode_flac
    from shapely_spark.multimodal.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)
    from shapely_spark.multimodal.webp import decode_webp, encode_webp_lossless

    rng = np.random.default_rng(rnd)
    t0 = time.time()
    failures = 0
    for i in range(n):
        h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        try:
            assert (decode_png(encode_png(img, interlace=bool(i & 1))) == img).all()
            kw = [{}, {"subtract_green": True}, {"use_lz77": False},
                  {"cache_bits": int(rng.integers(1, 9))}][i % 4]
            assert (decode_webp(encode_webp_lossless(img, **kw)) == img).all()
            pal = np.repeat(rng.integers(0, 13, (h, w, 1)).astype(np.uint8) * 19,
                            3, axis=2)
            assert (decode_webp(encode_webp_lossless(pal, palette=True)) == pal).all()
            assert (decode_gif(encode_gif(pal)) == pal).all()
            q = int(rng.choice([75, 87, 95]))
            assert (decode_jpeg(encode_jpeg_progressive(img, quality=q))
                    == decode_jpeg(encode_jpeg(img, quality=q))).all()
            x = rng.integers(-2000, 2001, int(rng.integers(16, 600)))
            y = decode_flac(encode_flac(x))  # int16 in, float out
            assert (np.rint(y * 32768).astype(np.int64) == x).all(), "flac"
        except Exception as ex:
            failures += 1
            print(f"FAIL  codec roundtrips at case {i} (h={h}, w={w}): {ex!r}")
            break
    if not failures:
        print(f"OK    codec roundtrips: {n} cases × 6 codecs "
              f"[{time.time() - t0:.1f}s, seed={rnd}]")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
