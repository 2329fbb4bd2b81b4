#!/usr/bin/env python
"""Quantify the cv2-INTER_AREA vs Lanczos minify delta (docs/PARITY.md).

The reference minifies with ImageMagick ``mogrify -resize`` (Lanczos,
ref: utils/data.py:64-116); this framework uses cv2 INTER_AREA
(data/llff.py::minify_images). ImageMagick is not present in this
environment, so PIL's Lanczos stands in for IM's default filter — the same
windowed-sinc family. Prints max/mean abs delta and the PSNR between the
two minified results on a synthesized photo-like image (noise + edges) and
on a smooth-only image.
"""

import cv2
import numpy as np
from PIL import Image


def compare(img8, factor=4, label=""):
    h2, w2 = img8.shape[0] // factor, img8.shape[1] // factor
    a = cv2.resize(img8, (w2, h2),
                   interpolation=cv2.INTER_AREA).astype(np.float32) / 255.0
    b = np.asarray(Image.fromarray(img8).resize(
        (w2, h2), Image.LANCZOS)).astype(np.float32) / 255.0
    d = np.abs(a - b)
    mse = float(((a - b) ** 2).mean())
    psnr = -10 * np.log10(max(mse, 1e-12))
    print(f"{label}: factor {factor}: max|d|={d.max():.4f} "
          f"({d.max() * 255:.1f}/255) mean|d|={d.mean():.5f} "
          f"PSNR-between-minifies={psnr:.2f} dB "
          f"frac>1/255={(d > 1 / 255).mean():.3f}")


def main():
    rng = np.random.default_rng(0)
    H, W = 768, 1024
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([
        0.5 + 0.4 * np.sin(x / 37.0) * np.cos(y / 23.0),
        0.5 + 0.3 * np.sin((x + y) / 53.0),
        0.5 + 0.4 * np.cos(x / 11.0) * np.sin(y / 71.0)], -1)
    img += 0.15 * rng.normal(size=(H, W, 3)).astype(np.float32)
    img[200:400, 300:500] = 0.9
    img[500:520, :] = 0.05
    compare((np.clip(img, 0, 1) * 255).round().astype(np.uint8),
            label="noisy+edges")

    smooth = np.stack(
        [0.5 + 0.4 * np.sin(x / 137.0) * np.cos(y / 123.0)] * 3, -1)
    compare((np.clip(smooth, 0, 1) * 255).round().astype(np.uint8),
            label="smooth-only")

    # the in-loader lanczos path (--minify_filter lanczos) must reproduce
    # the PIL comparison arm above bit-for-bit
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from evdeblurnerf_tpu.data.llff import imread, minify_images

    img8 = (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
    with tempfile.TemporaryDirectory() as td:
        os.makedirs(os.path.join(td, "images"))
        Image.fromarray(img8).save(os.path.join(td, "images", "0.png"))
        folder = minify_images(td, 4, filt="lanczos")
        got = imread(os.path.join(td, folder, "0.png"))
        want = np.asarray(Image.fromarray(img8).resize(
            (img8.shape[1] // 4, img8.shape[0] // 4), Image.LANCZOS))
        assert np.array_equal(got, want), "loader lanczos path deviates"
        print("loader --minify_filter lanczos matches PIL reference arm")


if __name__ == "__main__":
    main()
