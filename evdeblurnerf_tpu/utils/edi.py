"""Event double integral (EDI) deblurring prior.

Host-side numpy preprocessing run once at dataset build (ref: utils/edi.py):
bilinear-splat brightness-increment images per sub-exposure interval, then
``sharp = (2N+1) * blurry / sum_i exp(inner_integral_i)``.
"""

from __future__ import annotations

from itertools import product

import numpy as np


def interpolate_subpixel(x, y, v, w, h, image=None):
    """Bilinear splat of values ``v`` at float coords (x, y) into [h, w]
    (ref: utils/edi.py:7-41)."""
    image = image if image is not None else np.zeros((h, w), dtype=np.float32)
    if x.size == 0:
        return image

    def k_b(a):
        return np.maximum(0, 1 - np.abs(a))

    for x_round, y_round in product((np.floor, np.ceil), (np.floor, np.ceil)):
        x_ref = x_round(x)
        y_ref = y_round(y)
        # integer coords contribute once (floor only); drop out-of-frame
        valid = np.logical_and.reduce([
            np.logical_or(x_ref != x, x_round is np.floor),
            np.logical_or(y_ref != y, y_round is np.floor),
            x_ref < w, y_ref < h])
        # NOTE: no >= 0 check, exactly like the reference
        # (ref utils/edi.py:31-33): slightly negative rectified coords
        # floor to -1 and np.add.at wraps them onto the far edge. The EDI
        # host-oracle parity test pins this — do not "fix" unilaterally.
        x_ref = x_ref[valid]
        y_ref = y_ref[valid]
        if x_ref.shape[0] > 0:
            val = v[valid] * k_b(x_ref - x[valid]) * k_b(y_ref - y[valid])
            np.add.at(image, (y_ref.astype(np.int64), x_ref.astype(np.int64)),
                      val)
    return image


def brightness_increment_image(x, y, p, w, h, c_pos, c_neg, interpolate=True,
                               color_events=False):
    """BII = c_pos * splat(+events) - c_neg * splat(-events)
    (ref: utils/edi.py:44-70). ``color_events`` demosaics the per-polarity
    count images from the Bayer pattern first."""
    assert c_pos is not None and c_neg is not None
    image_pos = np.zeros((h, w), dtype=np.float32)
    image_neg = np.zeros((h, w), dtype=np.float32)
    vals = np.ones([np.asarray(x).shape[0]], dtype=np.float32)

    pos = np.asarray(p) > 0
    neg = ~pos
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)

    if interpolate:
        image_pos = interpolate_subpixel(x[pos], y[pos], vals[pos], w, h,
                                         image_pos)
        image_neg = interpolate_subpixel(x[neg], y[neg], vals[neg], w, h,
                                         image_neg)
    else:
        np.add.at(image_pos, (y[pos].astype(np.int64), x[pos].astype(np.int64)),
                  vals[pos])
        np.add.at(image_neg, (y[neg].astype(np.int64), x[neg].astype(np.int64)),
                  vals[neg])

    if color_events:
        import cv2
        image_pos = cv2.cvtColor(image_pos.astype(np.uint8),
                                 cv2.COLOR_BayerBG2BGR)
        image_neg = cv2.cvtColor(image_neg.astype(np.uint8),
                                 cv2.COLOR_BayerBG2BGR)

    return image_pos.astype(np.float32) * c_pos - image_neg.astype(np.float32) * c_neg


def inner_double_integral(bii):
    """Stack of integrated log-brightness offsets across the exposure
    (ref: utils/edi.py:73-88). bii: [2N, ...]; returns [2N+1, ...]."""
    assert bii.shape[0] % 2 == 0
    N = bii.shape[0] // 2
    images = []
    for i in range(N):
        images.append(-bii[i:N].sum(axis=0))
    images.append(np.zeros_like(images[0]))
    for i in range(N):
        images.append(+bii[N:N + 1 + i].sum(axis=0))
    return np.stack(images, axis=0)


def deblur_double_integral(blurry, bii):
    """EDI deblur: sharp = (2N+1) * blurry / sum(exp(inner integrals))
    (ref: utils/edi.py:91-95)."""
    N = bii.shape[0] // 2
    images = inner_double_integral(bii)
    return (2 * N + 1) * blurry / np.exp(images).sum(axis=0)


def slowmo_double_integral(sharp, bii):
    """Re-blur a sharp frame to each sub-exposure instant
    (ref: utils/edi.py:98-104)."""
    images = inner_double_integral(bii)
    return [sharp * np.exp(im) for im in list(images)]
