"""Gaussian and median blurs matching cv.GaussianBlur / cv.medianBlur.

The reference builds a blur pyramid for circle detection: median and
Gaussian blur at k = 1, 3, 5, 7 with sigma = k (img2sgf.py:169-175).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .common import border_remap, pad_reflect101, pad_replicate


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """cv.getGaussianKernel(ksize, sigma) (double path)."""
    if ksize == 1:
        return np.array([1.0])
    half = (ksize - 1) * 0.5
    xs = np.arange(ksize) - half
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_kernel_fixed(ksize: int, sigma: float) -> np.ndarray:
    """OpenCV's bit-exact Q8.8 kernel for 8U images.

    Coefficients are floor(k*256) with the remainder to 256 distributed by
    largest fractional part (verified bit-exact vs cv2 5.0 for k=3,5,7,
    sigma=k — the reference's pyramid, img2sgf.py:175).
    """
    kern = gaussian_kernel1d(ksize, sigma)
    scaled = kern * 256.0
    base = np.floor(scaled).astype(np.int64)
    frac = scaled - base
    rem = int(256 - base.sum())
    for i in np.argsort(-frac, kind="stable")[:rem]:
        base[i] += 1
    return base


def gaussian_blur(img_u8, ksize: int, sigma: float, hw=None):
    """Separable Gaussian on uint8 [..., H, W], BORDER_REFLECT_101,
    bit-exact vs cv.GaussianBlur on 8U (integer Q8.8 kernel, full-precision
    accumulation, final (x + 2^15) >> 16 rounding).

    hw=(h, w): content dims inside a fixed canvas (shape-bucketed mode);
    the border band is rewritten so content results equal native-size ones.
    """
    if ksize == 1:
        return img_u8
    if hw is not None:
        img_u8 = border_remap(img_u8, hw[0], hw[1], "reflect101")
    kq = gaussian_kernel_fixed(ksize, sigma)
    r = ksize // 2
    x = pad_reflect101(img_u8.astype(jnp.int32), r)
    H, W = img_u8.shape[-2], img_u8.shape[-1]
    # rows (keep the vertical padding for the column pass)
    acc = jnp.zeros_like(x[..., :, r : r + W])
    for i in range(ksize):
        acc = acc + int(kq[i]) * x[..., :, i : i + W]
    out = jnp.zeros_like(acc[..., r : r + H, :])
    for i in range(ksize):
        out = out + int(kq[i]) * acc[..., i : i + H, :]
    return ((out + (1 << 15)) >> 16).astype(jnp.uint8)


def median_blur(img_u8, ksize: int, hw=None):
    """Exact median filter on uint8 [..., H, W], BORDER_REPLICATE.

    Implementation: stack the k*k shifted window planes on a leading axis
    and sort along it (XLA lowers this to a vectorized sorting network over
    full planes — each lane sorts its own pixel's window). Median = middle
    plane. Capacity: k in {1, 3, 5, 7} like the reference pyramid.
    """
    if ksize == 1:
        return img_u8
    if hw is not None:
        img_u8 = border_remap(img_u8, hw[0], hw[1], "replicate")
    r = ksize // 2
    x = pad_replicate(img_u8, r)
    H, W = img_u8.shape[-2], img_u8.shape[-1]
    planes = [
        x[..., dy : dy + H, dx : dx + W]
        for dy in range(ksize)
        for dx in range(ksize)
    ]
    stack = jnp.stack(planes, axis=0)
    med = jnp.sort(stack, axis=0)[(ksize * ksize) // 2]
    return med


def blur_pyramid(grey_u8, edges_u8, maxblur: int = 3, hw=None):
    """The reference's 2 + 2*(maxblur+1) circle-detection variants
    (img2sgf.py:171-175): [grey, edges, median_1, gauss_1, median_3,
    gauss_3, ...]. Returns a [V, H, W] uint8 stack."""
    variants = [grey_u8, edges_u8]
    for i in range(maxblur + 1):
        b = 2 * i + 1
        variants.append(median_blur(grey_u8, b, hw=hw))
        variants.append(gaussian_blur(grey_u8, b, float(b), hw=hw))
    return jnp.stack(variants, axis=0)
