"""Colour-space and enhancement ops with PIL/OpenCV bit parity.

The reference preprocesses with PIL ImageEnhance (img2sgf.py:142-149) and
converts to grey with cv.cvtColor(..., COLOR_BGR2GRAY) applied to RGB data
(img2sgf.py:153) — a channel-swap quirk we reproduce deliberately.
"""

from __future__ import annotations

import jax.numpy as jnp


def pil_luma(rgb_u8):
    """PIL convert('L') luma: (R*19595 + G*38470 + B*7471 + 32768) >> 16."""
    x = rgb_u8.astype(jnp.uint32)
    return (x[..., 0] * 19595 + x[..., 1] * 38470 + x[..., 2] * 7471 + 32768) >> 16


def grey_bgr_quirk(rgb_u8):
    """cv.cvtColor(BGR2GRAY) applied to an RGB array, as the reference does.

    OpenCV 5.x fixed point (verified exhaustively against cv2 5.0):
    (B*3735 + G*19235 + R*9798 + 16384) >> 15, where OpenCV reads channel 0
    as B. On RGB data channel 0 is really R, so effective weights are
    swapped (img2sgf.py:153). Output uint8 [H, W].
    """
    x = rgb_u8.astype(jnp.uint32)
    g = (x[..., 0] * 3735 + x[..., 1] * 19235 + x[..., 2] * 9798 + 16384) >> 15
    return g.astype(jnp.uint8)


def _pil_blend_trunc(degenerate_f, img_f, alpha):
    """PIL Image.blend semantics: out = in1 + alpha*(in2-in1), clipped to
    [0, 255] then truncated toward zero (Pillow Blend.c casts to UINT8)."""
    out = degenerate_f + alpha * (img_f - degenerate_f)
    out = jnp.clip(out, 0.0, 255.0)
    return jnp.floor(out).astype(jnp.uint8)


def enhance_contrast(rgb_u8, contrast: float, hw=None):
    """PIL ImageEnhance.Contrast with the reference's slider remap.

    scaled = 102/(101-contrast) - 1 (img2sgf.py:142-144); the degenerate
    image is a solid grey at int(mean(L) + 0.5). hw=(h, w): content dims
    inside a fixed canvas — the mean is taken over the content block only
    (padding would shift PIL's pivot grey).
    """
    alpha = 102.0 / (101.0 - contrast) - 1.0
    luma = pil_luma(rgb_u8)
    # exact integer sum (fits uint32 up to ~16 MPix); the f32 division is
    # accurate to ~2.5e-5 in [0,255], which only matters on exact .5 ties
    if hw is None:
        total = jnp.sum(luma, dtype=jnp.uint32)
        count = jnp.uint32(luma.size)
    else:
        from .common import region_mask

        total = jnp.sum(luma * region_mask(luma.shape, hw[0], hw[1], jnp.uint32),
                        dtype=jnp.uint32)
        count = jnp.asarray(hw[0] * hw[1], jnp.uint32)
    mean = jnp.floor(total.astype(jnp.float32) / count.astype(jnp.float32) + 0.5)
    return _pil_blend_trunc(mean, rgb_u8.astype(jnp.float32), alpha)


def enhance_brightness(rgb_u8, brightness: float):
    """PIL ImageEnhance.Brightness with the reference's slider remap.

    scaled = 450/(200-brightness) - 2 (img2sgf.py:146-149); degenerate image
    is black.
    """
    alpha = 450.0 / (200.0 - brightness) - 2.0
    return _pil_blend_trunc(0.0, rgb_u8.astype(jnp.float32), alpha)


def preprocess(rgb_u8, contrast: float, brightness: float, hw=None):
    """Contrast then brightness enhancement (img2sgf.py:142-150)."""
    out = enhance_contrast(rgb_u8, contrast, hw=hw)
    return enhance_brightness(out, brightness)
