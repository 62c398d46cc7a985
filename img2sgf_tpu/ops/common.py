"""Shared small helpers for image ops (shifts, padding, windows)."""

from __future__ import annotations

import jax.numpy as jnp


def shift2d(x, dy: int, dx: int, fill=0):
    """Shift a [..., H, W] array by (dy, dx), filling vacated cells.

    shift2d(x, 1, 0)[y] == x[y-1]: contents move DOWN/RIGHT for positive
    offsets, i.e. out[y, x] = in[y-dy, x-dx].
    """
    H, W = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(dy, 0), max(-dy, 0)),
        (max(dx, 0), max(-dx, 0)),
    ]
    xp = jnp.pad(x, pad, constant_values=fill)
    ys = slice(max(-dy, 0), max(-dy, 0) + H)
    xs = slice(max(-dx, 0), max(-dx, 0) + W)
    return xp[..., ys, xs]


def pad_replicate(x, n: int):
    """Replicate-pad the trailing two dims by n (OpenCV BORDER_REPLICATE)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(n, n), (n, n)]
    return jnp.pad(x, pad, mode="edge")


def pad_reflect101(x, n: int):
    """Reflect-101 pad (OpenCV BORDER_REFLECT_101 / BORDER_DEFAULT)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(n, n), (n, n)]
    return jnp.pad(x, pad, mode="reflect")


def dilate8(x):
    """3x3 max-pool (8-neighbourhood dilation) on [..., H, W]."""
    out = x
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            out = jnp.maximum(out, shift2d(x, dy, dx))
    return out
