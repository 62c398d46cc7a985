"""Grid completion, truncation and validation — jittable, fixed capacity.

Reproduces complete_grid (img2sgf.py:335-397), truncate_grid (:400-417) and
validate_grid (:420-445) over fixed-capacity sorted coordinate arrays
(padded with +inf) plus a count, so the whole grid solve stays inside the
jitted program and batches with vmap.

Key reference quirks preserved:
  - int(round(...)) is Python/numpy half-to-even -> jnp.round
  - "no big gaps" returns x unchanged even if longer than the board
  - the interpolation x[j-1] + (k+1)*s/m applies uniformly (for small
    spaces m=1 so it degenerates to copying the next line)
  - hspace divides by the line COUNT, not count-1 (:437-438)
"""

from __future__ import annotations

import jax.numpy as jnp

# rejection reason codes (diagnostics; mirror the reference's log messages)
OK = 0
NO_LINES = 1  # "No grid lines found at all!" (:340)
ONE_LINE = 2  # "Only found one grid line" (:344)
TOO_CLOSE = 3  # "Grid lines are too close together" (:351)
TOO_BIG = 4  # "Extra lines on diagram, or a grid line detected twice?" (:371)

_INF = jnp.float32(jnp.inf)


def complete_grid(x, n, board_size: int, min_grid_spacing: float,
                  big_space_ratio: float):
    """x: [M] ascending coords padded with +inf; n: valid count.

    Returns (y[M], ny, ok, reason, diag) where diag is a [4] f32 vector of
    narration diagnostics mirroring the reference's log script
    (img2sgf.py:335-397): [min_space, has_big, steps, grid_n] — the
    minimum line spacing, whether any gap exceeds the big-space bound,
    the edge-to-edge distance in units of average spacing (the reference's
    pre-increment `n`, :366-369), and the inferred full grid size
    (`n` after the +1, :378).
    """
    M = x.shape[0]
    idx = jnp.arange(M)
    space_valid = idx < jnp.maximum(n - 1, 0)
    nxt = jnp.concatenate([x[1:], jnp.full((1,), jnp.inf, x.dtype)])
    spaces = jnp.where(space_valid, nxt - x, jnp.inf)

    min_space = jnp.min(spaces)
    bound = min_space * big_space_ratio
    bigmask = space_valid & (spaces > bound)
    smallmask = space_valid & (spaces <= bound)
    has_big = jnp.any(bigmask)
    max_space = jnp.max(jnp.where(smallmask, spaces, -jnp.inf))
    average = (min_space + max_space) * 0.5

    m = jnp.where(
        bigmask, jnp.round(spaces / average), jnp.where(smallmask, 1.0, 0.0)
    ).astype(jnp.int32)
    steps = jnp.sum(m)
    ny_fill = steps + 1

    # fill: slot t>=1 belongs to space i(t) = first i with cumsum(m)[i] >= t
    cumM = jnp.cumsum(m)
    t = jnp.arange(M)
    i_of_t = jnp.searchsorted(cumM, t, side="left")
    i_of_t = jnp.clip(i_of_t, 0, M - 1)
    cum_excl = cumM - m
    k_of_t = t - 1 - cum_excl[i_of_t]
    s_t = spaces[i_of_t]
    m_t = jnp.maximum(m[i_of_t], 1).astype(x.dtype)
    y_fill = x[i_of_t] + (k_of_t + 1).astype(x.dtype) * s_t / m_t
    y_fill = jnp.where(t == 0, x[0], y_fill)
    y_fill = jnp.where(t < ny_fill, y_fill, _INF)

    # choose branch like the reference:
    #   no big gaps -> x unchanged; big gaps & len(x) < n -> filled; else x
    use_fill = has_big & (n < ny_fill)
    y = jnp.where(use_fill, y_fill, x)
    ny = jnp.where(use_fill, ny_fill, n)

    fail_reason = jnp.where(
        n == 0,
        NO_LINES,
        jnp.where(
            n == 1,
            ONE_LINE,
            jnp.where(
                min_space < min_grid_spacing,
                TOO_CLOSE,
                jnp.where(has_big & (steps > board_size + 2), TOO_BIG, OK),
            ),
        ),
    )
    ok = fail_reason == OK
    y = jnp.where(ok, y, _INF)
    ny = jnp.where(ok, ny, 0)
    diag = jnp.stack([
        min_space,
        has_big.astype(jnp.float32),
        steps.astype(jnp.float32),
        ny_fill.astype(jnp.float32),
    ]).astype(jnp.float32)
    return y, ny, ok, fail_reason, diag


def truncate_grid(x, n, board_size: int):
    """Drop 2 outer lines at board_size+2, or the last at board_size+1
    (img2sgf.py:400-417)."""
    M = x.shape[0]
    start = jnp.where(n == board_size + 2, 1, 0)
    newn = jnp.where(
        n == board_size + 2, n - 2, jnp.where(n == board_size + 1, n - 1, n)
    )
    idx = jnp.arange(M) + start
    y = x[jnp.clip(idx, 0, M - 1)]
    y = jnp.where(jnp.arange(M) < newn, y, _INF)
    return y, newn


def validate_axis(centres, count, board_size: int, min_grid_spacing: float,
                  big_space_ratio: float):
    """truncate -> complete -> truncate for one axis (img2sgf.py:422-430).

    Returns (x, n, ok, reason, diag); diag is a [6] f32 narration vector:
    complete_grid's [min_space, has_big, steps, grid_n] followed by
    [n_trunc1, n_complete] — the line counts after the first truncation
    and after completion (the values the reference's log messages quote).
    """
    x, n1 = truncate_grid(centres, count, board_size)
    x, n2, ok, reason, cdiag = complete_grid(
        x, n1, board_size, min_grid_spacing, big_space_ratio
    )
    x, n = truncate_grid(x, n2, board_size)
    diag = jnp.concatenate([
        cdiag,
        jnp.stack([n1.astype(jnp.float32), n2.astype(jnp.float32)]),
    ])
    return x, n, ok, reason, diag


def validate_grid(hcentres, hcount, vcentres, vcount, board_size: int,
                  min_grid_spacing: float, big_space_ratio: float):
    """Both axes + grid geometry (img2sgf.py:420-445).

    Returns dict with hc/vc complete arrays, vsize/hsize, hspace/vspace,
    valid flag and per-axis reason codes. Note the reference's naming:
    vsize = number of horizontal lines, hsize = number of vertical lines.
    """
    hc, hcn, hok, hreason, hdiag = validate_axis(
        hcentres, hcount, board_size, min_grid_spacing, big_space_ratio
    )
    vc, vcn, vok, vreason, vdiag = validate_axis(
        vcentres, vcount, board_size, min_grid_spacing, big_space_ratio
    )
    valid = hok & vok
    vsize = jnp.where(valid, hcn, 0)
    hsize = jnp.where(valid, vcn, 0)
    last_h = hc[jnp.clip(hcn - 1, 0, hc.shape[0] - 1)]
    last_v = vc[jnp.clip(vcn - 1, 0, vc.shape[0] - 1)]
    hspace = jnp.where(valid, (last_h - hc[0]) / jnp.maximum(vsize, 1), 0.0)
    vspace = jnp.where(valid, (last_v - vc[0]) / jnp.maximum(hsize, 1), 0.0)
    return {
        "valid": valid,
        "hreason": hreason,
        "vreason": vreason,
        "hdiag": hdiag,
        "vdiag": vdiag,
        "hcentres_complete": hc,
        "vcentres_complete": vc,
        "vsize": vsize,
        "hsize": hsize,
        "hspace": hspace,
        "vspace": vspace,
    }
