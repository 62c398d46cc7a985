"""exact_rescore must reproduce OpenCV's vote walk bit-exactly.

Brute-force reference: for every edge pixel, walk both directions at all
radii with the 10-bit fixed-point steps and count landings per patch cell.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from img2sgf_tpu.hough.circles import exact_rescore


def _brute(emask, sx, sy, cy, cx, min_r, max_r, cells=3):
    H, W = emask.shape
    reach = cells // 2
    score = np.zeros((cells, cells))
    far = max_r + 7
    for py in range(max(0, cy - far), min(H, cy + far + 1)):
        for px in range(max(0, cx - far), min(W, cx + far + 1)):
            if not emask[py, px]:
                continue
            for sign in (1, -1):
                for r in range(min_r, max_r + 1):
                    ly = py + ((r * sign * sy[py, px]) >> 10)
                    lx = px + ((r * sign * sx[py, px]) >> 10)
                    if -reach <= ly - cy <= reach and -reach <= lx - cx <= reach:
                        score[ly - cy + reach, lx - cx + reach] += 1
    return score


@pytest.mark.parametrize("cells", [3, 5])
def test_exact_rescore_matches_brute_force_walk(cells):
    rng = np.random.default_rng(7)
    H = W = 96
    emask = rng.random((H, W)) < 0.10
    ang = rng.uniform(0, 2 * np.pi, (H, W))
    sx = (np.rint(1024 * np.cos(ang)).astype(np.int32)) * emask
    sy = (np.rint(1024 * np.sin(ang)).astype(np.int32)) * emask
    ys = rng.integers(5, H - 5, 12)
    xs = rng.integers(5, W - 5, 12)
    patch, _r, _s = exact_rescore(
        jnp.asarray(emask), jnp.asarray(sx), jnp.asarray(sy),
        jnp.asarray(ys), jnp.asarray(xs), 1, 30, cells,
        with_radius=False,
    )
    got = np.asarray(patch)
    for i in range(12):
        want = _brute(emask, sx, sy, int(ys[i]), int(xs[i]), 1, 30, cells)
        np.testing.assert_array_equal(got[i], want, err_msg=f"candidate {i}")


@pytest.mark.parametrize("cells", [3, 5])
def test_pallas_rescore_matches_xla(cells):
    """Interpret-mode Pallas rescore == XLA exact_rescore, bit for bit."""
    from img2sgf_tpu.hough.rescore_pallas import exact_rescore_pallas

    rng = np.random.default_rng(11)
    H = W = 96
    K = 32
    emask = rng.random((H, W)) < 0.10
    ang = rng.uniform(0, 2 * np.pi, (H, W))
    sx = (np.rint(1024 * np.cos(ang)).astype(np.int32)) * emask
    sy = (np.rint(1024 * np.sin(ang)).astype(np.int32)) * emask
    ys = rng.integers(0, H, K)  # include border candidates
    xs = rng.integers(0, W, K)
    valid = np.ones(K, bool)
    valid[-7:] = False  # prefix-valid with dead tail

    want = np.asarray(
        exact_rescore(
            jnp.asarray(emask), jnp.asarray(sx), jnp.asarray(sy),
            jnp.asarray(ys), jnp.asarray(xs), 1, 30, cells,
            valid=jnp.asarray(valid), with_radius=False,
        )[0]
    )
    got = np.asarray(
        exact_rescore_pallas(
            jnp.asarray(emask), jnp.asarray(sx), jnp.asarray(sy),
            jnp.asarray(ys), jnp.asarray(xs), 1, 30,
            valid=jnp.asarray(valid), chunk=8, cells=cells, interpret=True,
        )
    )
    np.testing.assert_array_equal(got[valid], want[valid])


def test_pallas_cascade_matches_xla():
    """Interpret-mode Pallas cascade == XLA cascade accumulator, bit for bit."""
    from img2sgf_tpu.hough.cascade_pallas import vote_accumulator_cascade_pallas
    from img2sgf_tpu.hough.circles import vote_accumulator_cascade

    rng = np.random.default_rng(3)
    H, W = 96, 128
    emask = rng.random((H, W)) < 0.10
    dx = rng.integers(-255, 256, (H, W)).astype(np.int32)
    dy = rng.integers(-255, 256, (H, W)).astype(np.int32)
    want = np.asarray(vote_accumulator_cascade(
        jnp.asarray(emask), jnp.asarray(dx), jnp.asarray(dy), 64, 1, 30))
    got = np.asarray(vote_accumulator_cascade_pallas(
        jnp.asarray(emask), jnp.asarray(dx), jnp.asarray(dy), 64, 1, 30,
        interpret=True))
    np.testing.assert_array_equal(got, want)


def test_radius_pool_matches_fused_estimate():
    """radius_support_pool at the recentred position == exact_rescore's
    fused 9-cell radius estimate selected at the best cell (the pooled
    stage replaced the fused one; both use _radius_tables and distances
    measured from centre+0.5, so values must be identical)."""
    from img2sgf_tpu.hough.circles import exact_rescore, radius_support_pool

    rng = np.random.default_rng(5)
    H = W = 128
    K = 24
    emask = rng.random((H, W)) < 0.12
    ang = rng.uniform(0, 2 * np.pi, (H, W))
    sx = (np.rint(1024 * np.cos(ang)).astype(np.int32)) * emask
    sy = (np.rint(1024 * np.sin(ang)).astype(np.int32)) * emask
    ys = rng.integers(34, H - 34, K)
    xs = rng.integers(34, W - 34, K)

    patch, r9, s9 = exact_rescore(
        jnp.asarray(emask), jnp.asarray(sx), jnp.asarray(sy),
        jnp.asarray(ys), jnp.asarray(xs), 1, 30, 3, with_radius=True,
    )
    flat = np.asarray(patch).reshape(K, 9)
    best = flat.argmax(axis=1)
    want_r = np.asarray(r9)[np.arange(K), best]
    want_s = np.asarray(s9)[np.arange(K), best]

    ys_c = ys + best // 3 - 1
    xs_c = xs + best % 3 - 1
    got_r, got_s = radius_support_pool(
        jnp.asarray(emask)[None], jnp.asarray(ys_c)[None],
        jnp.asarray(xs_c)[None], jnp.ones((1, K), bool), 1, 30, chunk=8,
    )
    np.testing.assert_allclose(np.asarray(got_r)[0], want_r, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_s)[0], want_s)


def test_paired_topk_matches_direct():
    """centre_candidates' paired top_k (even W) must be bit-identical to a
    direct lax.top_k over the masked score plane, including tie order."""
    import jax

    from img2sgf_tpu.hough.circles import centre_candidates

    rng = np.random.default_rng(3)
    H, W, K = 64, 128, 64
    # small integer votes force many ties
    acc = jnp.asarray(rng.integers(0, 6, (H, W)).astype(np.float32))

    ys, xs, votes, valid = jax.jit(
        lambda a: centre_candidates(a, 1.0, K)
    )(acc)

    # direct reference: same NMS mask, plain top_k
    from img2sgf_tpu.ops.common import shift2d

    left = shift2d(acc, 0, 1)
    right = shift2d(acc, 0, -1)
    up = shift2d(acc, 1, 0)
    down = shift2d(acc, -1, 0)
    ys_i, xs_i = np.mgrid[0:H, 0:W]
    interior = (ys_i >= 1) & (ys_i <= H - 2) & (xs_i >= 1) & (xs_i <= W - 2)
    is_max = (
        (np.asarray(acc) > 1.0)
        & (np.asarray(acc) > np.asarray(left))
        & (np.asarray(acc) >= np.asarray(right))
        & (np.asarray(acc) > np.asarray(up))
        & (np.asarray(acc) >= np.asarray(down))
        & interior
    )
    score = np.where(is_max, np.asarray(acc), -1.0).ravel()
    want_votes, want_flat = jax.lax.top_k(jnp.asarray(score), K)
    np.testing.assert_array_equal(np.asarray(votes), np.asarray(want_votes))
    flat = np.asarray(ys) * W + np.asarray(xs)
    np.testing.assert_array_equal(
        flat[np.asarray(valid)], np.asarray(want_flat)[np.asarray(want_votes) > 0]
    )


def test_recentre_5x5_true_nms_semantics():
    """circle_recentre on a 5x5 patch == plain-numpy OpenCV NMS over the
    central 3x3: a cell is a centre iff votes > threshold, > left,
    >= right, > up, >= down (all four neighbours known in-patch) and the
    cell lies in the accumulator interior [1, h-2] x [1, w-2]; the
    highest-voted passing cell wins, ties to the smaller y-major index."""
    import jax

    from img2sgf_tpu.hough.circles import circle_recentre

    rng = np.random.default_rng(9)
    K, H, W = 256, 100, 120
    thr = 5.0
    # small integer votes force plateaus and NMS tie cases
    patch = rng.integers(0, 12, (K, 5, 5)).astype(np.float32)
    ys = rng.integers(0, H, K).astype(np.int32)
    xs = rng.integers(0, W, K).astype(np.int32)
    valid = rng.random(K) < 0.9

    got_y, got_x, got_v, got_ok = jax.jit(
        lambda p, y, x, v: circle_recentre(p, y, x, v, thr, H, W)
    )(jnp.asarray(patch), jnp.asarray(ys), jnp.asarray(xs),
      jnp.asarray(valid))

    ref = {}
    for i in range(K):
        best = None
        for py in (1, 2, 3):
            for px in (1, 2, 3):
                v = patch[i, py, px]
                cy, cx = ys[i] + py - 2, xs[i] + px - 2
                if not (1 <= cy <= H - 2 and 1 <= cx <= W - 2):
                    continue
                if not (
                    v > thr
                    and v > patch[i, py, px - 1]
                    and v >= patch[i, py, px + 1]
                    and v > patch[i, py - 1, px]
                    and v >= patch[i, py + 1, px]
                ):
                    continue
                if best is None or v > best[0]:
                    best = (v, cy, cx)
        ref[i] = best if valid[i] else None

    got = {
        (int(y), int(x)): (float(v), bool(ok))
        for y, x, v, ok in zip(
            np.asarray(got_y), np.asarray(got_x),
            np.asarray(got_v), np.asarray(got_ok),
        )
    }
    # the function sorts its outputs; compare per-candidate by re-running
    # unsorted semantics: count accepted and match the accepted set
    want_accepted = sorted(
        (b[1], b[2], b[0]) for b in ref.values() if b is not None
    )
    got_accepted = sorted(
        (int(y), int(x), float(v))
        for y, x, v, ok in zip(
            np.asarray(got_y), np.asarray(got_x),
            np.asarray(got_v), np.asarray(got_ok),
        )
        if ok
    )
    assert got_accepted == want_accepted
