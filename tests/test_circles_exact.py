"""exact_rescore must reproduce OpenCV's vote walk bit-exactly.

Brute-force reference: for every edge pixel, walk both directions at all
radii with the 10-bit fixed-point steps and count landings per patch cell.
"""

import numpy as np

import jax.numpy as jnp

from img2sgf_tpu.hough.circles import exact_rescore


def _brute(emask, sx, sy, cy, cx, min_r, max_r):
    H, W = emask.shape
    score = np.zeros((3, 3))
    reach = max_r + 6
    for py in range(max(0, cy - reach), min(H, cy + reach + 1)):
        for px in range(max(0, cx - reach), min(W, cx + reach + 1)):
            if not emask[py, px]:
                continue
            for sign in (1, -1):
                for r in range(min_r, max_r + 1):
                    ly = py + ((r * sign * sy[py, px]) >> 10)
                    lx = px + ((r * sign * sx[py, px]) >> 10)
                    if -1 <= ly - cy <= 1 and -1 <= lx - cx <= 1:
                        score[ly - cy + 1, lx - cx + 1] += 1
    return score


def test_exact_rescore_matches_brute_force_walk():
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
        jnp.asarray(ys), jnp.asarray(xs), 1, 30, 3,
    )
    got = np.asarray(patch)
    for i in range(12):
        want = _brute(emask, sx, sy, int(ys[i]), int(xs[i]), 1, 30)
        np.testing.assert_array_equal(got[i], want, err_msg=f"candidate {i}")


def test_pallas_rescore_matches_xla(monkeypatch):
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
            jnp.asarray(ys), jnp.asarray(xs), 1, 30, 3,
            valid=jnp.asarray(valid),
        )[0]
    )
    got = np.asarray(
        exact_rescore_pallas(
            jnp.asarray(emask), jnp.asarray(sx), jnp.asarray(sy),
            jnp.asarray(ys), jnp.asarray(xs), 1, 30,
            valid=jnp.asarray(valid), chunk=8, interpret=True,
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
