"""Canny hysteresis as a Pallas TPU kernel.

The XLA implementation sweeps (segmented scans + dilation) over HBM every
iteration; this kernel keeps the whole image resident in VMEM and iterates
to convergence on-chip — each sweep touches a few MB of VMEM instead of
~1 GB of HBM at batch scale.

Algorithm per sweep (identical semantics to ops.canny.hysteresis):
  1. forward then backward segmented OR-fill along lanes (logarithmic
     doubling: A' = A | (G & roll(A, k)), G' = G & roll(G, k))
  2. the same along sublanes
  3. 3x3 dilation gated by the candidate mask
Early-exits when a sweep changes nothing; `iters` bounds the worst case.

VMEM note: data stays int32 (Mosaic's rotate only supports 32-bit lanes);
the fill runs forward and backward sequentially rather than interleaved to
keep the live set ~8 planes, under the 16 MB scoped limit for <=0.6 MPix.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _masked_roll(x, idx, k: int, size: int, axis: int):
    """Shift by +k along axis (toward higher indices), zero-filled.
    pltpu.roll wraps and requires k >= 0, so negative shifts use the
    cyclic complement and the wrapped region is masked via the
    precomputed index plane."""
    rolled = pltpu.roll(x, k if k >= 0 else size + k, axis=axis)
    if k >= 0:
        return jnp.where(idx >= k, rolled, 0)
    return jnp.where(idx < size + k, rolled, 0)


def _fill_dir(act, gate, idx, size: int, axis: int, forward: bool):
    a, g = act, gate
    k = 1
    for _ in range(max(1, math.ceil(math.log2(size)))):
        kk = k if forward else -k
        a = a | (g & _masked_roll(a, idx, kk, size, axis))
        g = g & _masked_roll(g, idx, kk, size, axis)
        k *= 2
    return a


def _kernel(iters: int, H: int, W: int):
    def kern(strong_ref, cand_ref, out_ref):
        gate = cand_ref[:]
        act0 = strong_ref[:] & gate
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

        def fill_axis(act, idx, size, axis):
            fwd = _fill_dir(act, gate, idx, size, axis, True)
            bwd = _fill_dir(act, gate, idx, size, axis, False)
            return (fwd | bwd) & gate

        def cond(state):
            i, _, changed = state
            return jnp.logical_and(i < iters, changed)

        def body(state):
            i, act, _ = state
            new = fill_axis(act, col_idx, W, 1)
            new = fill_axis(new, row_idx, H, 0)
            dil = new
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    t = _masked_roll(new, row_idx, dy, H, 0)
                    t = _masked_roll(t, col_idx, dx, W, 1)
                    dil = dil | t
            new = (dil & gate) | new
            changed = jnp.any(new != act)
            return i + 1, new, changed

        _, act, _ = jax.lax.while_loop(cond, body, (0, act0, jnp.bool_(True)))
        out_ref[:] = act

    return kern


def hysteresis_pallas(strong, cand, iters: int):
    """strong, cand: [H, W] bool. Returns bool [H, W]."""
    s = strong.astype(jnp.int32)
    c = cand.astype(jnp.int32)
    return _call_kernel(s, c, iters).astype(jnp.bool_)


def _call_kernel(s, c, iters: int):
    H, W = s.shape
    return pl.pallas_call(
        _kernel(iters, H, W),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(s, c)


def hysteresis_pallas_packed(edge0_u32, gate_u32, iters: int):
    """The same in-VMEM fixed-point loop on BIT-PACKED uint32 planes
    (32 independent images per element, ops.canny.hysteresis_pool's
    packing). Every kernel operation — masked rolls, &, |, the
    convergence compare — is bitwise, so the identical kernel body runs
    all 32 bit-lanes in parallel; with the whole loop resident in VMEM
    a sweep costs ~0.1 ms instead of ~4 ms of dispatch-bound HBM passes
    (measured v5e at 1280^2: the ex15/16 photo-textured scans need
    ~250 sweeps — diagonal runs propagate one dilation hop per sweep —
    which the XLA while_loop paid 1.0 s for, ~60x this kernel).

    edge0/gate: [G, H, W] uint32. Returns [G, H, W] uint32.
    """
    s = edge0_u32.astype(jnp.int32)
    c = gate_u32.astype(jnp.int32)
    if s.ndim == 2:
        return _call_kernel(s, c, iters).astype(jnp.uint32)
    # static Python unroll over the (small) packed-group axis: lax.map's
    # scan does NOT carry the pallas_call's vmem_limit compiler params
    # through its body (observed: scoped-vmem OOM at 768^2 with G=2)
    return jnp.stack([
        _call_kernel(s[i], c[i], iters) for i in range(s.shape[0])
    ]).astype(jnp.uint32)
