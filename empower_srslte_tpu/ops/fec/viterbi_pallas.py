"""Pallas TPU Viterbi kernel (K=7 tail-biting, rate 1/3).

The XLA-scan Viterbi (convcoder.viterbi_decode) is bounded by per-op
runtime overhead: ~21 us per trellis step regardless of dtype, unroll or
register count (measured — a 135-step blind-search call is ~2.9 ms at
batch 4608). This kernel runs the whole trellis VMEM-resident, so each
step is ~650 single-cycle vreg ops instead of ~28 dispatched XLA ops.

Same playbook as the turbo NII kernel (turbo_decoder_pallas2.py):

* **State-unrolled**: the 64 trellis states are 64 Python variables of
  one (sub, lanes) tile each, so the butterfly wiring
  (s' = u<<5 | s>>1) is variable renaming — zero shuffle/gather ops.
* **Batch-folded**: each tile is (8, 128) = 1024 batch elements; the
  grid walks batch tiles.
* **Register-exchange survivors** in ceil(K/32) int32 tiles per state,
  selected between two statically-renamed predecessors per step.
* **Three segments** (mirrors the three-segment scan): the circular
  training halo updates metrics only, the middle K steps run full ACS +
  register exchange, the flush halo selects survivors without shifting.
  Registers never influence metrics, so decisions equal the scan path's.
* Renormalization subtracts state 0's metric each step (subtracting one
  common value preserves every comparison; cheaper than a 64-way max
  tree and keeps f32 magnitudes bounded by the path-metric spread).

The winning state's registers are selected in-kernel (64-way
compare-select chain on the final metrics); bit unpacking to [B, K] is
three XLA ops on the host side of the call.

Reference analog: viterbi37_sse.c keeps metrics in SSE registers over
the whole trellis; this is the same idea at (8, 128)-tile width.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .convcoder import TRAIN_LEN, _tables


@functools.lru_cache(maxsize=64)
def _vit_kernel(halo: int, k: int, n_regs: int, sub: int, lanes: int):
    ns, out, ps, pu, pout = _tables()
    ps0 = ps[:, 0]
    ps1 = ps[:, 1]
    i0 = (pout[:, 0, 0].astype(np.int32) << 2) | \
        (pout[:, 0, 1].astype(np.int32) << 1) | pout[:, 0, 2]
    i1 = (pout[:, 1, 0].astype(np.int32) << 2) | \
        (pout[:, 1, 1].astype(np.int32) << 1) | pout[:, 1, 2]

    def kernel(llr_ref, regs_ref):
        # llr_ref  [halo + k + halo, 3, sub, lanes] f32
        # regs_ref [n_regs, sub, lanes] int32 (winner's survivor bits)

        def comb_of(t):
            l0 = llr_ref[t, 0]
            l1 = llr_ref[t, 1]
            l2 = llr_ref[t, 2]
            p01, m01 = l0 + l1, l0 - l1
            half = jnp.float32(0.5)
            c = [(p01 + l2) * half, (p01 - l2) * half,
                 (m01 + l2) * half, (m01 - l2) * half]
            return c + [-c[3], -c[2], -c[1], -c[0]]

        def metric_step(m, t):
            comb = comb_of(t)
            best, new = [], []
            for s in range(64):
                c0 = m[ps0[s]] + comb[i0[s]]
                c1 = m[ps1[s]] + comb[i1[s]]
                b = c1 > c0
                best.append(b)
                new.append(jnp.where(b, c1, c0))
            m0 = new[0]
            return [v - m0 for v in new], best

        zero = jnp.zeros((sub, lanes), jnp.float32)
        m0 = tuple(zero for _ in range(64))

        # ---- segment 1: circular training halo, metrics only ----------
        def train_body(t, m):
            new, _ = metric_step(list(m), t)
            return tuple(new)

        m1 = jax.lax.fori_loop(0, halo, train_body, m0)

        # ---- segment 2: middle K steps, full ACS + register exchange --
        zregs = jnp.zeros((sub, lanes), jnp.int32)
        regs0 = tuple(tuple(zregs for _ in range(64))
                      for _ in range(n_regs))
        one = jnp.int32(1)

        def mid_body(t, carry):
            m, regs = carry
            new, best = metric_step(list(m), t + halo)
            sel = [[jnp.where(best[s], regs[r][ps1[s]], regs[r][ps0[s]])
                    for s in range(64)] for r in range(n_regs)]
            outr = []
            for r in range(n_regs):
                row = []
                for s in range(64):
                    v = sel[r][s] << 1
                    if r == 0:
                        if pu[s]:
                            v = v | one
                    else:
                        v = v | ((sel[r - 1][s] >> 31) & one)
                    row.append(v)
                outr.append(tuple(row))
            return (tuple(new), tuple(outr))

        m2, regs2 = jax.lax.fori_loop(0, k, mid_body, (m1, regs0))

        # ---- segment 3: flush halo — select survivors, no shifting ----
        def flush_body(t, carry):
            m, regs = carry
            new, best = metric_step(list(m), t + halo + k)
            sel = tuple(
                tuple(jnp.where(best[s], regs[r][ps1[s]], regs[r][ps0[s]])
                      for s in range(64))
                for r in range(n_regs))
            return (tuple(new), sel)

        m3, regs3 = jax.lax.fori_loop(0, halo, flush_body, (m2, regs2))

        # ---- winner: 64-way compare-select on the final metrics -------
        best_m = m3[0]
        best_r = [regs3[r][0] for r in range(n_regs)]
        for s in range(1, 64):
            upd = m3[s] > best_m
            best_m = jnp.where(upd, m3[s], best_m)
            for r in range(n_regs):
                best_r[r] = jnp.where(upd, regs3[r][s], best_r[r])
        for r in range(n_regs):
            regs_ref[r] = best_r[r]

    return kernel


def viterbi_regs_pallas(llr_tiles, halo: int, k: int, n_regs: int,
                        interpret: bool = False):
    """llr_tiles [T, halo+k+halo, 3, sub, lanes] -> winner registers
    [T, n_regs, sub, lanes] int32 (middle-copy decision t at bit
    position k-1-t)."""
    t_tiles, steps, three, sub, lanes = llr_tiles.shape
    assert steps == 2 * halo + k and three == 3
    kernel = _vit_kernel(halo, k, n_regs, sub, lanes)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_tiles, n_regs, sub, lanes),
                                       jnp.int32),
        grid=(t_tiles,),
        in_specs=[pl.BlockSpec((None, steps, 3, sub, lanes),
                               lambda t: (t, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((None, n_regs, sub, lanes),
                               lambda t: (t, 0, 0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=650 * steps * sub * lanes * t_tiles,
            bytes_accessed=4 * steps * 3 * sub * lanes * t_tiles,
            transcendentals=0),
        interpret=interpret,
    )(llr_tiles)


def viterbi_decode_pallas(llr, train: int = TRAIN_LEN,
                          interpret: bool = False, sub: int = 8,
                          lanes: int = 128):
    """Drop-in for convcoder.viterbi_decode on the TPU backend.

    llr [..., 3, K] -> bits [..., K]. Pads the flattened batch to a
    multiple of sub*lanes (pad rows decode garbage and are dropped).
    """
    *lead, three, k = llr.shape
    b = int(np.prod(lead)) if lead else 1
    # train=None means an untruncated circular pass (wrap=1 full copy)
    halo = k if train is None else min(train, k)
    x = jnp.moveaxis(llr.reshape(b, 3, k).astype(jnp.float32), -1, 0)
    x = jnp.concatenate([x[-halo:], x, x[:halo]], axis=0)  # [steps, B, 3]
    steps = 2 * halo + k

    tile = sub * lanes
    bp = -(-b // tile) * tile
    if bp != b:
        x = jnp.pad(x, ((0, 0), (0, bp - b), (0, 0)))
    t_tiles = bp // tile
    xt = x.transpose(0, 2, 1).reshape(steps, 3, t_tiles, sub, lanes)
    xt = xt.transpose(2, 0, 1, 3, 4)        # [T, steps, 3, sub, lanes]

    n_regs = (k - 1) // 32 + 1
    regs = viterbi_regs_pallas(xt, halo, k, n_regs, interpret=interpret)
    regs = regs.transpose(1, 0, 2, 3).reshape(n_regs, bp)[:, :b]  # [R, B]

    # unpack: decision t sits at position k-1-t of the packed registers
    pos = (k - 1 - np.arange(k)).astype(np.int32)
    rsel = jnp.asarray(pos // 32)
    shift = jnp.asarray(pos % 32)
    words = jnp.take(regs, rsel, axis=0)                   # [k, B]
    bits = ((words >> shift[:, None]) & 1).astype(jnp.int8)
    return jnp.moveaxis(bits, 0, -1).reshape(*lead, k)
