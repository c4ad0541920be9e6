"""Pallas TPU turbo MAP kernel, v2: NII windows + fused extrinsics.

Second-generation constituent decoder behind ops/fec/turbo_decoder.py
(v1 = turbo_decoder_pallas.py, kept for the overlap-trained variant).
Three structural changes over v1, each measured on-chip:

* **Batch-tile-major layout** ``[T, K, 8, lanes]``: every program's block
  is contiguous in HBM, so inputs stream through the standard BlockSpec
  double-buffering pipeline (v1's flat ``[rows, 8, B]`` layout forced
  manual strided DMAs that collapsed throughput for B > 8*lanes).
* **Next-iteration initialization (NII)** instead of overlap training:
  each window's starting alpha/beta come from the neighbouring windows'
  boundary metrics of the *previous* half-iteration of the same
  constituent, carried in small ``[T, W+1, 8, 8, lanes]`` arrays. This
  removes the reference's 40-step-per-window training sweeps
  (turbodecoder_win.h:58,92 win_overlap_len) — a 1.31x cut in trellis
  steps — at equal decoded quality after the usual iteration count
  (boundaries start uniform on iteration 1 and are exact thereafter).
* **Fused extrinsic emission**: the kernel consumes raw unhalved
  ``systematic + a-priori`` rows and emits ``ext = llr - input`` directly,
  so the host-side XLA glue per half-iteration collapses to a single
  fused add+gather (QPP (de)interleave) instead of scale/pad/concat/
  subtract passes over the full LLR arrays.

Tail handling: only the last window's beta needs the 3 termination
steps; they run inside that program from the exact terminated state
using small replicated tail-row inputs, so payload arrays stay unpadded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .turbo_encoder import trellis

NEG = -1e30


@functools.lru_cache(maxsize=1)
def _wiring():
    t = trellis()
    return (t.next_state, t.parity, t.prev_state, t.prev_parity)


def _nii_kernel(l: int, w_count: int, lanes: int, group: int, dtype):
    """Kernel body over grid (T, W).

    Block refs (squeezed leading dims):
      u_ref, p_ref     [l, 8, lanes]   raw unhalved input rows
      ut_ref, pt_ref   [8, 8, lanes]   tail rows (3 used), per tile
      a_in, b_in       [8, 8, lanes]   boundary metric inits
      ext_ref          [l, 8, lanes]   extrinsic output
      a_out, b_out     [8, 8, lanes]   boundary metrics produced
      betas (scratch)  [l, 8, 8, lanes]
    """
    ns, par, ps, pp = _wiring()
    assert l % group == 0
    n_groups = l // group
    half = dtype.type(0.5)

    def gammas(u, p):
        g00 = (u + p) * half
        g01 = (u - p) * half
        return {(0, 0): g00, (0, 1): g01, (1, 0): -g01, (1, 1): -g00}

    def norm8(vs):
        m = vs[0]
        for v in vs[1:]:
            m = jnp.maximum(m, v)
        return [v - m for v in vs]

    def kernel(u_ref, p_ref, ut_ref, pt_ref, a_in, b_in,
               ext_ref, a_out, b_out, betas_ref):
        w = pl.program_id(1)
        is_first = w == 0
        is_last = w == w_count - 1

        exact = [jnp.zeros((8, lanes), dtype)] + \
                [jnp.full((8, lanes), dtype.type(NEG), dtype)] * 7

        # ---- beta init: stored boundary, or tail walk for the last window
        beta_tail = exact
        for j in (2, 1, 0):
            g = gammas(ut_ref[j], pt_ref[j])
            beta_tail = [
                jnp.maximum(beta_tail[ns[s, 0]] + g[(0, par[s, 0])],
                            beta_tail[ns[s, 1]] + g[(1, par[s, 1])])
                for s in range(8)
            ]
        beta_tail = norm8(beta_tail)
        beta0 = tuple(
            jnp.where(is_last, bt, b_in[s])
            for s, bt in enumerate(beta_tail))

        # ---- beta sweep (backward), store pre-update carries ---------------
        def bgroup(gi, beta):
            beta = list(beta)
            base = pl.multiple_of((n_groups - 1 - gi) * group, group)
            u_blk = u_ref[pl.ds(base, group)]
            p_blk = p_ref[pl.ds(base, group)]
            saves = [None] * group
            for j in range(group - 1, -1, -1):
                g = gammas(u_blk[j], p_blk[j])
                saves[j] = beta
                beta = [
                    jnp.maximum(beta[ns[s, 0]] + g[(0, par[s, 0])],
                                beta[ns[s, 1]] + g[(1, par[s, 1])])
                    for s in range(8)
                ]
            beta = norm8(beta)
            betas_ref[pl.ds(base, group)] = jnp.stack(
                [jnp.stack(sv, axis=0) for sv in saves], axis=0)
            return tuple(beta)

        beta_end = jax.lax.fori_loop(0, n_groups, bgroup, beta0)
        b_out[...] = jnp.stack(list(beta_end), axis=0)

        # ---- alpha sweep + extrinsic emission ------------------------------
        alpha0 = tuple(
            jnp.where(is_first, ex, a_in[s])
            for s, ex in enumerate(exact))

        def agroup(gi, alpha):
            base = pl.multiple_of(gi * group, group)
            u_blk = u_ref[pl.ds(base, group)]
            p_blk = p_ref[pl.ds(base, group)]
            bblk = betas_ref[pl.ds(base, group)]
            alpha = list(alpha)
            outs = []
            for j in range(group):
                g = gammas(u_blk[j], p_blk[j])
                bk1 = [bblk[j, s] for s in range(8)]
                # Branch metrics br_u[s] = alpha[s] + gamma(s, u) are shared
                # between the LLR totals and the alpha update (the update's
                # alpha[ps[s,u]] + gamma(ps[s,u], u) IS br_u[ps[s,u]], since
                # pp[s,u] = par[ps[s,u], u]) — 16 adds saved per step.
                br0 = [alpha[s] + g[(0, par[s, 0])] for s in range(8)]
                br1 = [alpha[s] + g[(1, par[s, 1])] for s in range(8)]
                tot0 = tot1 = None
                for s in range(8):
                    t0 = br0[s] + bk1[ns[s, 0]]
                    t1 = br1[s] + bk1[ns[s, 1]]
                    tot0 = t0 if tot0 is None else jnp.maximum(tot0, t0)
                    tot1 = t1 if tot1 is None else jnp.maximum(tot1, t1)
                outs.append(tot0 - tot1 - u_blk[j])   # llr - input = ext
                alpha = [
                    jnp.maximum(br0[ps[s, 0]], br1[ps[s, 1]])
                    for s in range(8)
                ]
            alpha = norm8(alpha)
            ext_ref[pl.ds(base, group)] = jnp.stack(outs, axis=0)
            return tuple(alpha)

        alpha_end = jax.lax.fori_loop(0, n_groups, agroup, alpha0)
        a_out[...] = jnp.stack(list(alpha_end), axis=0)

    return kernel


def map_decode_nii(u, p, tail_u, tail_p, a_st, b_st, *, l: int,
                   lanes: int, group: int = 16, interpret: bool = False):
    """One NII constituent decode.

    u, p:            [T, K, 8, lanes] raw (unhalved) input / parity rows
    tail_u, tail_p:  [T, 8, 8, lanes] tail rows (first 3 rows used)
    a_st, b_st:      [T, W+1, 8, 8, lanes] boundary metrics from this
                     constituent's previous half-iteration: slot w holds
                     the alpha init / beta init for window w (slot W is
                     padding). Pass zeros on the first iteration.

    Returns (ext [T, K, 8, lanes], a_next, b_next) in the same slot
    convention, ready to pass back on the next call.
    """
    t_tiles, k, eight, lns = u.shape
    assert eight == 8 and lns == lanes and k % l == 0
    w_count = k // l
    dtype = u.dtype
    kernel = _nii_kernel(l, w_count, lanes, group, jnp.dtype(dtype))

    grid = (t_tiles, w_count)
    ext, a_raw, b_raw = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_tiles, k, 8, lanes), dtype),
            jax.ShapeDtypeStruct((t_tiles, w_count, 8, 8, lanes), dtype),
            jax.ShapeDtypeStruct((t_tiles, w_count, 8, 8, lanes), dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, l, 8, lanes), lambda t, w: (t, w, 0, 0)),
            pl.BlockSpec((None, l, 8, lanes), lambda t, w: (t, w, 0, 0)),
            pl.BlockSpec((None, 8, 8, lanes), lambda t, w: (t, 0, 0, 0)),
            pl.BlockSpec((None, 8, 8, lanes), lambda t, w: (t, 0, 0, 0)),
            pl.BlockSpec((None, None, 8, 8, lanes),
                         lambda t, w: (t, w, 0, 0, 0)),
            pl.BlockSpec((None, None, 8, 8, lanes),
                         lambda t, w: (t, w, 0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, l, 8, lanes), lambda t, w: (t, w, 0, 0)),
            pl.BlockSpec((None, None, 8, 8, lanes),
                         lambda t, w: (t, w, 0, 0, 0)),
            pl.BlockSpec((None, None, 8, 8, lanes),
                         lambda t, w: (t, w, 0, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((l, 8, 8, lanes), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 60 * k * 8 * lanes * t_tiles,
            bytes_accessed=u.dtype.itemsize * 8 * lanes * t_tiles * 3 * k,
            transcendentals=0),
        interpret=interpret,
    )(u, p, tail_u, tail_p, a_st[:, :w_count], b_st[:, 1:])

    # Next-iteration slots: window w's alpha init is the alpha produced at
    # the END of window w-1 (a_raw[w-1]); its beta init is the beta
    # produced at the START of window w+1 (b_raw[w+1]). The pass-in
    # slicing above (a_st[:, :W] / b_st[:, 1:]) applies the shifts, so the
    # state arrays just embed the raw outputs at +1 / 0.
    zero = jnp.zeros_like(a_raw[:, :1])
    a_next = jnp.concatenate([zero, a_raw], axis=1)
    b_next = jnp.concatenate([b_raw, zero], axis=1)
    return ext, a_next, b_next


def to_tiles(x, lanes: int):
    """[rows, B] -> [T, rows, 8, lanes] (B = T*8*lanes), tile-major."""
    rows, b = x.shape
    assert b % (8 * lanes) == 0, (b, lanes)
    t = b // (8 * lanes)
    return x.reshape(rows, t, 8, lanes).transpose(1, 0, 2, 3)


def from_tiles(x):
    """[T, rows, 8, lanes] -> [rows, B]."""
    t, rows, eight, lanes = x.shape
    return x.transpose(1, 0, 2, 3).reshape(rows, t * eight * lanes)
