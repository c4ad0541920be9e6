"""Pallas TPU kernels for the windowed max-log-MAP constituent decode.

This is the VMEM-resident fast path behind ops/fec/turbo_decoder.py. One
``pallas_call`` performs a full constituent (half-iteration) decode: the
grid is (windows, batch-tiles); each program DMAs its window's overlapping
row span from the compact LLR arrays in HBM, runs the beta backward sweep
(stored to VMEM scratch) and the alpha forward sweep with LLR emission,
and writes its [L, 8, LANES] slice of the output.

Design notes (why this shape):

* **State-unrolled SoA**: the 8 trellis state metrics live in 8 separate
  [8, LANES] tiles (Python variables), so the trellis wiring — a static
  8-state permutation — is pure variable renaming with ZERO shuffle/gather
  ops. An earlier formulation keeping states on the sublane axis of one
  [8 states, T] tile spent most of its cycles in sublane shuffles.
* **State-folded lane layout**: the caller reshapes [rows, B] to
  [rows, 8, B/8] (free, row-major), so every trellis step's input row
  loads as a natively-tiled [8, B/8-tile] vreg block — no relayouts.
* **Grouped time loop**: GROUP=8 steps per loop iteration — one dynamic
  block load/store per group, static row peeling, one renormalization.
* The whole (L+O)-step recursion runs inside the kernel; the lax.scan
  formulation of the same algorithm is ~50x slower end-to-end.

Windowed-overlap semantics follow the reference's turbodecoder_win.h
scheme (win_overlap_len 40, lib/src/phy/fec/turbodecoder_win.h:58,92):
interior windows train alpha/beta over O extra steps from uniform metrics;
window 0's alpha and the last window's beta start from the exact boundary
metrics, carried through PAD_LLR-forced padding steps (see
turbo_decoder.PAD_LLR for the construction).

Inputs are expected PRE-HALVED (0.5 * LLR): branch metrics are then
gamma = su*ls + sp*lp and emitted LLRs come out in full scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .turbo_encoder import trellis

#: Lanes per program in the folded layout: total CBs per program = 8*LANES.
DEFAULT_LANES = 128

#: Trellis steps per loop iteration (one block load/store, one renorm).
GROUP = 8

NEG = -1e30


@functools.lru_cache(maxsize=1)
def _wiring():
    t = trellis()
    return (t.next_state, t.parity, t.prev_state, t.prev_parity)


def _half_iter_kernel(l: int, o: int, lanes: int, group: int = GROUP,
                      dtype=jnp.float32):
    """Kernel body for one constituent decode over grid (W, B_folded/lanes).

    Refs: lsa_hbm/lp_hbm [rows, 8, Bf] (ANY); llr block out [L, 8, lanes];
    scratch: two [span, 8, lanes] input buffers, betas [L, 8, 8, lanes],
    2 DMA semaphores. All LLR inputs pre-halved.
    """
    ns, par, ps, pp = _wiring()

    assert l % group == 0 and o % group == 0
    span = l + 2 * o
    n_groups = (l + o) // group
    o_groups = o // group

    def step_gammas(ls, lp_):
        """Branch metrics for (u, p) combos from pre-halved [8, lanes] rows."""
        g00 = ls + lp_
        g01 = ls - lp_
        return {(0, 0): g00, (0, 1): g01, (1, 0): -g01, (1, 1): -g00}

    def norm8(vs):
        m = vs[0]
        for v in vs[1:]:
            m = jnp.maximum(m, v)
        return [v - m for v in vs]

    def kernel(lsa_hbm, lp_hbm, llr_ref, lsa_buf, lp_buf, betas_ref, sems):
        w = pl.program_id(0)
        b = pl.program_id(1)
        n_w = pl.num_programs(0)
        row0 = pl.multiple_of(w * l, group)
        col0 = pl.multiple_of(b * lanes, 128)

        cp_s = pltpu.make_async_copy(
            lsa_hbm.at[pl.ds(row0, span), :, pl.ds(col0, lanes)], lsa_buf,
            sems.at[0])
        cp_p = pltpu.make_async_copy(
            lp_hbm.at[pl.ds(row0, span), :, pl.ds(col0, lanes)], lp_buf,
            sems.at[1])
        cp_s.start()
        cp_p.start()

        # Exact boundary metric {state0: 0, others: NEG} for window 0's
        # alpha / last window's beta; uniform 0 for interior windows.
        def inits(is_boundary):
            # bf16 boundary metric: use a large-but-safe negative
            neg_v = NEG if dtype == jnp.float32 else -1e30
            neg = jnp.where(is_boundary, neg_v, 0.0).astype(dtype)
            full = jnp.broadcast_to(neg, (8, lanes))
            zero = jnp.zeros((8, lanes), dtype)
            return [zero] + [full] * 7

        a0 = inits(w == 0)
        b0 = inits(w == n_w - 1)

        cp_s.wait()
        cp_p.wait()

        # Alpha reads buffer rows [0, L+O) (trellis w*L - O + i); beta reads
        # rows [O, L+2O) (trellis w*L + i). Offsets are GROUP-aligned.

        # ---- beta backward sweep, store beta_{j+1} for j in [0, L) --------
        def bgroup(gi, beta):
            beta = list(beta)
            base = pl.multiple_of((n_groups - 1 - gi) * group + o, group)
            ls_blk = lsa_buf[pl.ds(base, group)]      # [G, 8, lanes]
            lp_blk = lp_buf[pl.ds(base, group)]
            saves = [None] * group
            for j in range(group - 1, -1, -1):
                g = step_gammas(ls_blk[j], lp_blk[j])
                saves[j] = beta
                beta = [
                    jnp.maximum(beta[ns[s, 0]] + g[(0, par[s, 0])],
                                beta[ns[s, 1]] + g[(1, par[s, 1])])
                    for s in range(8)
                ]
            beta = norm8(beta)

            @pl.when(gi >= o_groups)
            def _():
                # [G, 8, 8, lanes] block store of pre-update carries
                blk = jnp.stack([jnp.stack(sv, axis=0) for sv in saves], axis=0)
                betas_ref[pl.ds(pl.multiple_of(base - o, group), group)] = blk

            return tuple(beta)

        jax.lax.fori_loop(0, n_groups, bgroup, tuple(b0))

        # ---- alpha forward sweep + LLR emission ---------------------------
        def agroup(gi, alpha):
            base = pl.multiple_of(gi * group, group)
            ls_blk = lsa_buf[pl.ds(base, group)]
            lp_blk = lp_buf[pl.ds(base, group)]

            def half_sweep(alpha, emit_blk):
                alpha = list(alpha)
                outs = []
                for j in range(group):
                    g = step_gammas(ls_blk[j], lp_blk[j])
                    if emit_blk is not None:
                        bk1 = [emit_blk[j, s] for s in range(8)]
                        tot0 = tot1 = None
                        for s in range(8):
                            t0 = alpha[s] + g[(0, par[s, 0])] + bk1[ns[s, 0]]
                            t1 = alpha[s] + g[(1, par[s, 1])] + bk1[ns[s, 1]]
                            tot0 = t0 if tot0 is None else jnp.maximum(tot0, t0)
                            tot1 = t1 if tot1 is None else jnp.maximum(tot1, t1)
                        outs.append(tot0 - tot1)
                    alpha = [
                        jnp.maximum(alpha[ps[s, 0]] + g[(0, pp[s, 0])],
                                    alpha[ps[s, 1]] + g[(1, pp[s, 1])])
                        for s in range(8)
                    ]
                return norm8(alpha), outs

            def train(alpha):
                a, _ = half_sweep(alpha, None)
                return tuple(a)

            def emit(alpha):
                eb = pl.multiple_of(base - o, group)
                bblk = betas_ref[pl.ds(eb, group)]     # [G, 8, 8, lanes]
                a, outs = half_sweep(alpha, bblk)
                llr_ref[pl.ds(eb, group)] = jnp.stack(outs, axis=0)
                return tuple(a)

            return jax.lax.cond(gi < o_groups, train, emit, alpha)

        jax.lax.fori_loop(0, n_groups, agroup, tuple(a0))

    return kernel


def map_decode_fused(lsa_pd, lp_pd, k: int, l: int, o: int, *,
                     lanes: int = DEFAULT_LANES, group: int = GROUP,
                     interpret: bool = False):
    dtype = lsa_pd.dtype
    """One constituent MAP decode over pre-halved padded LLR arrays.

    lsa_pd/lp_pd: [rows, 8, Bf] f32 — O PAD rows, the K+3 payload+tail
    rows, >= O+3 trailing PAD rows (build via ``pad_trellis_rows`` +
    ``fold_lanes``). Returns llr [K, 8, Bf] (full-scale a-posteriori).
    """
    rows, eight, bf = lsa_pd.shape
    assert eight == 8
    assert bf % lanes == 0, (bf, lanes)
    assert rows >= k + 2 * o + 3
    w = k // l
    grid = (w, bf // lanes)

    kernel = _half_iter_kernel(l, o, lanes, group, dtype=dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, 8, bf), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((l, 8, lanes), lambda w, b: (w, 0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((l + 2 * o, 8, lanes), dtype),
            pltpu.VMEM((l + 2 * o, 8, lanes), dtype),
            pltpu.VMEM((l, 8, 8, lanes), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 60 * (l + o) * w * 8 * bf,
            bytes_accessed=4 * 8 * bf * (2 * (l + 2 * o) * w + k),
            transcendentals=0),
        interpret=interpret,
    )(lsa_pd, lp_pd)


def fold_lanes(x):
    """[rows, B] -> [rows, 8, B/8] (free row-major reshape)."""
    rows, b = x.shape
    assert b % 8 == 0
    return x.reshape(rows, 8, b // 8)


def unfold_lanes(x):
    """[rows, 8, B/8] -> [rows, B]."""
    rows, eight, bf = x.shape
    return x.reshape(rows, eight * bf)


def pad_trellis_rows(x, o: int, pad_value: float):
    """Pad [T, B] with O leading and >= O+3 trailing rows of pad_value,
    aligning total rows to GROUP."""
    t, b = x.shape
    total = t + 2 * o + 3
    total += (-total) % GROUP
    lead = jnp.full((o, b), pad_value, x.dtype)
    trail = jnp.full((total - t - o, b), pad_value, x.dtype)
    return jnp.concatenate([lead, x, trail], axis=0)
