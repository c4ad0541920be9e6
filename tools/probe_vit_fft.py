"""Microbenchmarks: Viterbi formulation variants + raw FFT cost.

Explores where the 7.3 ms blind-search and 4.1 ms OFDM stages go:
- jnp.fft.fft alone on the subframe symbol block
- viterbi_decode as-is (f32, renorm every step, unroll 8)
- variants: bf16 metrics, renorm every 8, full unroll, radix-2 steps
Usage: python tools/probe_vit_fft.py
"""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np
import jax
import jax.numpy as jnp

from empower_srslte_tpu.ops.fec.convcoder import viterbi_decode, _tables


def _sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(jnp.abs(jnp.ravel(x)[0]).astype(jnp.float32)))


def timeit(name, fn, *args, reps=4, chain=4):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            a0, acc = carry
            r = fn(a0, *a[1:])
            s = jnp.abs(
                jax.tree_util.tree_leaves(r)[0].ravel()[0]
            ).astype(jnp.float32)
            return (a[0] + 0.0 * s.astype(a[0].dtype), acc + s), None
        (_, out), _ = jax.lax.scan(
            body, (a[0], jnp.zeros((), jnp.float32)), None, length=chain)
        return out

    r = chained(*args)
    _sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = chained(*args)
    _sync(r)
    dt = (time.time() - t0) / (reps * chain)
    print(f"{name:52s} {dt*1e3:8.2f} ms")
    return dt


def viterbi_variant(llr, wrap=1, dtype=jnp.float32, renorm=1, unroll=8,
                    train=None):
    """viterbi_decode with knobs: metric dtype, renorm period, unroll,
    and optional short train/flush halo length instead of full copies."""
    ns, out, ps, pu, pout = _tables()
    NOF_STATES = 64

    *lead, three, k = llr.shape
    b = int(np.prod(lead)) if lead else 1
    x = jnp.moveaxis(llr.reshape(b, 3, k), -1, 0)
    if train is not None:
        # circular halo: prepend last `train` columns, append first `train`
        x = jnp.concatenate([x[-train:], x, x[:train]], axis=0)
        mid = train
    else:
        if wrap:
            x = jnp.concatenate([x] * (1 + 2 * wrap), axis=0)
        mid = wrap * k
    t_len = x.shape[0]

    psel = [jnp.asarray(ps[:, u]) for u in (0, 1)]
    pidx = [jnp.asarray((pout[:, u, 0] << 2) | (pout[:, u, 1] << 1)
                        | pout[:, u, 2]) for u in (0, 1)]
    pu_col = jnp.asarray(pu.astype(np.int32))[:, None]

    n_regs = (t_len - 1 - mid) // 32 + 1

    def acs(carry, inp):
        (metric, regs), (llr_k, step_i) = carry, inp
        llr_k = llr_k.astype(dtype)
        l0, l1, l2 = llr_k[:, 0], llr_k[:, 1], llr_k[:, 2]
        p01, m01 = l0 + l1, l0 - l1
        comb = jnp.stack([p01 + l2, p01 - l2, m01 + l2, m01 - l2,
                          -m01 + l2, -m01 - l2, -p01 + l2, -p01 - l2],
                         axis=0) * jnp.asarray(0.5, dtype)
        cand0 = metric[psel[0]] + comb[pidx[0]]
        cand1 = metric[psel[1]] + comb[pidx[1]]
        best = cand1 > cand0
        new = jnp.where(best, cand1, cand0)
        if renorm > 1:
            new = jax.lax.cond(
                step_i % renorm == 0,
                lambda m: m - jnp.max(m, axis=0, keepdims=True),
                lambda m: m, new)
        else:
            new = new - jnp.max(new, axis=0, keepdims=True)
        sel = [jnp.where(best, r[psel[1]], r[psel[0]]) for r in regs]
        out_regs = []
        carry_bit = jnp.broadcast_to(pu_col, best.shape)
        for r in sel:
            out_regs.append((r << 1) | carry_bit)
            carry_bit = (r >> 31) & 1
        return (new, out_regs), None

    metric0 = jnp.zeros((NOF_STATES, b), dtype)
    regs0 = [jnp.zeros((NOF_STATES, b), jnp.int32) for _ in range(n_regs)]
    steps = jnp.arange(t_len, dtype=jnp.int32)
    (metric, regs), _ = jax.lax.scan(acs, (metric0, regs0), (x, steps),
                                     unroll=unroll)

    win = jnp.argmax(metric, axis=0)
    win_regs = [jnp.take_along_axis(r, win[None, :], axis=0)[0]
                for r in regs]
    cols = []
    for t in range(mid, mid + k):
        pos = t_len - 1 - t
        cols.append((win_regs[pos // 32] >> (pos % 32)) & 1)
    bits = jnp.stack(cols, axis=-1).astype(jnp.int8)
    return bits.reshape(*lead, k)


def main():
    rng = np.random.default_rng(0)

    # ---- FFT alone
    sym = (rng.normal(size=(256, 2, 14, 2048)).astype(np.float32),
           rng.normal(size=(256, 2, 14, 2048)).astype(np.float32))
    sym = tuple(jnp.asarray(a) for a in sym)

    def s_fft(re, im):
        return jnp.abs(jnp.fft.fft(jax.lax.complex(re, im), axis=-1))

    timeit("jnp.fft.fft [256,2,14,2048] c64", s_fft, *sym)

    # slices + bins on top
    samples = (jnp.asarray(rng.normal(size=(256, 2, 30720)).astype(np.float32)),
               jnp.asarray(rng.normal(size=(256, 2, 30720)).astype(np.float32)))
    from empower_srslte_tpu.ops.ofdm import ofdm_rx_sf
    from empower_srslte_tpu.utils import Cell
    cell = Cell(nof_prb=100, nof_ports=2, id=1)

    def s_ofdm(re, im):
        return jnp.abs(ofdm_rx_sf(jax.lax.complex(re, im), cell))

    timeit("ofdm_rx_sf (slices+fft+bins)", s_ofdm, *samples)

    # ---- Viterbi variants: B = 256 * 18 candidates, k = 55
    b, k = 256 * 18, 55
    llr = jnp.asarray(rng.normal(size=(b, 3, k)).astype(np.float32))

    timeit("viterbi as-is (f32, renorm 1, unroll 8)",
           lambda x: viterbi_decode(x, wrap=1), llr)
    timeit("viterbi bf16 metrics",
           lambda x: viterbi_variant(x, dtype=jnp.bfloat16), llr)
    timeit("viterbi renorm 8",
           lambda x: viterbi_variant(x, renorm=8), llr)
    timeit("viterbi unroll full",
           lambda x: viterbi_variant(x, unroll=3 * k), llr)
    timeit("viterbi halo train=40",
           lambda x: viterbi_variant(x, train=40), llr)
    timeit("viterbi bf16 + renorm8 + train40",
           lambda x: viterbi_variant(x, dtype=jnp.bfloat16, renorm=8,
                                     train=40), llr)

    # correctness spot check of the variants vs as-is on clean LLRs
    from empower_srslte_tpu.ops.fec.convcoder import conv_encode_np
    u = rng.integers(0, 2, size=(64, k)).astype(np.int8)
    d = conv_encode_np(u)                      # [64, 3, k]
    clean = jnp.asarray((1.0 - 2.0 * d).astype(np.float32) * 4.0)
    ref = np.asarray(viterbi_decode(clean, wrap=1))
    for name, f in [
        ("bf16", lambda x: viterbi_variant(x, dtype=jnp.bfloat16)),
        ("renorm8", lambda x: viterbi_variant(x, renorm=8)),
        ("train40", lambda x: viterbi_variant(x, train=40)),
        ("combo", lambda x: viterbi_variant(x, dtype=jnp.bfloat16,
                                            renorm=8, train=40)),
    ]:
        got = np.asarray(f(clean))
        print(f"variant {name}: exact={np.array_equal(got, u)} "
              f"vs-ref={np.array_equal(got, ref)}")


if __name__ == "__main__":
    main()
