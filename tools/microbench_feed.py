"""Microbenchmarks for decoder-feed primitive candidates (round 5).

The round-4 roofline (docs/BENCHMARKS.md:167-199) bounds the fused
decoder feed at 4.4 ms of the 11.3 ms receiver floor, dominated by the
16x gather read amplification of single-[lanes]-row gathers from a
(16,128)-tiled bf16 HBM layout. This tool measures the primitives of the
candidate replacements on the real chip, with the same chained-dispatch
treatment as bench.py (the axon tunnel adds ~5 ms fixed latency per
dispatch):

  a. current-style row gather: [N, 256] bf16 source, one row per
     gathered element (16x read amplification expected)
  b. row-BLOCK gather: [E, 8, 256] bf16 source, shared index over axis 0
     (rows are [8, 256] = half a (16,128) tile -> ~2x amplification)
  c. full relayout transpose [2, 256, 100800] -> [2, 100800, 256]
  d. minor-axis (lane) gather: take(x[2, 256, 100800], idx[G], axis=-1)
  e. member stack+pad+transpose: slices along minor axis -> [E, m, 256]

Shapes mirror the rx_20mimo bench: batch 256, 20 MHz MCS 27
(G=63776 bits/codeword, 13 CBs of K=5824, bps*SK=100800 grid rows).
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(x):
    return float(jnp.ravel(x)[0])


def timed(fn, args, chain=8, reps=2, trials=3):
    # scalar carry: the cross-call dependency is a broadcast add that
    # fuses into fn's first read (a full-size carry add would add a
    # whole extra HBM pass per step and skew every number)
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(a[0] + (0.0 * carry).astype(a[0].dtype), *a[1:])
            # barrier: force FULL materialization of the output (without
            # it, probing one element lets XLA slice/DCE the whole op)
            out = jax.lax.optimization_barrier(out)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.ravel(leaf)[0].astype(jnp.float32), None
        final, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=chain)
        return final

    r = chained(*args)
    _sync(r)
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            r = chained(*args)
        _sync(r)
        best = min(best, (time.time() - t0) / (reps * chain))
    return best * 1e3  # ms per call


def main():
    rng = np.random.default_rng(0)
    lanes = 256
    r_len = 100800          # bps*SK, 20 MHz 64QAM grid rows
    g = 63776               # codeword bits
    kk = 5824               # CB size
    n_cb = 26               # 13 CBs x 2 codewords
    d_rows = 3 * (kk + 4)   # decoder rows per CB

    which = set(sys.argv[1:]) or {"a", "b", "c", "d", "e"}

    if "a" in which:
        # (a) current-style: gather d_rows * n_cb single rows from
        # [2*r_len, lanes] bf16 (~16x read amplification)
        src = jnp.asarray(
            rng.normal(size=(2 * r_len + 2, lanes)).astype(np.float32),
            dtype=jnp.bfloat16)
        idx = jnp.asarray(
            rng.integers(0, 2 * r_len, size=(d_rows * n_cb,)).astype(
                np.int32))

        def f_a(src, idx):
            return jnp.take(src, idx, axis=0)

        ms = timed(f_a, (src, idx))
        out_mb = d_rows * n_cb * lanes * 2 / 1e6
        print(f"a single-row gather   : {ms:7.3f} ms  "
              f"(out {out_mb:.0f} MB, {out_mb/1e3/ms*1e3:.0f} GB/s eff)")

    if "b" in which:
        # (b) row-block gather: shared index over axis 0, rows [8, 256]
        e_max = -(-g // n_cb) + 8
        src = jnp.asarray(
            rng.normal(size=(e_max + 2, 8, lanes)).astype(np.float32),
            dtype=jnp.bfloat16)
        idx = jnp.asarray(
            rng.integers(0, e_max, size=(d_rows,)).astype(np.int32))

        def f_b(src, idx):
            return jnp.take(src, idx, axis=0)

        # n_cb/8 = ~4 tiles would run this gather once each; emulate by
        # 4 gathers of the same source (distinct dummy offsets)
        def f_b4(src, idx):
            outs = [jnp.take(src, jnp.minimum(idx + i, e_max + 1), axis=0)
                    for i in range(4)]
            return sum(jnp.sum(o, axis=(1, 2)) for o in outs)

        ms = timed(f_b4, (src, idx))
        out_mb = 4 * d_rows * 8 * lanes * 2 / 1e6
        print(f"b row-block gather x4 : {ms:7.3f} ms  "
              f"(out {out_mb:.0f} MB, {out_mb/1e3/ms*1e3:.0f} GB/s eff)")

    if "c" in which:
        # (c) full relayout transpose (bf16)
        x = jnp.asarray(
            rng.normal(size=(2, lanes, r_len)).astype(np.float32),
            dtype=jnp.bfloat16)

        def f_c(x):
            return jnp.swapaxes(x, -1, -2)

        ms = timed(f_c, (x,))
        mb = 2 * lanes * r_len * 2 / 1e6
        print(f"c relayout transpose  : {ms:7.3f} ms  "
              f"({mb:.0f} MB, rw {2*mb/1e3/ms*1e3:.0f} GB/s)")

    if "d" in which:
        # (d) minor-axis gather (the grid-path g_map extraction)
        x = jnp.asarray(
            rng.normal(size=(2, lanes, r_len)).astype(np.float32),
            dtype=jnp.bfloat16)
        gidx = jnp.asarray(
            np.sort(rng.choice(r_len, size=g, replace=False)).astype(
                np.int32))

        def f_d(x, gidx):
            return jnp.take(x, gidx, axis=-1)

        ms = timed(f_d, (x, gidx))
        out_mb = 2 * lanes * g * 2 / 1e6
        print(f"d minor-axis gather   : {ms:7.3f} ms  "
              f"(out {out_mb:.0f} MB, {out_mb/1e3/ms*1e3:.0f} GB/s eff)")

    if "e" in which:
        # (e) member stack: 26 minor-axis slices -> stack -> pad ->
        # transpose to [E, m, lanes]
        x = jnp.asarray(
            rng.normal(size=(2, lanes, g)).astype(np.float32),
            dtype=jnp.bfloat16)
        e_cb = g // 13
        e_max = e_cb + 8

        def f_e(x):
            outs = []
            for cw in range(2):
                for i in range(13):
                    seg = jax.lax.dynamic_slice_in_dim(
                        x[cw], i * e_cb, e_cb, axis=-1)
                    outs.append(jnp.pad(seg, ((0, 0), (0, 8))))
            st = jnp.stack(outs, axis=0)        # [26, lanes, e_max]
            return jnp.transpose(st, (2, 0, 1))  # [e_max, 26, lanes]

        ms = timed(f_e, (x,))
        mb = 26 * lanes * e_max * 2 / 1e6
        print(f"e stack+pad+transpose : {ms:7.3f} ms  "
              f"({mb:.0f} MB, rw {2*mb/1e3/ms*1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()


def calib():
    rng = np.random.default_rng(0)
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32 ")):
        x = jnp.asarray(rng.normal(size=(2, 256, 100800)).astype(np.float32),
                        dtype=dt)

        def f(x):
            return x * jnp.asarray(1.0001, dt)

        ms = timed(f, (x,))
        mb = x.size * x.dtype.itemsize / 1e6
        print(f"calib elemwise {name}    : {ms:7.3f} ms  "
              f"({mb:.0f} MB, rw {2*mb/1e3/ms*1e3:.0f} GB/s)")
        def f2(x):
            return jnp.swapaxes(x, -1, -2)
        ms = timed(f2, (x,))
        print(f"calib transpose {name}   : {ms:7.3f} ms  "
              f"({mb:.0f} MB, rw {2*mb/1e3/ms*1e3:.0f} GB/s)")
