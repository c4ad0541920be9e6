"""Microbench: row-take de-rate-match formulations on the real chip.

Candidate for the fused receiver path: one gather from a [2(G+1), B]
LLR array straight into the turbo kernel's tile layout
[T, rows, sub, lanes], replacing pad-to-circle + place + split_streams +
to_tiles. Measures the take at the rx_20mimo shapes.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def _sync(r):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0][0, 0]))


def timeit(name, fn, *args, reps=5):
    r = fn(*args)
    _sync(r)
    r = fn(*args)
    _sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    _sync(r)
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.2f} ms")
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = 5824
    g = 86400  # ~ rx_20mimo codeword bits
    n_cb = 22  # 2 cw x 11 CBs
    sub, lanes = 8, 256
    n_tiles = -(-n_cb * b // (sub * lanes))
    rows = k + 3
    rng = np.random.default_rng(0)

    src = jnp.asarray(rng.standard_normal((2 * g + 8, b)).astype(np.float32))
    src_bf = src.astype(jnp.bfloat16)
    # random row indices, one table per (tile, row, sub)
    idx = jnp.asarray(
        rng.integers(0, 2 * g, size=(n_tiles, rows, sub)).astype(np.int32))
    print(f"b={b}, out tiles [{n_tiles}, {rows}, {sub}, {lanes}] "
          f"({n_tiles*rows*sub*lanes*4/1e6:.0f} MB f32/stream)")

    @jax.jit
    def take_f32(src, idx):
        return jnp.take(src, idx, axis=0)  # [T, rows, sub, B]

    @jax.jit
    def take_bf16(src_bf, idx):
        return jnp.take(src_bf, idx, axis=0)

    @jax.jit
    def take3_bf16(src_bf, idx):
        # three streams at once (sys/par1/par2), distinct tables
        o1 = jnp.take(src_bf, idx, axis=0)
        o2 = jnp.take(src_bf, (idx + 7) % (2 * g), axis=0)
        o3 = jnp.take(src_bf, (idx + 13) % (2 * g), axis=0)
        return o1 + 0.0, o2 + 0.0, o3 + 0.0

    @jax.jit
    def transpose_llr(x):
        # the [B, 2, G] -> [2G, B] transpose the fused path needs
        return jnp.moveaxis(x, -1, 0)

    llr_nat = jnp.asarray(
        rng.standard_normal((b, 2 * g)).astype(np.float32))

    timeit("take f32 [rows] from [2G,B]", take_f32, src, idx)
    timeit("take bf16", take_bf16, src_bf, idx)
    timeit("take bf16 x3 streams", take3_bf16, src_bf, idx)
    timeit("transpose [B,2G]->[2G,B] f32", transpose_llr, llr_nat)


if __name__ == "__main__":
    main()
