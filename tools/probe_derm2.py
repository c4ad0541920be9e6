"""Probe 2: end-to-end fused de-RM glue candidates.

Composition under test: llr [B, 2G] f32 (natural demod layout) ->
transpose -> bf16 -> 3 independent row-takes into tile layout -> cheap
consumer. Variants: XLA transpose vs Pallas transpose kernel.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(r):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[0]))


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


def pallas_transpose(x, chunk=640, out_dtype=None):
    """[B, R] -> [R, B] tiled transpose kernel (B, chunk multiples of 128)."""
    b, r = x.shape
    out_dtype = out_dtype or x.dtype
    assert r % chunk == 0

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].T.astype(out_dtype)

    return pl.pallas_call(
        kernel,
        grid=(r // chunk,),
        in_specs=[pl.BlockSpec((b, chunk), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, b), out_dtype),
    )(x)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    g = 86400
    k = 5824
    rows = k + 3
    sub, lanes = 8, 256
    n_tiles = 3
    rng = np.random.default_rng(0)
    r_pad = 2 * g + 128  # room for zero/strong rows, 128-aligned-ish

    llr = jnp.asarray(rng.standard_normal((b, 2 * g)).astype(np.float32))
    idxs = [jnp.asarray(rng.integers(0, 2 * g,
                                     size=(n_tiles, rows, sub)).astype(np.int32))
            for _ in range(3)]

    @jax.jit
    def xla_e2e(llr, i1, i2, i3):
        t = jnp.moveaxis(llr, 0, 1).astype(jnp.bfloat16)
        t = jnp.pad(t, ((0, r_pad - 2 * g), (0, 0)))
        return (jnp.take(t, i1, axis=0), jnp.take(t, i2, axis=0),
                jnp.take(t, i3, axis=0))

    @jax.jit
    def pallas_e2e(llr, i1, i2, i3):
        t = pallas_transpose(llr, out_dtype=jnp.bfloat16)
        t = jnp.pad(t, ((0, r_pad - 2 * g), (0, 0)))
        return (jnp.take(t, i1, axis=0), jnp.take(t, i2, axis=0),
                jnp.take(t, i3, axis=0))

    @jax.jit
    def ptr_only(llr):
        return pallas_transpose(llr, out_dtype=jnp.bfloat16)

    @jax.jit
    def takes_only(t, i1, i2, i3):
        return (jnp.take(t, i1, axis=0), jnp.take(t, i2, axis=0),
                jnp.take(t, i3, axis=0))

    t_pre = ptr_only(llr)
    t_pre = jnp.pad(t_pre, ((0, r_pad - 2 * g), (0, 0)))
    _ = [timeit(*a) for a in [
        ("pallas transpose f32->bf16", ptr_only, llr),
        ("takes x3 (indep tables, warm src)", takes_only, t_pre, *idxs),
        ("e2e XLA transpose + takes", xla_e2e, llr, *idxs),
        ("e2e pallas transpose + takes", pallas_e2e, llr, *idxs),
    ]]
    # correctness of the pallas transpose
    ref = np.asarray(llr).T.astype(np.float32)
    got = np.asarray(ptr_only(llr)).astype(np.float32)
    print("transpose max err:", np.abs(ref - got).max())


if __name__ == "__main__":
    main()
