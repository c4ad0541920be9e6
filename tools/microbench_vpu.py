"""VPU issue-rate microbenchmark: f32 vs bf16 vs int8 add/max chains.

Decides the turbo-decoder metric dtype (VERDICT r2 #2): the decoder's
inner loop is an add/max recursion on the VPU, so throughput scales with
how many metric elements one vector instruction covers — f32 (8,128)
tiles, bf16 (16,128), int8 (32,128). This measures the realized ratio on
the attached chip with a dependency structure shaped like the trellis
recursion (8 parallel states, serial across steps).

Usage: python tools/microbench_vpu.py [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def make_kernel(steps: int, n_state: int):
    def kernel(x_ref, o_ref):
        xs = [x_ref[i] for i in range(n_state)]          # [S, 128] each
        ms = list(xs)

        def body(i, ms):
            ms = list(ms)
            out = []
            for s in range(n_state):
                a = ms[s] + xs[(s + 1) % n_state]
                b = ms[(s + 3) % n_state] + xs[s]
                out.append(jnp.maximum(a, b))
            m = out[0]
            for v in out[1:]:
                m = jnp.maximum(m, v)
            return tuple(v - m for v in out)

        ms = jax.lax.fori_loop(0, steps, body, tuple(ms))
        for s in range(n_state):
            o_ref[s] = ms[s]

    return kernel


def bench(dtype, sub: int, steps: int, lanes: int = 512):
    n_state = 8
    shape = (n_state, sub, lanes)
    if dtype == jnp.int8:
        x = jnp.asarray(
            np.random.randint(-4, 4, size=shape).astype(np.int8))
    else:
        x = jnp.asarray(np.random.randn(*shape).astype(np.float32) * 0.1,
                        dtype=dtype)
    fn = pl.pallas_call(
        make_kernel(steps, n_state),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
    )
    f = jax.jit(fn)
    r = f(x)
    _ = int(jnp.asarray(r).reshape(-1)[0])
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        r = f(x)
        _ = int(jnp.asarray(r).reshape(-1)[0])
        best = min(best, time.time() - t0)
    # ops: per step per state: 2 add + 1 max, plus 7 max + 8 sub norm
    ops = steps * (n_state * 3 + 15) * sub * lanes
    return best, ops / best / 1e12


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    for name, dt, sub in (("f32", jnp.float32, 8),
                          ("bf16", jnp.bfloat16, 16),
                          ("int8", jnp.int8, 32)):
        try:
            dt_s, tops = bench(dt, sub, steps)
            print(f"{name:5s} sub={sub:3d} time={dt_s*1e3:8.3f} ms "
                  f"rate={tops:6.2f} Tops/s")
        except Exception as e:
            print(f"{name:5s} FAILED: {str(e)[:200]}")
