"""Direct timing of the v2 NII constituent kernel per (l, lanes, group).

Measures one map_decode_nii call (a half-iteration) chained C times,
isolating kernel throughput from the XLA glue.

Usage: python tools/probe_nii_kernel.py [batch] [l] [lanes] [group]
"""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np
import jax
import jax.numpy as jnp

from empower_srslte_tpu.ops.fec.turbo_decoder_pallas2 import map_decode_nii


def main():
    k = 6144
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    l = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    group = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    assert batch % (8 * lanes) == 0
    t_tiles = batch // (8 * lanes)
    w = k // l
    dt_ = jnp.bfloat16

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(t_tiles, k, 8, lanes))
                    .astype(np.float32)).astype(dt_)
    p = jnp.asarray(rng.normal(size=(t_tiles, k, 8, lanes))
                    .astype(np.float32)).astype(dt_)
    ut = jnp.zeros((t_tiles, 8, 8, lanes), dt_)
    a_st = jnp.zeros((t_tiles, w + 1, 8, 8, lanes), dt_)

    chain = 10

    @jax.jit
    def fn(u, p):
        ext = None
        x = u
        for _ in range(chain):
            ext, a, b = map_decode_nii(x, p, ut, ut, a_st, a_st,
                                       l=l, lanes=lanes, group=group)
            x = u + 0.0 * ext[0, 0, 0]
        return ext

    t0 = time.time()
    r = fn(u, p)
    _ = float(r[0, 0, 0, 0])
    print(f"compile+first {time.time()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(2):
            r = fn(u, p)
        _ = float(r[0, 0, 0, 0])
        best = min(best, (time.time() - t0) / (2 * chain))
    # bits/s if this were the only work: 10 half-iters per decode
    eq_mbps = batch * k / (best * 10) / 1e6
    print(f"l={l} lanes={lanes} group={group} batch={batch}: "
          f"{best*1e3:.2f} ms/half-iter -> {eq_mbps:.0f} Mbps-equivalent "
          f"(x10 half-iters)")


if __name__ == "__main__":
    main()
