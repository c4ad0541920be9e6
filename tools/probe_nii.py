"""Timing probe for the v2 NII full turbo decode (axon-safe sync).

Usage: python tools/probe_nii.py [batch] [chain] [nrep] [window]
Measures the same quantity bench.py reports, for configuration sweeps.
"""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np
import jax
import jax.numpy as jnp

from empower_srslte_tpu.ops.fec import TurboDecoder, turbo_encode_np


def main():
    k = 6144
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nrep = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    window = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    iters = 5

    rng = np.random.default_rng(0)
    tile = max(batch // 256, 1)
    u0 = rng.integers(0, 2, size=(batch // tile, k)).astype(np.int8)
    u = np.tile(u0, (tile, 1))
    d = np.tile(turbo_encode_np(u0), (tile, 1, 1))
    ebn0 = 10 ** (1.5 / 10)
    n0 = 1.0 / (ebn0 / 3)
    sigma = np.sqrt(n0 / 2)
    y = 1 - 2 * d.astype(np.float64) + sigma * rng.normal(size=d.shape)
    llr = jnp.asarray((4 / n0 * y).astype(np.float32))

    dec = TurboDecoder(k=k, iterations=iters, window=window, impl="auto")

    @jax.jit
    def fn(llr):
        bits = None
        x = llr
        for _ in range(chain):
            bits, llr_out = dec.decode(x)
            x = llr + 0.0 * llr_out[0, 0]
        return bits

    t0 = time.time()
    bits = fn(llr)
    errs = int(np.sum(np.asarray(bits) != u))
    _ = int(bits[0, 0])
    print(f"compile+first: {time.time()-t0:.1f}s errs={errs}", flush=True)

    best = 0.0
    for trial in range(3):
        t1 = time.time()
        for _ in range(nrep):
            bits = fn(llr)
        _ = int(bits[0, 0])
        dt = (time.time() - t1) / (nrep * chain)
        mbps = batch * k / dt / 1e6
        best = max(best, mbps)
        print(f"trial {trial}: {dt*1e3:.2f} ms/decode -> {mbps:.0f} Mbps",
              flush=True)
    print(f"BEST batch={batch} chain={chain} window={window}: {best:.0f} Mbps")


if __name__ == "__main__":
    main()
