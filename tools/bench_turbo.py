"""Quick turbo-decoder throughput exploration on the real TPU.

Usage: python tools/bench_turbo.py [batch] [window] [iters]
Prints Mbps for K=6144 CBs.
"""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np

import jax
import jax.numpy as jnp

from empower_srslte_tpu.ops.fec import TurboDecoder, turbo_encode_np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    impl = sys.argv[4] if len(sys.argv) > 4 else "xla"
    k = 6144

    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, size=(batch, k)).astype(np.int8)
    d = turbo_encode_np(u)
    ebn0 = 10 ** (1.5 / 10)
    n0 = 1.0 / (ebn0 / 3)
    sigma = np.sqrt(n0 / 2)
    y = 1 - 2 * d.astype(np.float64) + sigma * rng.normal(size=d.shape)
    llr = jnp.asarray((4 / n0 * y).astype(np.float32))

    dec = TurboDecoder(k=k, iterations=iters, window=(window or None), impl=impl)
    fn = jax.jit(dec.decode)

    t0 = time.time()
    bits, _ = fn(llr)
    _ = int(bits[0, 0])  # axon block_until_ready is async; force readback
    print(f"compile+first run: {time.time()-t0:.1f}s on {jax.devices()[0].platform}")
    errs = int(np.sum(np.asarray(bits) != u))
    print(f"bit errors: {errs}")

    n_rep = 5
    t0 = time.time()
    for _ in range(n_rep):
        bits, _ = fn(llr)
    _ = int(bits[0, 0])  # serial device stream: syncs all reps
    dt = (time.time() - t0) / n_rep
    mbps = batch * k / dt / 1e6
    print(f"batch={batch} window={window} iters={iters} impl={impl}: {dt*1e3:.2f} ms "
          f"-> {mbps:.1f} Mbps")


if __name__ == "__main__":
    main()
