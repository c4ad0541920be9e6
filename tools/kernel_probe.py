"""Standalone timing probe for the fused MAP kernel (axon-safe sync)."""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np
import jax
import jax.numpy as jnp

from empower_srslte_tpu.ops.fec.turbo_decoder_pallas import (
    fold_lanes, map_decode_fused, pad_trellis_rows)


def main():
    k = 6144
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    l = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    mdt = jnp.bfloat16 if (len(sys.argv) > 6 and sys.argv[6] == 'bf16') else jnp.float32
    o = int(sys.argv[5]) if len(sys.argv) > 5 else (48 if group == 16 else 40)
    t0 = time.time()
    rng = np.random.default_rng(0)
    lsa = fold_lanes(pad_trellis_rows(
        jnp.asarray(rng.normal(size=(k + 3, b)).astype(np.float32)).astype(mdt), o, 1e5))
    lp = fold_lanes(pad_trellis_rows(
        jnp.asarray(rng.normal(size=(k + 3, b)).astype(np.float32)).astype(mdt), o, 0.0))
    lsa, lp = jax.block_until_ready((lsa, lp))
    print("inputs ready", time.time() - t0, flush=True)

    fn = jax.jit(lambda a, p: map_decode_fused(a, p, k, l, o, lanes=lanes, group=group))
    r = fn(lsa, lp)
    print("dispatched", time.time() - t0, flush=True)
    _ = float(r[0, 0, 0])
    print("first result", time.time() - t0, flush=True)

    t1 = time.time()
    for _ in range(10):
        r = fn(lsa, lp)
    _ = float(r[0, 0, 0])
    dt = (time.time() - t1) / 10
    print(f"dt={mdt.__name__} l={l} o={o} lanes={lanes} group={group} per-kernel: {dt*1e3:.2f} ms -> half-iter throughput "
          f"{b*k/dt/1e6:.0f} Mbit/s-of-halfiters", flush=True)


if __name__ == "__main__":
    main()
