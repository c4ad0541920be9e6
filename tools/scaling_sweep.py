"""Weak-scaling sweep of the flagship sharded step over a virtual mesh.

Runs the 20 MHz TM4 two-codeword encode->channel->decode step of
__graft_entry__.dryrun_multichip at 1/2/4/8 devices with FIXED
per-device work (one subframe per device), printing subframes/s per
configuration — the multi-chip table for docs/BENCHMARKS.md.

On this box the devices are virtual (xla_force_host_platform_device_count
on 2 vCPUs), so absolute numbers are CPU-bound; the point of the table
is that the sharded program compiles, executes, and keeps per-device
work constant as the mesh grows (collectives ride the mesh axes instead
of replicating).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/scaling_sweep.py
"""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "tests/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from empower_srslte_tpu.models import ra
    from empower_srslte_tpu.models.pdsch import (PdschConfig, pdsch_decode,
                                                 pdsch_encode)
    from empower_srslte_tpu.ops.equalizer import MimoType
    from empower_srslte_tpu.parallel import make_mesh
    from empower_srslte_tpu.utils.cell import Cell

    cell = Cell(nof_prb=100, nof_ports=2, id=1)
    mod, tbs = ra.mcs_to_tbs(18, 100)
    cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod,
                      mimo=MimoType.SPATIAL_MUX, nof_layers=2,
                      nof_codewords=2, pmi=0)
    plan = cfg.plan(tbs, decoder_impl="xla")
    rng = np.random.default_rng(0)

    print(f"{'devices':>8} {'mesh':>8} {'sf/step':>8} {'ms/step':>9} "
          f"{'sf/s':>9} {'Mbps':>8}")
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        mesh = make_mesh(n)
        n_car, n_sf = mesh.shape["carrier"], mesh.shape["sf"]
        tb = rng.integers(0, 2, size=(n_car, n_sf, tbs)).astype(np.int8)
        tb2 = rng.integers(0, 2, size=(n_car, n_sf, tbs)).astype(np.int8)
        shard = NamedSharding(mesh, P("carrier", "sf"))
        tb_dev = jax.device_put(jnp.asarray(tb), shard)
        tb2_dev = jax.device_put(jnp.asarray(tb2), shard)

        @jax.jit
        def step(tb_bits, tb2_bits):
            ports = pdsch_encode(tb_bits, cfg, plan, tb2_bits, plan)
            hm = jnp.asarray([[0.9 + 0.1j, 0.2 - 0.1j],
                              [-0.15 + 0.2j, 0.85 - 0.05j]], jnp.complex64)
            rx = jnp.einsum("rp,...psk->...rsk", hm, ports)
            h = jnp.broadcast_to(
                hm[:, :, None, None],
                (*tb_bits.shape[:-1], 2, 2, cell.nsymb_sf, cell.nof_re))
            (b1, b2), (ok1, ok2), _ = pdsch_decode(
                rx, h, cfg, plan, noise_est=1e-4, plan2=plan)
            return jnp.logical_and(ok1, ok2)

        ok = np.asarray(step(tb_dev, tb2_dev))     # compile + check
        assert ok.all(), f"CRC failed at n={n}"
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = step(tb_dev, tb2_dev)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        sfs = n_car * n_sf
        print(f"{n:>8} {f'{n_car}x{n_sf}':>8} {sfs:>8} {dt*1e3:>9.1f} "
              f"{sfs/dt:>9.1f} {sfs*2*tbs/dt/1e6:>8.1f}")


if __name__ == "__main__":
    main()
