"""Full PDSCH/PUSCH chain throughput on TPU (BASELINE configs 2/3/4).

Equalize -> demod -> descramble -> de-rate-match -> turbo decode for a
batch of subframes; reports decoded Mbps and subframes/s. Reference
figures: 150 Mbps at 20 MHz 2x2 DL (README.md:39), 36 Mbps at 10 MHz
SISO DL, 50 Mbps eNB UL at 20 MHz (README.md:58).

Usage: python tools/bench_pdsch.py [batch] [config: 20mimo|10siso|20ul]
"""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np

import jax
import jax.numpy as jnp

from empower_srslte_tpu.models.pdsch import PdschConfig, pdsch_decode, pdsch_encode
from empower_srslte_tpu.ops.equalizer import MimoType
from empower_srslte_tpu.models import ra
from empower_srslte_tpu.utils import Cell


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    config = sys.argv[2] if len(sys.argv) > 2 else "20mimo"
    rng = np.random.default_rng(0)

    if config == "20mimo":
        cell = Cell(nof_prb=100, nof_ports=2, id=1)
        mod, tbs = ra.mcs_to_tbs(27, 100)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod,
                          mimo=MimoType.SPATIAL_MUX, nof_layers=2,
                          nof_codewords=2)
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
        tb2 = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
        n0 = 1e-3
        hs = (batch, 2, 2, 14, 1200)
        ns = (batch, 2, 14, 1200)
        # complex values never cross the host-device boundary (the axon
        # backend cannot transfer complex64): encode + channel + decode is
        # ONE jit over real inputs
        h_re = rng.normal(size=hs).astype(np.float32)
        h_im = rng.normal(size=hs).astype(np.float32)
        nz_re = (rng.normal(size=ns) * np.sqrt(n0 / 2)).astype(np.float32)
        nz_im = (rng.normal(size=ns) * np.sqrt(n0 / 2)).astype(np.float32)

        @jax.jit
        def make_rx(tb, tb2, h_re, h_im, nz_re, nz_im):
            h = jax.lax.complex(h_re, h_im)
            ports = pdsch_encode(tb, cfg, plan, tb2, plan)
            y = (jnp.einsum("brpsk,bpsk->brsk", h, ports)
                 + jax.lax.complex(nz_re, nz_im))
            return jnp.real(y), jnp.imag(y)

        y_re, y_im = make_rx(*(jnp.asarray(a) for a in
                               (tb, tb2, h_re, h_im, nz_re, nz_im)))

        # timed section = the RECEIVER only (pdsch_test decode Mbps)
        def fn(y_re, y_im, h_re, h_im):
            y = jax.lax.complex(y_re, y_im)
            h = jax.lax.complex(h_re, h_im)
            (b1, b2), (ok1, ok2), _ = pdsch_decode(
                y, h, cfg, plan, noise_est=n0, plan2=plan)
            return jnp.sum(ok1) + jnp.sum(ok2)

        bits_per_sf = 2 * tbs
        args = (y_re, y_im, jnp.asarray(h_re), jnp.asarray(h_im))
    elif config == "20ul":
        # eNB uplink receiver: SC-FDMA grid -> DMRS-free equalize (ideal
        # h) -> IDFT de-precoding -> demod -> de-RM -> turbo
        from empower_srslte_tpu.models.pusch import (PuschConfig,
                                                     pusch_decode,
                                                     pusch_encode)

        cell = Cell(nof_prb=100, nof_ports=1, id=1)
        mod, tbs = ra.mcs_to_tbs(20, 96, dl=False)
        cfg = PuschConfig(cell=cell, sf_idx=1, rnti=0x1234, mod=mod,
                          prb_start=0, n_prb=96)
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
        n0 = 1e-3

        @jax.jit
        def make_rx(tb):
            grid = pusch_encode(tb, cfg, plan)
            hval = jax.lax.complex(jnp.float32(0.95), jnp.float32(0.1))
            y = grid * hval
            return jnp.real(y), jnp.imag(y)

        y_re, y_im = make_rx(jnp.asarray(tb))

        def fn(y_re, y_im):
            y = jax.lax.complex(y_re, y_im)
            bits, ok, _ = pusch_decode(y, cfg, plan, noise_est=n0)
            return jnp.sum(ok)

        bits_per_sf = tbs
        args = (y_re, y_im)
    else:
        cell = Cell(nof_prb=50, nof_ports=1, id=1)
        mod, tbs = ra.mcs_to_tbs(23, 50)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod)
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
        n0 = 1e-3

        @jax.jit
        def make_rx(tb):
            grid = pdsch_encode(tb, cfg, plan)
            hval = jax.lax.complex(jnp.float32(0.9), jnp.float32(-0.2))
            y = grid * hval
            return jnp.real(y), jnp.imag(y)

        y_re, y_im = make_rx(jnp.asarray(tb))

        def fn(y_re, y_im):
            y = jax.lax.complex(y_re, y_im)
            hval = jax.lax.complex(jnp.float32(0.9), jnp.float32(-0.2))
            h = jnp.broadcast_to(hval, (batch, 1, 1, 14, 600))
            bits, ok, _ = pdsch_decode(y, h, cfg, plan, noise_est=n0)
            return jnp.sum(ok)

        bits_per_sf = tbs
        args = (y_re, y_im)

    jfn = jax.jit(fn)
    t0 = time.time()
    r = jfn(*args)
    n_ok = int(r)
    total = 2 * batch if config == "20mimo" else batch
    print(f"compile+first: {time.time()-t0:.1f}s; ok={n_ok}/{total}")

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        r = jfn(*args)
    _ = int(r)  # sync
    dt = (time.time() - t0) / reps
    mbps = batch * bits_per_sf / dt / 1e6
    print(f"{config} batch={batch}: {dt*1e3:.2f} ms -> {mbps:.0f} Mbps, "
          f"{batch/dt:.0f} subframes/s")


if __name__ == "__main__":
    main()
