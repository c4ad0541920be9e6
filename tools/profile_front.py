"""Front-end (extract/equalize/demod) sub-stage profile at rx_20mimo."""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np
import jax
import jax.numpy as jnp

from empower_srslte_tpu.models import ra
from empower_srslte_tpu.models.pdsch import (PdschConfig, pdsch_encode,
                                             pdsch_extract)
from empower_srslte_tpu.ops.equalizer import (MimoType,
                                              effective_channel_mux,
                                              eq_mux_2x2, layerdemap)
from empower_srslte_tpu.ops.modem import demod_soft
from empower_srslte_tpu.ops.scrambling import descramble_llrs
from empower_srslte_tpu.utils import Cell


def _sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(x.ravel()[0]))


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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    cell = Cell(nof_prb=100, nof_ports=2, id=1)
    mod, tbs = ra.mcs_to_tbs(27, 100)
    cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod,
                      mimo=MimoType.SPATIAL_MUX, nof_layers=2,
                      nof_codewords=2)
    n0 = 1e-3
    hs = (batch, 2, 2, 14, 1200)
    h_re = jnp.asarray(rng.normal(size=hs).astype(np.float32))
    h_im = jnp.asarray(rng.normal(size=hs).astype(np.float32))
    ys = (batch, 2, 14, 1200)
    y_re = jnp.asarray(rng.normal(size=ys).astype(np.float32))
    y_im = jnp.asarray(rng.normal(size=ys).astype(np.float32))
    m = cfg.nof_symbols
    print(f"batch={batch}, M={m}, nof_re={cfg.nof_re}")

    @jax.jit
    def s_extract_y(y_re, y_im):
        y = pdsch_extract(jax.lax.complex(y_re, y_im), cfg)
        return jnp.sum(jnp.abs(y))

    @jax.jit
    def s_extract_yh(y_re, y_im, h_re, h_im):
        y = pdsch_extract(jax.lax.complex(y_re, y_im), cfg)
        h = jax.lax.complex(h_re, h_im)
        hp = jnp.stack([pdsch_extract(h[..., :, p, :, :], cfg)
                        for p in range(2)], axis=-2)
        return jnp.sum(jnp.abs(y)) + jnp.sum(jnp.abs(hp))

    @jax.jit
    def s_eq(y_re, y_im, h_re, h_im):
        y = pdsch_extract(jax.lax.complex(y_re, y_im), cfg)
        h = jax.lax.complex(h_re, h_im)
        hp = jnp.stack([pdsch_extract(h[..., :, p, :, :], cfg)
                        for p in range(2)], axis=-2)
        h_eff = effective_channel_mux(hp, cfg.pmi)
        x, csi = eq_mux_2x2(y, h_eff, n0)
        return jnp.sum(jnp.abs(x)) + jnp.sum(csi)

    @jax.jit
    def s_full_llr(y_re, y_im, h_re, h_im):
        y = pdsch_extract(jax.lax.complex(y_re, y_im), cfg)
        h = jax.lax.complex(h_re, h_im)
        hp = jnp.stack([pdsch_extract(h[..., :, p, :, :], cfg)
                        for p in range(2)], axis=-2)
        h_eff = effective_channel_mux(hp, cfg.pmi)
        x, csi = eq_mux_2x2(y, h_eff, n0)
        cw_syms = layerdemap(x, 2)
        csis = layerdemap(csi, 2)
        out = []
        for cwi, (syms, c) in enumerate(zip(cw_syms, csis)):
            llr = demod_soft(syms, cfg.mod)
            w = jnp.repeat(c, cfg.mod.bits_per_symbol, axis=-1)
            out.append(descramble_llrs(llr * w, cfg.cinit(cwi)))
        return sum(jnp.sum(o) for o in out)

    timeit("extract y", s_extract_y, y_re, y_im)
    timeit("extract y+h(2 ports)", s_extract_yh, y_re, y_im, h_re, h_im)
    timeit("+ eq_mux_2x2", s_eq, y_re, y_im, h_re, h_im)
    timeit("+ demod+csi+descramble (full llr)", s_full_llr,
           y_re, y_im, h_re, h_im)


if __name__ == "__main__":
    main()
