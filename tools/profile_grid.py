"""Profile the grid-domain fused receiver composition at rx_20mimo."""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np
import jax
import jax.numpy as jnp

from empower_srslte_tpu.models import ra
from empower_srslte_tpu.models.pdsch import (PdschConfig, _grid_maps,
                                             _pdsch_decode_fused_grid,
                                             pdsch_encode)
from empower_srslte_tpu.models.sch import _dlsch_decode_fused
from empower_srslte_tpu.ops.equalizer import MimoType, \
    effective_channel_mux, eq_mux_2x2
from empower_srslte_tpu.ops.modem import demod_soft
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
    plan = cfg.plan(tbs)
    n0 = 1e-3
    hs = (batch, 2, 2, 14, 1200)
    h_re = jnp.asarray(rng.normal(size=hs).astype(np.float32))
    h_im = jnp.asarray(rng.normal(size=hs).astype(np.float32))
    ys = (batch, 2, 14, 1200)
    y_re = jnp.asarray(rng.normal(size=ys).astype(np.float32))
    y_im = jnp.asarray(rng.normal(size=ys).astype(np.float32))
    sk = cell.nsymb_sf * cell.nof_re
    bps = cfg.mod.bits_per_symbol
    rows, signs = _grid_maps(cfg)

    def llr_rows_of(y_re, y_im, h_re, h_im):
        y = jax.lax.complex(y_re, y_im).reshape(batch, 2, sk)
        h = jax.lax.complex(h_re, h_im).reshape(batch, 2, 2, sk)
        h_eff = effective_channel_mux(h, cfg.pmi)
        x, csi = eq_mux_2x2(y, h_eff, n0)
        outs = []
        for cw in range(2):
            llr = demod_soft(x[..., cw, :], cfg.mod)
            llr = (llr.reshape(*llr.shape[:-1], sk, bps)
                   * csi[..., cw, :, None]).reshape(*llr.shape)
            outs.append(llr * jnp.asarray(signs[cw]))
        return jnp.stack(outs, axis=0)

    @jax.jit
    def llr_only(y_re, y_im, h_re, h_im):
        return jnp.sum(llr_rows_of(y_re, y_im, h_re, h_im)
                       .astype(jnp.float32))

    @jax.jit
    def llr_mat(y_re, y_im, h_re, h_im):
        return llr_rows_of(y_re, y_im, h_re, h_im)

    @jax.jit
    def dlsch_from_mat(llr_rows):
        _b, ok, _s = _dlsch_decode_fused(llr_rows, plan, 256, 8, False,
                                         g_map=rows)
        return jnp.sum(ok)

    @jax.jit
    def full_grid(y_re, y_im, h_re, h_im):
        llr_rows = llr_rows_of(y_re, y_im, h_re, h_im)
        _b, ok, _s = _dlsch_decode_fused(llr_rows, plan, 256, 8, False,
                                         g_map=rows)
        return jnp.sum(ok)

    print(f"batch={batch}, platform={jax.devices()[0].platform}")
    timeit("grid llr rows (reduce only)", llr_only, y_re, y_im, h_re, h_im)
    lm = llr_mat(y_re, y_im, h_re, h_im)
    timeit("grid llr rows (materialize)", llr_mat, y_re, y_im, h_re, h_im)
    timeit("fused dlsch from materialized llr", dlsch_from_mat, lm)
    timeit("full grid receiver", full_grid, y_re, y_im, h_re, h_im)


if __name__ == "__main__":
    main()
