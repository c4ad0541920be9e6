"""Stage-level profile of the 20 MHz MIMO receiver on the real chip.

Times extract+equalize / demod+descramble / de-rate-match+turbo
separately (same shapes as tools/bench_pdsch.py 20mimo) to locate the
next perf bottleneck.
"""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np
import jax
import jax.numpy as jnp

from empower_srslte_tpu.models.pdsch import (PdschConfig, pdsch_decode,
                                             pdsch_encode, pdsch_extract)
from empower_srslte_tpu.models import ra
from empower_srslte_tpu.ops.equalizer import (MimoType,
                                              effective_channel_mux,
                                              eq_mux_2x2, layerdemap)
from empower_srslte_tpu.ops.modem import demod_soft
from empower_srslte_tpu.ops.scrambling import descramble_llrs
from empower_srslte_tpu.models.sch import dlsch_decode
from empower_srslte_tpu.utils import Cell


def timeit(name, fn, *args, reps=5):
    r = fn(*args)          # compile
    _sync(r)
    r = fn(*args)          # warm (first post-compile call is slow on axon)
    _sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    _sync(r)
    dt = (time.time() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


def _sync(r):
    for x in jax.tree_util.tree_leaves(r):
        np.asarray(jax.device_get(x))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.default_rng(0)
    cell = Cell(nof_prb=100, nof_ports=2, id=1)
    mod, tbs = ra.mcs_to_tbs(27, 100)
    cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod,
                      mimo=MimoType.SPATIAL_MUX, nof_layers=2,
                      nof_codewords=2)
    plan = cfg.plan(tbs)
    n0 = 1e-3
    hs = (batch, 2, 2, 14, 1200)
    ns = (batch, 2, 14, 1200)
    h_re = jnp.asarray(rng.normal(size=hs).astype(np.float32))
    h_im = jnp.asarray(rng.normal(size=hs).astype(np.float32))
    tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
    tb2 = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
    nz_re = jnp.asarray((rng.normal(size=ns) * np.sqrt(n0/2)).astype(np.float32))
    nz_im = jnp.asarray((rng.normal(size=ns) * np.sqrt(n0/2)).astype(np.float32))

    @jax.jit
    def make_rx(tb, tb2, h_re, h_im, nz_re, nz_im):
        h = jax.lax.complex(h_re, h_im)
        ports = pdsch_encode(tb, cfg, plan, tb2, plan)
        y = (jnp.einsum("brpsk,bpsk->brsk", h, ports)
             + jax.lax.complex(nz_re, nz_im))
        return jnp.real(y), jnp.imag(y)

    y_re, y_im = make_rx(jnp.asarray(tb), jnp.asarray(tb2), h_re, h_im,
                         nz_re, nz_im)
    m = cfg.nof_symbols

    @jax.jit
    def stage_eq(y_re, y_im, h_re, h_im):
        grid = jax.lax.complex(y_re, y_im)
        h = jax.lax.complex(h_re, h_im)
        y = pdsch_extract(grid, cfg)
        hp = jnp.stack([pdsch_extract(h[..., :, p, :, :], cfg)
                        for p in range(2)], axis=-2)
        h_eff = effective_channel_mux(hp, cfg.pmi)
        x, csi = eq_mux_2x2(y, h_eff, n0)
        cw_syms = layerdemap(x, 2)
        csis = layerdemap(csi, 2)
        return (jnp.real(cw_syms[0]), jnp.imag(cw_syms[0]),
                jnp.real(cw_syms[1]), jnp.imag(cw_syms[1]),
                csis[0], csis[1])

    @jax.jit
    def stage_eq_t(y_re, y_im, h_re, h_im):
        out = stage_eq(y_re, y_im, h_re, h_im)
        return sum(jnp.sum(o) for o in out)

    eq_out = stage_eq(y_re, y_im, h_re, h_im)

    @jax.jit
    def stage_demod(x0r, x0i, x1r, x1i, c0, c1):
        outs = []
        for (xr, xi), csi, cw in (((x0r, x0i), c0, 0), ((x1r, x1i), c1, 1)):
            syms = jax.lax.complex(xr, xi)
            llr = demod_soft(syms, cfg.mod)
            w = jnp.repeat(csi, cfg.mod.bits_per_symbol, axis=-1)
            llr = llr * w
            outs.append(descramble_llrs(llr, cfg.cinit(cw)))
        return tuple(outs)

    llrs = stage_demod(*eq_out)

    @jax.jit
    def stage_demod_t(*a):
        return sum(jnp.sum(o) for o in stage_demod(*a))

    @jax.jit
    def stage_dlsch(llr0, llr1):
        b0, ok0, _ = dlsch_decode(llr0, plan)
        b1, ok1, _ = dlsch_decode(llr1, plan)
        return jnp.sum(ok0) + jnp.sum(ok1)

    @jax.jit
    def full(y_re, y_im, h_re, h_im):
        y = jax.lax.complex(y_re, y_im)
        h = jax.lax.complex(h_re, h_im)
        (b1, b2), (ok1, ok2), _ = pdsch_decode(
            y, h, cfg, plan, noise_est=n0, plan2=plan)
        return jnp.sum(ok1) + jnp.sum(ok2)

    print(f"batch={batch}, tbs={tbs}, platform="
          f"{jax.devices()[0].platform}")
    t_eq = timeit("extract+equalize+demap", stage_eq_t, y_re, y_im, h_re,
                  h_im)
    t_dm = timeit("demod+csi+descramble", stage_demod_t, *eq_out)
    t_tc = timeit("de-RM+turbo (2 cw)", stage_dlsch, *llrs)
    t_full = timeit("full receiver", full, y_re, y_im, h_re, h_im)
    bits = 2 * tbs * batch
    print(f"sum of stages: {(t_eq+t_dm+t_tc)*1e3:.2f} ms; "
          f"full: {t_full*1e3:.2f} ms -> {bits/t_full/1e6:.0f} Mbps")


if __name__ == "__main__":
    main()


def profile_dlsch_detail(batch=128):
    """Finer split of the dlsch stage: de-RM vs turbo vs CRC early-stop."""
    import dataclasses

    rng = np.random.default_rng(0)
    cell = Cell(nof_prb=100, nof_ports=2, id=1)
    mod, tbs = ra.mcs_to_tbs(27, 100)
    cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod,
                      mimo=MimoType.SPATIAL_MUX, nof_layers=2,
                      nof_codewords=2)
    plan = cfg.plan(tbs)
    print("cb_plans:", plan.segm.c, "CBs,",
          sorted({(k, e) for k, e, _f, _o in plan.cb_plans}))
    # DECODABLE llrs (valid codeword + margin): the early-stop path's
    # runtime depends on when CRCs pass — random data never passes and
    # measures the worst case instead of the operating point
    from empower_srslte_tpu.models.sch import dlsch_encode

    tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
    cw = jax.jit(lambda t: dlsch_encode(t, plan))(jnp.asarray(tb))
    llr = (1.0 - 2.0 * cw.astype(jnp.float32)) * 8.0

    (k, e, f), members = max(
        {(kk, ee, ff): [(i, o) for i, (k2, e2, f2, o) in
                        enumerate(plan.cb_plans) if (k2, e2, f2) == (kk, ee, ff)]
         for kk, ee, ff in {(k2, e2, f2) for k2, e2, f2, _ in plan.cb_plans}
         }.items(), key=lambda kv: len(kv[1]))

    @jax.jit
    def derm_only(llr):
        seg = jnp.stack([llr[..., off: off + e] for _, off in members],
                        axis=-2)
        d_llr, ns = plan.rm(k, f).rx(seg, plan.rv)
        return jnp.sum(d_llr) + jnp.sum(ns)

    @jax.jit
    def derm_out(llr):
        seg = jnp.stack([llr[..., off: off + e] for _, off in members],
                        axis=-2)
        d_llr, _ = plan.rm(k, f).rx(seg, plan.rv)
        return d_llr

    d_llr = derm_out(llr)
    from empower_srslte_tpu.utils.crc import CRC24B

    @jax.jit
    def turbo_es(d_llr):
        bits, _ = plan.decoder(k).decode(d_llr, crc=CRC24B)
        return jnp.sum(bits)

    @jax.jit
    def turbo_fixed(d_llr):
        bits, _ = plan.decoder(k).decode(d_llr, crc=None)
        return jnp.sum(bits)

    print(f"one group: {len(members)} CBs x K={k}, E={e}, "
          f"total {batch * len(members)} CBs")
    timeit("de-RM only", derm_only, llr)
    timeit("turbo early-stop", turbo_es, d_llr)
    timeit("turbo fixed 5 iter", turbo_fixed, d_llr)


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "dlsch":
    profile_dlsch_detail(int(sys.argv[1]))
