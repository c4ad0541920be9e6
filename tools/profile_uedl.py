"""Stage profile of the FULL-CHAIN 20 MHz MIMO receiver (bench_uedl mimo).

Times each front-end stage (FFT, chest, noise, PCFICH, blind PDCCH) and
the PDSCH decode separately, each as its own jitted+chained program, to
locate where the gap between rx_uedl_20mimo and the genie rx_20mimo goes.
Usage: python tools/profile_uedl.py [batch]
"""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np
import jax
import jax.numpy as jnp

from empower_srslte_tpu.models import ra
from empower_srslte_tpu.models.dci import format0_1a_size, format1_size
from empower_srslte_tpu.models.enb_dl import (enb_dl_base_grid,
                                              enb_dl_gen_signal)
from empower_srslte_tpu.models.pcfich import pcfich_decode, pcfich_put
from empower_srslte_tpu.models.pdcch import (pdcch_blind_bits,
                                             pdcch_encode,
                                             pdcch_extract_llr,
                                             ue_search_candidates)
from empower_srslte_tpu.models.pdsch import (PdschConfig, pdsch_decode,
                                             pdsch_encode)
from empower_srslte_tpu.models.regs import pdcch_nof_cces
from empower_srslte_tpu.ops.chest import chest_dl, noise_est_pilots
from empower_srslte_tpu.ops.equalizer import MimoType
from empower_srslte_tpu.ops.fec.convcoder import viterbi_decode
from empower_srslte_tpu.ops.fec.rm_conv import rm_conv_rx
from empower_srslte_tpu.ops.ofdm import ofdm_rx_sf
from empower_srslte_tpu.utils import Cell
from empower_srslte_tpu.utils.bits import uint_to_bits
from empower_srslte_tpu.utils.crc import CRC16


def _sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(jnp.abs(jnp.ravel(x)[0]).astype(jnp.float32)))


def timeit(name, fn, *args, reps=4, chain=4):
    """Time fn chained `chain` times per dispatch via a data dependency."""

    @jax.jit
    def chained(*a):
        # cross-iteration dependency on arg 0 so XLA cannot hoist the body
        def body(carry, _):
            a0, acc = carry
            r = fn(a0, *a[1:])
            s = jnp.abs(
                jax.tree_util.tree_leaves(r)[0].ravel()[0]
            ).astype(jnp.float32)
            return (a[0] + 0.0 * s.astype(a[0].dtype), acc + s), None
        (_, out), _ = jax.lax.scan(
            body, (a[0], jnp.zeros((), jnp.float32)), None, length=chain)
        return out

    r = chained(*args)
    _sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = chained(*args)
    _sync(r)
    dt = (time.time() - t0) / (reps * chain)
    print(f"{name:46s} {dt*1e3:8.2f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(7)
    sf_idx, cfi, rnti = 1, 1, 0x1234
    cell = Cell(nof_prb=100, nof_ports=2, id=1)
    mod, tbs = ra.mcs_to_tbs(25, 100)
    cfg = PdschConfig(cell=cell, sf_idx=sf_idx, cfi=cfi, rnti=rnti,
                      mod=mod, mimo=MimoType.SPATIAL_MUX,
                      nof_layers=2, nof_codewords=2)
    plan = cfg.plan(tbs)
    nprb = 100
    size1 = format1_size(nprb)
    size1a = format0_1a_size(nprb)
    dci_bits = rng.integers(0, 2, size1).astype(np.int8)
    tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
    tb2 = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
    sf_len = cell.sf_sample_len
    snr_db = 30.0
    ph = rng.uniform(0, 2 * np.pi, size=(batch, 2, 2))
    mag = np.where(np.eye(2, dtype=bool)[None], 1.0, 0.35)
    h2 = (mag * np.exp(1j * ph)).astype(np.complex64)

    @jax.jit
    def make_tx(tb, tb2, h2_re, h2_im, nz_re, nz_im):
        grid = enb_dl_base_grid(cell, sf_idx, batch_shape=(batch,))
        grid = pcfich_put(grid, cfi, cell, sf_idx)
        grid = grid + pdcch_encode(jnp.asarray(dci_bits), rnti, 0, 4,
                                   cell, cfi, sf_idx)
        grid = grid + pdsch_encode(tb, cfg, plan, tb2, plan)
        h2c = jax.lax.complex(h2_re, h2_im)
        grid = jnp.einsum("brp,bpsk->brsk", h2c, grid)
        samples = enb_dl_gen_signal(grid, cell)
        p_sig = jnp.mean(jnp.abs(samples) ** 2)
        sigma = jnp.sqrt(p_sig * 10 ** (-snr_db / 10) / 2)
        y = samples + sigma * jax.lax.complex(nz_re, nz_im)
        return jnp.real(y), jnp.imag(y)

    nshape = (batch, 2, sf_len)
    nz_re = jnp.asarray(rng.normal(size=nshape).astype(np.float32))
    nz_im = jnp.asarray(rng.normal(size=nshape).astype(np.float32))
    s_re, s_im = make_tx(jnp.asarray(tb), jnp.asarray(tb2),
                         jnp.asarray(np.real(h2)),
                         jnp.asarray(np.imag(h2)), nz_re, nz_im)
    _sync(s_re)
    print(f"batch={batch} 20MHz TM4 MCS25 tbs={tbs}")

    # --- stage 1: OFDM FFT
    def s_fft(s_re, s_im):
        return ofdm_rx_sf(jax.lax.complex(s_re, s_im), cell)

    grid = jax.jit(s_fft)(s_re, s_im)
    _sync(grid)
    g_re, g_im = jnp.real(grid), jnp.imag(grid)
    timeit("ofdm_rx_sf (2 rx)", s_fft, s_re, s_im)

    # --- stage 2: chest x (rx, port)
    def s_chest(g_re, g_im):
        grid = jax.lax.complex(g_re, g_im)
        h = jnp.stack(
            [jnp.stack([chest_dl(grid[:, r], cell, sf_idx, port=p)
                        for p in range(2)], axis=1)
             for r in range(2)], axis=1)
        return jnp.real(h)

    timeit("chest_dl x4 (rx,port)", s_chest, g_re, g_im)

    def s_noise(g_re, g_im):
        grid = jax.lax.complex(g_re, g_im)
        return noise_est_pilots(grid[:, 0], cell, sf_idx)

    timeit("noise_est_pilots", s_noise, g_re, g_im)

    # --- stage 3: PCFICH
    h_full = jax.jit(lambda a, b: s_chest(a, b))(g_re, g_im)

    def s_pcfich(g_re, g_im):
        grid = jax.lax.complex(g_re, g_im)
        h = jnp.stack(
            [jnp.stack([chest_dl(grid[:, r], cell, sf_idx, port=p)
                        for p in range(2)], axis=1)
             for r in range(2)], axis=1)
        n0 = jnp.maximum(noise_est_pilots(grid[:, 0], cell, sf_idx), 1e-7)
        cfi_hat, _ = pcfich_decode(grid[:, 0], h[:, 0], cell, sf_idx,
                                   noise_est=n0[..., None])
        return cfi_hat

    timeit("chest+noise+pcfich", s_pcfich, g_re, g_im)

    # --- stage 4: blind PDCCH
    cands = ue_search_candidates(rnti, sf_idx, pdcch_nof_cces(cell, cfi))
    mask16 = jnp.asarray(uint_to_bits(rnti & 0xFFFF, 16))
    print(f"  pdcch candidates: {cands}, sizes {size1}/{size1a}")

    def s_pdcch(g_re, g_im):
        grid = jax.lax.complex(g_re, g_im)
        h = jnp.stack(
            [jnp.stack([chest_dl(grid[:, r], cell, sf_idx, port=p)
                        for p in range(2)], axis=1)
             for r in range(2)], axis=1)
        n0 = jnp.maximum(noise_est_pilots(grid[:, 0], cell, sf_idx), 1e-7)
        llr = pdcch_extract_llr(grid[:, 0], h[:, 0], cell, cfi, sf_idx,
                                noise_est=n0[..., None])
        n_det = jnp.zeros((), jnp.int32)
        for size in {size1, size1a}:
            bits = pdcch_blind_bits(llr, cands, size)
            unmasked = jnp.concatenate(
                [bits[..., :size],
                 jnp.bitwise_xor(bits[..., size:], mask16)], axis=-1)
            n_det = n_det + jnp.sum(
                CRC16.jnp_check(unmasked).astype(jnp.int32))
        return n_det

    timeit("chest+noise+pdcch blind search", s_pdcch, g_re, g_im)

    # --- isolated viterbi cost
    llr0 = jax.jit(lambda a, b: pdcch_extract_llr(
        jax.lax.complex(a, b)[:, 0], h_full[:, 0].astype(jnp.complex64),
        cell, cfi, sf_idx))(g_re, g_im)
    _sync(llr0)

    def s_vit(llr):
        n_det = jnp.zeros((), jnp.int32)
        for size in {size1, size1a}:
            bits = pdcch_blind_bits(llr, cands, size)
            n_det = n_det + jnp.sum(bits[..., 0].astype(jnp.int32))
        return n_det

    timeit("  viterbi blind search alone", s_vit, llr0)

    # --- stage 5: PDSCH decode with estimated channel
    def s_pdsch(g_re, g_im, h_re, h_im):
        grid = jax.lax.complex(g_re, g_im)
        h = jax.lax.complex(h_re, h_im)
        n0 = jnp.maximum(noise_est_pilots(grid[:, 0], cell, sf_idx), 1e-7)
        _bits, (ok1, ok2), _ = pdsch_decode(
            grid, h, cfg, plan, noise_est=n0[:, None], plan2=plan)
        return jnp.sum(ok1.astype(jnp.int32)) + jnp.sum(
            ok2.astype(jnp.int32))

    h_c = jax.jit(lambda a, b: jax.lax.complex(a, b))
    h4 = jax.jit(lambda g_re, g_im: s_chest(g_re, g_im))(g_re, g_im)

    def s_chest_c(g_re, g_im):
        grid = jax.lax.complex(g_re, g_im)
        return jnp.stack(
            [jnp.stack([chest_dl(grid[:, r], cell, sf_idx, port=p)
                        for p in range(2)], axis=1)
             for r in range(2)], axis=1)

    hgrid = jax.jit(s_chest_c)(g_re, g_im)
    h_re, h_im = jnp.real(hgrid), jnp.imag(hgrid)
    _sync(h_re)
    timeit("pdsch_decode (estimated h)", s_pdsch, g_re, g_im, h_re, h_im)

    # --- full fn for reference
    def s_full(s_re, s_im):
        grid = ofdm_rx_sf(jax.lax.complex(s_re, s_im), cell)
        h = jnp.stack(
            [jnp.stack([chest_dl(grid[:, r], cell, sf_idx, port=p)
                        for p in range(2)], axis=1)
             for r in range(2)], axis=1)
        n0 = jnp.maximum(noise_est_pilots(grid[:, 0], cell, sf_idx), 1e-7)
        cfi_hat, _ = pcfich_decode(grid[:, 0], h[:, 0], cell, sf_idx,
                                   noise_est=n0[..., None])
        llr = pdcch_extract_llr(grid[:, 0], h[:, 0], cell, cfi, sf_idx,
                                noise_est=n0[..., None])
        n_det = jnp.zeros((), jnp.int32)
        for size in {size1, size1a}:
            bits = pdcch_blind_bits(llr, cands, size)
            unmasked = jnp.concatenate(
                [bits[..., :size],
                 jnp.bitwise_xor(bits[..., size:], mask16)], axis=-1)
            n_det = n_det + jnp.sum(
                CRC16.jnp_check(unmasked).astype(jnp.int32))
        _bits, (ok1, ok2), _ = pdsch_decode(
            grid, h, cfg, plan, noise_est=n0[:, None], plan2=plan)
        ok_sum = jnp.sum(ok1.astype(jnp.int32)) + jnp.sum(
            ok2.astype(jnp.int32))
        return ok_sum + jnp.sum((cfi_hat == cfi).astype(jnp.int32)) + n_det

    dt = timeit("FULL chain", s_full, s_re, s_im)
    mbps = 2 * tbs * batch / dt / 1e6
    print(f"  -> {mbps:.0f} Mbps")


if __name__ == "__main__":
    main()
