"""PDSCH end-to-end tests: encode -> (channel) -> decode, across MIMO modes.

Mirrors the reference's pdsch_test sweep (lib/src/phy/phch/test/
CMakeLists.txt: pdsch_test -x single/diversity/multiplex) and the
phy_dl_test eNB->UE in-memory loop (SURVEY.md section 4 tier 3).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from empower_srslte_tpu.models.enb_dl import enb_dl_base_grid, enb_dl_gen_signal
from empower_srslte_tpu.models.pdsch import PdschConfig, pdsch_encode, pdsch_decode
from empower_srslte_tpu.models.sch import DlschPlan, dlsch_decode, dlsch_encode
from empower_srslte_tpu.ops.chest import chest_dl
from empower_srslte_tpu.ops.equalizer import MimoType
from empower_srslte_tpu.ops.modem import Mod
from empower_srslte_tpu.ops.ofdm import ofdm_rx_sf
from empower_srslte_tpu.utils import Cell


class TestDlsch:
    @pytest.mark.parametrize("tbs,g", [(1000, 3200), (104, 400), (12000, 39000)])
    def test_roundtrip_noiseless(self, tbs, g, rng):
        plan = DlschPlan(tbs=tbs, g=g, qm=2)
        tb = rng.integers(0, 2, size=(2, tbs)).astype(np.int8)
        cw = dlsch_encode(jnp.asarray(tb), plan)
        assert cw.shape == (2, g)
        llr = (1.0 - 2.0 * np.asarray(cw).astype(np.float32)) * 6.0
        bits, ok, _ = dlsch_decode(jnp.asarray(llr), plan)
        assert np.asarray(ok).all()
        assert np.array_equal(np.asarray(bits), tb)

    def test_crc_fails_on_corruption(self, rng):
        plan = DlschPlan(tbs=1000, g=3200, qm=2)
        tb = rng.integers(0, 2, size=(1, 1000)).astype(np.int8)
        cw = np.asarray(dlsch_encode(jnp.asarray(tb), plan))
        llr = (1.0 - 2.0 * cw.astype(np.float32)) * 6.0
        llr[:, 100:140] *= -1  # strong burst corruption
        bits, ok, _ = dlsch_decode(jnp.asarray(llr), plan)
        # decoder may still fix it; if it does CRC says ok and bits match
        if bool(np.asarray(ok)[0]):
            assert np.array_equal(np.asarray(bits)[0], tb[0])

    def test_multi_cb_segmented(self, rng):
        plan = DlschPlan(tbs=20000, g=64000, qm=4)
        assert plan.segm.c > 1
        tb = rng.integers(0, 2, size=(1, 20000)).astype(np.int8)
        cw = dlsch_encode(jnp.asarray(tb), plan)
        llr = (1.0 - 2.0 * np.asarray(cw).astype(np.float32)) * 6.0
        bits, ok, _ = dlsch_decode(jnp.asarray(llr), plan)
        assert bool(np.asarray(ok)[0])
        assert np.array_equal(np.asarray(bits)[0], tb[0])


def _awgn(x, snr_db, rng):
    p = np.mean(np.abs(x) ** 2)
    n0 = p / 10 ** (snr_db / 10)
    n = (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)) * np.sqrt(n0 / 2)
    return (x + n).astype(np.complex64), n0


class TestPdschSiso:
    @pytest.mark.parametrize("mod,tbs", [(Mod.QPSK, 4000), (Mod.QAM16, 8000), (Mod.QAM64, 12000)])
    def test_ideal_channel(self, mod, tbs, rng):
        cell = Cell(nof_prb=25, id=1)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod)
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(2, tbs)).astype(np.int8)
        grid = pdsch_encode(jnp.asarray(tb), cfg, plan)    # [2, 1, 14, 300]
        h = jnp.ones_like(grid)[..., None, :, :, :].swapaxes(-3, -4)  # dummy
        h = jnp.ones((2, 1, 1, 14, 300), jnp.complex64)
        bits, ok, _ = pdsch_decode(grid, h, cfg, plan, noise_est=1e-3)
        assert np.asarray(ok).all()
        assert np.array_equal(np.asarray(bits), tb)

    def test_ofdm_chest_awgn_chain(self, rng):
        # full tier-3 loop: compose grid + CRS -> iFFT -> AWGN -> FFT ->
        # chest -> PDSCH decode
        cell = Cell(nof_prb=25, id=1)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=Mod.QAM16)
        tbs = 6456  # moderate rate
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
        base = enb_dl_base_grid(cell, 1, (1,))
        grid = base + pdsch_encode(jnp.asarray(tb), cfg, plan)
        samples = enb_dl_gen_signal(grid, cell)[:, 0]      # port 0
        noisy, _ = _awgn(np.asarray(samples), 18.0, rng)
        rx_grid = ofdm_rx_sf(jnp.asarray(noisy), cell)     # [1, 14, 300]
        h = chest_dl(rx_grid, cell, 1)[:, None, None]      # [1, A=1, P=1, 14, 300]
        noise = 10 ** (-18 / 10)
        bits, ok, _ = pdsch_decode(rx_grid[:, None], h, cfg, plan, noise_est=noise)
        assert bool(np.asarray(ok)[0])
        assert np.array_equal(np.asarray(bits)[0], tb[0])


class TestPdschMimo:
    def test_sfbc_diversity(self, rng):
        cell = Cell(nof_prb=25, nof_ports=2, id=1)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=Mod.QPSK,
                          mimo=MimoType.DIVERSITY, nof_layers=2)
        tbs = 4392
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
        ports = pdsch_encode(jnp.asarray(tb), cfg, plan)   # [1, 2, 14, 300]
        # flat random per-port channel (SFBC assumes pairwise-equal h; a
        # flat channel keeps the test exact regardless of RE pairing)
        n = cell.nof_re
        h0 = np.full((14, n), rng.normal() + 1j * rng.normal(), np.complex64)
        h1 = np.full((14, n), rng.normal() + 1j * rng.normal(), np.complex64)
        y = ports[:, 0] * h0 + ports[:, 1] * h1
        noisy, n0 = _awgn(np.asarray(y), 15.0, rng)
        h = jnp.stack([jnp.asarray(h0), jnp.asarray(h1)], axis=0)[None, None]
        bits, ok, _ = pdsch_decode(jnp.asarray(noisy)[:, None], h, cfg, plan,
                                   noise_est=n0)
        assert bool(np.asarray(ok)[0])
        assert np.array_equal(np.asarray(bits)[0], tb[0])

    @pytest.mark.parametrize("ncw", [1, 2])
    def test_spatial_mux_2x2(self, ncw, rng):
        cell = Cell(nof_prb=25, nof_ports=2, id=1)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=Mod.QAM16,
                          mimo=MimoType.SPATIAL_MUX, nof_layers=2,
                          nof_codewords=ncw, pmi=1)
        tbs = 6456
        plan = cfg.plan(tbs, )
        plan = DlschPlan(tbs=tbs, g=cfg.g, qm=4, n_layers=2 // ncw)
        tb = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
        if ncw == 2:
            tb2 = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
            ports = pdsch_encode(jnp.asarray(tb), cfg, plan, jnp.asarray(tb2), plan)
        else:
            tb2 = None
            ports = pdsch_encode(jnp.asarray(tb), cfg, plan)
        # well-conditioned 2x2 channel per subcarrier
        hmat = (rng.normal(size=(2, 2, 14, cell.nof_re))
                + 1j * rng.normal(size=(2, 2, 14, cell.nof_re))).astype(np.complex64)
        y = np.einsum("rpsk,bpsk->brsk", hmat, np.asarray(ports))
        noisy, n0 = _awgn(y, 25.0, rng)
        h = jnp.asarray(hmat)[None]                        # [1, rx, port, s, k]
        if ncw == 2:
            (b1, b2), (ok1, ok2), _ = pdsch_decode(
                jnp.asarray(noisy), h, cfg, plan, noise_est=n0,
                plan2=plan)
            assert bool(np.asarray(ok1)[0]) and bool(np.asarray(ok2)[0])
            assert np.array_equal(np.asarray(b1)[0], tb[0])
            assert np.array_equal(np.asarray(b2)[0], tb2[0])
        else:
            bits, ok, _ = pdsch_decode(jnp.asarray(noisy), h, cfg, plan, noise_est=n0)
            assert bool(np.asarray(ok)[0])
            assert np.array_equal(np.asarray(bits)[0], tb[0])


class TestPdschCdd:
    @pytest.mark.parametrize("ncw", [1, 2])
    def test_tm3_cdd_2x2(self, ncw, rng):
        cell = Cell(nof_prb=25, nof_ports=2, id=1)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=Mod.QAM16,
                          mimo=MimoType.CDD, nof_layers=2, nof_codewords=ncw)
        tbs = 6456
        plan = DlschPlan(tbs=tbs, g=cfg.g, qm=4, n_layers=2 // ncw)
        tb = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
        if ncw == 2:
            tb2 = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
            ports = pdsch_encode(jnp.asarray(tb), cfg, plan, jnp.asarray(tb2), plan)
        else:
            ports = pdsch_encode(jnp.asarray(tb), cfg, plan)
        hmat = (rng.normal(size=(2, 2, 14, cell.nof_re))
                + 1j * rng.normal(size=(2, 2, 14, cell.nof_re))).astype(np.complex64)
        y = np.einsum("rpsk,bpsk->brsk", hmat, np.asarray(ports))
        noisy, n0 = _awgn(y, 25.0, rng)
        h = jnp.asarray(hmat)[None]
        if ncw == 2:
            (b1, b2), (ok1, ok2), _ = pdsch_decode(
                jnp.asarray(noisy), h, cfg, plan, noise_est=n0, plan2=plan)
            assert bool(np.asarray(ok1)[0]) and bool(np.asarray(ok2)[0])
            assert np.array_equal(np.asarray(b1)[0], tb[0])
            assert np.array_equal(np.asarray(b2)[0], tb2[0])
        else:
            bits, ok, _ = pdsch_decode(jnp.asarray(noisy), h, cfg, plan,
                                       noise_est=n0)
            assert bool(np.asarray(ok)[0])
            assert np.array_equal(np.asarray(bits)[0], tb[0])


class TestFourPortDiversity:
    def test_sfbc_fstd_4port_flat_channel(self, rng):
        """4-port SFBC-FSTD (TM2 with 4 CRS ports; precoding.c:1863-1889)
        through the full PDSCH encode/decode with per-port flat channels."""
        cell = Cell(nof_prb=25, nof_ports=4, id=1)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=Mod.QAM16,
                          mimo=MimoType.DIVERSITY, nof_layers=4)
        tbs = 4392
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
        ports = pdsch_encode(jnp.asarray(tb), cfg, plan)   # [1, 4, 14, 300]
        assert ports.shape[1] == 4
        n = cell.nof_re
        hs = [np.full((14, n), rng.normal() + 1j * rng.normal(),
                      np.complex64) for _ in range(4)]
        y = sum(np.asarray(ports[:, p]) * hs[p] for p in range(4))
        noisy, n0 = _awgn(y, 15.0, rng)
        h = jnp.stack([jnp.asarray(x) for x in hs], axis=0)[None, None]
        bits, ok, _ = pdsch_decode(jnp.asarray(noisy)[:, None], h, cfg,
                                   plan, noise_est=n0)
        assert bool(np.asarray(ok)[0])
        assert np.array_equal(np.asarray(bits)[0], tb[0])

    def test_ports_occupy_disjoint_re_groups(self, rng):
        """FSTD structure: ports 0/2 are silent on REs (4i+2, 4i+3) and
        ports 1/3 on REs (4i, 4i+1)."""
        from empower_srslte_tpu.ops.equalizer import (layermap,
                                                      precode_sfbc_fstd)

        x = jnp.asarray((rng.normal(size=32)
                         + 1j * rng.normal(size=32)).astype(np.complex64))
        ports = np.asarray(precode_sfbc_fstd(layermap([x], 4)))
        quads = ports.reshape(4, -1, 4)
        assert np.allclose(quads[0][:, 2:], 0) and np.allclose(quads[2][:, 2:], 0)
        assert np.allclose(quads[1][:, :2], 0) and np.allclose(quads[3][:, :2], 0)
        # total TX power preserved (1/sqrt2 pairs, 2 active ports per RE)
        assert np.isclose(np.sum(np.abs(ports) ** 2),
                          np.sum(np.abs(np.asarray(x)) ** 2), rtol=1e-5)
