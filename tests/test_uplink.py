"""Uplink tests: DFT precoding, UL DMRS, PUSCH chain, PRACH detection.

Mirrors the reference's pusch_test / prach_test tiers (BASELINE config 4:
DFT-precoded SC-FDMA + turbo decode, batched subframes).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from empower_srslte_tpu.models.prach import prach_detect, prach_gen, prach_seq_len
from empower_srslte_tpu.models.pusch import PuschConfig, pusch_decode, pusch_encode
from empower_srslte_tpu.models.refsignal_ul import base_sequence, pusch_dmrs
from empower_srslte_tpu.ops.dft_precoding import dft_deprecode, dft_precode, valid_prb
from empower_srslte_tpu.ops.modem import Mod
from empower_srslte_tpu.utils import Cell


class TestDftPrecoding:
    def test_valid_prb(self):
        assert valid_prb(1) and valid_prb(12) and valid_prb(25) and valid_prb(96)
        assert not valid_prb(7) and not valid_prb(11) and not valid_prb(0)

    def test_unitary_roundtrip(self, rng):
        x = (rng.normal(size=(3, 144)) + 1j * rng.normal(size=(3, 144))).astype(np.complex64)
        y = dft_deprecode(dft_precode(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)
        p_in = np.mean(np.abs(x) ** 2)
        p_out = float(np.mean(np.abs(np.asarray(dft_precode(jnp.asarray(x)))) ** 2))
        assert abs(p_in - p_out) < 1e-3


class TestUlRs:
    @pytest.mark.parametrize("m_sc", [12, 24, 36, 144, 600])
    def test_base_sequence_cm(self, m_sc):
        r = base_sequence(5, 0, m_sc)
        assert r.shape == (m_sc,)
        np.testing.assert_allclose(np.abs(r), 1.0, rtol=1e-5)

    def test_sequences_distinct_groups(self):
        a = base_sequence(0, 0, 144)
        b = base_sequence(1, 0, 144)
        assert abs(np.vdot(a, b)) / 144 < 0.5

    def test_dmrs_shape(self):
        cell = Cell(nof_prb=25, id=9)
        d = pusch_dmrs(cell, 6, cyclic_shift=3)
        assert d.shape == (2, 72)
        np.testing.assert_allclose(np.abs(d), 1.0, rtol=1e-5)


class TestPusch:
    @pytest.mark.parametrize("mod,n_prb,tbs", [
        (Mod.QPSK, 6, 1096), (Mod.QAM16, 12, 4584), (Mod.QAM64, 25, 18336)])
    def test_roundtrip_flat_channel(self, mod, n_prb, tbs, rng):
        cell = Cell(nof_prb=25, id=7)
        cfg = PuschConfig(cell=cell, sf_idx=2, rnti=0x1d2c, mod=mod,
                          prb_start=0, n_prb=n_prb)
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(2, tbs)).astype(np.int8)
        grid = pusch_encode(jnp.asarray(tb), cfg, plan)
        h = (0.9 - 0.4j)
        rx = grid * h
        n0 = 1e-3
        rx = rx + jnp.asarray((rng.normal(size=rx.shape)
                               + 1j * rng.normal(size=rx.shape))
                              ).astype(jnp.complex64) * np.sqrt(n0 / 2)
        bits, ok, _ = pusch_decode(rx, cfg, plan, noise_est=n0)
        assert np.asarray(ok).all()
        assert np.array_equal(np.asarray(bits), tb)

    def test_roundtrip_selective_channel(self, rng):
        cell = Cell(nof_prb=25, id=3)
        cfg = PuschConfig(cell=cell, sf_idx=5, mod=Mod.QAM16, prb_start=4,
                          n_prb=12)
        tbs = 4584
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
        grid = pusch_encode(jnp.asarray(tb), cfg, plan)
        k = np.arange(cell.nof_re)
        h = (1.1 * np.exp(2j * np.pi * k / 900)).astype(np.complex64)
        rx = grid * jnp.asarray(h)
        n0 = 2e-3
        rx = rx + jnp.asarray((rng.normal(size=rx.shape)
                               + 1j * rng.normal(size=rx.shape))
                              ).astype(jnp.complex64) * np.sqrt(n0 / 2)
        bits, ok, _ = pusch_decode(rx, cfg, plan, noise_est=n0)
        assert bool(np.asarray(ok)[0])
        assert np.array_equal(np.asarray(bits)[0], tb[0])


class TestPrach:
    @pytest.mark.parametrize("idx", [0, 7, 33])
    def test_gen_detect_roundtrip(self, idx, rng):
        cell = Cell(nof_prb=25, id=1)
        sig = prach_gen(cell, rsi=22, preamble_idx=idx, zcz=5)
        cp = len(sig) - prach_seq_len(cell)
        win = sig[cp:]  # aligned sequence window
        win = win + 0.05 * (rng.normal(size=len(win))
                            + 1j * rng.normal(size=len(win))).astype(np.complex64)
        det, offs, met = prach_detect(jnp.asarray(win[None]), cell, rsi=22,
                                      zcz=5)
        d = np.asarray(det[0])
        assert d[idx], f"preamble {idx} not detected (metric {np.asarray(met[0])[idx]:.1f})"
        assert d.sum() == 1, f"false alarms: {np.nonzero(d)}"
        assert int(np.asarray(offs[0])[idx]) <= 2

    def test_timing_offset(self, rng):
        cell = Cell(nof_prb=25, id=1)
        sig = prach_gen(cell, rsi=22, preamble_idx=4, zcz=5)
        cp = len(sig) - prach_seq_len(cell)
        delay = 40
        win = np.concatenate([np.zeros(delay, np.complex64), sig[cp:]])
        det, offs, met = prach_detect(jnp.asarray(win[None]), cell, rsi=22,
                                      zcz=5)
        assert bool(np.asarray(det[0])[4])
        got = int(np.asarray(offs[0])[4])
        assert abs(got - delay) <= 12  # one ZC sample ~ 9.2 time samples


class TestUeUlFacade:
    def test_full_ul_subframe_roundtrip(self, rng):
        from empower_srslte_tpu.models.pucch import (
            PucchConfig, pucch_f1_bits, pucch_f1_decode)
        from empower_srslte_tpu.models.refsignal_ul import srs_chest
        from empower_srslte_tpu.models.ue_ul import (
            enb_ul_receive_grid, ue_ul_generate)

        cell = Cell(nof_prb=25, id=7)
        cfg = PuschConfig(cell=cell, sf_idx=3, mod=Mod.QAM16, prb_start=4,
                          n_prb=12)
        tbs = 4584
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(tbs,)).astype(np.int8)
        pcfg = PucchConfig(cell=cell, sf_idx=3, n_pucch=2, format="1a")

        samples = ue_ul_generate(
            cell,
            pusch=(jnp.asarray(tb)[None], cfg, plan),
            pucch=(pcfg, (1,)),
            srs=dict(n_prb_srs=4, prb_start=20),
        )
        # flat channel + noise
        h = 0.85 * np.exp(1j * 0.3)
        rx = np.asarray(samples) * h
        rx = rx + 0.002 * (rng.normal(size=rx.shape)
                           + 1j * rng.normal(size=rx.shape)).astype(np.complex64)
        grid = enb_ul_receive_grid(jnp.asarray(rx.astype(np.complex64)), cell)

        bits, ok, _ = pusch_decode(grid, cfg, plan, noise_est=1e-3)
        assert bool(np.asarray(ok)[0])
        assert np.array_equal(np.asarray(bits)[0], tb)

        d, _ = pucch_f1_decode(np.asarray(grid)[0], pcfg)
        assert pucch_f1_bits(d, "1a") == (1,)

        h_srs = np.asarray(srs_chest(grid, cell, 4, prb_start=20))[0]
        np.testing.assert_allclose(np.mean(h_srs), h, atol=0.05)


class TestUciOnPusch:
    """UCI multiplexing on PUSCH (36.212 5.2.2.6-8; sch.c:550-1095)."""

    def _cfg(self, mod=Mod.QAM16, n_prb=12):
        return PuschConfig(cell=Cell(nof_prb=25, id=1), n_prb=n_prb,
                           mod=mod, rnti=0x46)

    def test_interleaver_perm_is_bijection(self):
        from empower_srslte_tpu.models import uci as uci_mod

        rows, cols, qm = 48, 12, 4
        h = rows * cols
        ri = uci_mod.ri_ack_positions(6, qm, rows, True, ack=False)
        perm = uci_mod.ulsch_interleaver_perm(h, cols, qm, ri)
        assert len(perm) == h * qm - len(ri)
        assert len(np.unique(perm)) == len(perm)
        assert not np.intersect1d(perm, ri).size
        # ACK columns (around DMRS) and RI columns never collide
        ack = uci_mod.ri_ack_positions(6, qm, rows, True, ack=True)
        assert not np.intersect1d(ack, ri).size

    @pytest.mark.parametrize("mod,cqi_len,ack", [
        (Mod.QPSK, 5, (1,)),
        (Mod.QAM16, 5, (1,)),
        (Mod.QAM16, 16, (1, 0)),   # long CQI (conv-coded) + 2-bit ACK
        (Mod.QAM64, 7, (0,)),
    ])
    def test_data_plus_uci_roundtrip(self, rng, mod, cqi_len, ack):
        from empower_srslte_tpu.models.pusch import (
            UciData, UciPlan, pusch_decode_uci, pusch_encode_uci)

        cfg = self._cfg(mod)
        tbs = 1224
        tb = rng.integers(0, 2, tbs).astype(np.int8)
        uci = UciData(cqi_bits=tuple(int(x) for x in
                                     rng.integers(0, 2, cqi_len)),
                      ri=1, ack=ack)
        plan = UciPlan(cfg, tbs, uci)
        assert plan.q_ri > 0 and plan.q_ack > 0 and plan.q_cqi > 0
        grid = pusch_encode_uci(jnp.asarray(tb), cfg, plan)
        out = pusch_decode_uci(grid, cfg, plan, noise_est=1e-4)
        assert bool(np.asarray(out["crc_ok"]).all())
        assert np.array_equal(np.asarray(out["tb"]).ravel()[:tbs], tb)
        assert out["ri"] == 1
        assert out["ack"] == ack
        assert np.array_equal(out["cqi_bits"].ravel(),
                              np.asarray(uci.cqi_bits))
        if cqi_len > 11:
            assert out["cqi_ok"] is True

    def test_uci_only_pusch_awgn(self, rng):
        """Aperiodic CQI report without UL-SCH data (5.2.4 rules)."""
        from empower_srslte_tpu.models.pusch import (
            UciData, UciPlan, pusch_decode_uci, pusch_encode_uci)

        cfg = self._cfg(Mod.QPSK, n_prb=6)
        uci = UciData(cqi_bits=tuple(int(x) for x in rng.integers(0, 2, 7)),
                      ri=1, ack=(1,))
        plan = UciPlan(cfg, 0, uci)
        # UCI fills the whole grant when there is no data
        assert plan.q_cqi * plan.qm + plan.q_ri * plan.qm <= plan.nb_q
        grid = np.asarray(pusch_encode_uci(None, cfg, plan))
        grid = grid + 0.05 * (rng.normal(size=grid.shape)
                              + 1j * rng.normal(size=grid.shape))
        out = pusch_decode_uci(jnp.asarray(grid.astype(np.complex64)),
                               cfg, plan, noise_est=0.0025)
        assert np.array_equal(out["cqi_bits"].ravel(),
                              np.asarray(uci.cqi_bits))
        assert out["ri"] == 1 and out["ack"] == (1,)

    def test_ack_puncturing_does_not_break_data(self, rng):
        """ACK punctures data REs; the turbo code must still decode the
        TB with the punctured LLRs zeroed (sch.c:925-928)."""
        from empower_srslte_tpu.models.pusch import (
            UciData, UciPlan, pusch_decode_uci, pusch_encode_uci)

        cfg = self._cfg(Mod.QPSK)
        tbs = 600
        tb = rng.integers(0, 2, tbs).astype(np.int8)
        uci = UciData(ack=(1,), i_offset_ack=6)    # beta=8: many punctures
        plan = UciPlan(cfg, tbs, uci)
        assert plan.q_ack >= 8
        grid = pusch_encode_uci(jnp.asarray(tb), cfg, plan)
        out = pusch_decode_uci(grid, cfg, plan, noise_est=1e-4)
        assert bool(np.asarray(out["crc_ok"]).all())
        assert np.array_equal(np.asarray(out["tb"]).ravel()[:tbs], tb)
        assert out["ack"] == (1,)


class TestFrequencyHopping:
    """PUSCH frequency hopping (36.211 5.3.4, 36.213 8.4;
    pusch.c:55-180, ra.c:145-177)."""

    def test_type1_offsets(self):
        from empower_srslte_tpu.models.pusch import pusch_hop_type1

        # 25 PRB, no PUSCH hopping band: n_rb_pusch = 24
        assert pusch_hop_type1(25, 0, 2, "quart") == (2, 8)
        assert pusch_hop_type1(25, 0, 2, "half") == (2, 14)
        assert pusch_hop_type1(25, 0, 2, "quart_neg") == (2, 20)
        assert pusch_hop_type1(25, 0, 10, "quart_neg") == (10, 4)

    def test_type2_deterministic_and_in_range(self):
        from empower_srslte_tpu.models.pusch import pusch_hop_type2

        cell = Cell(nof_prb=50, id=7)
        for sf in range(10):
            s0, s1 = pusch_hop_type2(cell, n_sb=4, hopping_offset=4,
                                     inter_sf=False, n_vrb=6, sf_idx=sf)
            assert 0 <= s0 < 50 and 0 <= s1 < 50
            # deterministic
            assert (s0, s1) == pusch_hop_type2(cell, 4, 4, False, 6, sf)

    def test_hopped_roundtrip(self, rng):
        from empower_srslte_tpu.models.pusch import pusch_hop_type1

        cell = Cell(nof_prb=25, id=3)
        s0, s1 = pusch_hop_type1(25, 0, 2, "quart")
        cfg = PuschConfig(cell=cell, n_prb=4, prb_start=s0,
                          prb_start_slot1=s1, mod=Mod.QAM16, rnti=0x52)
        tbs = 1000
        tb = rng.integers(0, 2, tbs).astype(np.int8)
        plan = cfg.plan(tbs)
        grid = np.asarray(pusch_encode(jnp.asarray(tb), cfg, plan))
        half = cell.nsymb_slot
        # slot 1 energy sits at the hop target, none at the slot-0 PRBs
        assert np.abs(grid[half:, 12 * s1 : 12 * s1 + 48]).sum() > 1
        assert np.abs(grid[half:, 12 * s0 : 12 * s0 + 48]).sum() < 1e-6
        noisy = grid + 0.02 * (rng.normal(size=grid.shape)
                               + 1j * rng.normal(size=grid.shape))
        bits, ok, _ = pusch_decode(jnp.asarray(noisy.astype(np.complex64)),
                                   cfg, plan, noise_est=4e-4)
        assert bool(np.asarray(ok).all())
        assert np.array_equal(np.asarray(bits).ravel()[:tbs], tb)

    def test_hopping_with_uci_mux(self, rng):
        from empower_srslte_tpu.models.pusch import (
            UciData, UciPlan, pusch_decode_uci, pusch_encode_uci,
            pusch_hop_type1)

        cell = Cell(nof_prb=25, id=3)
        s0, s1 = pusch_hop_type1(25, 0, 2, "half")
        cfg = PuschConfig(cell=cell, n_prb=4, prb_start=s0,
                          prb_start_slot1=s1, mod=Mod.QAM16, rnti=0x52)
        tbs = 1000
        tb = rng.integers(0, 2, tbs).astype(np.int8)
        uci = UciData(cqi_bits=(1, 0, 1, 1), ri=1, ack=(1,))
        plan = UciPlan(cfg, tbs, uci)
        grid = pusch_encode_uci(jnp.asarray(tb), cfg, plan)
        out = pusch_decode_uci(grid, cfg, plan, noise_est=1e-4)
        assert bool(np.asarray(out["crc_ok"]).all())
        assert out["ri"] == 1 and out["ack"] == (1,)
        assert np.array_equal(out["cqi_bits"].ravel(), [1, 0, 1, 1])
