"""Sync tests: PSS/SSS generation+detection, CFO, full capture alignment.

Mirrors the reference's sync test tier (10 tests) and the pdsch_ue
file-mode flow (SURVEY.md section 3.5): a generated multi-subframe
capture with timing offset, CFO and noise must be found, identified and
aligned, then a PDSCH inside it decoded (BASELINE config 1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from empower_srslte_tpu.models.enb_dl import (
    enb_dl_base_grid,
    enb_dl_gen_signal,
    put_sync_signals,
)
from empower_srslte_tpu.models.pdsch import PdschConfig, pdsch_decode, pdsch_encode
from empower_srslte_tpu.models.ue_sync import sync_and_align
from empower_srslte_tpu.ops.chest import chest_dl
from empower_srslte_tpu.ops.modem import Mod
from empower_srslte_tpu.ops.ofdm import ofdm_rx_sf
from empower_srslte_tpu.ops.sync import (
    cfo_correct,
    pss_find,
    pss_freq,
    pss_time,
    sss_detect,
    sss_freq,
)
from empower_srslte_tpu.utils import Cell


class TestPss:
    def test_zc_properties(self):
        for r in range(3):
            d = pss_freq(r)
            np.testing.assert_allclose(np.abs(d), 1.0, rtol=1e-6)
        # cross-correlation between roots is low
        c = abs(np.vdot(pss_freq(0), pss_freq(1))) / 62
        assert c < 0.3

    def test_detect_position(self, rng):
        fft = 128
        sig = np.zeros(2000, np.complex64)
        t = pss_time(1, fft)
        pos = 700
        sig[pos : pos + fft] = t
        sig += 0.05 * (rng.normal(size=2000) + 1j * rng.normal(size=2000)).astype(np.complex64)
        mag, peak, psr = pss_find(jnp.asarray(sig[None]), fft)
        assert int(np.asarray(jnp.argmax(psr[0]))) == 1
        assert int(np.asarray(peak[0, 1])) == pos

    def test_cfo_estimate_and_correct(self, rng):
        fft = 128
        cfo_true = 0.31  # subcarrier units
        t = pss_time(2, fft)
        sig = np.zeros(1000, np.complex64)
        sig[500 : 500 + fft] = t
        n = np.arange(1000)
        sig = sig * np.exp(2j * np.pi * cfo_true * n / fft)
        from empower_srslte_tpu.ops.sync import pss_cfo_estimate

        est = float(np.asarray(pss_cfo_estimate(
            jnp.asarray(sig[None]), jnp.asarray([500]), 2, fft)[0]))
        assert abs(est - cfo_true) < 0.02
        back = cfo_correct(jnp.asarray(sig), est, fft)
        # after correction the replica correlates coherently
        seg = np.asarray(back)[500 : 500 + fft]
        assert abs(np.vdot(t, seg)) > 0.95 * np.linalg.norm(seg)


class TestSss:
    def test_sequences_binary(self):
        d = sss_freq(17, 1, 0)
        assert set(np.unique(d.real)) <= {-1.0, 1.0}

    @pytest.mark.parametrize("nid1,sf", [(0, 0), (17, 5), (167, 0), (83, 5)])
    def test_detect_exact(self, nid1, sf):
        d = sss_freq(nid1, 2, sf)
        got1, got5, metric = sss_detect(jnp.asarray(d[None]), 2)
        assert int(np.asarray(got1[0])) == nid1
        assert bool(np.asarray(got5[0])) == (sf == 5)
        assert float(np.asarray(metric[0])) > 0.9

    def test_detect_with_noise(self, rng):
        d = sss_freq(101, 0, 5) + 0.3 * (
            rng.normal(size=62) + 1j * rng.normal(size=62)).astype(np.complex64)
        got1, got5, _ = sss_detect(jnp.asarray(d[None]), 0)
        assert int(np.asarray(got1[0])) == 101
        assert bool(np.asarray(got5[0]))


class TestCaptureAlignment:
    def _build_capture(self, cell, rng, nof_sf=22, cfo=0.0, offset=1234,
                       snr_db=20.0, payload=None):
        sfs = []
        for i in range(nof_sf):
            sf_idx = i % 10
            grid = enb_dl_base_grid(cell, sf_idx, ())
            grid = put_sync_signals(grid, cell, sf_idx)
            if payload is not None and sf_idx == payload[0]:
                grid = grid + payload[1]
            sfs.append(np.asarray(enb_dl_gen_signal(grid, cell))[0])
        sig = np.concatenate(sfs)
        n = np.arange(len(sig))
        sig = sig * np.exp(2j * np.pi * cfo * n / cell.fft_size)
        sig = np.concatenate([
            0.01 * (rng.normal(size=offset) + 1j * rng.normal(size=offset)),
            sig]).astype(np.complex64)
        p = np.mean(np.abs(sig) ** 2)
        n0 = p / 10 ** (snr_db / 10)
        sig = sig + (rng.normal(size=len(sig)) + 1j * rng.normal(size=len(sig))
                     ).astype(np.complex64) * np.sqrt(n0 / 2)
        return sig.astype(np.complex64)

    @pytest.mark.parametrize("cell_id,cfo", [(151, 0.0), (301, 0.22), (7, -0.15)])
    def test_find_and_align(self, cell_id, cfo, rng):
        cell = Cell(nof_prb=6, id=cell_id)
        sig = self._build_capture(cell, rng, cfo=cfo, offset=2500)
        res = sync_and_align(sig, cell_prb=6)
        assert res.cell_id == cell_id
        assert abs(res.cfo - cfo) < 0.03
        # offset: sf0 starts at 2500 + k*10*sf_len
        assert (res.sf0_offset - 2500) % (10 * cell.sf_sample_len) == 0

    def test_end_to_end_pdsch_from_capture(self, rng):
        # BASELINE config 1: 1.4 MHz SISO PDSCH decode from raw IQ
        cell = Cell(nof_prb=6, id=31)
        cfg = PdschConfig(cell=cell, sf_idx=3, cfi=2, mod=Mod.QPSK)
        tbs = 1096
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
        payload_grid = pdsch_encode(jnp.asarray(tb), cfg, plan)[0]
        sig = self._build_capture(cell, rng, cfo=0.1, offset=777, snr_db=25,
                                  payload=(3, payload_grid))
        res = sync_and_align(sig, cell_prb=6)
        assert res.cell_id == 31
        # subframe 3 of the first full frame
        sf3 = res.subframes[3][None]
        grid = ofdm_rx_sf(sf3, cell)
        h = chest_dl(grid, cell, 3)[:, None, None]
        bits, ok, _ = pdsch_decode(grid[:, None], h, cfg, plan, noise_est=3e-3)
        assert bool(np.asarray(ok)[0])
        assert np.array_equal(np.asarray(bits)[0], tb[0])

    def test_cell_measurement_app(self, rng):
        # cell_measurement.c analog: sync then averaged RSRP/RSRQ/RSSI/SNR
        import pathlib
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                               / "apps"))
        from cell_measurement import measure

        cell = Cell(nof_prb=6, id=31)
        ms = []
        for snr_db in (25.0, 13.0):
            sig = self._build_capture(cell, rng, nof_sf=22, offset=400,
                                      snr_db=snr_db)
            res = sync_and_align(sig, cell_prb=6)
            assert res.cell_id == 31
            ms.append(measure(np.asarray(res.subframes), 6, res.cell_id))
        # 12 dB more injected noise -> ~12 dB lower pilot-estimated SNR
        delta = 10 * np.log10(ms[0]["snr"] / ms[1]["snr"])
        assert abs(delta - 12.0) < 2.0
        # RSRP (per-pilot-RE power) tracks the unchanged signal level
        assert abs(10 * np.log10(ms[0]["rsrp"] / ms[1]["rsrp"])) < 1.0
        # base grid is mostly empty: mean-RE power (RSSI) sits between the
        # noise floor and the per-pilot-RE power (RSRP)
        assert ms[0]["rsrp"] > ms[0]["rssi"] > ms[0]["rsrp"] / ms[0]["snr"]


class TestSfoEstimate:
    def test_known_drift_recovered(self):
        """PSS peaks drifting k samples per half-frame -> sfo_estimate
        returns the injected slope (sfo.c least-squares parity)."""
        from empower_srslte_tpu.models.ue_sync import sfo_estimate
        from empower_srslte_tpu.ops.sync import pss_time

        cell = Cell(nof_prb=6, id=1)
        half = 5 * cell.sf_sample_len
        n_win = 8
        drift = 3.0                      # samples per half-frame
        sig = np.zeros(n_win * half, np.complex64)
        t = np.asarray(pss_time(cell.n_id_2, cell.fft_size))
        base = 1000
        for i in range(n_win):
            p = base + i * half + int(round(i * drift))
            sig[p : p + len(t)] += t.astype(np.complex64)
        est = sfo_estimate(sig, cell.n_id_2, 6, max_windows=n_win)
        assert abs(est["drift_samples_per_frame"] - 2 * drift) < 0.6
        assert abs(est["sfo_hz"] - drift / 5e-3) < 120.0

    def test_zero_drift(self):
        from empower_srslte_tpu.models.ue_sync import sfo_estimate
        from empower_srslte_tpu.ops.sync import pss_time

        cell = Cell(nof_prb=6, id=1)
        half = 5 * cell.sf_sample_len
        sig = np.zeros(4 * half, np.complex64)
        t = np.asarray(pss_time(cell.n_id_2, cell.fft_size))
        for i in range(4):
            p = 500 + i * half
            sig[p : p + len(t)] += t.astype(np.complex64)
        est = sfo_estimate(sig, cell.n_id_2, 6, max_windows=4)
        assert abs(est["sfo_hz"]) < 40.0
