"""Measurement/selection features: PMI selection, condition number, CP
detection, SFO, cell-search voting, RSRQ, pilot-CFO, empty-SC noise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from empower_srslte_tpu.models.enb_dl import (
    enb_dl_base_grid,
    enb_dl_gen_signal,
    put_sync_signals,
)
from empower_srslte_tpu.models.ue_sync import cell_search_vote
from empower_srslte_tpu.ops.chest import cfo_est_pilots, rsrq
from empower_srslte_tpu.ops.equalizer import (
    codebook_2x2,
    condition_number_db,
    pmi_select_1layer,
    pmi_select_2layer,
)
from empower_srslte_tpu.ops.sync import detect_cp, sfo_estimate
from empower_srslte_tpu.utils import CP, Cell


class TestPmiSelect:
    def test_picks_matched_precoder(self, rng):
        # channel built so codebook entry 1 is strongly favored: H = U W1^H
        n = 200
        w1 = np.asarray(codebook_2x2(1))
        h = np.zeros((2, 2, n), np.complex64)
        for i in range(n):
            u = np.diag([1.0, 0.9]).astype(np.complex64)
            h[:, :, i] = u @ w1.conj().T * 2
        pmi, sinr = pmi_select_2layer(jnp.asarray(h), noise_est=1e-3)
        assert int(np.asarray(pmi)) == 1

    def test_1layer_select(self, rng):
        n = 100
        # h1 = +h0 -> v=+1 (pmi 0) maximizes |h0 + v h1|
        h = np.stack([np.ones((1, n)), np.ones((1, n))], axis=1).astype(np.complex64)
        pmi, _ = pmi_select_1layer(jnp.asarray(h), noise_est=1e-3)
        assert int(np.asarray(pmi)) == 0
        h2 = np.stack([np.ones((1, n)), -np.ones((1, n))], axis=1).astype(np.complex64)
        pmi2, _ = pmi_select_1layer(jnp.asarray(h2), noise_est=1e-3)
        assert int(np.asarray(pmi2)) == 1

    def test_condition_number(self, rng):
        n = 64
        h_good = np.tile(np.eye(2, dtype=np.complex64)[:, :, None], (1, 1, n))
        cn = float(np.asarray(condition_number_db(jnp.asarray(h_good))))
        assert cn < 0.5
        h_bad = h_good.copy()
        h_bad[1, 1] *= 0.01
        cn_bad = float(np.asarray(condition_number_db(jnp.asarray(h_bad))))
        assert cn_bad > 30


class TestSyncMeasurements:
    @pytest.mark.parametrize("cp", [CP.NORM, CP.EXT])
    def test_detect_cp(self, cp, rng):
        cell = Cell(nof_prb=6, id=1, cp=cp)
        grid = (rng.normal(size=(cell.nsymb_sf, cell.nof_re))
                + 1j * rng.normal(size=(cell.nsymb_sf, cell.nof_re))).astype(np.complex64)
        from empower_srslte_tpu.ops.ofdm import ofdm_tx_sf

        s = ofdm_tx_sf(jnp.asarray(grid), cell)
        is_norm, mn, me = detect_cp(s, 6)
        assert bool(np.asarray(is_norm)) == (cp is CP.NORM)

    def test_sfo_estimate(self):
        frame = 19200
        drift = 1.7  # samples per frame
        peaks = jnp.asarray((1000 + drift * np.arange(6)).astype(np.int32))
        est = float(np.asarray(sfo_estimate(peaks[None], frame)[0]))
        assert abs(est - drift) < 0.4

    def test_cell_search_vote(self, rng):
        cell = Cell(nof_prb=6, id=302)  # N_id_2 = 2
        sfs = []
        for i in range(30):
            g = enb_dl_base_grid(cell, i % 10, ())
            g = put_sync_signals(g, cell, i % 10)
            sfs.append(np.asarray(enb_dl_gen_signal(g, cell))[0])
        sig = np.concatenate(sfs)
        sig = sig + 0.05 * (rng.normal(size=len(sig))
                            + 1j * rng.normal(size=len(sig))).astype(np.complex64)
        best, votes, psr = cell_search_vote(sig, 6, max_frames=3)
        assert best == 2
        assert votes[2] == 3


class TestChestMeasurements:
    def test_rsrq_flat(self):
        cell = Cell(nof_prb=6, id=1)
        from tests.test_chest_eq import _grid_with_crs

        h = np.ones(cell.nof_re, np.complex64)
        grid = _grid_with_crs(cell, 0, 0, h)
        q = float(np.asarray(rsrq(jnp.asarray(grid[None]), cell, 0)[0]))
        assert q > 0

    def test_cfo_from_pilots(self, rng):
        cell = Cell(nof_prb=25, id=1)
        from tests.test_chest_eq import _grid_with_crs
        from empower_srslte_tpu.ops.ofdm import ofdm_rx_sf, ofdm_tx_sf

        h = np.ones(cell.nof_re, np.complex64)
        grid = _grid_with_crs(cell, 0, 0, h)
        s = np.asarray(ofdm_tx_sf(jnp.asarray(grid[None]), cell))
        cfo_true = 0.03
        n = np.arange(s.shape[-1])
        s = s * np.exp(2j * np.pi * cfo_true * n / cell.fft_size)
        rx = ofdm_rx_sf(jnp.asarray(s.astype(np.complex64)), cell)
        est = float(np.asarray(cfo_est_pilots(rx, cell, 0)[0]))
        assert abs(est - cfo_true) < 0.01


class TestUeReports:
    def test_cqi_staircase(self):
        from empower_srslte_tpu.models.measurements import cqi_from_snr

        import jax.numpy as jnp

        vals = np.asarray(cqi_from_snr(jnp.asarray([-10.0, 0.0, 12.0, 30.0])))
        assert vals[0] == 0 and vals[-1] == 15
        assert np.all(np.diff(vals) >= 0)

    def test_full_report(self, rng):
        from empower_srslte_tpu.models.measurements import ue_measurement_report

        import jax.numpy as jnp

        n = 120
        # well-conditioned strong channel -> rank 2, high CQI
        h_good = np.tile((2 * np.eye(2, dtype=np.complex64))[:, :, None],
                         (1, 1, n))
        rep = ue_measurement_report(jnp.asarray(h_good), noise_est=1e-3)
        assert int(np.asarray(rep["ri"])) == 2
        assert int(np.asarray(rep["cqi"])) >= 13
        # rank-1 channel -> ri 1, lower rank report
        u = (rng.normal(size=2) + 1j * rng.normal(size=2)).astype(np.complex64)
        h_r1 = np.einsum("r,p->rp", u, u.conj())[:, :, None].repeat(n, -1)
        rep1 = ue_measurement_report(jnp.asarray(h_r1.astype(np.complex64)),
                                     noise_est=1e-3)
        assert int(np.asarray(rep1["ri"])) == 1
