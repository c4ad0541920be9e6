"""Channel estimation and equalizer tests.

Mirrors the reference's chest (9 tests) and mimo (26 tests) unit tiers:
synthetic channels through CRS-bearing grids, estimate vs truth; ZF/MMSE
and SFBC combining recover known symbols (SURVEY.md section 4 tier 1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from empower_srslte_tpu.models.refsignal import crs_mask, crs_pilots
from empower_srslte_tpu.ops.chest import chest_dl, noise_est_pilots, rssi
from empower_srslte_tpu.ops.equalizer import (
    eq_mux_2x2,
    eq_sfbc,
    eq_single,
    effective_channel_mux,
    layerdemap,
    layermap,
    precode_mux_2x2,
    precode_sfbc,
)
from empower_srslte_tpu.utils import Cell


def _grid_with_crs(cell, sf_idx, port, h_freq):
    """Grid carrying CRS of one port through a frequency channel h[nre]."""
    grid = np.zeros((cell.nsymb_sf, cell.nof_re), dtype=np.complex64)
    idx, syms, vals = crs_pilots(cell, sf_idx, port)
    for r, s in enumerate(syms):
        grid[s, idx[r]] = vals[r]
    return grid * h_freq[None, :]


class TestCrs:
    def test_pilot_positions_port0(self):
        cell = Cell(nof_prb=6, id=0)
        idx, syms, vals = crs_pilots(cell, 0, 0)
        # port 0: symbols 0 and 4 of each slot
        assert list(syms) == [0, 4, 7, 11]
        # v=0 at l=0 with v_shift=0: subcarriers 0, 6, 12...
        assert idx[0][0] == 0 and idx[0][1] == 6
        # v=3 at l=4
        assert idx[1][0] == 3
        np.testing.assert_allclose(np.abs(vals), 1.0, rtol=1e-5)

    def test_vshift_follows_cell_id(self):
        cell = Cell(nof_prb=6, id=5)
        idx, _, _ = crs_pilots(cell, 0, 0)
        assert idx[0][0] == 5 % 6

    def test_mask_counts(self):
        cell = Cell(nof_prb=25, nof_ports=2, id=3)
        m = crs_mask(cell, 0)
        # 2 ports: 4 CRS symbols, each with both shifts -> 2*2 pilots/PRB
        assert m.sum() == 4 * 2 * 2 * 25
        cell1 = Cell(nof_prb=25, nof_ports=1, id=3)
        assert crs_mask(cell1, 0).sum() == 4 * 2 * 25

    def test_sequences_differ_across_cells(self):
        a = crs_pilots(Cell(nof_prb=6, id=0), 0, 0)[2]
        b = crs_pilots(Cell(nof_prb=6, id=3), 0, 0)[2]
        assert np.any(np.abs(a - b) > 1e-3)


class TestChest:
    @pytest.mark.parametrize("prb", [6, 50])
    def test_flat_channel(self, prb):
        cell = Cell(nof_prb=prb, id=1)
        h_true = np.full(cell.nof_re, 0.8 - 0.3j, np.complex64)
        grid = _grid_with_crs(cell, 0, 0, h_true)
        h = np.asarray(chest_dl(jnp.asarray(grid[None]), cell, 0))
        np.testing.assert_allclose(h[0], np.broadcast_to(h_true, h[0].shape),
                                   atol=1e-3)

    def test_frequency_selective_channel(self):
        cell = Cell(nof_prb=50, id=1)
        # smooth channel: 2-tap -> slow sinusoid over frequency
        k = np.arange(cell.nof_re)
        h_true = (np.exp(2j * np.pi * k / 600) * 1.2).astype(np.complex64)
        grid = _grid_with_crs(cell, 0, 0, h_true)
        h = np.asarray(chest_dl(jnp.asarray(grid[None]), cell, 0))[0]
        err = np.abs(h - h_true[None, :]) / np.abs(h_true[None, :])
        assert np.median(err) < 0.05

    def test_noise_estimate(self, rng):
        cell = Cell(nof_prb=50, id=1)
        h_true = np.ones(cell.nof_re, np.complex64)
        grid = _grid_with_crs(cell, 0, 0, h_true)
        n0 = 0.02
        noisy = grid + (rng.normal(size=grid.shape) + 1j * rng.normal(size=grid.shape)).astype(np.complex64) * np.sqrt(n0 / 2)
        est = float(noise_est_pilots(jnp.asarray(noisy[None]), cell, 0)[0])
        assert 0.3 * n0 < est < 3 * n0

    def test_rssi(self):
        cell = Cell(nof_prb=6)
        g = jnp.ones((1, cell.nsymb_sf, cell.nof_re), jnp.complex64) * 2.0
        assert abs(float(rssi(g)[0]) - 4.0) < 1e-5


class TestEqualizer:
    def test_single_mrc(self, rng):
        n, a = 600, 2
        x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
        h = (rng.normal(size=(a, n)) + 1j * rng.normal(size=(a, n))).astype(np.complex64)
        y = h * x[None, :]
        xe, csi = eq_single(jnp.asarray(y), jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(xe), x, atol=1e-4)
        assert np.all(np.asarray(csi) > 0)

    def test_sfbc_roundtrip(self, rng):
        n = 600  # symbols (pairs = 300)
        x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
        layers = layermap([jnp.asarray(x)], 2)
        ports = precode_sfbc(layers)  # [2, n]
        # per-pair-constant channel
        h0 = np.repeat((rng.normal(size=n // 2) + 1j * rng.normal(size=n // 2)), 2).astype(np.complex64)
        h1 = np.repeat((rng.normal(size=n // 2) + 1j * rng.normal(size=n // 2)), 2).astype(np.complex64)
        y = np.asarray(ports)[0] * h0 + np.asarray(ports)[1] * h1
        xe, csi = eq_sfbc(jnp.asarray(y[None]), jnp.asarray(h0[None]), jnp.asarray(h1[None]))
        np.testing.assert_allclose(np.asarray(xe), x, atol=1e-3)

    @pytest.mark.parametrize("pmi", [0, 1, 2])
    def test_mux_2x2_zf_roundtrip(self, pmi, rng):
        n = 400
        x = (rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))).astype(np.complex64)
        ports = precode_mux_2x2(jnp.asarray(x), pmi)
        h = (rng.normal(size=(2, 2, n)) + 1j * rng.normal(size=(2, 2, n))).astype(np.complex64)
        y = np.einsum("rpn,pn->rn", h, np.asarray(ports))
        h_eff = effective_channel_mux(jnp.asarray(h), pmi)
        xe, csi = eq_mux_2x2(jnp.asarray(y), h_eff, noise_est=0.0)
        np.testing.assert_allclose(np.asarray(xe), x, atol=1e-3)

    def test_mux_mmse_noise_robust(self, rng):
        n = 2000
        x = np.sign(rng.normal(size=(2, n))).astype(np.complex64)
        h = (rng.normal(size=(2, 2, n)) + 1j * rng.normal(size=(2, 2, n))).astype(np.complex64)
        y = np.einsum("rpn,pn->rn", h, x / np.sqrt(2))
        n0 = 0.05
        y += (rng.normal(size=y.shape) + 1j * rng.normal(size=y.shape)).astype(np.complex64) * np.sqrt(n0 / 2)
        xe, csi = eq_mux_2x2(jnp.asarray(y), jnp.asarray(h) / np.sqrt(2), noise_est=n0)
        ber = np.mean(np.sign(np.asarray(xe).real) != x.real)
        assert ber < 0.05

    def test_layermap_roundtrip(self, rng):
        x = jnp.asarray((rng.normal(size=200) + 1j * rng.normal(size=200)).astype(np.complex64))
        lm = layermap([x], 2)
        (back,) = layerdemap(lm, 1)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))
        a, b = layerdemap(layermap([x, x], 2, 2), 2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(x))
