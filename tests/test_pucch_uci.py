"""PUCCH and UCI tests (pucch_test / uci coding analog)."""

import numpy as np
import pytest

import jax.numpy as jnp

from empower_srslte_tpu.models.pucch import (
    PucchConfig,
    pucch_f1_bits,
    pucch_f1_decode,
    pucch_f1_encode,
    pucch_f2_decode,
    pucch_f2_encode,
)
from empower_srslte_tpu.models.uci import rm_decode, rm_encode
from empower_srslte_tpu.utils import Cell


class TestRmCodes:
    @pytest.mark.parametrize("n,o", [(32, 4), (32, 10), (20, 4), (20, 13)])
    def test_roundtrip_noiseless(self, n, o, rng):
        bits = rng.integers(0, 2, size=(5, o)).astype(np.int8)
        cw = rm_encode(bits, n)
        assert cw.shape == (5, n)
        llr = (1.0 - 2.0 * cw).astype(np.float32) * 4
        out = np.asarray(rm_decode(jnp.asarray(llr), n, o))
        assert np.array_equal(out, bits)

    def test_noise_robust(self, rng):
        bits = rng.integers(0, 2, size=(20, 6)).astype(np.int8)
        cw = rm_encode(bits, 32)
        llr = (1.0 - 2.0 * cw) * 2 + rng.normal(size=cw.shape)
        out = np.asarray(rm_decode(jnp.asarray(llr.astype(np.float32)), 32, 6))
        assert np.mean(np.all(out == bits, axis=1)) > 0.9


class TestPucchF1:
    @pytest.mark.parametrize("fmt,bits", [("1a", (0,)), ("1a", (1,)),
                                          ("1b", (0, 1)), ("1b", (1, 1))])
    def test_ack_roundtrip(self, fmt, bits, rng):
        cell = Cell(nof_prb=25, id=11)
        cfg = PucchConfig(cell=cell, sf_idx=3, n_pucch=5, format=fmt)
        grid = pucch_f1_encode(cfg, bits)
        h = 0.8 * np.exp(1j * 0.7)
        rx = np.asarray(grid) * h
        rx += 0.05 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
        d, e = pucch_f1_decode(rx.astype(np.complex64), cfg)
        assert pucch_f1_bits(d, fmt) == bits

    def test_orthogonal_users(self, rng):
        # two UEs on different n_pucch in the same PRB must not collide
        cell = Cell(nof_prb=25, id=11)
        c1 = PucchConfig(cell=cell, sf_idx=2, n_pucch=0, format="1a")
        c2 = PucchConfig(cell=cell, sf_idx=2, n_pucch=3, format="1a")
        g = pucch_f1_encode(c1, (0,)) + pucch_f1_encode(c2, (1,))
        d1, _ = pucch_f1_decode(np.asarray(g), c1)
        d2, _ = pucch_f1_decode(np.asarray(g), c2)
        assert pucch_f1_bits(d1, "1a") == (0,)
        assert pucch_f1_bits(d2, "1a") == (1,)


class TestPucchF2:
    @pytest.mark.parametrize("nof_bits", [4, 8])
    def test_cqi_roundtrip(self, nof_bits, rng):
        cell = Cell(nof_prb=25, id=5)
        cfg = PucchConfig(cell=cell, sf_idx=6, n_pucch=3, format="2")
        payload = rng.integers(0, 2, size=nof_bits).astype(np.int8)
        grid = pucch_f2_encode(cfg, payload)
        h = 1.1 * np.exp(-1j * 0.4)
        rx = np.asarray(grid) * h
        rx += 0.08 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
        out = pucch_f2_decode(rx.astype(np.complex64), cfg, nof_bits)
        assert np.array_equal(out, payload)


class TestPucchFormat2ab:
    """Formats 2a/2b: ACK modulated onto the second DMRS symbol per slot
    (36.211 5.4.2; pucch.c formats 2a/2b)."""

    @pytest.mark.parametrize("fmt,ack", [("2a", (0,)), ("2a", (1,)),
                                         ("2b", (0, 0)), ("2b", (1, 0)),
                                         ("2b", (0, 1)), ("2b", (1, 1))])
    def test_roundtrip_with_noise(self, fmt, ack, rng):
        cell = Cell(nof_prb=25, id=1)
        cfg = PucchConfig(cell=cell, sf_idx=2, format=fmt, n_pucch=3)
        payload = rng.integers(0, 2, 8).astype(np.int8)
        g = np.asarray(pucch_f2_encode(cfg, payload, ack))
        g = g + 0.05 * (rng.normal(size=g.shape)
                        + 1j * rng.normal(size=g.shape))
        bits, got_ack = pucch_f2_decode(g, cfg, 8, nof_ack=len(ack))
        assert np.array_equal(bits, payload)
        assert got_ack == ack

    def test_plain_format2_unchanged(self, rng):
        cell = Cell(nof_prb=25, id=1)
        cfg = PucchConfig(cell=cell, sf_idx=2, format="2", n_pucch=3)
        payload = rng.integers(0, 2, 11).astype(np.int8)
        g = np.asarray(pucch_f2_encode(cfg, payload))
        bits = pucch_f2_decode(g, cfg, 11)
        assert np.array_equal(bits, payload)
