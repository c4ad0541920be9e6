"""Rate matching tests: sub-block interleaver structure, RV circular buffer,
TX/RX roundtrip with soft combining (HARQ), decode after puncturing.

Mirrors lib/src/phy/fec/test/rm_turbo_test and the HARQ softbuffer reuse
pattern (SURVEY.md section 4 tier 1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from empower_srslte_tpu.ops.fec import RateMatchTurbo, TurboDecoder, turbo_encode_np
from empower_srslte_tpu.ops.fec.rate_matching import _wmap


class TestStructure:
    @pytest.mark.parametrize("k", [40, 104, 6144])
    def test_wmap_covers_all_bits(self, k):
        w = _wmap(k, 0)
        d = k + 4
        nonnull = w[w >= 0]
        # every d bit appears exactly once in the circular buffer
        assert sorted(nonnull.tolist()) == list(range(3 * d))

    def test_wmap_filler_nulled(self):
        k, f = 1056, 31
        w = _wmap(k, f)
        d = k + 4
        nonnull = set(w[w >= 0].tolist())
        for i in range(f):
            assert i not in nonnull            # d0 filler
            assert d + i not in nonnull        # d1 filler
            assert 2 * d + i in nonnull        # d2 kept
        assert len(nonnull) == 3 * d - 2 * f

    def test_full_rate_selection_hits_everything(self):
        k = 104
        rm = RateMatchTurbo(k)
        e = 3 * (k + 4)
        idx = rm.tx_indices(0, e)
        # E = all useful bits -> selection is a permutation of them
        assert sorted(set(idx.tolist())) == list(range(3 * (k + 4)))

    def test_rv_offsets_differ(self):
        rm = RateMatchTurbo(512)
        e = 600
        sets = [tuple(rm.tx_indices(rv, e)[:50].tolist()) for rv in range(4)]
        assert len(set(sets)) == 4

    def test_systematic_first_rv0(self):
        # rv0 starts near the head of the systematic part (k0 = 2 rows in)
        rm = RateMatchTurbo(512)
        idx = rm.tx_indices(0, 256)
        frac_sys = np.mean(idx < 512 + 4)
        assert frac_sys > 0.95


class TestRoundtrip:
    def test_tx_rx_inverse_full_rate(self, rng):
        k = 104
        rm = RateMatchTurbo(k)
        u = rng.integers(0, 2, size=(2, k)).astype(np.int8)
        d = turbo_encode_np(u)
        e = 3 * (k + 4)
        tx = rm.tx_np(d, 0, e)
        llr_e = (1.0 - 2.0 * tx.astype(np.float32)) * 4.0
        d_llr, _ = rm.rx(jnp.asarray(llr_e), 0)
        d_llr = np.asarray(d_llr)
        # sign of recovered LLRs must match the bits everywhere
        hard = (d_llr < 0).astype(np.int8)
        assert np.array_equal(hard, d)

    def test_decode_after_puncturing(self, rng):
        # moderate puncturing (rate ~0.55) noiseless: decode must succeed
        k = 1024
        rm = RateMatchTurbo(k)
        u = rng.integers(0, 2, size=(4, k)).astype(np.int8)
        d = turbo_encode_np(u)
        e = int(k / 0.55)
        tx = rm.tx_np(d, 0, e)
        llr_e = (1.0 - 2.0 * tx.astype(np.float32)) * 4.0
        d_llr, _ = rm.rx(jnp.asarray(llr_e), 0)
        bits, _ = TurboDecoder(k=k, iterations=5).decode(d_llr)
        assert np.array_equal(np.asarray(bits), u)

    def test_harq_combining_two_rvs(self, rng):
        # Very heavy puncturing per transmission; combining rv0 + rv2
        # recovers what a single rv cannot. Mirrors softbuffer.c usage.
        k = 1024
        rm = RateMatchTurbo(k)
        u = rng.integers(0, 2, size=(2, k)).astype(np.int8)
        d = turbo_encode_np(u)
        e = k + 48  # rate ~0.95, at low SNR single shot should fail
        ebn0 = 1.0
        rate = k / e
        n0 = 1.0 / (rate * ebn0 if (ebn0 := 10 ** (ebn0 / 10)) else 1)
        sigma = np.sqrt(n0 / 2)

        def chan(bits):
            x = 1.0 - 2.0 * bits.astype(np.float64)
            y = x + sigma * rng.normal(size=bits.shape)
            return (4.0 / n0 * y).astype(np.float32)

        dec = TurboDecoder(k=k, iterations=5)
        llr0 = chan(rm.tx_np(d, 0, e))
        d_llr0, soft = rm.rx(jnp.asarray(llr0), 0)
        bits0, _ = dec.decode(d_llr0)
        errs_single = int(np.sum(np.asarray(bits0) != u))

        llr2 = chan(rm.tx_np(d, 2, e))
        d_llr2, soft = rm.rx(jnp.asarray(llr2), 2, softbuffer=soft)
        bits2, _ = dec.decode(d_llr2)
        errs_combined = int(np.sum(np.asarray(bits2) != u))
        assert errs_combined == 0, f"{errs_combined} errors after combining"
        assert errs_combined <= errs_single

    def test_filler_bits_pinned(self, rng):
        k, f = 1056, 31
        rm = RateMatchTurbo(k, f=f)
        u = rng.integers(0, 2, size=(1, k)).astype(np.int8)
        u[:, :f] = 0  # filler bits are zeros by construction
        d = turbo_encode_np(u)
        e = 2 * k
        tx = rm.tx_np(d, 0, e)
        llr_e = (1.0 - 2.0 * tx.astype(np.float32)) * 4.0
        d_llr, _ = rm.rx(jnp.asarray(llr_e), 0)
        bits, _ = TurboDecoder(k=k, iterations=4).decode(d_llr)
        assert np.array_equal(np.asarray(bits), u)
