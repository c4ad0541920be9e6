"""8-bit quantized receive lane: byte-scaled LLR quantization
(demod_soft.c:44-46), int8 de-rate-matching with saturating HARQ
combining (rm_turbo.c:378-905 8-bit LUT paths), int8 softbuffers, and
the full PDSCH receiver running quantized end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from empower_srslte_tpu.models import ra
from empower_srslte_tpu.models.pdsch import (PdschConfig, pdsch_decode,
                                             pdsch_encode)
from empower_srslte_tpu.ops.fec import turbo_encode_np
from empower_srslte_tpu.ops.fec.rate_matching import RateMatchTurbo
from empower_srslte_tpu.ops.modem import (DEMOD_INT8_SCALE, Mod,
                                          quantize_llr_int8)
from empower_srslte_tpu.utils import Cell


class TestQuantize:
    def test_scales_and_saturation(self):
        llr = jnp.asarray([0.05, -0.05, 10.0, -10.0], jnp.float32)
        q = np.asarray(quantize_llr_int8(llr, Mod.QPSK))
        assert q.dtype == np.int8
        assert q[0] == 1 and q[1] == -1          # 0.05 * 20 = 1
        assert q[2] == 127 and q[3] == -127      # saturated
        q16 = np.asarray(quantize_llr_int8(llr, Mod.QAM16))
        assert q16[0] == 2                       # 0.05 * 30 = 1.5 -> 2

    def test_reference_scale_values(self):
        assert DEMOD_INT8_SCALE[Mod.QPSK] == 20.0
        assert DEMOD_INT8_SCALE[Mod.QAM16] == 30.0
        assert DEMOD_INT8_SCALE[Mod.QAM64] == 40.0


class TestInt8RateMatch:
    def _tx_llrs(self, rng, k, e, rv=0):
        u = rng.integers(0, 2, size=(2, k)).astype(np.int8)
        d = turbo_encode_np(u)
        rm = RateMatchTurbo(k)
        tx = np.asarray(rm.tx(jnp.asarray(d), rv, e))
        ebn0 = 10 ** (3.0 / 10)
        n0 = 1.0 / (ebn0 * k / e)
        y = 1 - 2 * tx.astype(np.float64) \
            + np.sqrt(n0 / 2) * rng.normal(size=tx.shape)
        return u, rm, (4 / n0 * y).astype(np.float32)

    def test_int8_rx_decodes(self, rng):
        from empower_srslte_tpu.ops.fec import TurboDecoder

        k, e = 1024, 2048
        u, rm, llr = self._tx_llrs(rng, k, e)
        q = np.clip(np.round(llr * 8.0), -127, 127).astype(np.int8)
        d_llr, soft = rm.rx(jnp.asarray(q), 0)
        assert np.asarray(soft).dtype == np.int8
        assert np.asarray(d_llr).dtype == np.int8
        dec = TurboDecoder(k=k, iterations=6, window=128, impl="xla")
        bits, _ = dec.decode(d_llr)
        assert np.array_equal(np.asarray(bits), u)

    def test_int8_harq_combining_saturates(self, rng):
        """Two RVs combine in int8 with symmetric ±127 saturation."""
        k, e = 512, 768
        u, rm, llr = self._tx_llrs(rng, k, e)
        q = np.clip(np.round(llr * 30.0), -127, 127).astype(np.int8)
        _, soft1 = rm.rx(jnp.asarray(q), 0)
        d2, soft2 = rm.rx(jnp.asarray(q), 0, softbuffer=soft1)
        s1, s2 = np.asarray(soft1), np.asarray(soft2)
        assert s2.dtype == np.int8
        # combining grows magnitude but never wraps
        assert np.abs(s2).max() == 127
        big = np.abs(s1) > 80
        assert (np.sign(s2[big]) == np.sign(s1[big])).all()

    def test_int8_vs_f32_bler_parity(self, rng):
        """At the waterfall's working point the quantized lane decodes
        the same blocks as f32 (the <=0.1 dB claim, spot-checked)."""
        from empower_srslte_tpu.ops.fec import TurboDecoder

        k, e = 1024, 1536          # ~rate 2/3, harder than 1/3
        dec = TurboDecoder(k=k, iterations=6, window=128, impl="xla")
        rm = RateMatchTurbo(k)
        n_err_f32 = n_err_i8 = 0
        for trial in range(4):
            u, rm, llr = self._tx_llrs(
                np.random.default_rng(100 + trial), k, e)
            d_f, _ = rm.rx(jnp.asarray(llr), 0)
            bits_f, _ = dec.decode(d_f)
            q = np.clip(np.round(llr * 4.0), -127, 127).astype(np.int8)
            d_q, _ = rm.rx(jnp.asarray(q), 0)
            bits_q, _ = dec.decode(d_q)
            n_err_f32 += int((np.asarray(bits_f) != u).any(axis=-1).sum())
            n_err_i8 += int((np.asarray(bits_q) != u).any(axis=-1).sum())
        # int8 may lose at most one extra block across the spot check
        assert n_err_i8 <= n_err_f32 + 1, (n_err_i8, n_err_f32)


class TestInt8Receiver:
    def test_pdsch_int8_lane_end_to_end(self, rng):
        """Full 10 MHz SISO receiver with llr_int8: quantized CSI-weighted
        LLRs, int8 descramble + de-RM, bf16 decode — CRC passes under
        noise."""
        cell = Cell(nof_prb=50, id=1)
        mod, tbs = ra.mcs_to_tbs(17, 50)
        cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod,
                          llr_int8=True)
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(2, tbs)).astype(np.int8)
        grid = pdsch_encode(jnp.asarray(tb), cfg, plan)
        hval = jnp.asarray(0.9 - 0.2j, jnp.complex64)
        h = jnp.broadcast_to(hval, (2, 1, 1, 14, 600))
        n0 = 10 ** (-14 / 10)
        # grid is [batch, port=1, nsymb, nre]; keep the rx dim aligned
        noise = (rng.normal(size=(2, 1, 14, 600))
                 + 1j * rng.normal(size=(2, 1, 14, 600))) * np.sqrt(n0 / 2)
        y = grid * hval + noise.astype(np.complex64)
        bits, ok, soft = pdsch_decode(jnp.asarray(y), h, cfg, plan,
                                      noise_est=n0)
        assert bool(np.asarray(ok).all()), "int8 lane CRC failed"
        assert np.array_equal(np.asarray(bits), tb)
        # the softbuffers ride int8 (4x smaller HARQ state)
        assert all(np.asarray(s).dtype == np.int8 for s in soft)


class TestInt8Stack:
    def test_attach_and_user_plane_on_int8_lane(self):
        """Full OTA attach + both-way user plane with the UE receiving
        every PDSCH on the quantized int8 lane (byte demod scales, int8
        de-RM/softbuffers) — the reference UE's default fast path."""
        from empower_srslte_tpu.stack import Air, EnbStack, UeStack
        from empower_srslte_tpu.upper.gtpu import gtpu_unpack
        from tests.conftest import tti_hygiene
        from tests.test_stack import _epc

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas, llr_int8=True)
        air = Air(cell.sf_sample_len, snr_db=18.0)

        ul_iq, attached_at, pushed = None, None, False
        for tti in range(140):
            tti_hygiene(tti)
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
                ue.send_ip(b"\x45\x00" + bytes(18) + b"PING-OVER-INT8!")
            if attached_at is not None and not pushed and enb.ul_gtpu:
                pushed = True
                pong = (b"\x45\x00" + bytes(14)
                        + bytes(map(int, ue.rrc.nas.ue_ip.split(".")))
                        + b"PONG-OVER-INT8!")
                fwd = mme.spgw.downlink(pong)
                enb.deliver_gtpu(fwd[1])
            if pushed and ue.rx_ip:
                break

        assert attached_at is not None, (ue.events[-8:], enb.events[-8:])
        assert enb.ul_gtpu and \
            gtpu_unpack(enb.ul_gtpu[0])[1].endswith(b"PING-OVER-INT8!")
        assert ue.rx_ip and ue.rx_ip[0].endswith(b"PONG-OVER-INT8!")
