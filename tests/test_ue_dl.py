"""Full eNB->UE downlink subframe loop: the phy_dl_test equivalent.

Composes a complete subframe (CRS + sync + PCFICH + PDCCH/DCI + PDSCH) on
the eNB side, passes it through OFDM + channel, and runs the complete UE
receiver (srslte_ue_dl_decode_rnti analog): chest -> CFI -> blind DCI ->
grant resolution -> PDSCH decode (SURVEY.md section 4 tier 3,
lib/test/phy/phy_dl_test.c:262-288).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from empower_srslte_tpu.models import dci as dci_mod
from empower_srslte_tpu.models import ra
from empower_srslte_tpu.models.enb_dl import (
    enb_dl_base_grid,
    enb_dl_gen_signal,
    put_sync_signals,
)
from empower_srslte_tpu.models.pbch import mib_pack, pbch_put
from empower_srslte_tpu.models.pcfich import pcfich_put
from empower_srslte_tpu.models.pdcch import pdcch_encode
from empower_srslte_tpu.models.pdsch import PdschConfig, pdsch_encode
from empower_srslte_tpu.models.ue_dl import ue_dl_decode, ue_mib_decode
from empower_srslte_tpu.ops.modem import Mod
from empower_srslte_tpu.utils import Cell


def _compose_subframe(cell, sf_idx, cfi, rnti, mcs, prb_start, prb_len, tb, rng):
    """eNB side: full subframe with control + data for one UE."""
    mod, tbs = ra.mcs_to_tbs(mcs, prb_len)
    assert tbs == len(tb)
    payload = dci_mod.pack_format1a(cell.nof_prb, prb_start, prb_len, mcs)
    mask = ra.prb_mask_type2(cell.nof_prb, prb_start, prb_len)
    cfg = PdschConfig(cell=cell, sf_idx=sf_idx, cfi=cfi, rnti=rnti,
                      mod=mod, prb_mask=mask)
    plan = cfg.plan(tbs)

    grid = enb_dl_base_grid(cell, sf_idx, ())
    grid = put_sync_signals(grid, cell, sf_idx)
    grid = pcfich_put(grid, cfi, cell, sf_idx)
    grid = grid + pdcch_encode(jnp.asarray(payload), rnti, 0, 4, cell, cfi, sf_idx)
    grid = grid + pdsch_encode(jnp.asarray(tb)[None], cfg, plan)[0]
    return enb_dl_gen_signal(grid, cell)[0]  # port 0 samples


class TestFullDownlink:
    @pytest.mark.parametrize("mcs,snr_db", [(5, 15.0), (13, 20.0), (20, 26.0)])
    def test_phy_dl_loop(self, mcs, snr_db, rng):
        cell = Cell(nof_prb=25, id=1)
        sf_idx, cfi, rnti = 4, 2, 0x4601
        prb_start, prb_len = 2, 20
        mod, tbs = ra.mcs_to_tbs(mcs, prb_len)
        tb = rng.integers(0, 2, size=tbs).astype(np.int8)

        samples = np.asarray(_compose_subframe(
            cell, sf_idx, cfi, rnti, mcs, prb_start, prb_len, tb, rng))
        p = np.mean(np.abs(samples) ** 2)
        n0 = p / 10 ** (snr_db / 10)
        noisy = samples + (rng.normal(size=len(samples))
                           + 1j * rng.normal(size=len(samples))
                           ).astype(np.complex64) * np.sqrt(n0 / 2)

        results = ue_dl_decode(noisy.astype(np.complex64), cell, sf_idx, rnti)
        assert len(results) == 1
        r = results[0]
        assert r.cfi == cfi
        assert r.dci is not None and r.dci.mcs == mcs
        assert r.crc_ok, "PDSCH CRC failed"
        assert np.array_equal(r.tb_bits, tb)

    def test_no_grant_for_other_rnti(self, rng):
        cell = Cell(nof_prb=25, id=1)
        tb = rng.integers(0, 2, size=ra.mcs_to_tbs(5, 20)[1]).astype(np.int8)
        samples = np.asarray(_compose_subframe(
            cell, 4, 2, 0x4601, 5, 2, 20, tb, rng))
        results = ue_dl_decode(samples.astype(np.complex64), cell, 4, 0x777)
        assert len(results) == 1 and results[0].dci is None

    def test_mib_acquisition(self, rng):
        cell = Cell(nof_prb=6, id=77, nof_ports=1)
        mib = mib_pack(50, 0, 1, 128)
        grid = enb_dl_base_grid(cell, 0, ())
        grid = put_sync_signals(grid, cell, 0)
        grid = pbch_put(grid, jnp.asarray(mib), cell, sfn=128)
        samples = np.asarray(enb_dl_gen_signal(grid, cell))[0]
        p = np.mean(np.abs(samples) ** 2)
        noisy = samples + (rng.normal(size=len(samples))
                           + 1j * rng.normal(size=len(samples))
                           ).astype(np.complex64) * np.sqrt(p / 10 ** 2 / 2)
        got = ue_mib_decode(noisy.astype(np.complex64), cell_id=77)
        assert got is not None
        assert got["nof_prb"] == 50
        assert got["sfn_msb"] == 128 >> 2
        assert got["sfn_mod4"] == 0


class TestFormat1CDownlink:
    def test_si_rnti_1c_grant_full_loop(self, rng):
        """SIB-style distributed 1C grant at SI-RNTI through the full
        eNB-compose -> UE-decode loop (common search space monitors 1C)."""
        from empower_srslte_tpu.models.enb_dl import (
            enb_dl_base_grid, enb_dl_gen_signal, put_sync_signals)
        from empower_srslte_tpu.models.pcfich import pcfich_put

        cell = Cell(nof_prb=25, id=1)
        si_rnti = 0xFFFF
        sf_idx, cfi = 5, 2
        step = ra.type2_n_rb_step(cell.nof_prb)
        start, length, i_tbs = 0, 4 * step, 5
        tbs = int(ra.tbs_format1c_table()[i_tbs])
        tb = rng.integers(0, 2, tbs).astype(np.int8)
        payload = dci_mod.pack_format1c(cell.nof_prb, start, length, i_tbs)
        d1c = dci_mod.unpack_format1c(payload, cell.nof_prb)
        cfg = PdschConfig(cell=cell, sf_idx=sf_idx, cfi=cfi, rnti=si_rnti,
                          mod=Mod.QPSK, prb_mask=d1c.prb_mask,
                          prb_mask_slot1=d1c.prb_mask_slot1)
        plan = cfg.plan(tbs)
        grid = enb_dl_base_grid(cell, sf_idx, ())
        grid = put_sync_signals(grid, cell, sf_idx)
        grid = pcfich_put(grid, cfi, cell, sf_idx)
        grid = grid + pdcch_encode(jnp.asarray(payload), si_rnti, 0, 4,
                                   cell, cfi, sf_idx)
        grid = grid + pdsch_encode(jnp.asarray(tb)[None], cfg, plan)[0]
        samples = np.asarray(enb_dl_gen_signal(grid, cell)[0])
        res = ue_dl_decode(samples.astype(np.complex64), cell, sf_idx,
                           si_rnti)
        assert len(res) == 1
        r = res[0]
        assert type(r.dci).__name__ == "DciDl1C" and r.crc_ok
        assert np.array_equal(np.asarray(r.tb_bits).ravel()[:tbs], tb)


class TestBroadcastChain:
    def test_sib1_mac_rrc_phy_chain(self, rng):
        """MAC SIB scheduler -> RRC-encoded SIB1 -> 1C grant at SI-RNTI ->
        PHY -> UE blind decode -> RRC unpack (the srsenb bcch pipeline)."""
        from empower_srslte_tpu.mac.bcch import SibConfig, SibScheduler
        from empower_srslte_tpu.models.enb_dl import (
            enb_dl_base_grid, enb_dl_gen_signal, put_sync_signals)
        from empower_srslte_tpu.models.pcfich import pcfich_put
        from empower_srslte_tpu.rrc import messages as M

        cell = Cell(nof_prb=25, id=1)
        si_rnti = 0xFFFF
        sib1 = {"cell_access_related_info": {
                    "plmn_identity_list": [{
                        "plmn_identity": {"mcc": [0, 0, 1], "mnc": [0, 1]},
                        "cell_reserved_for_operator_use": "notReserved"}],
                    "tracking_area_code": 7, "cell_identity": 0x1A2D001,
                    "cell_barred": "notBarred",
                    "intra_freq_reselection": "allowed",
                    "csg_indication": False},
                "cell_selection_info": {"q_rx_lev_min": -65},
                "freq_band_indicator": 7,
                "scheduling_info_list": [{"si_periodicity": 1,
                                          "sib_mapping_info": [0]}],
                "si_window_length": 5, "system_info_value_tag": 11}
        payload = M.pack_bcch_dlsch("systemInformationBlockType1", sib1)
        sched = SibScheduler(sibs=[SibConfig(payload_len=len(payload))])
        grants = [(t, g) for t in range(10) for g in sched.new_tti(t)]
        assert grants and grants[0][0] == 5 and grants[0][1].rv == 0

        tbs_tab = ra.tbs_format1c_table()
        i_tbs = int(np.argmax(tbs_tab >= 8 * len(payload)))
        tbs = int(tbs_tab[i_tbs])
        step = ra.type2_n_rb_step(cell.nof_prb)
        tb_bits = np.concatenate([
            np.unpackbits(np.frombuffer(payload, np.uint8)),
            np.zeros(tbs - 8 * len(payload), np.uint8)]).astype(np.int8)
        dci_bits = dci_mod.pack_format1c(cell.nof_prb, 0, 4 * step, i_tbs)
        d1c = dci_mod.unpack_format1c(dci_bits, cell.nof_prb)
        cfg = PdschConfig(cell=cell, sf_idx=5, cfi=2, rnti=si_rnti,
                          mod=Mod.QPSK, prb_mask=d1c.prb_mask,
                          prb_mask_slot1=d1c.prb_mask_slot1)
        plan = cfg.plan(tbs)
        grid = enb_dl_base_grid(cell, 5, ())
        grid = put_sync_signals(grid, cell, 5)
        grid = pcfich_put(grid, 2, cell, 5)
        grid = grid + pdcch_encode(jnp.asarray(dci_bits), si_rnti, 0, 4,
                                   cell, 2, 5)
        grid = grid + pdsch_encode(jnp.asarray(tb_bits)[None], cfg, plan)[0]
        s = np.asarray(enb_dl_gen_signal(grid, cell)[0]).astype(np.complex64)
        res = ue_dl_decode(s, cell, 5, si_rnti)
        assert len(res) == 1 and res[0].crc_ok
        rx = np.packbits(np.asarray(res[0].tb_bits).ravel()
                         [: 8 * len(payload)]).tobytes()
        name, v = M.unpack_bcch_dlsch(rx)
        assert name == "systemInformationBlockType1"
        assert v["system_info_value_tag"] == 11
        assert v["cell_access_related_info"]["cell_identity"] == 0x1A2D001
