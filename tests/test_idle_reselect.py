"""Idle-mode mobility over the air: PLMN selection, 36.304 S-criterion
cell selection, and intra-frequency cell reselection while RRC_IDLE.

Mirrors srsue/src/upper/rrc.cc:379 (plmn_search), :883 (cell_selection),
:938 (cell_selection_criteria), :958 (cell_reselection): the UE cold-boots
onto cell A, attaches, is released to RRC_IDLE, learns the reselection
parameters from A's SIB3/SIB4, re-selects to cell B when B becomes
stronger while idle, re-acquires B's system information, and re-attaches
there via an mo-Data Service Request with its NAS registration and IP
intact.
"""

import numpy as np

from empower_srslte_tpu.stack import EnbStack, UeStack
from empower_srslte_tpu.stack import si as si_mod
from empower_srslte_tpu.utils.cell import Cell
from tests.conftest import tti_hygiene
from tests.test_stack import _epc


class TestSiCodecs:
    def test_sib3_roundtrip(self):
        raw = si_mod.build_sib3(q_hyst_db=4, q_rx_lev_min=-60,
                                s_intra_search=20, t_resel_s=2)
        name, v = si_mod.parse_si(raw)
        assert name == "systemInformation"
        kind, sib3 = v["critical_extensions"][1]["sib_type_and_info"][0]
        assert kind == "sib3"
        cfg = si_mod.sib3_resel_config(sib3)
        assert cfg == {"q_hyst_db": 4, "q_rx_lev_min_db": -120,
                       "s_intra_search_db": 40, "t_resel_s": 2}

    def test_sib3_no_s_intra(self):
        raw = si_mod.build_sib3(s_intra_search=None)
        _, v = si_mod.parse_si(raw)
        _, sib3 = v["critical_extensions"][1]["sib_type_and_info"][0]
        assert si_mod.sib3_resel_config(sib3)["s_intra_search_db"] is None

    def test_sib4_roundtrip(self):
        raw = si_mod.build_sib4((2, 5), q_offset_db=2)
        name, v = si_mod.parse_si(raw)
        kind, sib4 = v["critical_extensions"][1]["sib_type_and_info"][0]
        assert kind == "sib4"
        assert si_mod.sib4_neighbors(sib4) == [(2, 2), (5, 2)]

    def test_sib1_access_info(self):
        cell = Cell(nof_prb=25, id=1)
        raw = si_mod.build_sib1(cell, tac=9, mcc=(0, 0, 1), mnc=(0, 1))
        name, sib1 = si_mod.parse_si(raw)
        assert name == "systemInformationBlockType1"
        info = si_mod.sib1_access_info(sib1)
        assert info["plmns"] == ["00101"] and info["tac"] == 9
        assert not info["barred"]
        assert info["q_rx_lev_min_db"] == -130


class TestIdleReselection:
    def test_reselect_and_reattach_via_target(self):
        import jax

        mme, nas = _epc()
        cell_a = Cell(nof_prb=25, id=1)
        cell_b = Cell(nof_prb=25, id=2)
        enb_a = EnbStack(cell_a, mme, rsi=128, broadcast=True)
        enb_a.enable_mobility_si(neighbor_pcis=(2,), q_hyst_db=2,
                                 s_intra_search=None, t_resel_s=0)
        enb_b = EnbStack(cell_b, mme, rsi=384, broadcast=True)

        ue = UeStack(cell_a, nas, rsi=128, cold_start=True)
        g_a, g_b = 1.0, 0.05
        ul = None
        attached_at = released_at = flipped_at = None
        ip_first = None
        reselected_at = recamped_at = None
        for tti in range(700):
            tti_hygiene(tti)
            dl = (g_a * enb_a.tti(tti, ul) + g_b * enb_b.tti(tti, ul)
                  ).astype(np.complex64)
            ul = ue.tti(tti, dl)
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
                ip_first = ue.rrc.nas.ue_ip
            if attached_at is not None and released_at is None \
                    and tti == attached_at + 10:
                enb_a.release_ue(ue.c_rnti)
                released_at = tti
            # wait in idle until the UE has SIB3+SIB4, then fade A / raise B
            if released_at is not None and flipped_at is None \
                    and ue.state == "idle" \
                    and "sib3_acquired" in ue.events \
                    and "sib4_acquired" in ue.events:
                g_a, g_b = 0.05, 1.2
                flipped_at = tti
            if reselected_at is None and any(
                    e == "reselect_pci2" for e in ue.events):
                reselected_at = tti
            if reselected_at is not None and recamped_at is None \
                    and ue.state == "idle" and ue.cell.id == 2:
                recamped_at = tti
                # MO uplink data while idle triggers a Service Request
                # at the NEW cell
                ue.send_ip(b"\x45" + bytes(19) + b"HELLO-FROM-CELL-B")
            if recamped_at is not None and ue.state == "connected" \
                    and ue.rrc.drbs and ue.c_rnti in enb_b.rrc.ues:
                break

        assert attached_at is not None and released_at is not None
        assert flipped_at is not None, ue.events[-12:]
        assert reselected_at is not None, ue.events[-12:]
        assert recamped_at is not None, ue.events[-12:]
        # camped on B with B's radio config
        assert ue.cell.id == 2 and ue.rsi == 384
        # re-attached at B via mo-Data service request, same registration
        assert "mo_data_ra" in ue.events
        assert ue.state == "connected" and ue.c_rnti in enb_b.rrc.ues
        assert nas.attached and nas.ue_ip == ip_first
        ctx = mme.context(nas.imsi)
        assert ctx is not None and ctx.state == "attached"

        # downlink user plane now flows through B
        pong = (b"\x45\x00" + bytes(14)
                + bytes(map(int, ip_first.split(".")))
                + b"BACK-VIA-CELL-B!")
        fwd = mme.spgw.downlink(pong)
        assert fwd is not None
        enb_b.deliver_gtpu(fwd[1])
        for tti in range(tti + 1, tti + 40):
            dl = (g_a * enb_a.tti(tti, ul) + g_b * enb_b.tti(tti, ul)
                  ).astype(np.complex64)
            ul = ue.tti(tti, dl)
            if ue.rx_ip:
                break
        assert ue.rx_ip and ue.rx_ip[0].endswith(b"BACK-VIA-CELL-B!")


class TestCellSelectionCriteria:
    def test_s_criterion_rejects_weak_cell(self):
        """A cell below Qrxlevmin fails 36.304 5.2.3.2 and is never
        camped on (rrc.cc:938 cell_selection_criteria)."""
        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme, rsi=128, broadcast=True)
        # Qrxlevmin = 2 * -24 = -48 dB; the cell arrives at -50 dB
        sib1 = si_mod.build_sib1(cell)
        import empower_srslte_tpu.rrc.messages as M
        s = M.unpack_bcch_dlsch(sib1)[1]
        s["cell_selection_info"]["q_rx_lev_min"] = -24
        enb.sib_payloads[0] = M.pack_bcch_dlsch(
            "systemInformationBlockType1", s)

        ue = UeStack(cell, nas, rsi=128, cold_start=True)
        gain = 10 ** (-50 / 20)
        ul = None
        for tti in range(120):
            dl = (gain * enb.tti(tti, ul)).astype(np.complex64)
            ul = ue.tti(tti, dl)
            if "s_criterion_fail_id1" in ue.events:
                break
        assert "s_criterion_fail_id1" in ue.events, ue.events[-8:]
        assert "camped" not in ue.events
        assert ue.state == "search"

    def test_plmn_mismatch_rejects_cell(self):
        """A cell broadcasting only a foreign PLMN is rejected during
        selection (rrc.cc plmn_search saves the PLMN; nas selects)."""
        from empower_srslte_tpu.mac.bcch import SibConfig

        mme, nas = _epc()           # IMSI 00101...
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme, rsi=128, broadcast=True)
        sib1 = si_mod.build_sib1(cell, mcc=(9, 9, 9), mnc=(9, 9))
        enb.sib_payloads[0] = sib1
        enb.sib_sched.sibs[0] = SibConfig(payload_len=len(sib1),
                                          period_rf=8)

        ue = UeStack(cell, nas, rsi=128, cold_start=True)
        ul = None
        for tti in range(120):
            dl = enb.tti(tti, ul)
            ul = ue.tti(tti, np.asarray(dl, np.complex64))
            if "plmn_reject_id1" in ue.events:
                break
        assert "plmn_reject_id1" in ue.events, ue.events[-8:]
        assert ue.found_plmns and ue.found_plmns[0][0] == "99999"
        assert "camped" not in ue.events
