"""Periodic tracking-area update over the air: T3412 expires while the
UE is ECM-idle, the UE wakes via random access, runs TAU with GUTI
reallocation (srsepc s1ap_nas_transport.cc:1268 handles the live TAU;
srsue nas.cc arms T3412 from the accept), returns to idle, and the
S1-U bearer plus the NEW GUTI keep working (paging + service request).
"""

import numpy as np

from empower_srslte_tpu.stack import Air, EnbStack, UeStack
from empower_srslte_tpu.utils.cell import Cell
from tests.conftest import tti_hygiene
from tests.test_stack import _epc


class TestPeriodicTau:
    def test_t3412_tau_guti_survives_bearer(self):
        import jax

        mme, nas = _epc()
        # T3412 = (2, 30) = 3 h; scale it so expiry lands ~30 TTIs after
        # the accept arms it (the arming path itself is the real one)
        nas.t3412_scale = 3e-6
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme, paging_cycle=8)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)

        ul = None
        attached_at = released_at = None
        guti_1 = ip_first = None
        tau_done_at = re_released_at = paged_at = None
        t3412_rearmed = False
        for tti in range(420):
            tti_hygiene(tti)
            dl = enb.tti(tti, air.ul(ul) if ul is not None else None)
            ul = ue.tti(tti, air.dl(dl))
            if attached_at is None and nas.attached and ue.rrc.drbs:
                attached_at = tti
                guti_1, ip_first = nas.guti, nas.ue_ip
                assert nas.t3412_ms > 0      # armed from the accept
            if attached_at is not None and released_at is None \
                    and tti == attached_at + 6:
                enb.release_ue(ue.c_rnti)
                released_at = tti
            if tau_done_at is None and "tau_accept" in nas.events \
                    and nas.state == "attached" \
                    and ue.state == "connected":
                tau_done_at = tti
                # the accept re-armed T3412 (scaled, so it may expire
                # again later in the test; capture the re-arm now)
                t3412_rearmed = nas.t3412_ms > 0
                # push the next (scaled) expiry past the test horizon so
                # the paged reconnect below is a plain service request
                nas.t3412_ms = 10 ** 9
            if tau_done_at is not None and re_released_at is None \
                    and mme.context(nas.imsi).state == "attached":
                # the MME got the TAU complete: network releases
                enb.release_ue(ue.c_rnti)
                re_released_at = tti
            if re_released_at is not None and paged_at is None \
                    and ue.state == "idle" and tti >= re_released_at + 20:
                enb.page(nas.imsi, m_tmsi=nas.guti.m_tmsi)
                paged_at = tti
            if paged_at is not None and ue.state == "connected" \
                    and ue.rrc.drbs:
                break

        assert attached_at is not None and released_at is not None
        # the idle UE woke on T3412 and ran the TAU
        assert "t3412_expired" in nas.events, nas.events[-8:]
        assert "tau_ra" in ue.events, ue.events[-10:]
        assert tau_done_at is not None, (nas.events[-8:], ue.events[-8:])
        # GUTI reallocated by the TAU accept; timer re-armed
        assert nas.guti is not None and nas.guti != guti_1
        assert t3412_rearmed
        ctx = mme.context(nas.imsi)
        assert ctx is not None and ctx.state == "attached"
        # back to idle, then paged with the NEW GUTI's M-TMSI and
        # reconnected via service request
        assert paged_at is not None
        assert ue.state == "connected" and nas.ue_ip == ip_first

        # the S1-U bearer survived the TAU: downlink data flows
        pong = (b"\x45\x00" + bytes(14)
                + bytes(map(int, ip_first.split(".")))
                + b"ALIVE-AFTER-TAU!")
        fwd = mme.spgw.downlink(pong)
        assert fwd is not None
        enb.deliver_gtpu(fwd[1])
        for tti in range(tti + 1, tti + 40):
            dl = enb.tti(tti, air.ul(ul) if ul is not None else None)
            ul = ue.tti(tti, air.dl(dl))
            if ue.rx_ip:
                break
        assert ue.rx_ip and ue.rx_ip[0].endswith(b"ALIVE-AFTER-TAU!")


class TestTauOnTacChange:
    def test_camp_outside_tai_list_arms_tau(self):
        """24.301 5.5.3.2.2: camping on a TA outside the registered TAI
        list (e.g. after idle reselection across a TA border) arms a
        normal TAU; the TAU accept's TAI list stops the loop."""
        from empower_srslte_tpu.epc import nas as nas_mod
        from empower_srslte_tpu.epc.mme import PLMN, UeNas
        from empower_srslte_tpu.stack import UeStack
        from empower_srslte_tpu.utils.cell import Cell

        mme, nas = _epc()
        mme.extra_tacs = [9]          # the MME serves TACs {7, 9}
        ue = UeStack(Cell(nof_prb=25, id=1), nas)

        # registered under TAC 7 (what an attach accept delivers)
        nas.attached = True
        nas.state = "attached"
        nas.tai_list = [(PLMN, 7)]

        # the camp decision on a TAC-9 cell (the _acquire camp tail
        # after an idle reselection) arms the TAU
        ue.access_info = {"tac": 9, "plmns": [PLMN], "barred": False,
                          "q_rx_lev_min_db": -130}
        ue._check_tac_tau()
        assert nas.pending_tau
        assert any(e.startswith("tau_on_tac_change_9") for e in ue.events)
        # same TA again: no re-trigger once the list covers it
        nas.pending_tau = False
        nas.tai_list = [(PLMN, 7), (PLMN, 9)]
        ue._check_tac_tau()
        assert not nas.pending_tau

    def test_tau_accept_updates_tai_list(self):
        """The TAU accept's TAI list replaces the registered list (so a
        multi-TA pool stops retriggering)."""
        from empower_srslte_tpu.epc import nas as nas_mod
        from empower_srslte_tpu.epc.mme import PLMN, TAC, Guti

        mme, nas = _epc()
        mme.extra_tacs = [9]
        # drive a real NAS attach directly (no PHY): the attach accept
        # carries the full TAI list
        pdu = nas.attach_request()
        while pdu is not None:
            down = mme.handle_ul_nas(pdu, enb_teid=0x10)
            if down is None:
                break
            pdu = nas.handle_dl_nas(down)
        assert nas.attached
        assert (PLMN, TAC) in nas.tai_list and (PLMN, 9) in nas.tai_list
