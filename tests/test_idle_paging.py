"""RRC connection release -> ECM-idle -> paging -> Service Request
reconnect, over the air.

The reference's idle-mode loop (srsue rrc.cc go_idle/process_paging,
nas.cc send_service_request; srsepc paging on downlink data): the UE
keeps its NAS registration and IP across RRC_IDLE, wakes on an S-TMSI
page at its 36.304 occasion, re-attaches via random access with cause
mt-Access, and re-activates the same session with a NAS Service Request
(no second attach/authentication).
"""

import numpy as np

from empower_srslte_tpu.stack import Air, EnbStack, UeStack
from empower_srslte_tpu.utils.cell import Cell
from tests.conftest import tti_hygiene
from tests.test_stack import _epc


class TestIdlePaging:
    def test_release_page_service_request(self):
        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        # short (non-standard) paging cycle keeps the worst-case paging
        # occasion within the test horizon; the occasion math is the
        # real 36.304 computation either way
        enb = EnbStack(cell, mme, paging_cycle=8)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)

        import jax

        ul_iq = None
        attached_at = released_at = paged_at = None
        ip_first = None
        for tti in range(260):
            tti_hygiene(tti)
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
                ip_first = ue.rrc.nas.ue_ip
            if attached_at is not None and released_at is None \
                    and tti == attached_at + 10:
                enb.release_ue(ue.c_rnti)
                released_at = tti
            if released_at is not None and paged_at is None \
                    and ue.state == "idle" and tti >= released_at + 25:
                # downlink data for an idle UE: the MME pages (mme s1ap
                # paging; here driven directly)
                enb.page(nas.imsi, m_tmsi=nas.guti.m_tmsi)
                paged_at = tti
            if paged_at is not None and ue.rrc.drbs \
                    and ue.state == "connected":
                break

        assert attached_at is not None and released_at is not None
        assert "went_idle" in ue.events, ue.events[-10:]
        assert paged_at is not None
        assert "paged" in ue.events, ue.events[-10:]
        # reconnected via Service Request: still attached, same IP, one
        # MME context, no second authentication
        assert ue.state == "connected" and ue.rrc.drbs
        assert nas.attached and nas.ue_ip == ip_first
        ctx = mme.context(nas.imsi)
        assert ctx is not None and ctx.state == "attached"
        assert ctx.ue_ip == ip_first

        # downlink data now flows to the NEW C-RNTI through the updated
        # S1-U bearer (modify-bearer on service request)
        pong = (b"\x45\x00" + bytes(14)
                + bytes(map(int, ip_first.split(".")))
                + b"PAGED-AND-ALIVE!")
        fwd = mme.spgw.downlink(pong)
        assert fwd is not None
        enb.deliver_gtpu(fwd[1])
        for tti in range(tti + 1, tti + 40):
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if ue.rx_ip:
                break
        assert ue.rx_ip and ue.rx_ip[0].endswith(b"PAGED-AND-ALIVE!")
