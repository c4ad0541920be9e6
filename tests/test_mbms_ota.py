"""eMBMS user plane over the air: MBMS-GW M1 fan-out -> eNB PMCH on
MBSFN subframes -> UE MCCH acquisition -> MTCH delivery, while the
unicast attach keeps running on the other subframes.

The reference's eMBMS chain (srsepc mbms-gw.cc M1 GTP-U, srsenb PMCH
scheduling, lib pmch.c MBSFN subframes with mixed CP, liblte MCCH):
subframe 3 of every frame is MBSFN — MCCH at the signalling MCS on its
occasions announces the data MCS; broadcast IP packets ride MTCH.
"""

import numpy as np

from empower_srslte_tpu.epc.mbms_gw import MbmsGw
from empower_srslte_tpu.stack import Air, EnbStack, UeStack
from empower_srslte_tpu.utils.cell import Cell
from tests.conftest import tti_hygiene
from tests.test_stack import _epc


class TestMbmsOverTheAir:
    def test_mcch_then_mtch_delivery_with_unicast(self):
        import jax

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        enb.enable_mbms(area_id=1, data_mcs=9)
        ue = UeStack(cell, nas)
        ue.enable_mbms(area_id=1)
        air = Air(cell.sf_sample_len)

        gw = MbmsGw()
        gw.add_enb(enb.deliver_m1)

        ul = None
        pushed = 0
        attached_at = None
        for tti in range(180):
            tti_hygiene(tti)
            dl = enb.tti(tti, air.ul(ul) if ul is not None else None)
            ul = ue.tti(tti, air.dl(dl))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
            # once the UE has the MCCH, stream broadcast packets
            if (any(e.startswith("mcch_acquired") for e in ue.events)
                    and pushed < 3):
                pushed += 1
                gw.forward(b"\x45\x00" + bytes(18)
                           + b"MBMS-PACKET-%03d" % pushed)
            if len(ue.rx_mbms) >= 3 and attached_at is not None:
                break

        # MCCH announced the data MCS at the signalling MCS
        assert any(e.startswith("mcch_acquired_mcs9") for e in ue.events), \
            [e for e in ue.events if "mcch" in e or "mtch" in e]
        # all three MTCH packets delivered, in order
        assert len(ue.rx_mbms) >= 3, ue.events[-10:]
        assert ue.rx_mbms[0].endswith(b"MBMS-PACKET-001")
        assert ue.rx_mbms[2].endswith(b"MBMS-PACKET-003")
        # the unicast plane was unaffected by the MBSFN subframes
        assert attached_at is not None and ue.rrc.nas.attached
        assert gw.stats_tx == 3
