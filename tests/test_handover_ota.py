"""Inter-eNB S1 handover fully over the air: two eNB stacks on one
summed IQ channel, UE measures the neighbour's CRS, reports A3, the
source relays HandoverRequired over S1, the target admits with K_eNB*
and a dedicated preamble, the UE retunes + runs non-contention RA and
its ReconfigurationComplete verifies at the target under the new keys.

The reference's apps only do intra-eNB RRC handover (srsenb rrc.cc);
this exercises the same 36.331 5.3.5.4 execution path plus the S1 leg
its liblte_s1ap codecs support, end to end through the PHY.
"""

import numpy as np

from empower_srslte_tpu.stack import EnbStack, UeStack
from empower_srslte_tpu.utils.cell import Cell
from tests.conftest import tti_hygiene
from tests.test_stack import _epc


class TestHandoverOverTheAir:
    def test_a3_report_drives_s1_handover(self):
        import jax

        from empower_srslte_tpu.s1ap.procedures import (EnbS1ap,
                                                        EnbS1apTarget,
                                                        MmeS1ap)

        mme, nas = _epc()
        mme_s1 = MmeS1ap(mme=mme)
        src_s1 = EnbS1ap(send=mme_s1.handle, enb_id=0x19B)

        cell1 = Cell(nof_prb=25, id=1)
        cell2 = Cell(nof_prb=25, id=2)
        src = EnbStack(cell1, src_s1, rsi=128)
        src.rrc.pci = 1
        src.rrc.neighbor_enbs = {2: 0x2AA}
        tgt = EnbStack(cell2, mme, rsi=384)
        tgt.rrc.pci = 2
        tgt.rrc.next_c_rnti = 0x60
        tgt_s1 = EnbS1apTarget(prepare=tgt.admit_handover)
        mme_s1.attach_enb_link(0x19B,
                               lambda pdu: (src_s1.deliver(pdu), [])[1])
        mme_s1.attach_enb_link(0x2AA, tgt_s1.handle)

        ue = UeStack(cell1, nas, rsi=128, neighbor_pcis=(2,))
        g1, g2 = 1.0, 0.1
        ul = None
        attached_at = flipped_at = None
        for tti in range(260):
            tti_hygiene(tti)
            dl = (g1 * src.tti(tti, ul) + g2 * tgt.tti(tti, ul)
                  ).astype(np.complex64)
            ul = ue.tti(tti, dl)
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
            if attached_at is not None and flipped_at is None \
                    and tti == attached_at + 15:
                # the UE moves: the neighbour becomes ~8 dB stronger
                g1, g2 = 0.5, 1.3
                flipped_at = tti
            if flipped_at is not None \
                    and "reconfig_complete" in tgt.rrc.events:
                break

        assert attached_at is not None and flipped_at is not None
        # UE: measured, reported, executed
        assert any(e.startswith("meas_report_2") for e in ue.events), \
            [e for e in ue.events if "meas" in e or "ho" in e]
        assert any(e.startswith("handover_to_2") for e in ue.rrc.events)
        assert any(e.startswith("ho_exec_pci2") for e in ue.events)
        assert "ho_ra_complete" in ue.events, ue.events[-12:]
        # source: relayed over S1 and admitted at the target
        assert "s1_handover_cmd" in src.rrc.events
        assert any(e.startswith("ho_admitted") for e in tgt.rrc.events)
        # target: the complete verified under the K_eNB*-derived keys
        assert "reconfig_complete" in tgt.rrc.events, \
            tgt.rrc.events[-8:]
        assert ue.cell.id == 2 and ue.rrc.serving_pci == 2
        assert ue.c_rnti in tgt.rrc.ues
        assert tgt.rrc.ues[ue.c_rnti]["state"] == "reconfigured"
