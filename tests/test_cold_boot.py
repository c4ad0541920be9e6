"""Cold-boot UE over the air: cell search -> MIB -> SIB1/SIB2 -> RA ->
attach, with nothing preconfigured but the RF geometry.

The srsue acquisition sequence (phch_recv.cc IDLE -> CELL_SEARCH ->
SFN_SYNC -> CAMPING, then rrc.cc SIB handling and apply_sib2_configs):
the UE discovers the PCI from PSS/SSS, the PRB count and SFN from the
MIB on PBCH, and the PRACH root sequence index from SIB2 broadcast on
the SI-RNTI — then attaches normally.
"""

import numpy as np

from empower_srslte_tpu.stack import Air, EnbStack, UeStack
from empower_srslte_tpu.utils.cell import Cell
from tests.conftest import tti_hygiene
from tests.test_stack import _epc


class TestColdBoot:
    def test_search_mib_sib_attach(self):
        import jax

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=77)
        enb = EnbStack(cell, mme, rsi=384, broadcast=True)
        # the UE knows only its RF tuning (rate/bandwidth): wrong PCI,
        # wrong PRACH root; everything real is acquired over the air
        ue = UeStack(Cell(nof_prb=25, id=0), nas, rsi=0, cold_start=True)
        air = Air(cell.sf_sample_len)

        ul_iq = None
        for tti in range(260):
            tti_hygiene(tti)
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if ue.rrc.nas.attached and ue.rrc.drbs:
                break

        assert any(e.startswith("cell_found_id77") for e in ue.events), \
            ue.events[:6]
        assert any(e.startswith("mib_prb25") for e in ue.events), \
            ue.events[:8]
        assert "sib1_acquired" in ue.events
        assert any(e.startswith("sib2_acquired_rsi384")
                   for e in ue.events), ue.events[:12]
        assert "camped" in ue.events
        # the acquired config made random access + attach work
        assert ue.cell.id == 77 and ue.cell.nof_prb == 25
        assert ue.rsi == 384
        assert ue.rrc.nas.attached and ue.rrc.drbs, ue.events[-12:]
