"""Two UEs on one cell: staggered random access, RRC-assigned dedicated
PUCCH resources, per-UE UL PRB allocations, both user planes flowing.

The multi-user shape of the reference eNB (srsenb serves many UEs with
per-UE PhysicalConfigDedicated and scheduler allocations) exercised end
to end over one shared IQ air: the uplink the eNB sees is the SUM of
both UEs' transmissions.
"""

import numpy as np

from empower_srslte_tpu.epc import Hss, Subscriber
from empower_srslte_tpu.epc.mme import Mme, UeNas
from empower_srslte_tpu.stack import Air, EnbStack, UeStack
from empower_srslte_tpu.upper import security
from empower_srslte_tpu.utils.cell import Cell


def _epc_two():
    hss = Hss()
    subs = []
    for i, imsi in enumerate(("001010123456789", "001010123456790")):
        k = bytes([0x46 + i]) + bytes.fromhex(
            "5b5ce8b199b49faa5f0a2ee238a6bc")
        opc = security.milenage_opc(
            k, bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318"))
        hss.add_subscriber(Subscriber(name=f"u{i}", auth_algo="mil",
                                      imsi=imsi, key=k, opc=opc))
        subs.append(UeNas(imsi=imsi, key=k, opc=opc))
    return Mme(hss), subs


class TestTwoUes:
    def test_both_attach_and_ping(self):
        mme, (nas1, nas2) = _epc_two()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue1 = UeStack(cell, nas1, preamble=7, ra_delay_frames=0)
        ue2 = UeStack(cell, nas2, preamble=23, ra_delay_frames=2)
        air = Air(cell.sf_sample_len)

        import jax

        ul1 = ul2 = None
        pinged = set()
        for tti in range(200):
            if tti and tti % 50 == 0:
                # the XLA-CPU executable loader degrades after hundreds
                # of in-process loads (see conftest); shed them mid-test
                jax.clear_caches()
            ul_sum = None
            for u in (ul1, ul2):
                if u is not None:
                    ul_sum = u if ul_sum is None else ul_sum + u
            dl_iq = enb.tti(tti, air.ul(ul_sum)
                            if ul_sum is not None else None)
            dl = air.dl(dl_iq)
            ul1 = ue1.tti(tti, dl)
            ul2 = ue2.tti(tti, dl)
            for i, ue in enumerate((ue1, ue2)):
                if (i not in pinged and ue.rrc.nas.attached
                        and ue.rrc.drbs):
                    pinged.add(i)
                    ue.send_ip(b"\x45\x00" + bytes(18)
                               + b"PING-FROM-UE-%d!" % i)
            if len(enb.ul_gtpu) >= 2:
                break

        assert ue1.rrc.nas.attached, "UE1 attach failed"
        assert ue2.rrc.nas.attached, "UE2 attach failed"
        # distinct C-RNTIs and IPs
        assert ue1.c_rnti != ue2.c_rnti
        assert ue1.rrc.nas.ue_ip != ue2.rrc.nas.ue_ip
        # RRC assigned distinct dedicated PUCCH resources
        assert ue1.rrc.sr_cfg is not None and ue2.rrc.sr_cfg is not None
        assert (ue1.rrc.sr_cfg["n_pucch"], ue1.rrc.sr_cfg["subframe"]) != \
            (ue2.rrc.sr_cfg["n_pucch"], ue2.rrc.sr_cfg["subframe"])
        # both uplink user planes made it through the shared air
        from empower_srslte_tpu.upper.gtpu import gtpu_unpack

        payloads = {gtpu_unpack(p)[1][-15:] for p in enb.ul_gtpu}
        assert b"PING-FROM-UE-0!" in payloads, payloads
        assert b"PING-FROM-UE-1!" in payloads, payloads
