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
from tests.conftest import tti_hygiene


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
        from empower_srslte_tpu.mac.agent import EmpowerAgent

        mme, (nas1, nas2) = _epc_two()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme, agent=EmpowerAgent())
        ue1 = UeStack(cell, nas1, preamble=7, ra_delay_frames=0)
        ue2 = UeStack(cell, nas2, preamble=23, ra_delay_frames=2)
        air = Air(cell.sf_sample_len)

        import jax

        ul1 = ul2 = None
        pinged = set()
        for tti in range(200):
            tti_hygiene(tti)
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
        # the live agent hook saw both UEs' grants and PRB utilization
        # (empower_agent process_DL_results accounting)
        report = enb.agent.emit_reports()
        assert {u["rnti"] for u in report["ues"]} >= {ue1.c_rnti,
                                                      ue2.c_rnti}
        assert report["prb"]["dl_prb_used"] > 0
        assert report["prb"]["ul_prb_used"] > 0


class TestTwoUesDownlink:
    def test_same_subframe_dl_to_both(self):
        """Both UEs receive downlink IP data; with both DL queues filled
        the scheduler packs two PDSCH allocations (distinct PRB ranges,
        distinct CCEs) into one subframe (dl_metric_rr over users)."""
        import jax

        mme, (nas1, nas2) = _epc_two()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue1 = UeStack(cell, nas1, preamble=7, ra_delay_frames=0)
        ue2 = UeStack(cell, nas2, preamble=23, ra_delay_frames=2)
        air = Air(cell.sf_sample_len)

        ul1 = ul2 = None
        pushed = False
        for tti in range(200):
            tti_hygiene(tti)
            ul_sum = None
            for u in (ul1, ul2):
                if u is not None:
                    ul_sum = u if ul_sum is None else ul_sum + u
            dl_iq = enb.tti(tti, air.ul(ul_sum)
                            if ul_sum is not None else None)
            dl = air.dl(dl_iq)
            ul1 = ue1.tti(tti, dl)
            ul2 = ue2.tti(tti, dl)
            both_up = all(u.rrc.nas.attached and u.rrc.drbs
                          for u in (ue1, ue2))
            if both_up and not pushed:
                pushed = True
                for ue, tag in ((ue1, b"PONG-TO-THE-UE1"),
                                (ue2, b"PONG-TO-THE-UE2")):
                    pong = (b"\x45\x00" + bytes(14)
                            + bytes(map(int, ue.rrc.nas.ue_ip.split(".")))
                            + tag)
                    fwd = mme.spgw.downlink(pong)
                    assert fwd is not None
                    enb.deliver_gtpu(fwd[1])
            if pushed and ue1.rx_ip and ue2.rx_ip:
                break

        assert ue1.rx_ip and ue1.rx_ip[0].endswith(b"PONG-TO-THE-UE1")
        assert ue2.rx_ip and ue2.rx_ip[0].endswith(b"PONG-TO-THE-UE2")
        # the two data TBs (or their signalling) shared a subframe at
        # least once
        assert any(e.startswith("dl_multiuser") for e in enb.events), \
            [e for e in enb.events if "dl" in e][-10:]
