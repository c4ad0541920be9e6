"""Full-stack integration: UE + eNB + EPC attach over the IQ air.

The srsue/srsenb/srsepc integration in one test (SURVEY.md section 3.3's
attach call stack end-to-end): PRACH -> RAR -> msg3 + contention
resolution -> RRC connection -> NAS mutual auth -> AS security ->
reconfiguration with DRB, every message riding real PHY subframes.
"""

import numpy as np
import pytest

from empower_srslte_tpu.epc import Hss, Subscriber
from empower_srslte_tpu.epc.mme import Mme, UeNas
from empower_srslte_tpu.stack import Air, EnbStack, UeStack
from empower_srslte_tpu.upper import security
from empower_srslte_tpu.utils.cell import Cell


def _epc():
    k = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
    opc = security.milenage_opc(
        k, bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318"))
    imsi = "001010123456789"
    hss = Hss()
    hss.add_subscriber(Subscriber(name="t", auth_algo="mil", imsi=imsi,
                                  key=k, opc=opc))
    return Mme(hss), UeNas(imsi=imsi, key=k, opc=opc)


def _run(enb, ue, air, max_tti=80):
    ul_iq = None
    for tti in range(max_tti):
        dl_iq = enb.tti(tti, air.ul(ul_iq) if ul_iq is not None else None)
        ul_iq = ue.tti(tti, air.dl(dl_iq))
        if ue.rrc.nas.attached and ue.rrc.drbs:
            return tti
    return -1


class TestFullStackAttach:
    def test_attach_over_ideal_air(self):
        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        tti = _run(enb, ue, Air(cell.sf_sample_len))
        assert tti > 0, "attach did not complete"
        assert "contention_resolved" in ue.events
        assert any(e.startswith("prach_rapid7_")
                   for e in enb.events), enb.events[:4]
        assert ue.rrc.nas.attached
        assert ue.rrc.nas.ue_ip.startswith("172.16.0.")
        assert ue.rrc.drbs == [1]
        assert ue.rrc.security_activated

    def test_attach_over_noisy_air_with_s1ap(self):
        from empower_srslte_tpu.s1ap.procedures import EnbS1ap, MmeS1ap

        mme, nas = _epc()
        mme_s1 = MmeS1ap(mme=mme)
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, EnbS1ap(send=mme_s1.handle))
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len, snr_db=15.0,
                  h_dl=0.9 * np.exp(1j * 0.5),
                  h_ul=0.85 * np.exp(-1j * 0.3))
        tti = _run(enb, ue, air)
        assert tti > 0
        assert ue.rrc.nas.attached and ue.rrc.drbs == [1]
        assert "initial_ctx_setup_complete" in mme_s1.events

    def test_user_plane_ping_both_directions(self):
        """IP packets over DRB1: UE -> PDCP/RLC-UM/MAC -> PUSCH -> eNB ->
        GTP-U -> SP-GW, and internet -> SP-GW -> GTP-U -> eNB -> PDSCH ->
        UE (the gw.cc TUN path, minus the kernel interface)."""
        from empower_srslte_tpu.upper.gtpu import gtpu_unpack

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)
        ping = b"\x45\x00" + bytes(18) + b"PING-FROM-UE-01"
        ul_iq, attached_at = None, None
        for tti in range(100):
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
                ue.send_ip(ping)
                pong = (b"\x45\x00" + bytes(14)
                        + bytes(map(int, ue.rrc.nas.ue_ip.split(".")))
                        + b"PONG-TO-THE-UE!")
                fwd = mme.spgw.downlink(pong)
                assert fwd is not None
                enb.deliver_gtpu(fwd[1])
            if enb.ul_gtpu and ue.rx_ip:
                break
        assert enb.ul_gtpu and ue.rx_ip, "user plane did not flow"
        assert gtpu_unpack(enb.ul_gtpu[0])[1].endswith(b"PING-FROM-UE-01")
        assert ue.rx_ip[0].endswith(b"PONG-TO-THE-UE!")
        # SP-GW forwards the uplink out its SGi side
        assert mme.spgw.uplink(enb.ul_gtpu[0]).endswith(b"PING-FROM-UE-01")


class TestSrb1RlcAm:
    def test_signalling_survives_harq_exhaustion(self):
        """SRB1 rides RLC AM (rlc_am.cc): an RRC message whose every
        HARQ attempt dies in a long fade is recovered by the AM layer's
        poll/status retransmission once the channel returns."""
        cell = Cell(nof_prb=25, id=1)
        mme, nas = _epc()
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)
        import jax

        ul_iq, attached_at, sent_at = None, None, None
        for tti in range(220):
            if tti and tti % 150 == 0:
                jax.clear_caches()   # XLA-CPU loader fatigue (conftest)
            # 30-tti blackout right after the enquiry is queued: deeper
            # and longer than DL HARQ's 4 attempts can bridge
            air.snr_db = -20.0 if (sent_at is not None
                                   and sent_at <= tti < sent_at + 30) \
                else None
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
            if (attached_at is not None and sent_at is None
                    and tti == attached_at + 10):
                enb.send_dl(*enb.rrc.send_capability_enquiry(ue.c_rnti))
                sent_at = tti + 1
            if sent_at is not None and any(
                    e.startswith("ue_cat") for e in enb.rrc.events):
                break
        assert attached_at is not None and sent_at is not None
        # the enquiry was lost at the MAC during the fade...
        assert any(e.startswith("ul_harq_max_retx")
                   or e.startswith("harq_nack") for e in enb.events)
        # ...but RLC AM recovered it and the UE answered
        assert "capability_sent" in ue.rrc.events, ue.rrc.events[-8:]
        assert any(e.startswith("ue_cat") for e in enb.rrc.events), \
            enb.rrc.events[-8:]


class TestTimingAdvance:
    def test_attach_over_delayed_air(self):
        """Propagation delay on the uplink (~2 km): the eNB measures the
        PRACH delay-domain offset (prach_detect_offset), commands a
        timing advance in the RAR (36.213 4.2.3, 16 Ts units), and the
        UE's radio applies it as a timed-TX advance (radio.cc tx_adv) —
        msg3 and everything after arrive aligned. Without the TA the
        120-sample offset far exceeds the cyclic prefix."""
        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len, delay_samples=120)
        ul_iq = None
        for tti in range(100):
            dl_iq = enb.tti(
                tti, air.ul(ul_iq, advance=ue.timing_advance)
                if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if ue.rrc.nas.attached and ue.rrc.drbs:
                break
        ta_unit = 16 * cell.fft_size // 2048
        tas = [int(e.rsplit("ta", 1)[1]) for e in enb.events
               if e.startswith("prach_rapid7_ta")]
        # the delay-domain grid quantizes to ~ZC-sample resolution
        assert tas and abs(tas[0] * ta_unit - 120) <= 8, enb.events[:4]
        assert f"ta_applied_{tas[0]}" in ue.events, ue.events[:6]
        assert ue.timing_advance == tas[0] * ta_unit
        assert ue.rrc.nas.attached and ue.rrc.drbs, ue.events[-10:]


class TestRadioLinkFailure:
    def test_rlc_max_retx_triggers_reestablishment(self):
        """RLF path (36.331 5.3.11.3): a dead uplink exhausts SRB1 RLC AM
        retransmissions -> the UE declares RLF, drops to idle and recovers
        through random access with RRCConnectionReestablishmentRequest;
        the eNB validates shortMAC-I, migrates the context to the new
        C-RNTI and both sides re-key (srsue rrc.cc max_retx_attempted ->
        srsenb rrc.cc reestablishment handling), all over the air."""
        cell = Cell(nof_prb=25, id=1)
        mme, nas = _epc()
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas, srb1_max_retx=2, srb1_poll_retx=8)
        air = Air(cell.sf_sample_len)
        import jax

        ul_iq, attached_at, fade_from = None, None, None
        rlf_at = reest_at = None
        for tti in range(500):
            if tti and tti % 150 == 0:
                jax.clear_caches()   # XLA-CPU loader fatigue (conftest)
            # deep PARTIAL uplink fade: PUCCH SR (energy detection) still
            # lands so grants keep flowing, but every PUSCH fails CRC —
            # the UE transmits its SRB1 AM retransmissions into the void
            # until the retx counter runs out (the rlc_am.cc maxRetx RLF)
            if fade_from is not None and rlf_at is None:
                air.snr_db_ul = -12.0
            else:
                air.snr_db_ul = None
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
            if attached_at is not None and fade_from is None \
                    and tti == attached_at + 5:
                # UE-originated SRB1 traffic that will never be ACKed
                srb, mr = ue.rrc.send_measurement_report(50, 20, [])
                ue.srb1_rlc.write_sdu(mr)
                fade_from = tti
            if rlf_at is None and "rlf_max_retx" in ue.events:
                rlf_at = tti            # air recovers here
            if rlf_at is not None and any(
                    e.startswith("reestablished_ncc")
                    for e in ue.rrc.events):
                reest_at = tti
                break
        assert attached_at is not None, "attach failed"
        assert rlf_at is not None, f"no RLF declared: {ue.events[-12:]}"
        assert "reestablishment_ok" in enb.rrc.events, enb.rrc.events[-8:]
        assert reest_at is not None, ue.events[-12:]
        # context migrated: exactly one UE context, under a fresh C-RNTI
        assert len(enb.rrc.ues) == 1
        assert ue.c_rnti in enb.rrc.ues
        # NAS registration survived RLF (reestablishment, not re-attach)
        assert ue.rrc.nas.attached


class TestSpecMsg3Timing:
    def test_attach_with_spec_n_plus_6_msg3(self):
        """RAR-grant -> msg3 at the spec's n+6 (36.213 6.1.1) instead of
        the framework's default +4 pipeline delay: attach still completes
        with both stacks configured for spec timing."""
        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme, msg3_delay=6)
        ue = UeStack(cell, nas, msg3_delay=6)
        tti = _run(enb, ue, Air(cell.sf_sample_len))
        assert tti > 0, "attach did not complete with n+6 msg3"
        assert ue.rrc.nas.attached and ue.rrc.drbs == [1]
