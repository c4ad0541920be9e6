"""UE MAC procedures: BSR / PHR / SR (proc_bsr.cc, proc_phr.cc,
proc_sr.cc parity) — unit logic plus the full-stack SR->grant->BSR flow."""

import numpy as np

from empower_srslte_tpu.mac.pdu import (LCID_LONG_BSR, LCID_SHORT_BSR,
                                        MacPdu, unpack_pdu)
from empower_srslte_tpu.mac.procs import (BSR_TABLE, LONG_BSR, SHORT_BSR,
                                          BsrProc, PhrProc, SrProc,
                                          TtiTimers, UlSchConfig, bsr_index,
                                          phr_index)


def _bsr_env(buffers, **cfg_kw):
    timers = TtiTimers()
    cfg = UlSchConfig(**cfg_kw)
    bsr = BsrProc(lambda lcid: buffers.get(lcid, 0), timers, cfg)
    bsr.setup_lcid(1, lcg=0, priority=10)
    bsr.setup_lcid(3, lcg=2, priority=5)
    return timers, bsr


class TestBsrTable:
    def test_index_monotonic_and_bounds(self):
        assert bsr_index(0) == 0
        assert bsr_index(1) == 1        # <= 10 bytes -> level 1
        assert bsr_index(10) == 1
        assert bsr_index(11) == 2
        assert bsr_index(150000) == 62
        assert bsr_index(10**6) == 63
        idx = [bsr_index(n) for n in range(0, 200000, 97)]
        assert idx == sorted(idx)

    def test_phr_quantization(self):
        assert phr_index(-23.0) == 0
        assert phr_index(40.0) == 63
        assert phr_index(0.0) == 23


class TestBsrProc:
    def test_regular_trigger_on_new_data(self):
        buffers = {}
        _t, bsr = _bsr_env(buffers)
        bsr.step(0)
        assert not bsr.need_to_send_sr()
        buffers[3] = 100                    # first data on DRB
        bsr.step(1)
        assert bsr.need_to_send_sr()        # regular BSR -> SR
        assert not bsr.need_to_send_sr()    # sent once

    def test_higher_priority_channel_retriggers(self):
        buffers = {3: 50}
        _t, bsr = _bsr_env(buffers)
        bsr.step(0)
        bsr.need_to_send_sr()
        bsr.need_to_send_bsr_on_ul_grant(1000)   # cancel triggers
        buffers[1] = 20                     # higher-priority SRB data
        bsr.step(1)
        assert bsr.triggered_type != 0

    def test_grant_cancels_and_formats(self):
        buffers = {3: 100}
        _t, bsr = _bsr_env(buffers)
        bsr.step(0)
        out = bsr.need_to_send_bsr_on_ul_grant(1000)
        assert out is not None and out.fmt == SHORT_BSR
        assert out.buff_size[2] == 100
        assert bsr.triggered_type == 0      # cancelled after grant
        # two LCGs with data -> long BSR
        buffers[1] = 30
        bsr.step(1)
        out = bsr.need_to_send_bsr_on_ul_grant(1000)
        assert out is not None and out.fmt == LONG_BSR
        assert out.buff_size[0] == 30 and out.buff_size[2] == 100

    def test_grant_fitting_all_data_but_not_ce_cancels(self):
        buffers = {3: 100}
        _t, bsr = _bsr_env(buffers)
        bsr.step(0)
        # grant of exactly data+header but no room for the CE
        total = 100 + 2 - 1
        out = bsr.need_to_send_bsr_on_ul_grant(total)
        assert out is None

    def test_padding_bsr_formats(self):
        buffers = {3: 100, 1: 30}
        _t, bsr = _bsr_env(buffers)
        # no trigger, enough padding room -> padding long BSR
        out = bsr.generate_padding_bsr(10)
        assert out is not None and out.fmt == LONG_BSR
        # only room for short: truncated keeps the max-priority LCG (SRB)
        out = bsr.generate_padding_bsr(2)
        assert out is not None
        assert out.buff_size[0] == 30 and out.buff_size[2] == 0

    def test_periodic_timer_trigger(self):
        buffers = {3: 10}
        timers, bsr = _bsr_env(buffers, periodic_bsr_timer_ms=5)
        bsr.need_to_send_bsr_on_ul_grant(1000)
        for _ in range(6):
            timers.step_all()
        assert bsr.triggered_type == 3      # PERIODIC

    def test_retx_timer_reraises_sr(self):
        buffers = {3: 10}
        timers, bsr = _bsr_env(buffers, retx_bsr_timer_ms=4)
        bsr.step(0)
        assert bsr.need_to_send_sr()
        bsr.need_to_send_bsr_on_ul_grant(4)      # restarts retx timer
        assert bsr.need_to_reset_sr()
        for _ in range(5):
            timers.step_all()
        assert bsr.need_to_send_sr()        # retx expiry re-raises


class TestSrProc:
    def test_sr_counter_and_ra_fallback(self):
        cfg = UlSchConfig(dsr_trans_max=2)
        sr = SrProc(cfg)
        sr.start()
        fired = []
        for tti in range(0, 40):
            sr.step(tti)
            if sr.sr_signal:
                fired.append(tti)
        assert len(fired) == 2              # dsr_trans_max
        assert (fired[1] - fired[0]) > 8    # >8ms spacing
        assert sr.need_random_access()      # then fall back to RA
        assert not sr.need_random_access()

    def test_no_pucch_goes_straight_to_ra(self):
        sr = SrProc(UlSchConfig(sr_configured=False))
        sr.start()
        sr.step(0)
        assert not sr.sr_signal
        assert sr.need_random_access()

    def test_reset_on_grant(self):
        sr = SrProc(UlSchConfig())
        sr.start()
        sr.step(0)
        assert sr.sr_signal
        sr.reset()
        sr.step(12)
        assert not sr.sr_signal


class TestPhrProc:
    def test_periodic_and_pathloss_triggers(self):
        timers = TtiTimers()
        state = {"pl": 90.0}
        cfg = UlSchConfig(periodic_phr_timer_ms=10, dl_pathloss_change_db=3)
        phr = PhrProc(lambda: state["pl"], lambda: 17.0, timers, cfg)
        assert phr.generate_phr_on_ul_grant() == phr_index(17.0)  # initial
        assert phr.generate_phr_on_ul_grant() is None
        for _ in range(11):
            timers.step_all()
        assert phr.generate_phr_on_ul_grant() is not None   # periodic
        state["pl"] = 99.0                                  # +9 dB
        phr.step(0)
        assert phr.generate_phr_on_ul_grant() is not None   # pathloss


class TestBsrCe:
    def test_long_bsr_pack_unpack(self):
        mac = MacPdu()
        mac.add_long_bsr([1, 20, 45, 63])
        mac.add_sdu(3, b"x" * 5)
        raw = mac.pack(16)
        back = unpack_pdu(raw, ul=True)
        ce = [sp for sp in back.subpdus if sp.lcid == LCID_LONG_BSR][0]
        b = ce.payload
        idxs = [b[0] >> 2, ((b[0] & 0x3) << 4) | (b[1] >> 4),
                ((b[1] & 0xF) << 2) | (b[2] >> 6), b[2] & 0x3F]
        assert idxs == [1, 20, 45, 63]

    def test_short_bsr_pack_unpack(self):
        mac = MacPdu()
        mac.add_short_bsr(2, bsr_index(100))
        raw = mac.pack(8)
        back = unpack_pdu(raw, ul=True)
        ce = [sp for sp in back.subpdus if sp.lcid == LCID_SHORT_BSR][0]
        assert ce.payload[0] >> 6 == 2
        assert BSR_TABLE[ce.payload[0] & 0x3F] >= 100


class TestSrOverTheAir:
    def test_sr_triggers_grant_and_bsr(self):
        """Post-attach: UE queues IP data with no grant -> SR on PUCCH ->
        eNB detects -> DCI0 grant -> PUSCH carries BSR CE + data."""
        from tests.test_stack import _epc

        from empower_srslte_tpu.stack import Air, EnbStack, UeStack
        from empower_srslte_tpu.utils.cell import Cell

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)
        ul_iq, attached_at = None, None
        for tti in range(120):
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
            # wait for the standing grants to drain (BSR=0 clears want_ul)
            if (attached_at is not None and tti == attached_at + 12):
                assert not any(st.get("want_ul")
                               for st in enb.active_ues.values()), \
                    "standing grant not cleared by zero BSR"
                ue.send_ip(b"\x45\x00" + bytes(18) + b"DATA-AFTER-IDLE")
            if enb.ul_gtpu:
                break
        assert attached_at is not None
        assert enb.ul_gtpu, "UL data did not flow after SR"
        assert any(e.startswith("sr_tx") for e in ue.events), ue.events
        assert any(e.startswith("sr_detected") for e in enb.events), \
            enb.events


class TestPeriodicCqi:
    def test_cqi_reports_drive_link_adaptation(self):
        """Post-attach: UE sends wideband CQI on PUCCH format 2 every
        period; the eNB stores it and raises the DL MCS; a downlink IP
        packet rides the adapted MCS and still decodes."""
        from tests.test_stack import _epc

        from empower_srslte_tpu.stack import Air, EnbStack, UeStack
        from empower_srslte_tpu.utils.cell import Cell

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)
        ul_iq, attached_at, pushed = None, None, False
        for tti in range(120):
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
            got_cqi = any("cqi" in st for st in enb.active_ues.values())
            if attached_at is not None and got_cqi and not pushed:
                pushed = True
                pong = (b"\x45\x00" + bytes(14)
                        + bytes(map(int, ue.rrc.nas.ue_ip.split(".")))
                        + b"ADAPTED-MCS-DATA")
                fwd = mme.spgw.downlink(pong)
                enb.deliver_gtpu(fwd[1])
            if pushed and ue.rx_ip:
                break
        assert attached_at is not None
        assert any(e.startswith("cqi_tx") for e in ue.events), ue.events
        assert any(e.startswith("cqi_rx") for e in enb.events), enb.events
        # ideal air -> high CQI -> elevated MCS actually used
        cqis = [st["cqi"] for st in enb.active_ues.values() if "cqi" in st]
        assert cqis and max(cqis) >= 12, cqis
        assert ue.rx_ip and ue.rx_ip[0].endswith(b"ADAPTED-MCS-DATA")


class TestDlHarqOverTheAir:
    def test_nack_triggers_rv_retx_and_delivery(self):
        """A downlink IP packet sent through a deep fade: the UE NACKs
        on PUCCH 1a, the eNB retransmits the same TB with the next RV,
        the UE soft-combines and delivers exactly once."""
        from tests.test_stack import _epc

        from empower_srslte_tpu.stack import Air, EnbStack, UeStack
        from empower_srslte_tpu.utils.cell import Cell

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)
        ul_iq, attached_at, sent_at = None, None, None
        for tti in range(140):
            # fade exactly the first transmission of the data TB (deep
            # enough to break even the lowest-MCS QPSK allocation)
            air.snr_db = -12.0 if (sent_at is not None
                                   and tti == sent_at) else None
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
            if (attached_at is not None and tti == attached_at + 14
                    and sent_at is None):
                pong = (b"\x45\x00" + bytes(14)
                        + bytes(map(int, ue.rrc.nas.ue_ip.split(".")))
                        + b"HARQ-COMBINED!!!")
                fwd = mme.spgw.downlink(pong)
                enb.deliver_gtpu(fwd[1])
                sent_at = tti + 1          # next compose_dl carries it
            if sent_at is not None and ue.rx_ip:
                break
        assert attached_at is not None
        assert any(e.startswith("harq_retx") for e in enb.events), \
            enb.events[-12:]
        assert any(e.startswith("harq_nack") for e in ue.events) or \
            any(e.startswith("harq_nack") for e in enb.events), \
            (ue.events[-8:], enb.events[-8:])
        assert ue.rx_ip and ue.rx_ip[0].endswith(b"HARQ-COMBINED!!!")
        assert len(ue.rx_ip) == 1          # duplicate-free delivery
        assert any(e.startswith("harq_ack_") for e in enb.events), \
            enb.events[-12:]


class TestUlHarqOverTheAir:
    def test_phich_nack_triggers_retx_and_delivery(self):
        """An uplink IP packet whose PUSCH is sent through a deep fade:
        the eNB CRC-fails and NACKs on PHICH at n+4, the UE retransmits
        the same TB at n+8 with the next rv (non-adaptive synchronous UL
        HARQ, ul_harq.cc), the eNB soft-combines and the packet reaches
        the core exactly once."""
        from tests.test_stack import _epc

        from empower_srslte_tpu.stack import Air, EnbStack, UeStack
        from empower_srslte_tpu.upper.gtpu import gtpu_unpack
        from empower_srslte_tpu.utils.cell import Cell

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)
        ul_iq, attached_at, fade_at = None, None, None
        pre_plans: set = set()
        for tti in range(160):
            air.snr_db = -12.0 if tti == fade_at else None
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
                pre_plans = set(ue.pusch_plan)   # pre-ping grants
                ue.send_ip(b"\x45\x00" + bytes(18) + b"UL-HARQ-PAYLOAD")
            if attached_at is not None and fade_at is None:
                # first PUSCH planned after the ping was queued carries
                # it: fade the subframe in which the eNB receives it
                new = set(ue.pusch_plan) - pre_plans
                if new:
                    fade_at = min(new) + 1
            if enb.ul_gtpu and any(e.startswith("phich_nack")
                                   for e in ue.events):
                break
        assert attached_at is not None and fade_at is not None
        assert any(e.startswith("pusch_crc_fail") for e in enb.events), \
            enb.events[-12:]
        assert any(e.startswith("phich_nack") for e in ue.events), \
            ue.events[-12:]
        assert any(e.startswith("phich_ack") for e in ue.events), \
            ue.events[-12:]
        payloads = [gtpu_unpack(p)[1][-15:] for p in enb.ul_gtpu]
        assert payloads.count(b"UL-HARQ-PAYLOAD") == 1, payloads
