"""CSI feedback over the air: aperiodic hl-subband CQI on PUSCH,
periodic RI on PUCCH, and the frequency-selective DL allocation they
feed.

Mirrors lib/src/phy/phch/cqi.c:45 (srslte_cqi_hl_subband_pack),
srsue/src/phy/phch_worker.cc:1086 (periodic RI) and the reference
scheduler's CQI-driven link adaptation: a two-tap channel notches part
of the band, the UE's subband report shows the dip, and the eNB steers
its allocations into the clean window with a window-capped MCS.
"""

import numpy as np
import pytest

from empower_srslte_tpu.models import uci as uci_mod
from empower_srslte_tpu.stack import Air, EnbStack, UeStack
from empower_srslte_tpu.utils.cell import Cell
from tests.conftest import tti_hygiene
from tests.test_stack import _epc


class TestCqiPayloads:
    def test_subband_sizes(self):
        assert uci_mod.cqi_hl_subband_size(6) == 6
        assert uci_mod.cqi_hl_subband_size(25) == 4
        assert uci_mod.cqi_hl_subband_size(50) == 6
        assert uci_mod.cqi_hl_subband_size(100) == 8
        assert uci_mod.cqi_nof_subbands(25) == 7
        assert uci_mod.cqi_nof_subbands(100) == 13
        assert uci_mod.cqi_hl_subband_nof_bits(25) == 4 + 14

    def test_hl_subband_roundtrip(self):
        wb = 10
        sbs = [10, 10, 8, 10, 11, 10, 9]
        bits = uci_mod.cqi_pack_hl_subband(wb, sbs, 25)
        assert len(bits) == 18
        wb2, sbs2 = uci_mod.cqi_unpack_hl_subband(bits, 25)
        assert wb2 == wb
        # 2-bit differential saturates at wb-2 below / wb+1 above
        assert sbs2 == [10, 10, 8, 10, 11, 10, 9]

    def test_hl_subband_saturation(self):
        bits = uci_mod.cqi_pack_hl_subband(10, [3, 15, 10], 12)
        _, sbs = uci_mod.cqi_unpack_hl_subband(bits, 12)
        assert sbs == [8, 11, 10]      # offsets clamp to {-1..2}

    def test_ue_subband_roundtrip(self):
        bits = uci_mod.cqi_pack_ue_subband(9, 1, 5, 3)
        wb, diff, pos = uci_mod.cqi_unpack_ue_subband(bits, 3)
        assert (wb, diff, pos) == (9, 1, 5)

    def test_ri_roundtrip(self):
        for ri in (1, 2):
            assert uci_mod.ri_unpack(uci_mod.ri_pack(ri)) == ri


class TestCsiOverTheAir:
    def test_subband_report_steers_allocation(self):
        """Two-tap channel -> notched subbands -> UE aperiodic report ->
        eNB frequency-selective allocation avoids the notch."""
        import jax

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme, aperiodic_cqi=True)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)

        # d=2 echo: |H| notches at fft bins +-128 -> occupied SC ~22 and
        # ~278 (subbands 0 and 5/6 of seven 4-PRB subbands); mid-band
        # stays clean
        def notch(x):
            y = np.asarray(x, np.complex64).copy()
            y[2:] += 0.72 * y[:-2]
            return y

        ul = None
        attached_at = None
        sb_seen = None
        fsel_started = None
        delivered = False
        for tti in range(420):
            tti_hygiene(tti)
            dl = enb.tti(tti, air.ul(ul) if ul is not None else None)
            ul = ue.tti(tti, notch(air.dl(dl)))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
                # uplink+downlink traffic: UL grants carry the CSI
                # request; DL data exercises the selective allocator
                ue.send_ip(b"\x45" + bytes(19) + b"UPLINK")
            st = enb.active_ues.get(ue.c_rnti) or {}
            if attached_at is not None and sb_seen is None \
                    and "sb_cqi" in st:
                sb_seen = list(st["sb_cqi"])
                pong = (b"\x45\x00" + bytes(14)
                        + bytes(map(int, ue.rrc.nas.ue_ip.split(".")))
                        + b"DOWNLINK-DATA-TO-STEER" * 3)
                fwd = mme.spgw.downlink(pong)
                assert fwd is not None
                enb.deliver_gtpu(fwd[1])
            if fsel_started is None and any(
                    e.startswith("fsel_alloc") for e in enb.events):
                fsel_started = tti
            if fsel_started is not None and ue.rx_ip:
                delivered = True
                break

        assert attached_at is not None
        assert sb_seen is not None, enb.events[-10:]
        assert any(e.startswith("sbcqi_tx") for e in ue.events)
        assert any(e.startswith("sbcqi_rx") for e in enb.events)
        # the notched subbands (0 and 5/6) report lower CQI than the
        # clean mid-band
        mid = max(sb_seen[2:5])
        assert sb_seen[0] < mid, sb_seen
        assert min(sb_seen[5:7]) < mid, sb_seen
        # frequency-selective allocations happened and avoided the notch:
        # every chosen window's mean per-PRB CQI >= the band mean
        assert fsel_started is not None, enb.events[-10:]
        k = uci_mod.cqi_hl_subband_size(25)
        per_prb = [sb_seen[min(i // k, len(sb_seen) - 1)]
                   for i in range(25)]
        band_mean = sum(per_prb) / len(per_prb)
        starts = [int(e.split("_prb")[1].split("_")[0])
                  for e in enb.events if e.startswith("fsel_alloc")]
        for s in starts:
            win = per_prb[s:s + 4]
            assert sum(win) / len(win) >= band_mean, (s, sb_seen)
        assert delivered, "downlink data did not flow"

    def test_periodic_ri_reported(self):
        """The RI occasion (every 4th CQI occasion, I_ri=322) carries the
        1-bit rank indicator; the eNB stores it per UE."""
        import jax

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len)

        ul = None
        for tti in range(200):
            tti_hygiene(tti)
            dl = enb.tti(tti, air.ul(ul) if ul is not None else None)
            ul = ue.tti(tti, air.dl(dl))
            st = enb.active_ues.get(ue.c_rnti) or {}
            if "ri" in st and any(
                    e.startswith("cqi_rx") for e in enb.events):
                break
        assert "ri_configured" in ue.rrc.events
        assert any(e.startswith("ri_tx1") for e in ue.events), \
            [e for e in ue.events if "ri" in e or "cqi" in e][-8:]
        st = enb.active_ues.get(ue.c_rnti) or {}
        assert st.get("ri") == 1     # single-port cell -> rank 1
        # CQI reporting continues on the non-RI occasions
        assert any(e.startswith("cqi_rx") for e in enb.events)


class TestFormat2Subband:
    def test_roundtrip(self):
        """PUCCH format-2 UE-selected subband payload (cqi.c:117)."""
        for cqi, label, two in ((11, 3, True), (7, 1, False)):
            bits = uci_mod.cqi_pack_format2_subband(cqi, label, two)
            assert len(bits) == 4 + (2 if two else 1)
            c2, l2 = uci_mod.cqi_unpack_format2_subband(bits, two)
            assert (c2, l2) == (cqi, label)
