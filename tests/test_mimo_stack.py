"""Two-antenna-port cell through the full stack: every downlink channel
(PBCH, PCFICH, PDCCH, PHICH, PDSCH) transmits 2-port SFBC diversity
(TM2) and the UE combines both ports — attach and the user plane run
over a per-port fading air.

The reference's multi-antenna eNB (srsenb with nof_ports=2: enb_dl.c
put_base applies diversity precoding to every channel; srsue
predecoding_diversity combines). Single-port stacks are unchanged.
"""

import numpy as np

from empower_srslte_tpu.stack import Air, EnbStack, UeStack
from empower_srslte_tpu.utils.cell import Cell
from tests.conftest import tti_hygiene
from tests.test_stack import _epc


class TestMimoStack:
    def test_tm2_attach_and_user_plane(self):
        import jax

        from empower_srslte_tpu.upper.gtpu import gtpu_unpack

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1, nof_ports=2)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        # distinct per-port channels: the SFBC combiner must use both
        air = Air(cell.sf_sample_len, h_dl=(1.0, 0.45 - 0.62j))

        ul_iq, attached_at, pushed = None, None, False
        for tti in range(140):
            tti_hygiene(tti)
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            assert dl_iq.ndim == 2 and dl_iq.shape[0] == 2
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
                ue.send_ip(b"\x45\x00" + bytes(18) + b"PING-OVER-SFBC!")
            if attached_at is not None and not pushed and enb.ul_gtpu:
                pushed = True
                pong = (b"\x45\x00" + bytes(14)
                        + bytes(map(int, ue.rrc.nas.ue_ip.split(".")))
                        + b"PONG-OVER-SFBC!")
                fwd = mme.spgw.downlink(pong)
                enb.deliver_gtpu(fwd[1])
            if pushed and ue.rx_ip:
                break

        assert attached_at is not None, (ue.events[-8:], enb.events[-8:])
        assert enb.ul_gtpu and \
            gtpu_unpack(enb.ul_gtpu[0])[1].endswith(b"PING-OVER-SFBC!")
        assert ue.rx_ip and ue.rx_ip[0].endswith(b"PONG-OVER-SFBC!")

    def test_tm4_two_codewords(self):
        """Two queued downlink packets ride ONE spatial-multiplexed
        format-2 grant (TM4, 2 layers / 2 codewords); the UE blind-
        decodes the format-2 DCI and both transport blocks."""
        import jax

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1, nof_ports=2)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        air = Air(cell.sf_sample_len, h_dl=(1.0, 0.45 - 0.62j))

        ul_iq, attached_at, pushed = None, None, False
        for tti in range(140):
            tti_hygiene(tti)
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
            if attached_at is not None and not pushed \
                    and tti == attached_at + 12:
                pushed = True
                # payloads sized so RLC concatenation cannot fold both
                # into one 200-byte PDU (36.322 LI concat would otherwise
                # fill a single grant and leave nothing for codeword 2)
                for tag in (b"TB0-OVER-LAYER0" + b"0" * 140,
                            b"TB1-OVER-LAYER1" + b"1" * 140):
                    pong = (b"\x45\x00" + bytes(14)
                            + bytes(map(int, ue.rrc.nas.ue_ip.split(".")))
                            + tag)
                    fwd = mme.spgw.downlink(pong)
                    enb.deliver_gtpu(fwd[1])
            if pushed and len(ue.rx_ip) >= 2:
                break

        assert any(e.startswith("tm4_tx") for e in enb.events), \
            [e for e in enb.events if "tm4" in e][-4:] or enb.events[-8:]
        assert len(ue.rx_ip) >= 2, (ue.events[-10:], enb.events[-10:])
        tags = {p[20:35] for p in ue.rx_ip}
        assert tags == {b"TB0-OVER-LAYER0", b"TB1-OVER-LAYER1"}


class TestFourPortStack:
    def test_tm2_4port_attach_and_user_plane(self):
        """Attach + user plane on a 4-antenna-port cell: every DL channel
        runs SFBC-FSTD (enb_dl.c:323-519 port loops; PBCH's CRC mask
        blind-detects the port count), and the UE's 4-port chest +
        SFBC-FSTD combiner carries the whole stack."""
        import jax

        from empower_srslte_tpu.upper.gtpu import gtpu_unpack

        mme, nas = _epc()
        cell = Cell(nof_prb=25, id=1, nof_ports=4)
        enb = EnbStack(cell, mme)
        ue = UeStack(cell, nas)
        # four distinct per-port channels: the FSTD combiner must use all
        air = Air(cell.sf_sample_len,
                  h_dl=(1.0, 0.45 - 0.62j, -0.3 + 0.8j, 0.7 + 0.2j))

        ul_iq, attached_at, pushed = None, None, False
        for tti in range(140):
            tti_hygiene(tti)
            dl_iq = enb.tti(tti,
                            air.ul(ul_iq) if ul_iq is not None else None)
            assert dl_iq.ndim == 2 and dl_iq.shape[0] == 4
            ul_iq = ue.tti(tti, air.dl(dl_iq))
            if attached_at is None and ue.rrc.nas.attached and ue.rrc.drbs:
                attached_at = tti
                ue.send_ip(b"\x45\x00" + bytes(18) + b"PING-OVER-FSTD!")
            if attached_at is not None and not pushed and enb.ul_gtpu:
                pushed = True
                pong = (b"\x45\x00" + bytes(14)
                        + bytes(map(int, ue.rrc.nas.ue_ip.split(".")))
                        + b"PONG-OVER-FSTD!")
                fwd = mme.spgw.downlink(pong)
                enb.deliver_gtpu(fwd[1])
            if pushed and ue.rx_ip:
                break

        assert attached_at is not None, (ue.events[-8:], enb.events[-8:])
        assert enb.ul_gtpu and \
            gtpu_unpack(enb.ul_gtpu[0])[1].endswith(b"PING-OVER-FSTD!")
        assert ue.rx_ip and ue.rx_ip[0].endswith(b"PONG-OVER-FSTD!")
