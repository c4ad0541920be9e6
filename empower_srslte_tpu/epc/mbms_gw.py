"""MBMS gateway (srsepc/src/mbms-gw/mbms-gw.cc parity).

Encapsulates multicast downlink IP into GTP-U toward the eNB's M1
interface with the fixed MBMS TEID (mbms-gw.cc:299 uses 0xAAAA), for
delivery over PMCH/MBSFN subframes. The reference reads an SGi-mb TUN
device; here packets are injected programmatically (the transport to the
eNB can be the S1 socket framing or in-process)."""

from __future__ import annotations

from dataclasses import dataclass, field

from ..upper.gtpu import gtpu_pack, gtpu_unpack

MBMS_TEID = 0xAAAA


@dataclass
class MbmsGw:
    teid: int = MBMS_TEID
    enbs: list = field(default_factory=list)   # delivery callbacks
    stats_tx: int = 0

    def add_enb(self, deliver) -> None:
        """deliver(gtpu_pdu: bytes) — the eNB's M1 ingest."""
        self.enbs.append(deliver)

    def forward(self, ip_packet: bytes) -> bytes:
        """Encapsulate one multicast IP packet and fan it to every eNB."""
        pdu = gtpu_pack(self.teid, ip_packet)
        for deliver in self.enbs:
            deliver(pdu)
        self.stats_tx += 1
        return pdu


def m1_ingest(gtpu_pdu: bytes, expected_teid: int = MBMS_TEID) -> bytes | None:
    """eNB M1 side: validate the MBMS TEID, return the inner IP packet."""
    teid, payload = gtpu_unpack(gtpu_pdu)
    return payload if teid == expected_teid else None
