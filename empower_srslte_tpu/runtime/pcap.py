"""Wireshark pcap writers for MAC/NAS frames.

Capability parity with lib/src/common/mac_pcap.cc / nas_pcap.cc: frames
are wrapped with the UDP-framed MAC-LTE header understood by Wireshark
(DLT 147 user-dlt framing, mac_pcap.h:35-59's context fields).
"""

from __future__ import annotations

import struct
import time

#: DLT_USER_0 (the reference writes DLT 147 + mac-lte-framed payload).
DLT_USER0 = 147

MAC_LTE_START = b"mac-lte"
#: mac-lte-framed tags (packet-mac-lte.h)
MAC_LTE_RNTI_TAG = 0x02
MAC_LTE_FRAME_SUBFRAME_TAG = 0x04
MAC_LTE_PAYLOAD_TAG = 0x01

RADIO_DL = 1
RADIO_UL = 2
RNTI_TYPE_C = 3


class MacPcap:
    """MAC-LTE pcap writer (srslte::mac_pcap analog)."""

    def __init__(self, path: str, ue_id: int = 0):
        self._f = open(path, "wb")
        self.ue_id = ue_id
        # pcap global header, DLT 147
        self._f.write(struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0,
                                  65535, DLT_USER0))

    def _packet(self, payload: bytes) -> None:
        ts = time.time()
        sec = int(ts)
        usec = int((ts - sec) * 1e6)
        self._f.write(struct.pack("<IIII", sec, usec, len(payload),
                                  len(payload)))
        self._f.write(payload)
        self._f.flush()

    def write_pdu(self, pdu: bytes, rnti: int, tti: int,
                  direction: int = RADIO_DL,
                  rnti_type: int = RNTI_TYPE_C) -> None:
        """One MAC PDU with context (mac_pcap::pack_and_write analog)."""
        ctx = bytearray()
        ctx += MAC_LTE_START
        ctx += bytes([RADIO_DL if direction == RADIO_DL else RADIO_UL,
                      rnti_type])
        ctx += bytes([MAC_LTE_RNTI_TAG]) + struct.pack(">H", rnti)
        ctx += bytes([MAC_LTE_FRAME_SUBFRAME_TAG]) + struct.pack(
            ">H", ((tti // 10) << 4) | (tti % 10))
        ctx += bytes([MAC_LTE_PAYLOAD_TAG]) + pdu
        self._packet(bytes(ctx))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
