"""S1AP endpoints: eNB client and MME server over the 36.413 codecs.

Capability parity with srsenb/src/upper/s1ap.cc (S1 setup, initial UE
message, UL NAS, initial context setup handling) and
srsepc/src/mme/s1ap*.cc (the server side: s1ap_mngmt_proc,
s1ap_nas_transport, s1ap_ctx_mngmt_proc). The MME side drives the same
epc.Mme attach state machine used by the direct path; the wire format
is real S1AP bytes, transported in-memory or over a socket
(transport.py — the reference uses SCTP, we frame over TCP when SCTP
is unavailable).

The eNB side presents the MME-interface consumed by rrc.procedures:
  initial_ue(nas) / ul_nas(nas) -> [directives]
where directives are ("dl_nas", pdu) | ("ctx_setup", k_enb, nas_pdu)
| ("release",).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..upper import security
from . import messages as S


class DirectMmeAdapter:
    """In-process adapter presenting the directive interface over a plain
    epc.Mme (no S1AP wire) — the pre-S1AP behavior."""

    def __init__(self, mme):
        self.mme = mme

    def initial_ue(self, nas_pdu: bytes):
        return self._directives(self.mme.handle_ul_nas(nas_pdu))

    def ul_nas(self, nas_pdu: bytes):
        return self._directives(self.mme.handle_ul_nas(nas_pdu))

    def _directives(self, resp):
        ctx = getattr(self.mme, "last_ctx", None)
        if ctx is not None and ctx.state == "attached" and resp is not None:
            k_enb = security.generate_k_enb(ctx.kasme, 0)
            return [("ctx_setup", k_enb, resp)]
        if resp is not None:
            return [("dl_nas", resp)]
        return []


@dataclass
class MmeS1ap:
    """srsepc s1ap.cc analog: decodes S1AP, drives epc.Mme, encodes
    responses. `handle(pdu) -> [response pdus]`."""

    mme: object
    mcc: str = "001"
    mnc: str = "01"
    mme_name: str = "tpu-mme"
    next_mme_ue_id: int = 1
    ue_ids: dict = field(default_factory=dict)    # enb_ue_id -> mme_ue_id
    enbs: list = field(default_factory=list)
    events: list = field(default_factory=list)

    def handle(self, pdu: bytes) -> list[bytes]:
        kind, proc, ies = S.unpack_pdu(pdu)
        if proc == S.PROC_S1_SETUP and kind == S.INITIATING:
            req = S.unpack_s1_setup_request(ies)
            self.enbs.append(req)
            self.events.append(f"s1_setup_{req['enb_name']}")
            return [S.pack_s1_setup_response(self.mme_name, self.mcc,
                                             self.mnc, 0x8001, 0x1A)]
        if proc == S.PROC_INITIAL_UE_MESSAGE:
            enb_ue = S.get_ue_ids(ies)[1]
            mme_ue = self.next_mme_ue_id
            self.next_mme_ue_id += 1
            self.ue_ids[enb_ue] = mme_ue
            return self._nas_response(enb_ue, S.get_nas(ies))
        if proc == S.PROC_UPLINK_NAS:
            enb_ue = S.get_ue_ids(ies)[1]
            return self._nas_response(enb_ue, S.get_nas(ies))
        if proc == S.PROC_INITIAL_CONTEXT_SETUP and kind == S.SUCCESSFUL:
            self.events.append("initial_ctx_setup_complete")
            return []
        if proc == S.PROC_UE_CONTEXT_RELEASE and kind == S.SUCCESSFUL:
            self.events.append("ue_context_released")
            return []
        return []

    def _nas_response(self, enb_ue: int, nas_pdu: bytes) -> list[bytes]:
        resp = self.mme.handle_ul_nas(nas_pdu)
        mme_ue = self.ue_ids.get(enb_ue, 0)
        ctx = getattr(self.mme, "last_ctx", None)
        if ctx is not None and ctx.state == "attached" and resp is not None:
            k_enb = security.generate_k_enb(ctx.kasme, 0)
            sess = None
            spgw = getattr(self.mme, "spgw", None)
            teid, addr = 0, bytes(4)
            if spgw is not None and getattr(spgw, "sessions", None):
                # the session was created during attach; advertise its TEID
                sess = list(spgw.sessions.values())[-1]
                teid = getattr(sess, "spgw_teid", 0) or 0
                addr = bytes([172, 16, 255, 1])
            self.events.append("initial_ctx_setup_request")
            return [S.pack_initial_context_setup_request(
                mme_ue, enb_ue, erab_id=5, teid=teid, gtp_addr=addr,
                security_key=k_enb, nas_pdu=resp)]
        if resp is not None:
            return [S.pack_dl_nas_transport(mme_ue, enb_ue, resp)]
        return []

    def page(self, m_tmsi: int, mmec: int, tac: int) -> bytes:
        return S.pack_paging(m_tmsi, mmec, self.mcc, self.mnc, tac)


@dataclass
class EnbS1ap:
    """srsenb s1ap.cc analog: the eNB end of the S1 interface. Presents
    the directive interface to rrc.procedures while exchanging real
    S1AP PDUs with the MME through `send` (callable returning response
    PDUs, e.g. MmeS1ap.handle or a socket round-trip)."""

    send: object
    mcc: str = "001"
    mnc: str = "01"
    tac: int = 7
    cell_id: int = 0x1A2D001
    enb_id: int = 0x19B
    enb_name: str = "tpu-enb"
    next_enb_ue_id: int = 1
    setup_done: bool = False
    events: list = field(default_factory=list)
    _current_ue: int = 0

    def s1_setup(self) -> bool:
        for resp in self.send(S.pack_s1_setup_request(
                self.mcc, self.mnc, self.enb_id, self.enb_name, self.tac)):
            kind, proc, _ = S.unpack_pdu(resp)
            if proc == S.PROC_S1_SETUP and kind == S.SUCCESSFUL:
                self.setup_done = True
                self.events.append("s1_setup_ok")
        return self.setup_done

    def initial_ue(self, nas_pdu: bytes):
        if not self.setup_done:
            self.s1_setup()
        self._current_ue = self.next_enb_ue_id
        self.next_enb_ue_id += 1
        pdu = S.pack_initial_ue_message(self._current_ue, nas_pdu,
                                        self.mcc, self.mnc, self.tac,
                                        self.cell_id)
        return self._directives(self.send(pdu))

    def ul_nas(self, nas_pdu: bytes):
        pdu = S.pack_ul_nas_transport(0, self._current_ue, nas_pdu,
                                      self.mcc, self.mnc, self.tac,
                                      self.cell_id)
        return self._directives(self.send(pdu))

    def _directives(self, responses) -> list:
        out = []
        for resp in responses:
            kind, proc, ies = S.unpack_pdu(resp)
            if proc == S.PROC_DOWNLINK_NAS:
                out.append(("dl_nas", S.get_nas(ies)))
            elif proc == S.PROC_INITIAL_CONTEXT_SETUP \
                    and kind == S.INITIATING:
                item = S.unpack_erab_setup_item(ies, with_nas=True)
                k_enb = ies[S.IE_SECURITY_KEY]
                mme_ue, enb_ue = S.get_ue_ids(ies)
                self.events.append("initial_ctx_setup")
                # acknowledge with our GTP endpoint
                self.send(S.pack_initial_context_setup_response(
                    mme_ue, enb_ue, item["erab_id"], teid=enb_ue,
                    gtp_addr=bytes([172, 16, 255, 2])))
                out.append(("ctx_setup", k_enb, item["nas_pdu"]))
            elif proc == S.PROC_UE_CONTEXT_RELEASE:
                out.append(("release",))
        return out
