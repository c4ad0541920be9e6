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
    ue_capabilities: dict = field(default_factory=dict)

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
        if proc == S.PROC_INITIAL_CONTEXT_SETUP and kind == S.UNSUCCESSFUL:
            # srsepc releases the UE on setup failure
            mme_ue, enb_ue = S.get_ue_ids(ies)
            self.events.append("initial_ctx_setup_failure")
            return [S.pack_ue_context_release_command(mme_ue or 0,
                                                      enb_ue or 0)]
        if proc == S.PROC_UE_CONTEXT_RELEASE and kind == S.SUCCESSFUL:
            self.events.append("ue_context_released")
            return []
        if proc == S.PROC_UE_CONTEXT_RELEASE_REQUEST:
            mme_ue, enb_ue = S.get_ue_ids(ies)
            self.events.append("release_requested")
            return [S.pack_ue_context_release_command(mme_ue or 0,
                                                      enb_ue or 0)]
        if proc == S.PROC_UE_CAPABILITY_INFO_IND:
            mme_ue, enb_ue = S.get_ue_ids(ies)
            self.ue_capabilities[enb_ue] = S.get_ue_radio_capability(ies)
            self.events.append("ue_capabilities_stored")
            return []
        if proc == S.PROC_ERAB_SETUP and kind == S.SUCCESSFUL:
            res = S.unpack_erab_setup_response(ies)
            self.events.append(f"erab_setup_complete_{res['erab_id']}")
            return []
        return []

    def setup_bearer(self, enb_ue_id: int, erab_id: int, qci: int,
                     teid: int, gtp_addr: bytes, nas_pdu: bytes) -> bytes:
        """Build an E-RAB SETUP REQUEST for a dedicated bearer (the MME
        GTP-C create-bearer path; srsepc scope is the default bearer, the
        procedure itself mirrors 36.413 8.2.1)."""
        mme_ue = self.ue_ids.get(enb_ue_id, 0)
        self.events.append("erab_setup_request")
        return S.pack_erab_setup_request(mme_ue, enb_ue_id, erab_id, qci,
                                         teid, gtp_addr, nas_pdu)

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
            elif proc == S.PROC_UE_CONTEXT_RELEASE \
                    and kind == S.INITIATING:
                # srsenb handle_uectxtreleasecommand: ack with complete
                mme_ue, enb_ue = self._ids_from_release(ies)
                self.send(S.pack_ue_context_release_complete(
                    mme_ue, enb_ue))
                self.events.append("released")
                out.append(("release",))
            elif proc == S.PROC_ERAB_SETUP and kind == S.INITIATING:
                item = S.unpack_erab_setup_request(ies)
                mme_ue, enb_ue = S.get_ue_ids(ies)
                self.events.append(f"erab_setup_{item['erab_id']}")
                self.send(S.pack_erab_setup_response(
                    mme_ue, enb_ue, item["erab_id"], teid=enb_ue,
                    gtp_addr=bytes([172, 16, 255, 2])))
                out.append(("erab_setup", item["erab_id"], item["qci"],
                            item["teid"], item["addr"], item["nas_pdu"]))
        return out

    @staticmethod
    def _ids_from_release(ies) -> tuple[int, int]:
        if S.IE_UE_S1AP_IDS in ies:
            from .per import AReader

            r = AReader(ies[S.IE_UE_S1AP_IDS])
            r.get(1)
            if r.get(1) == 0:       # pair
                r.get(1)
                r.get(1)
                return r.get_big_int(), r.get_big_int()
            return r.get_big_int(), 0
        return S.get_ue_ids(ies)

    def ue_capabilities(self, ue_radio_cap: bytes):
        """Forward UE radio capabilities to the MME (srsenb
        send_ue_capabilities)."""
        self.events.append("capabilities_forwarded")
        return self._directives(self.send(
            S.pack_ue_capability_info_indication(0, self._current_ue,
                                                 ue_radio_cap)))

    def initial_ctx_setup_failure(self, cause=(0, 26)):
        """Report context-setup failure (srsenb
        send_initial_ctxt_setup_failure); the MME answers with a release
        command."""
        self.events.append("ctx_setup_failed")
        return self._directives(self.send(
            S.pack_initial_context_setup_failure(0, self._current_ue,
                                                 cause)))

    def release_request(self, cause=(0, 21)):
        """eNB-initiated UE release (srsenb send_uectxtreleaserequest)."""
        self.events.append("release_requested")
        return self._directives(self.send(
            S.pack_ue_context_release_request(0, self._current_ue, cause)))
