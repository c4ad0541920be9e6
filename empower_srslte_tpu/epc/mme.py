"""MME-lite: the NAS attach state machine over HSS + SP-GW
(srsepc/src/mme parity for the attach/authentication flow).

Drives the reference's attach sequence (nas.cc): Attach Request ->
Authentication Request/Response (Milenage via the HSS) -> Security Mode
Command/Complete (K_NASint derived from K_ASME) -> session creation at
the SP-GW -> Attach Accept with the UE IP. Transport-agnostic: the eNB
side passes opaque NAS PDUs (the reference carries them over S1AP).
"""

from __future__ import annotations

import hashlib
import hmac
from dataclasses import dataclass

from ..upper import security
from . import nas
from .hss import Hss
from .spgw import SpGw


def kdf_nas_int(kasme: bytes, alg_id: int = 2) -> bytes:
    """K_NASint derivation (33.401 A.7: FC=0x69, algo type NAS-int=2)."""
    s = (b"\x69" + b"\x02" + b"\x00\x01" + bytes([alg_id]) + b"\x00\x01")
    return hmac.new(kasme, s, hashlib.sha256).digest()[16:]


@dataclass
class UeContext:
    imsi: str
    state: str = "idle"        # idle -> auth -> smc -> attached
    xres: bytes = b""
    kasme: bytes = b""
    k_nas_int: bytes = b""
    ul_count: int = 0
    dl_count: int = 0
    ue_ip: str = ""
    guti: int = 0
    spgw_teid: int = 0


class Mme:
    """Attach-flow endpoint (one per EPC)."""

    def __init__(self, hss: Hss, spgw: SpGw | None = None):
        self.hss = hss
        self.spgw = spgw or SpGw()
        # S11: serialized GTPv2-C to the SP-GW (mme_gtpc.cc analog;
        # in-memory transport by default, socket-pluggable)
        from .gtpc import MmeGtpc, SpGwGtpc

        self.gtpc = MmeGtpc(transport=SpGwGtpc(self.spgw).handle)
        self._by_imsi: dict[str, UeContext] = {}
        self._next_guti = 0x1000
        self.last_ctx: UeContext | None = None  # ctx of the last UL NAS

    def handle_ul_nas(self, pdu: bytes, enb_teid: int = 0) -> bytes | None:
        """Process one uplink NAS message; returns the downlink response
        (or None)."""
        if nas.is_service_request(pdu):
            # ECM-idle -> connected (srsepc nas.cc service request): find
            # the attached context whose short MAC verifies, re-activate
            # its bearers (session persists; same IP/TEID)
            for ctx in self._by_imsi.values():
                if ctx.state == "attached" and nas.verify_service_request(
                        pdu, ctx.k_nas_int, ctx.ul_count):
                    ctx.ul_count = (ctx.ul_count & ~0x1F) | (pdu[1] & 0x1F)
                    ctx.ul_count += 1
                    self.last_ctx = ctx
                    if enb_teid:
                        # refresh the eNB S1-U endpoint (modify bearer)
                        self.gtpc.modify_bearer(ctx.spgw_teid, enb_teid)
                    out = nas.protect(nas.pack_service_accept(),
                                      ctx.k_nas_int, ctx.dl_count, 1)
                    ctx.dl_count += 1
                    return out
            return None
        msg_type = pdu[1] if (pdu[0] >> 4) == nas.SH_PLAIN else None

        if msg_type == nas.MSG_ATTACH_REQUEST:
            imsi = nas.unpack_attach_request(pdu)
            av = self.hss.generate_av(imsi)
            if av is None:
                return None
            ctx = UeContext(imsi=imsi, state="auth", xres=av["xres"],
                            kasme=av["kasme"])
            self._by_imsi[imsi] = ctx
            self.last_ctx = ctx
            return nas.pack_auth_request(av["rand"], av["autn"])

        if msg_type == nas.MSG_AUTH_RESPONSE:
            ctx = self._ctx_in_state("auth")
            if ctx is None:
                return None
            self.last_ctx = ctx
            res = nas.unpack_auth_response(pdu)
            if res != ctx.xres:
                ctx.state = "idle"
                return None
            ctx.k_nas_int = kdf_nas_int(ctx.kasme)
            ctx.state = "smc"
            cmd = nas.pack_security_mode_command()
            out = nas.protect(cmd, ctx.k_nas_int, ctx.dl_count, direction=1)
            ctx.dl_count += 1
            return out

        # integrity-protected uplink from an attached UE (detach request /
        # detach accept for a network-initiated detach)
        for ctx in list(self._by_imsi.values()):
            if ctx.state not in ("attached", "detaching"):
                continue
            inner = nas.unprotect(pdu, ctx.k_nas_int, ctx.ul_count,
                                  direction=0)
            if inner is None:
                continue
            ctx.ul_count += 1
            self.last_ctx = ctx
            if inner[1] == nas.MSG_DETACH_REQUEST and ctx.state == "attached":
                # srsepc nas.cc detach handling: tear the session down
                switch_off, _, _ = nas.unpack_detach_request_ue(inner)
                if ctx.spgw_teid:
                    self.gtpc.delete_session(ctx.spgw_teid)
                ctx.state = "deregistered"
                ctx.spgw_teid = 0
                if switch_off:
                    return None      # no accept for switch-off (24.301)
                out = nas.protect(nas.pack_detach_accept(), ctx.k_nas_int,
                                  ctx.dl_count, 1)
                ctx.dl_count += 1
                return out
            if inner[1] == nas.MSG_DETACH_ACCEPT and ctx.state == "detaching":
                ctx.state = "deregistered"
                return None
            break

        # integrity-protected uplink (security mode complete)
        ctx = self._ctx_in_state("smc")
        if ctx is not None:
            self.last_ctx = ctx
            inner = nas.unprotect(pdu, ctx.k_nas_int, ctx.ul_count,
                                  direction=0)
            ctx.ul_count += 1
            if inner is not None and inner[1] == nas.MSG_SECURITY_MODE_COMPLETE:
                res = self.gtpc.create_session(ctx.imsi, enb_teid)
                ctx.ue_ip = res["ue_ip"]
                ctx.spgw_teid = res["spgw_teid"]
                ctx.guti = self._next_guti
                self._next_guti += 1
                ctx.state = "attached"
                acc = nas.pack_attach_accept(ctx.ue_ip, ctx.guti)
                out = nas.protect(acc, ctx.k_nas_int, ctx.dl_count, 1)
                ctx.dl_count += 1
                return out
        return None

    def detach_ue(self, imsi: str, detach_type: int = 2) -> bytes | None:
        """Network-initiated detach (srsepc nas.cc): tears the session down
        and returns the protected Detach Request to deliver downlink."""
        ctx = self._by_imsi.get(imsi)
        if ctx is None or ctx.state != "attached":
            return None
        if ctx.spgw_teid:
            self.gtpc.delete_session(ctx.spgw_teid)
            ctx.spgw_teid = 0
        ctx.state = "detaching"
        out = nas.protect(nas.pack_detach_request_net(detach_type),
                          ctx.k_nas_int, ctx.dl_count, 1)
        ctx.dl_count += 1
        return out

    def _ctx_in_state(self, state: str) -> UeContext | None:
        for ctx in self._by_imsi.values():
            if ctx.state == state:
                return ctx
        return None

    def context(self, imsi: str) -> UeContext | None:
        return self._by_imsi.get(imsi)


@dataclass
class UeNas:
    """UE-side NAS endpoint (srsue/src/upper/nas.cc + usim.cc analog)."""

    imsi: str
    key: bytes
    opc: bytes
    k_nas_int: bytes = b""
    kasme: bytes = b""
    ul_count: int = 0
    dl_count: int = 0
    ue_ip: str = ""
    guti: int = 0
    attached: bool = False

    def attach_request(self) -> bytes:
        return nas.pack_attach_request(self.imsi)

    def service_request(self) -> bytes:
        """ECM-idle -> connected (nas.cc send_service_request)."""
        pdu = nas.pack_service_request(self.k_nas_int, self.ul_count)
        self.ul_count += 1
        return pdu

    def detach_request(self, switch_off: bool = True) -> bytes:
        """UE-initiated detach (nas.cc:175 detach_request / :1164
        send_detach_request)."""
        req = nas.pack_detach_request_ue(self.guti, switch_off)
        pdu = nas.protect(req, self.k_nas_int, self.ul_count, 0)
        self.ul_count += 1
        self.attached = False
        return pdu

    def handle_dl_nas(self, pdu: bytes,
                      plmn: bytes = b"\x00\xf1\x10") -> bytes | None:
        if (pdu[0] >> 4) == nas.SH_PLAIN and pdu[1] == nas.MSG_AUTH_REQUEST:
            rand, autn = nas.unpack_auth_request(pdu)
            res, ck, ik, ak = security.milenage_f2345(self.key, self.opc, rand)
            # verify network MAC-A (AUTN = SQN^AK | AMF | MAC)
            sqn = bytes(a ^ b for a, b in zip(autn[:6], ak))
            mac_a, _ = security.milenage_f1(self.key, self.opc, rand, sqn,
                                            autn[6:8])
            if mac_a != autn[8:]:
                return None  # network authentication failed
            from .hss import kasme_derive

            self.kasme = kasme_derive(ck, ik, plmn, autn[:6])
            self.k_nas_int = kdf_nas_int(self.kasme)
            return nas.pack_auth_response(res)

        inner = nas.unprotect(pdu, self.k_nas_int, self.dl_count, 1)
        self.dl_count += 1
        if inner is None:
            return None
        if inner[1] == nas.MSG_SECURITY_MODE_COMMAND:
            out = nas.protect(nas.pack_security_mode_complete(),
                              self.k_nas_int, self.ul_count, 0)
            self.ul_count += 1
            return out
        if inner[1] == nas.MSG_ATTACH_ACCEPT:
            self.guti, self.ue_ip = nas.unpack_attach_accept(inner)
            self.attached = True
        if inner[1] == nas.MSG_DETACH_REQUEST:
            # network-initiated detach (nas.cc:974 parse_detach_request)
            self.attached = False
            out = nas.protect(nas.pack_detach_accept(), self.k_nas_int,
                              self.ul_count, 0)
            self.ul_count += 1
            return out
        return None
