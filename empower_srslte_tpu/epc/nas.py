"""NAS EMM message subset (24.301; srsepc/src/mme nas.cc / liblte_mme.cc
parity for the attach flow).

Pack/unpack for the messages exercised by the reference's attach
procedure: Attach Request, Authentication Request/Response, Security Mode
Command/Complete, Attach Accept. Plain-header (non-ciphered) encoding plus
the integrity-protected header variant with EIA2 MAC.
"""

from __future__ import annotations

from ..upper import security

#: Protocol discriminator: EPS Mobility Management.
PD_EMM = 0x07

# message types (24.301 Table 9.8.1)
MSG_ATTACH_REQUEST = 0x41
MSG_ATTACH_ACCEPT = 0x42
MSG_AUTH_REQUEST = 0x52
MSG_AUTH_RESPONSE = 0x53
MSG_SECURITY_MODE_COMMAND = 0x5D
MSG_SECURITY_MODE_COMPLETE = 0x5E
MSG_SERVICE_ACCEPT = 0x4F
MSG_DETACH_REQUEST = 0x45
MSG_DETACH_ACCEPT = 0x46

#: Security header types.
SH_PLAIN = 0x0
SH_INTEGRITY = 0x1
SH_INTEGRITY_CIPHERED = 0x2
#: Service Request uses its own compact security header (24.301 9.1).
SH_SERVICE_REQUEST = 0xC


def _imsi_to_bcd(imsi: str) -> bytes:
    """IMSI -> mobile identity BCD (odd-length IMSI typical)."""
    digits = [int(c) for c in imsi]
    odd = len(digits) % 2 == 1
    out = [(digits[0] << 4) | (0x9 if odd else 0x1)]
    rest = digits[1:]
    for i in range(0, len(rest) - 1, 2):
        out.append((rest[i + 1] << 4) | rest[i])
    if len(rest) % 2 == 1:
        out.append(0xF0 | rest[-1])
    return bytes(out)


def _bcd_to_imsi(b: bytes) -> str:
    digits = [str(b[0] >> 4)]
    for byte in b[1:]:
        digits.append(str(byte & 0xF))
        if (byte >> 4) != 0xF:
            digits.append(str(byte >> 4))
    return "".join(digits)


def pack_attach_request(imsi: str) -> bytes:
    ident = _imsi_to_bcd(imsi)
    return bytes([PD_EMM, MSG_ATTACH_REQUEST, 0x71, len(ident)]) + ident


def unpack_attach_request(msg: bytes) -> str:
    assert msg[1] == MSG_ATTACH_REQUEST
    ln = msg[3]
    return _bcd_to_imsi(msg[4 : 4 + ln])


def pack_auth_request(rand: bytes, autn: bytes, ksi: int = 0) -> bytes:
    return (bytes([PD_EMM, MSG_AUTH_REQUEST, ksi & 0x0F]) + rand
            + bytes([len(autn)]) + autn)


def unpack_auth_request(msg: bytes) -> tuple[bytes, bytes]:
    assert msg[1] == MSG_AUTH_REQUEST
    rand = msg[3:19]
    ln = msg[19]
    return rand, msg[20 : 20 + ln]


def pack_auth_response(res: bytes) -> bytes:
    return bytes([PD_EMM, MSG_AUTH_RESPONSE, len(res)]) + res


def unpack_auth_response(msg: bytes) -> bytes:
    assert msg[1] == MSG_AUTH_RESPONSE
    return msg[3 : 3 + msg[2]]


def pack_security_mode_command(eea: int = 2, eia: int = 2) -> bytes:
    return bytes([PD_EMM, MSG_SECURITY_MODE_COMMAND, (eea << 4) | eia])


def pack_security_mode_complete() -> bytes:
    return bytes([PD_EMM, MSG_SECURITY_MODE_COMPLETE])


def pack_attach_accept(ue_ip: str, guti: int = 0) -> bytes:
    import ipaddress

    ip = ipaddress.ip_address(ue_ip).packed
    return (bytes([PD_EMM, MSG_ATTACH_ACCEPT]) + guti.to_bytes(4, "big") + ip)


def unpack_attach_accept(msg: bytes) -> tuple[int, str]:
    import ipaddress

    assert msg[1] == MSG_ATTACH_ACCEPT
    guti = int.from_bytes(msg[2:6], "big")
    return guti, str(ipaddress.ip_address(msg[6:10]))


# --- integrity-protected wrapper (24.301 9.1/9.2) ---------------------------


def protect(msg: bytes, k_nas_int: bytes, count: int,
            direction: int) -> bytes:
    """Wrap with the integrity-protected security header:
    [SH|PD, MAC(4), SEQ, inner...]."""
    seq = count & 0xFF
    mac = security.eia2(k_nas_int, count, 0, direction, bytes([seq]) + msg)
    return bytes([(SH_INTEGRITY << 4) | PD_EMM]) + mac + bytes([seq]) + msg


def unprotect(pdu: bytes, k_nas_int: bytes, count: int,
              direction: int) -> bytes | None:
    """Verify + strip the security header; None on MAC failure."""
    if (pdu[0] >> 4) != SH_INTEGRITY:
        return pdu  # plain message
    mac, seq, inner = pdu[1:5], pdu[5], pdu[6:]
    exp = security.eia2(k_nas_int, (count & ~0xFF) | seq, 0, direction,
                        bytes([seq]) + inner)
    return inner if mac == exp else None


# --- Service Request (24.301 8.2.25: compact 4-byte format) -----------------


def service_request_mac(k_nas_int: bytes, count: int) -> bytes:
    """Short MAC (2 bytes): truncated EIA2 over the KSI|SEQ byte
    (24.301 9.9.3.28 uses the message short MAC; same construction)."""
    seq = count & 0x1F
    mac = security.eia2(k_nas_int, count, 0, 0, bytes([seq]))
    return mac[2:4]


def pack_service_request(k_nas_int: bytes, count: int,
                         ksi: int = 0) -> bytes:
    """[SH_SERVICE_REQUEST|PD, KSI|SEQ(5 bits), short MAC(2)]."""
    seq = count & 0x1F
    return (bytes([(SH_SERVICE_REQUEST << 4) | PD_EMM,
                   (ksi << 5) | seq])
            + service_request_mac(k_nas_int, count))


def is_service_request(pdu: bytes) -> bool:
    return len(pdu) == 4 and (pdu[0] >> 4) == SH_SERVICE_REQUEST \
        and (pdu[0] & 0xF) == PD_EMM


def verify_service_request(pdu: bytes, k_nas_int: bytes,
                           count: int) -> bool:
    """Checks the short MAC against the expected UL count (the receiver
    substitutes the 5-bit SEQ into its local count estimate)."""
    seq = pdu[1] & 0x1F
    est = (count & ~0x1F) | seq
    return service_request_mac(k_nas_int, est) == pdu[2:]


def pack_service_accept() -> bytes:
    return bytes([PD_EMM, MSG_SERVICE_ACCEPT])


# --- detach (24.301 8.2.11/8.2.10; nas.cc:175 send_detach_request,
# --- nas.cc:974 parse_detach_request -> send_detach_accept) -----------------

def pack_detach_request_ue(guti: int, switch_off: bool = True,
                           detach_type: int = 1) -> bytes:
    """UE-originating Detach Request: detach-type IE (bit 4 = switch off,
    bits 1-3 = type, 1 = EPS detach) + KSI nibble + GUTI identity."""
    dt = ((0x8 if switch_off else 0) | (detach_type & 0x7))
    return bytes([PD_EMM, MSG_DETACH_REQUEST, dt]) + guti.to_bytes(4, "big")


def unpack_detach_request_ue(msg: bytes) -> tuple[bool, int, int]:
    """-> (switch_off, detach_type, guti)."""
    dt = msg[2]
    return bool(dt & 0x8), dt & 0x7, int.from_bytes(msg[3:7], "big")


def pack_detach_request_net(detach_type: int = 1) -> bytes:
    """Network-originating Detach Request (type 1 = re-attach required,
    2 = re-attach not required, 3 = IMSI detach)."""
    return bytes([PD_EMM, MSG_DETACH_REQUEST, detach_type & 0x7])


def pack_detach_accept() -> bytes:
    return bytes([PD_EMM, MSG_DETACH_ACCEPT])


# --- full attach-accept decode (24.301 8.2.1; liblte_mme.cc parity for the
# --- captured message in srsue/test/upper/rrc_reconfig_test.cc nas_test) ----


def unpack_attach_accept_full(inner: bytes) -> dict:
    """Decode a standards-formatted ATTACH ACCEPT (the real-network layout,
    as opposed to this framework's compact pack_attach_accept): mandatory
    attach result, T3412, TAI list and ESM container, then optional TLVs
    (GUTI 0x50, T3402 0x17, T3423 0x59, equivalent PLMNs 0x4A, ...).
    """
    out: dict = {}
    pos = 2                                   # PD/SH + message type
    out["attach_result"] = inner[pos] & 0x0F
    pos += 1
    out["t3412"] = inner[pos]
    pos += 1
    # TAI list (length-prefixed)
    n = inner[pos]
    tai = inner[pos + 1 : pos + 1 + n]
    pos += 1 + n
    out["tai_list"] = {
        "type": (tai[0] >> 5) & 3,
        "plmn": tai[1:4].hex(),
        "tac": int.from_bytes(tai[4:6], "big"),
    }
    # ESM message container (2-byte length)
    esm_len = int.from_bytes(inner[pos : pos + 2], "big")
    esm = inner[pos + 2 : pos + 2 + esm_len]
    pos += 2 + esm_len
    out["esm"] = unpack_activate_default_bearer(esm)
    # optional TLVs
    while pos < len(inner):
        iei = inner[pos]
        if iei == 0x50:                       # GUTI
            n = inner[pos + 1]
            g = inner[pos + 2 : pos + 2 + n]
            out["guti"] = {
                "plmn": g[1:4].hex(),
                "mme_group": int.from_bytes(g[4:6], "big"),
                "mme_code": g[6],
                "m_tmsi": int.from_bytes(g[7:11], "big"),
            }
            pos += 2 + n
        elif iei in (0x17, 0x59):             # GPRS timers (TV, 1 byte)
            out[{0x17: "t3402", 0x59: "t3423"}[iei]] = inner[pos + 1]
            pos += 2
        else:                                 # unknown TLV: skip by length
            n = inner[pos + 1] if pos + 1 < len(inner) else 0
            pos += 2 + n
    return out


def unpack_activate_default_bearer(esm: bytes) -> dict:
    """ACTIVATE DEFAULT EPS BEARER CONTEXT REQUEST (24.301 8.3.6)."""
    out = {
        "eps_bearer_id": (esm[0] >> 4) & 0x0F,
        "proc_transaction_id": esm[1],
        "msg_type": esm[2],
    }
    pos = 3
    # EPS QoS (length-prefixed)
    n = esm[pos]
    out["qci"] = esm[pos + 1]
    pos += 1 + n
    # APN (length-prefixed, DNS label encoding)
    n = esm[pos]
    apn = esm[pos + 1 : pos + 1 + n]
    labels = []
    i = 0
    while i < len(apn):
        ln = apn[i]
        labels.append(apn[i + 1 : i + 1 + ln].decode())
        i += 1 + ln
    out["apn"] = ".".join(labels)
    pos += 1 + n
    # PDN address (length-prefixed: type + address)
    n = esm[pos]
    out["pdn_type"] = esm[pos + 1] & 0x07
    out["pdn_address"] = ".".join(str(b)
                                  for b in esm[pos + 2 : pos + 1 + n])
    pos += 1 + n
    return out
