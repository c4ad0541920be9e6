"""LTE security algorithms (33.401; lib/src/common/liblte_security.cc
parity): EEA0 (null), 128-EEA2 (AES-CTR ciphering), 128-EIA2 (AES-CMAC
integrity) and the Milenage authentication functions (f1-f5*, used by the
HSS and USIM). AES-128 is implemented in pure Python (encrypt-only — CTR
and CMAC need only the forward cipher); no external crypto dependency.
SNOW3G (EEA1/EIA1) is not yet implemented.
"""

from __future__ import annotations

# --- AES-128 (FIPS-197), encrypt-only ---------------------------------------

_SBOX = None


def _build_sbox():
    global _SBOX
    if _SBOX is not None:
        return _SBOX
    # multiplicative inverse in GF(2^8) + affine transform
    def xtime(a):
        return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1

    # build log/antilog tables with generator 3
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= xtime(x)  # multiply by 3
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    sbox = [0] * 256
    for i in range(256):
        inv = 0 if i == 0 else exp[255 - log[i]]
        b = inv
        res = 0x63
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            res ^= b
        sbox[i] = res ^ inv
    _SBOX = bytes(sbox)
    return _SBOX


def _gmul(a, b):
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[bytes]:
    sbox = _build_sbox()
    w = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [sbox[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [bytes(sum(w[4 * r : 4 * r + 4], [])) for r in range(11)]


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One AES-128 block encryption (16 bytes)."""
    sbox = _build_sbox()
    rks = _expand_key(key)
    # flat state, byte index r + 4*c (column-major like FIPS-197)
    s = list(block)

    def add_rk(s, rk):
        return [a ^ b for a, b in zip(s, rk)]

    def sub(s):
        return [sbox[b] for b in s]

    def shift_rows(s):
        out = list(s)
        for r in range(1, 4):
            row = [s[r + 4 * c] for c in range(4)]
            row = row[r:] + row[:r]
            for c in range(4):
                out[r + 4 * c] = row[c]
        return out

    def mix(s):
        out = [0] * 16
        for c in range(4):
            col = s[4 * c : 4 * c + 4]
            out[4 * c + 0] = _gmul(col[0], 2) ^ _gmul(col[1], 3) ^ col[2] ^ col[3]
            out[4 * c + 1] = col[0] ^ _gmul(col[1], 2) ^ _gmul(col[2], 3) ^ col[3]
            out[4 * c + 2] = col[0] ^ col[1] ^ _gmul(col[2], 2) ^ _gmul(col[3], 3)
            out[4 * c + 3] = _gmul(col[0], 3) ^ col[1] ^ col[2] ^ _gmul(col[3], 2)
        return out

    s = add_rk(s, rks[0])
    for rnd in range(1, 10):
        s = mix(shift_rows(sub(s)))
        s = add_rk(s, rks[rnd])
    s = shift_rows(sub(s))
    s = add_rk(s, rks[10])
    return bytes(s)


# --- 128-EEA2: AES-CTR ciphering (33.401 B.1.3) ------------------------------


def eea2(key: bytes, count: int, bearer: int, direction: int,
         data: bytes) -> bytes:
    """Cipher/decipher (symmetric): counter block T1 = COUNT | BEARER |
    DIRECTION | 0..., incremented per 16-byte block."""
    iv = (count.to_bytes(4, "big")
          + bytes([((bearer & 0x1F) << 3) | ((direction & 1) << 2)])
          + b"\x00" * 11)
    out = bytearray()
    ctr = int.from_bytes(iv, "big")
    for i in range(0, len(data), 16):
        ks = aes128_encrypt_block(key, ctr.to_bytes(16, "big"))
        chunk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
        ctr = (ctr + 1) % (1 << 128)
    return bytes(out)


def eea0(key: bytes, count: int, bearer: int, direction: int,
         data: bytes) -> bytes:
    """Null ciphering."""
    return data


# --- 128-EIA2: AES-CMAC integrity (33.401 B.2.3) -----------------------------


def _cmac_subkeys(key: bytes):
    def dbl(b: bytes) -> bytes:
        i = int.from_bytes(b, "big") << 1
        if b[0] & 0x80:
            i ^= 0x87
        return (i & ((1 << 128) - 1)).to_bytes(16, "big")

    l = aes128_encrypt_block(key, b"\x00" * 16)
    k1 = dbl(l)
    k2 = dbl(k1)
    return k1, k2


def aes_cmac(key: bytes, msg: bytes) -> bytes:
    k1, k2 = _cmac_subkeys(key)
    n = max(1, (len(msg) + 15) // 16)
    full = len(msg) and len(msg) % 16 == 0
    blocks = [msg[16 * i : 16 * i + 16] for i in range(n)]
    last = blocks[-1]
    if full:
        last = bytes(a ^ b for a, b in zip(last, k1))
    else:
        pad = last + b"\x80" + b"\x00" * (15 - len(last))
        last = bytes(a ^ b for a, b in zip(pad, k2))
    x = b"\x00" * 16
    for b in blocks[:-1]:
        x = aes128_encrypt_block(key, bytes(a ^ c for a, c in zip(x, b)))
    return aes128_encrypt_block(key, bytes(a ^ c for a, c in zip(x, last)))


def eia2(key: bytes, count: int, bearer: int, direction: int,
         data: bytes) -> bytes:
    """32-bit MAC-I (33.401 B.2.3): M = COUNT | BEARER | DIR | data."""
    m = (count.to_bytes(4, "big")
         + bytes([((bearer & 0x1F) << 3) | ((direction & 1) << 2)])
         + b"\x00" * 3 + data)
    return aes_cmac(key, m)[:4]


# --- Milenage (35.206; hss.cc:808 / usim.cc parity) --------------------------


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def milenage_opc(k: bytes, op: bytes) -> bytes:
    return _xor(aes128_encrypt_block(k, op), op)


def _rotl(x: bytes, bits: int) -> bytes:
    """Cyclic left rotation by a whole number of bytes (35.206 uses
    r in {0, 32, 64, 96, 128} bits)."""
    n = (bits // 8) % 16
    return x[n:] + x[:n]


def milenage_f1(k: bytes, opc: bytes, rand: bytes, sqn: bytes, amf: bytes):
    """-> (MAC-A, MAC-S) (35.206 f1/f1*; r1=64 bits, c1=0)."""
    temp = aes128_encrypt_block(k, _xor(rand, opc))
    in1 = sqn + amf + sqn + amf
    out1 = _xor(aes128_encrypt_block(
        k, _xor(temp, _rotl(_xor(in1, opc), 64))), opc)
    return out1[:8], out1[8:]


def milenage_f2345(k: bytes, opc: bytes, rand: bytes):
    """-> (RES, CK, IK, AK) (35.206 f2-f5; r2..r4 = 0/32/64 bits,
    c2..c4 = 1/2/4)."""
    temp = aes128_encrypt_block(k, _xor(rand, opc))

    def outx(c: int, r_bits: int) -> bytes:
        block = bytearray(_rotl(_xor(temp, opc), r_bits))
        block[15] ^= c
        return _xor(aes128_encrypt_block(k, bytes(block)), opc)

    out2 = outx(1, 0)
    out3 = outx(2, 32)
    out4 = outx(4, 64)
    return out2[8:], out3, out4, out2[:6]
