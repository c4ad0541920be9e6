"""PBCH: physical broadcast channel (MIB), 36.211 6.6 / 36.212 5.3.1.

Capability parity with lib/src/phy/phch/pbch.c: MIB pack/unpack, CRC16
masked by the antenna-port configuration (pbch.c port detection from the
CRC mask, :156,425), tail-biting convolutional coding, rate matching to
the 40 ms / 1920-bit PBCH allocation, per-frame quarter transmission and
blind decoding of the frame phase (SFN mod 4).
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..ops.fec.convcoder import conv_encode, viterbi_decode
from ..ops.fec.rm_conv import rm_conv_rx, rm_conv_tx
from ..ops.modem import Mod, demod_soft, modulate
from ..ops.scrambling import descramble_llrs, scramble_bits
from ..utils.bits import bits_to_uint, uint_to_bits
from ..utils.cell import Cell
from ..utils.crc import CRC16

#: Coded bits per 40 ms PBCH period (normal CP) and per radio frame.
PBCH_BITS = 1920
QUARTER = PBCH_BITS // 4

#: CRC masks per antenna-port count (36.212 Table 5.3.1.1-1).
PORT_MASKS = {1: 0x0000, 2: 0xFFFF, 4: 0x5555}

_BW_IDX = {6: 0, 15: 1, 25: 2, 50: 3, 75: 4, 100: 5}
_IDX_BW = {v: k for k, v in _BW_IDX.items()}


def mib_pack(nof_prb: int, phich_dur: int, phich_res: int, sfn: int) -> np.ndarray:
    """MIB -> 24 bits (36.331 MasterInformationBlock)."""
    bits = np.concatenate([
        uint_to_bits(_BW_IDX[nof_prb], 3),
        uint_to_bits(phich_dur, 1),
        uint_to_bits(phich_res, 2),
        uint_to_bits((sfn >> 2) & 0xFF, 8),
        np.zeros(10, np.int8),
    ])
    return bits


def mib_unpack(bits: np.ndarray) -> dict:
    return dict(
        nof_prb=_IDX_BW[bits_to_uint(bits[0:3])],
        phich_dur=bits_to_uint(bits[3:4]),
        phich_res=bits_to_uint(bits[4:6]),
        sfn_msb=bits_to_uint(bits[6:14]),
    )


@functools.lru_cache(maxsize=256)
def pbch_re_indices(cell: Cell) -> np.ndarray:
    """Flat (symbol * nof_re + k) indices of the 240 PBCH REs: slot-1
    symbols 0..3, central 72 subcarriers, skipping CRS positions assuming
    4 antenna ports (36.211 6.6.4)."""
    nre = cell.nof_re
    mid = nre // 2
    cols = np.arange(mid - 36, mid + 36)
    vshift = cell.id % 6
    out = []
    nsym = cell.nsymb_slot
    for s in range(4):
        sym = nsym + s
        for k in cols:
            if s < 2 and (k - vshift) % 3 == 0:
                continue  # reserved for 4-port CRS
            out.append(sym * nre + k)
    idx = np.asarray(out, np.int32)
    assert len(idx) == 240
    return idx


def pbch_encode_period(mib_bits, cell: Cell):
    """24-bit MIB -> 1920 scrambled coded bits for one 40 ms period."""
    mask = PORT_MASKS[cell.nof_ports]
    crc = CRC16.jnp_compute(mib_bits).astype(jnp.int8)
    maskbits = jnp.asarray(uint_to_bits(mask, 16))
    payload = jnp.concatenate([mib_bits.astype(jnp.int8),
                               jnp.bitwise_xor(crc, maskbits)], axis=-1)
    d = conv_encode(payload)
    e = rm_conv_tx(d, PBCH_BITS)
    return scramble_bits(e, cell.id)


def pbch_put(grid, mib_bits, cell: Cell, sfn: int):
    """Insert this frame's PBCH quarter into the grid
    [..., P, nsymb, nre] (subframe 0 grids only): single port or 2-port
    SFBC (srslte_pbch_encode layer map + diversity precoding)."""
    from ..utils.scatter import overlay

    coded = pbch_encode_period(mib_bits, cell)
    q = sfn % 4
    syms = modulate(coded[..., q * QUARTER : (q + 1) * QUARTER], Mod.QPSK)
    idx = pbch_re_indices(cell)
    lead = grid.shape[:-3]
    flat = grid.reshape(*lead, grid.shape[-3], -1)
    if cell.nof_ports >= 2:
        from ..ops.equalizer import precode_sfbc

        layers = jnp.stack([syms[..., 0::2], syms[..., 1::2]], axis=-2)
        ps = precode_sfbc(layers)
        p0 = overlay(flat[..., 0, :], ps[..., 0, :], idx)
        p1 = overlay(flat[..., 1, :], ps[..., 1, :], idx)
        flat = jnp.concatenate([p0[..., None, :], p1[..., None, :],
                                flat[..., 2:, :]], axis=-2)
    else:
        p0 = overlay(flat[..., 0, :], syms, idx)
        flat = jnp.concatenate([p0[..., None, :], flat[..., 1:, :]],
                               axis=-2)
    return flat.reshape(grid.shape)


def pbch_decode(grid, h, cell: Cell, noise_est=0.0):
    """Blind PBCH decode from a subframe-0 grid.

    grid [..., nsymb, nre] (single rx antenna), h same shape (port-0
    channel), at any bandwidth >= 6 PRB (PBCH sits on the central 72
    subcarriers). Tries all 4 frame-phase hypotheses x 3 port masks;
    returns (mib_bits [..., 24], sfn_mod4 [...], nof_ports [...],
    ok [...]). Batched over hypotheses like the reference's loop
    (pbch.c:425).
    """
    cell_id = cell.id
    idx = jnp.asarray(pbch_re_indices(cell))
    flat = grid.reshape(*grid.shape[:-2], -1)
    y = flat[..., idx]
    if h.ndim == grid.ndim + 1 and h.shape[-3] >= 2:
        # 2-port SFBC combining (the transmit-diversity PBCH)
        from ..ops.equalizer import eq_sfbc

        hf = h.reshape(*h.shape[:-2], -1)
        h0 = hf[..., 0, :][..., idx]
        h1 = hf[..., 1, :][..., idx]
        x, csi = eq_sfbc(y[..., None, :], h0[..., None, :],
                         h1[..., None, :])
        llr480 = demod_soft(x, Mod.QPSK) * jnp.repeat(csi, 2, axis=-1)
    else:
        if h.ndim == grid.ndim + 1:
            h = h[..., 0, :, :]
        hf = h.reshape(*h.shape[:-2], -1)
        hh = hf[..., idx]
        x = y * jnp.conj(hh) / jnp.maximum(jnp.abs(hh) ** 2 + noise_est,
                                           1e-12)
        llr480 = demod_soft(x, Mod.QPSK) \
            * jnp.abs(hh).repeat(2, axis=-1) ** 2

    lead = llr480.shape[:-1]
    outs_bits, outs_ok = [], []
    for q in range(4):
        buf = jnp.zeros((*lead, PBCH_BITS), llr480.dtype)
        buf = buf.at[..., q * QUARTER : (q + 1) * QUARTER].set(llr480)
        buf = descramble_llrs(buf, cell_id)
        d_llr = rm_conv_rx(buf, 40)
        bits = viterbi_decode(d_llr, wrap=1)
        for ports, mask in PORT_MASKS.items():
            maskbits = jnp.asarray(uint_to_bits(mask, 16))
            unmasked = jnp.concatenate(
                [bits[..., :24],
                 jnp.bitwise_xor(bits[..., 24:].astype(jnp.int8), maskbits)],
                axis=-1)
            ok = CRC16.jnp_check(unmasked)
            outs_bits.append(bits[..., :24])
            outs_ok.append(ok)
    oks = jnp.stack(outs_ok, axis=-1)                  # [..., 12]
    allbits = jnp.stack(outs_bits, axis=-2)            # [..., 12, 24]
    best = jnp.argmax(oks, axis=-1)
    mib = jnp.take_along_axis(
        allbits, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    ports_tbl = jnp.asarray([1, 2, 4] * 4, jnp.int32).reshape(12)
    # hypothesis order: q major, ports minor
    q_tbl = jnp.asarray(np.repeat(np.arange(4), 3), jnp.int32)
    return (mib, q_tbl[best], ports_tbl[best], jnp.any(oks, axis=-1))
