"""Uplink demodulation reference signals (DMRS) and base sequences,
36.211 5.5.

Capability parity with lib/src/phy/ch_estimation/refsignal_ul.c and
ul_rs_tables.h: Zadoff-Chu base sequences with cyclic extension for
allocations >= 3 PRB, the 30 special QPSK-phase sequences for 1-2 PRB
(binary spec tables in empower_srslte_tpu/data/), group assignment
u = (f_gh + f_ss) mod 30 with **group hopping** (phy_common.c:342) and
**sequence hopping** v (refsignal_ul.c:154) — both checked against
reference-generated goldens — cyclic shifts, and PUSCH DMRS placement on
the middle SC-FDMA symbol of each slot.
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np

import jax.numpy as jnp

from ..utils.cell import Cell

_DATA = pathlib.Path(__file__).resolve().parent.parent / "data"


def _largest_prime_below(n: int) -> int:
    def is_prime(x):
        if x < 2:
            return False
        for d in range(2, int(x ** 0.5) + 1):
            if x % d == 0:
                return False
        return True

    p = n - 1
    while not is_prime(p):
        p -= 1
    return p


@functools.lru_cache(maxsize=1024)
def base_sequence(u: int, v: int, m_sc: int) -> np.ndarray:
    """r_{u,v}(n), length m_sc (36.211 5.5.1.1/5.5.1.2)."""
    if m_sc == 12:
        phi = np.load(_DATA / "ul_rs_phi12.npy")[u]
        return np.exp(1j * phi * np.pi / 4).astype(np.complex64)
    if m_sc == 24:
        phi = np.load(_DATA / "ul_rs_phi24.npy")[u]
        return np.exp(1j * phi * np.pi / 4).astype(np.complex64)
    nzc = _largest_prime_below(m_sc)
    q_bar = nzc * (u + 1) / 31.0
    # q = floor(q_bar + 1/2) + v * (-1)^floor(2 q_bar)  (36.211 5.5.1.1)
    q = int(np.floor(q_bar + 0.5) + v * (-1) ** int(np.floor(2 * q_bar)))
    m = np.arange(nzc)
    xq = np.exp(-1j * np.pi * q * m * (m + 1) / nzc)
    n = np.arange(m_sc)
    return xq[n % nzc].astype(np.complex64)


# --- group / sequence hopping (36.211 5.5.1.3/5.5.1.4;
# --- phy_common.c:342 srslte_group_hopping_f_gh and
# --- refsignal_ul.c:154 generate_srslte_sequence_hopping_v) -----------------


@functools.lru_cache(maxsize=64)
def group_hopping_f_gh(cell_id: int) -> np.ndarray:
    """f_gh(ns) mod 30 for the 20 slots of a frame: 8 Gold bits per slot
    with c_init = floor(cell_id/30)."""
    from ..utils.sequence import gold_sequence

    c = gold_sequence(cell_id // 30, 160)
    weights = (1 << np.arange(8)).astype(np.int64)
    return (c.reshape(20, 8) @ weights) % 30


@functools.lru_cache(maxsize=64)
def sequence_hopping_v(cell_id: int, delta_ss: int = 0) -> np.ndarray:
    """v(ns) for the 20 slots: one Gold bit per slot with
    c_init = floor(cell_id/30)*2^5 + f_ss (applies when m_sc >= 6 PRB)."""
    from ..utils.sequence import gold_sequence

    c_init = ((cell_id // 30) << 5) + ((cell_id % 30) + delta_ss) % 30
    return gold_sequence(c_init, 20).astype(np.int64)


def dmrs_u_v(cell_id: int, ns: int, n_prb: int, delta_ss: int = 0,
             group_hopping: bool = False,
             sequence_hopping: bool = False) -> tuple[int, int]:
    """(u, v) for slot ns (refsignal_ul.c compute path: u = (f_gh + f_ss)
    mod 30; v from the hopping sequence for >= 6-PRB allocations)."""
    f_gh = int(group_hopping_f_gh(cell_id)[ns]) if group_hopping else 0
    u = (f_gh + (cell_id % 30) + delta_ss) % 30
    v = 0
    if n_prb >= 6 and sequence_hopping and not group_hopping:
        v = int(sequence_hopping_v(cell_id, delta_ss)[ns])
    return u, v


def pusch_dmrs_symbols(cell: Cell) -> tuple[int, int]:
    """Subframe-symbol indices carrying PUSCH DMRS (symbol 3 of each slot
    for normal CP, 36.211 5.5.2.1.2)."""
    l = 3 if cell.cp.value == "normal" else 2
    return (l, cell.nsymb_slot + l)


def pusch_dmrs(cell: Cell, n_prb: int, cyclic_shift: int = 0,
               delta_ss: int = 0, sf_idx: int = 0,
               group_hopping: bool = False,
               sequence_hopping: bool = False) -> np.ndarray:
    """[2, 12*n_prb] DMRS sequences for the two slots of subframe
    ``sf_idx`` (36.211 5.5.1.3/5.5.2.1.1; refsignal_ul.c:368 pregen).

    With hopping off both slots use u = (cell_id + delta_ss) mod 30;
    with group/sequence hopping on, (u, v) follow the per-slot hopping
    patterns. alpha = 2*pi*cyclic_shift/12.
    """
    m_sc = 12 * n_prb
    n = np.arange(m_sc)
    alpha = 2 * np.pi * cyclic_shift / 12.0
    slots = []
    for slot in range(2):
        ns = 2 * sf_idx + slot
        u, v = dmrs_u_v(cell.id, ns, n_prb, delta_ss, group_hopping,
                        sequence_hopping)
        r = base_sequence(u, v, m_sc)
        slots.append((np.exp(1j * alpha * n) * r).astype(np.complex64))
    return np.stack(slots)


def chest_ul_pusch(grid, cell: Cell, prb_start: int, n_prb: int,
                   cyclic_shift: int = 0,
                   prb_start_slot1: int | None = None, sf_idx: int = 0,
                   delta_ss: int = 0, group_hopping: bool = False,
                   sequence_hopping: bool = False):
    """LS channel estimate over the PUSCH allocation from the two DMRS
    symbols, time-interpolated to all symbols (chest_ul.c analog).

    grid [..., nsymb, nre] -> h [..., nsymb, 12*n_prb] (allocation only).
    With frequency hopping (``prb_start_slot1``) each slot's DMRS sits on
    its own allocation, so estimates are held constant per slot instead
    of interpolated across the hop.
    """
    m_sc = 12 * n_prb
    k0 = 12 * prb_start
    k1 = 12 * (prb_start if prb_start_slot1 is None else prb_start_slot1)
    dmrs = jnp.asarray(pusch_dmrs(
        cell, n_prb, cyclic_shift, delta_ss=delta_ss, sf_idx=sf_idx,
        group_hopping=group_hopping, sequence_hopping=sequence_hopping))
    l0, l1 = pusch_dmrs_symbols(cell)
    y0 = grid[..., l0, k0 : k0 + m_sc]
    y1 = grid[..., l1, k1 : k1 + m_sc]
    h0 = y0 * jnp.conj(dmrs[0])
    h1 = y1 * jnp.conj(dmrs[1])
    # 3-tap freq smoothing
    def smooth(h):
        pad = jnp.concatenate([h[..., :1], h, h[..., -1:]], axis=-1)
        return (pad[..., :-2] + pad[..., 1:-1] + pad[..., 2:]) / 3.0

    h0, h1 = smooth(h0), smooth(h1)
    nsymb = cell.nsymb_sf
    if prb_start_slot1 is not None and prb_start_slot1 != prb_start:
        # hopped: hold each slot's estimate (no cross-hop interpolation)
        half = cell.nsymb_slot
        sel = jnp.asarray((np.arange(nsymb) >= half).astype(np.float32))
        t = sel[..., :, None]
        return h0[..., None, :] * (1 - t) + h1[..., None, :] * t
    # linear time interpolation/extrapolation between the two DMRS symbols
    t = (np.arange(nsymb) - l0) / float(l1 - l0)
    t = jnp.asarray(t.astype(np.float32))[..., :, None]
    return h0[..., None, :] * (1 - t) + h1[..., None, :] * t


# --- SRS: sounding reference signals (36.211 5.5.3) -------------------------


def srs_sequence(cell: Cell, n_prb_srs: int, cyclic_shift: int = 0,
                 sf_idx: int = 0,
                 group_hopping: bool = False) -> np.ndarray:
    """r_SRS over the sounding bandwidth: comb-2 -> M_sc = 12*n_prb/2
    subcarriers (refsignal_ul.c srs path; SRS rides slot 2*sf with the
    same f_gh group hopping as PUSCH DMRS)."""
    m_sc = 12 * n_prb_srs // 2
    u, _ = dmrs_u_v(cell.id, 2 * sf_idx, 0, 0, group_hopping, False)
    r = base_sequence(u, 0, m_sc)
    n = np.arange(m_sc)
    alpha = 2 * np.pi * cyclic_shift / 8.0
    return (np.exp(1j * alpha * n) * r).astype(np.complex64)


def srs_put(grid, cell: Cell, n_prb_srs: int, prb_start: int = 0,
            comb: int = 0, cyclic_shift: int = 0):
    """Insert SRS in the last SC-FDMA symbol (comb-2 spacing)."""
    import jax.numpy as jnp

    from ..utils.scatter import overlay

    seq = srs_sequence(cell, n_prb_srs, cyclic_shift)
    k = 12 * prb_start + comb + 2 * np.arange(len(seq))
    flat = grid.reshape(*grid.shape[:-2], -1)
    flat = overlay(flat, jnp.asarray(seq),
                   (cell.nsymb_sf - 1) * cell.nof_re + k)
    return flat.reshape(grid.shape)


def srs_chest(grid, cell: Cell, n_prb_srs: int, prb_start: int = 0,
              comb: int = 0, cyclic_shift: int = 0):
    """LS channel estimate at the SRS comb positions -> h[..., M_sc]."""
    import jax.numpy as jnp

    seq = srs_sequence(cell, n_prb_srs, cyclic_shift)
    k = 12 * prb_start + comb + 2 * np.arange(len(seq))
    y = grid[..., cell.nsymb_sf - 1, jnp.asarray(k.astype(np.int32))]
    return y * jnp.conj(jnp.asarray(seq))
