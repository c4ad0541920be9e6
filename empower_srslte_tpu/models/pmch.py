"""PMCH: physical multicast channel for eMBMS/MBSFN (36.211 6.5/6.10.2).

Capability parity with lib/src/phy/phch/pmch.c: a PDSCH-like processor
with MBSFN-area scrambling (36.211 6.5: c_init from the MBSFN area id),
extended-CP MBSFN region, MBSFN reference signals on antenna port 4
(36.211 6.10.2) and full-band allocation. The many-carrier batched decode
(BASELINE config 5) rides the ``carrier`` mesh axis (parallel/mesh.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from ..ops.modem import Mod, demod_soft, modulate
from ..ops.scrambling import descramble_llrs, scramble_bits
from ..utils.cell import CP, Cell
from ..utils.sequence import cinit_pmch, prs_sequence
from .sch import DlschPlan, dlsch_decode, dlsch_encode

#: Subframe symbols carrying MBSFN RS (extended CP, 15 kHz, 36.211 6.10.2.2).
MBSFN_RS_SYMS = (2, 6, 10)


@functools.lru_cache(maxsize=256)
def mbsfn_rs(area_id: int, nof_prb: int, sf_idx: int):
    """(re_idx[3, 3*prb], syms[3], values[3, 3*prb]): MBSFN RS every other
    subcarrier (6 per PRB over 2 symbol groups -> 3 per PRB per symbol)."""
    rows_idx, rows_val = [], []
    nre = 12 * nof_prb
    max_prb = 110
    for i, l in enumerate(MBSFN_RS_SYMS):
        ns = 2 * sf_idx + (0 if l < 6 else 1)
        l_slot = l if l < 6 else l - 6
        c_init = ((7 * (ns + 1) + l_slot + 1) * (2 * area_id + 1) << 9) + area_id
        r = prs_sequence(c_init, 6 * max_prb)
        m = np.arange(6 * nof_prb)
        m_prime = m + 3 * (max_prb - nof_prb)   # center in the max-BW seq
        k = 2 * m + (1 if i == 1 else 0)   # offset alternates per symbol
        keep = k < nre
        rows_idx.append(k[keep].astype(np.int32))
        rows_val.append(r[m_prime[keep]])
    syms = np.asarray(MBSFN_RS_SYMS, np.int32)
    return rows_idx, syms, rows_val


@functools.lru_cache(maxsize=256)
def pmch_re_indices(cell: Cell, sf_idx: int, cfi: int = 1) -> np.ndarray:
    """PMCH REs: all non-control REs except MBSFN RS (full band)."""
    nre = cell.nof_re
    usable = np.ones((cell.nsymb_sf, nre), dtype=bool)
    usable[:cfi, :] = False
    idx_rows, syms, _ = mbsfn_rs(0, cell.nof_prb, sf_idx)
    for row, s in zip(idx_rows, syms):
        # only the RS REs themselves are excluded; data rides the other
        # subcarriers of RS symbols (srslte_pmch_cp prb_cp_ref with
        # nof_refs=6, pmch.c:63-105)
        usable[s, row] = False
    sym_idx, k_idx = np.nonzero(usable)
    order = np.lexsort((k_idx, sym_idx))
    return (sym_idx[order] * nre + k_idx[order]).astype(np.int32)


@dataclass(frozen=True)
class PmchConfig:
    cell: Cell                     # extended-CP cell for MBSFN subframes
    area_id: int = 1
    sf_idx: int = 1
    cfi: int = 1
    mod: Mod = Mod.QAM16

    def __post_init__(self):
        assert self.cell.cp is CP.EXT, "PMCH requires the extended-CP cell"

    @property
    def nof_re(self) -> int:
        return len(pmch_re_indices(self.cell, self.sf_idx, self.cfi))

    @property
    def g(self) -> int:
        return self.nof_re * self.mod.bits_per_symbol

    def plan(self, tbs: int, max_iterations: int = 5,
             decoder_impl: str = "auto") -> DlschPlan:
        return DlschPlan(tbs=tbs, g=self.g, qm=self.mod.bits_per_symbol,
                         max_iterations=max_iterations,
                         decoder_impl=decoder_impl)

    def cinit(self) -> int:
        return cinit_pmch(self.area_id, 2 * self.sf_idx)


def pmch_put_rs(grid, cfg: PmchConfig):
    """Insert MBSFN RS into [..., nsymb, nre]."""
    from ..utils.scatter import overlay

    idx_rows, syms, vals = mbsfn_rs(cfg.area_id, cfg.cell.nof_prb, cfg.sf_idx)
    nre = cfg.cell.nof_re
    lead = grid.shape[:-2]
    flat = grid.reshape(*lead, -1)
    for row, s, v in zip(idx_rows, syms, vals):
        flat = overlay(flat, jnp.asarray(v), int(s) * nre + row)
    return flat.reshape(grid.shape)


def pmch_encode(tb_bits, cfg: PmchConfig, plan: DlschPlan):
    """tb[..., tbs] -> MBSFN subframe grid [..., nsymb, nre] (with RS)."""
    from ..utils.scatter import place

    coded = dlsch_encode(tb_bits, plan)
    scr = scramble_bits(coded, cfg.cinit())
    syms = modulate(scr, cfg.mod)
    lead = syms.shape[:-1]
    grid = place(syms, pmch_re_indices(cfg.cell, cfg.sf_idx, cfg.cfi),
                 cfg.cell.nsymb_sf * cfg.cell.nof_re)
    grid = grid.reshape(*lead, cfg.cell.nsymb_sf, cfg.cell.nof_re)
    return pmch_put_rs(grid, cfg)


def pmch_chest(grid, cfg: PmchConfig):
    """LS + interpolation over MBSFN RS -> h [..., nsymb, nre]."""
    idx_rows, syms, vals = mbsfn_rs(cfg.area_id, cfg.cell.nof_prb, cfg.sf_idx)
    nre = cfg.cell.nof_re
    h_rows = []
    for row, s, v in zip(idx_rows, syms, vals):
        ls = grid[..., s, jnp.asarray(row)] * jnp.conj(jnp.asarray(v))
        # linear interp to the full band
        x = np.asarray(row, np.float64)
        w_idx0 = np.clip(np.searchsorted(x, np.arange(nre)) - 1, 0, len(x) - 2)
        t = (np.arange(nre) - x[w_idx0]) / (x[w_idx0 + 1] - x[w_idx0])
        h0 = ls[..., jnp.asarray(w_idx0)]
        h1 = ls[..., jnp.asarray(w_idx0 + 1)]
        h_rows.append(h0 * (1 - jnp.asarray(t.astype(np.float32)))
                      + h1 * jnp.asarray(t.astype(np.float32)))
    h_t = jnp.stack(h_rows, axis=-2)                      # [..., 3, nre]
    # time interpolation across the 3 RS symbols
    ts = np.asarray(syms, np.float64)
    tw = np.zeros((cfg.cell.nsymb_sf, len(ts)), np.float32)
    for s in range(cfg.cell.nsymb_sf):
        j = int(np.clip(np.searchsorted(ts, s) - 1, 0, len(ts) - 2))
        w = (s - ts[j]) / (ts[j + 1] - ts[j])
        tw[s, j] = 1 - w
        tw[s, j + 1] = w
    from ..ops.chest import time_interp_apply

    return time_interp_apply(tw, h_t)


def pmch_decode(grid, cfg: PmchConfig, plan: DlschPlan, noise_est=0.0,
                h=None):
    """MBSFN subframe decode -> (tb, crc_ok, softbuffers)."""
    if h is None:
        h = pmch_chest(grid, cfg)
    idx = jnp.asarray(pmch_re_indices(cfg.cell, cfg.sf_idx, cfg.cfi))
    y = grid.reshape(*grid.shape[:-2], -1)[..., idx]
    hh = h.reshape(*h.shape[:-2], -1)[..., idx]
    x = y * jnp.conj(hh) / (jnp.abs(hh) ** 2 + noise_est)
    llr = demod_soft(x, cfg.mod) * jnp.repeat(jnp.abs(hh) ** 2,
                                              cfg.mod.bits_per_symbol, axis=-1)
    llr = descramble_llrs(llr, cfg.cinit())
    return dlsch_decode(llr, plan)
