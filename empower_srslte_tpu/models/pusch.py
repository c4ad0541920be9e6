"""PUSCH: physical uplink shared channel (36.211 5.3, 36.212 5.2.2).

Capability parity with lib/src/phy/phch/pusch.c: UL-SCH coding (shared
turbo chain), scrambling, modulation, DFT transform precoding, mapping
around the two DMRS symbols; and the eNB receive path (enb_ul.c:256-386):
DMRS channel estimation, MMSE equalization, IDFT despreading, soft
demapping and decode. UCI multiplexing is handled in models/uci.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from ..ops.dft_precoding import dft_deprecode, dft_precode, valid_prb
from ..ops.modem import Mod, demod_soft, modulate
from ..ops.scrambling import descramble_llrs, scramble_bits
from ..utils.cell import Cell
from ..utils.sequence import cinit_pdsch
from .refsignal_ul import chest_ul_pusch, pusch_dmrs, pusch_dmrs_symbols
from .sch import DlschPlan, dlsch_decode, dlsch_encode


@dataclass(frozen=True)
class PuschConfig:
    """Static PUSCH grant configuration."""

    cell: Cell
    sf_idx: int = 0
    rnti: int = 0x1234
    mod: Mod = Mod.QPSK
    prb_start: int = 0
    n_prb: int = 6
    cyclic_shift: int = 0

    def __post_init__(self):
        assert valid_prb(self.n_prb), f"n_prb={self.n_prb} not 2^a 3^b 5^c"

    @property
    def m_sc(self) -> int:
        return 12 * self.n_prb

    @property
    def nof_data_symbols(self) -> int:
        return self.cell.nsymb_sf - 2  # minus the two DMRS symbols

    @property
    def g(self) -> int:
        return self.nof_data_symbols * self.m_sc * self.mod.bits_per_symbol

    def plan(self, tbs: int, rv: int = 0, max_iterations: int = 5,
             decoder_impl: str = "auto") -> DlschPlan:
        return DlschPlan(tbs=tbs, g=self.g, qm=self.mod.bits_per_symbol,
                         rv=rv, max_iterations=max_iterations,
                         decoder_impl=decoder_impl)

    def cinit(self) -> int:
        return cinit_pdsch(self.rnti, 0, 2 * self.sf_idx, self.cell.id)

    @functools.cached_property
    def data_symbol_indices(self) -> np.ndarray:
        l0, l1 = pusch_dmrs_symbols(self.cell)
        return np.asarray(
            [s for s in range(self.cell.nsymb_sf) if s not in (l0, l1)],
            np.int32)


def pusch_encode(tb_bits, cfg: PuschConfig, plan: DlschPlan):
    """tb_bits[..., tbs] -> UL grid [..., nsymb, nre] (single antenna)."""
    coded = dlsch_encode(tb_bits, plan)
    scr = scramble_bits(coded, cfg.cinit())
    syms = modulate(scr, cfg.mod)
    lead = syms.shape[:-1]
    blocks = syms.reshape(*lead, cfg.nof_data_symbols, cfg.m_sc)
    spread = dft_precode(blocks)

    from ..utils.scatter import place

    cell = cfg.cell
    k0 = 12 * cfg.prb_start
    l0, l1 = pusch_dmrs_symbols(cell)
    dmrs = pusch_dmrs(cell, cfg.n_prb, cfg.cyclic_shift)
    # one static placement of data + DMRS values into the flat grid
    data_idx = np.concatenate(
        [s * cell.nof_re + k0 + np.arange(cfg.m_sc)
         for s in cfg.data_symbol_indices])
    dmrs_idx = np.concatenate(
        [l * cell.nof_re + k0 + np.arange(cfg.m_sc) for l in (l0, l1)])
    vals = jnp.concatenate(
        [spread.reshape(*lead, -1),
         jnp.broadcast_to(jnp.asarray(dmrs.reshape(-1)),
                          (*lead, 2 * cfg.m_sc))], axis=-1)
    flat = place(vals, np.concatenate([data_idx, dmrs_idx]),
                 cell.nsymb_sf * cell.nof_re)
    return flat.reshape(*lead, cell.nsymb_sf, cell.nof_re)


def pusch_decode(grid, cfg: PuschConfig, plan: DlschPlan, noise_est=0.0,
                 softbuffers=None):
    """eNB receive: grid [..., nsymb, nre] -> (tb, crc_ok, softbuffers).

    DMRS chest over the allocation, per-RE MMSE, IDFT despread, CSI-
    weighted LLRs, UL-SCH decode (srslte_enb_ul chain, enb_ul.c:256-386).
    """
    cell = cfg.cell
    k0 = 12 * cfg.prb_start
    h = chest_ul_pusch(grid, cell, cfg.prb_start, cfg.n_prb,
                       cfg.cyclic_shift)                  # [..., nsymb, Msc]
    alloc = grid[..., k0 : k0 + cfg.m_sc]
    data_syms = jnp.asarray(cfg.data_symbol_indices)
    y = alloc[..., data_syms, :]
    hh = h[..., data_syms, :]
    x = y * jnp.conj(hh) / (jnp.abs(hh) ** 2 + noise_est)
    despread = dft_deprecode(x)
    llr = demod_soft(despread.reshape(*despread.shape[:-2], -1), cfg.mod)
    # weight by the mean channel gain per symbol (post-IDFT the per-RE CSI
    # averages across the allocation)
    csi = jnp.mean(jnp.abs(hh) ** 2, axis=-1, keepdims=True)
    csi = jnp.broadcast_to(csi, hh.shape).reshape(*despread.shape[:-2], -1)
    llr = llr * jnp.repeat(csi, cfg.mod.bits_per_symbol, axis=-1)
    llr = descramble_llrs(llr, cfg.cinit())
    return dlsch_decode(llr, plan, softbuffers=softbuffers)
