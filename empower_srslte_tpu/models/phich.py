"""PHICH: hybrid-ARQ indicator channel (36.211 6.9).

Capability parity with lib/src/phy/phch/phich.c: BPSK ACK/NACK spread by
length-4 orthogonal sequences (8 sequences, normal CP), repeated over 3
REGs of symbol 0, group/sequence addressing, scrambling. Normal PHICH
duration only (the reference's default).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils.cell import Cell
from ..utils.sequence import cinit_pdcch, gold_sequence
from .regs import phich_regs, symbol_regs

#: Orthogonal sequences, normal CP (36.211 Table 6.9.1-2).
_W = np.array([
    [1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1],
    [1j, 1j, 1j, 1j], [1j, -1j, 1j, -1j], [1j, 1j, -1j, -1j],
    [1j, -1j, -1j, 1j],
], dtype=np.complex64)

NSF = 4


def phich_resource(cell: Cell, prb_start: int, n_dmrs: int = 0,
                   ng: float = 1.0) -> tuple[int, int]:
    """(group, sequence) for a PUSCH's PHICH (36.213 9.1.2): derived from
    the lowest allocated PRB and the DMRS cyclic shift, so concurrent UEs
    on distinct PRB slices land on distinct resources."""
    from .regs import nof_phich_groups

    n_group = nof_phich_groups(cell, ng)
    group = (prb_start + n_dmrs) % n_group
    seq = (prb_start // n_group + n_dmrs) % (2 * NSF)
    return group, seq


def _group_re_indices(cell: Cell, ng: float, group: int) -> np.ndarray:
    regs0 = symbol_regs(cell, 0)
    idx = []
    for r in phich_regs(cell, ng)[group]:
        idx.extend(regs0[r])
    return np.asarray(idx, np.int32)  # 12 REs in symbol 0


def _scramble_seq(cell: Cell, sf_idx: int) -> np.ndarray:
    c = gold_sequence(cinit_pdcch(2 * sf_idx, cell.id), 12)
    return (1.0 - 2.0 * c).astype(np.float32)


def phich_put(grid, ack: int, cell: Cell, sf_idx: int, group: int = 0,
              seq_idx: int = 0, ng: float = 1.0):
    """Insert one ACK(1)/NACK(0) indicator into the grid: single port or
    2-port SFBC (36.211 6.9.2 precoding for two antenna ports)."""
    from ..utils.scatter import overlay

    bpsk = 1.0 if ack else -1.0
    z = np.tile(_W[seq_idx], 3) * bpsk          # 12 symbols over 3 REGs
    z = z * _scramble_seq(cell, sf_idx)
    idx = _group_re_indices(cell, ng, group)    # symbol-0 subcarriers
    lead = grid.shape[:-3]
    flat = grid.reshape(*lead, grid.shape[-3], -1)
    if cell.nof_ports >= 2:
        from ..ops.equalizer import precode_sfbc

        zt = jnp.asarray(z).astype(grid.dtype)
        layers = jnp.stack([zt[..., 0::2], zt[..., 1::2]], axis=-2)
        ps = precode_sfbc(layers)
        cur0 = flat[..., 0, jnp.asarray(idx)]
        cur1 = flat[..., 1, jnp.asarray(idx)]
        p0 = overlay(flat[..., 0, :], cur0 + ps[..., 0, :], idx)
        p1 = overlay(flat[..., 1, :], cur1 + ps[..., 1, :], idx)
        flat = jnp.concatenate([p0[..., None, :], p1[..., None, :],
                                flat[..., 2:, :]], axis=-2)
    else:
        cur = flat[..., 0, jnp.asarray(idx)]
        p0 = overlay(flat[..., 0, :],
                     cur + jnp.asarray(z).astype(grid.dtype), idx)
        flat = jnp.concatenate([p0[..., None, :], flat[..., 1:, :]],
                               axis=-2)
    return flat.reshape(grid.shape)


def phich_decode(grid, h, cell: Cell, sf_idx: int, group: int = 0,
                 seq_idx: int = 0, ng: float = 1.0, noise_est=0.0):
    """Decode one indicator: -> (ack [...] bool, metric [...]).

    ``h``: [..., nsymb, nre] single-port or [..., P, nsymb, nre]."""
    idx = jnp.asarray(_group_re_indices(cell, ng, group))
    y = grid[..., 0, :][..., idx]
    if h.ndim == grid.ndim + 1 and h.shape[-3] >= 2:
        from ..ops.equalizer import eq_sfbc

        h0 = h[..., 0, 0, :][..., idx]
        h1 = h[..., 1, 0, :][..., idx]
        x, _ = eq_sfbc(y[..., None, :], h0[..., None, :],
                       h1[..., None, :])
    else:
        if h.ndim == grid.ndim + 1:
            h = h[..., 0, :, :]
        hh = h[..., 0, :][..., idx]
        x = y * jnp.conj(hh) / jnp.maximum(
            jnp.abs(hh) ** 2 + noise_est, 1e-12)
    x = x * jnp.asarray(_scramble_seq(cell, sf_idx))
    w = jnp.asarray(np.tile(np.conj(_W[seq_idx]), 3))
    corr = jnp.real(jnp.sum(x * w, axis=-1)) / 12.0
    return corr > 0, corr
