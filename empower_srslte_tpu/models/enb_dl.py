"""eNB downlink subframe composition.

Capability parity with lib/src/phy/enb/enb_dl.c: clear the grid, place
PSS/SSS/CRS (put_base, enb_dl.c:323-388), add PDSCH, then iFFT to
time-domain samples (gen_signal, enb_dl.c:389). Control channels
(PCFICH/PHICH/PDCCH) are composed by their own modules and summed in.

Batched: every function takes/returns leading batch dims.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..ops.ofdm import ofdm_tx_sf
from ..utils.cell import Cell
from .refsignal import crs_pilots


@functools.lru_cache(maxsize=256)
def _crs_scatter(cell: Cell, sf_idx: int):
    """Per-port flat indices + values for CRS insertion."""
    out = []
    ports = {1: (0,), 2: (0, 1), 4: (0, 1, 2, 3)}[cell.nof_ports]
    for p in ports:
        idx, syms, vals = crs_pilots(cell, sf_idx, p)
        flat = (syms[:, None] * cell.nof_re + idx).reshape(-1)
        out.append((flat.astype(np.int32), vals.reshape(-1)))
    return out


def put_crs(grid, cell: Cell, sf_idx: int):
    """Insert CRS for all ports: grid [..., P, nsymb, nre] -> same."""
    from ..utils.scatter import overlay

    lead = grid.shape[:-3]
    flatg = grid.reshape(*lead, grid.shape[-3], -1)
    planes = []
    scatters = _crs_scatter(cell, sf_idx)
    for p in range(grid.shape[-3]):
        plane = flatg[..., p, :]
        if p < len(scatters):
            idx, vals = scatters[p]
            plane = overlay(plane, jnp.asarray(vals), idx)
        planes.append(plane)
    return jnp.stack(planes, axis=-2).reshape(grid.shape)


def enb_dl_base_grid(cell: Cell, sf_idx: int, batch_shape=()):
    """Empty per-port grid with CRS placed (put_base analog)."""
    grid = jnp.zeros(
        (*batch_shape, cell.nof_ports, cell.nsymb_sf, cell.nof_re),
        dtype=jnp.complex64)
    return put_crs(grid, cell, sf_idx)


def put_sync_signals(grid, cell: Cell, sf_idx: int):
    """Insert PSS (slot-0 last symbol) and SSS (the one before) on port 0
    for subframes 0 and 5 (enb_dl.c put_base; 36.211 6.11), FDD."""
    if sf_idx not in (0, 5):
        return grid
    from ..ops.sync import pss_freq, sss_freq, sync_re_indices

    from ..utils.scatter import overlay

    k = sync_re_indices(cell)
    nre = cell.nof_re
    nsym = cell.nsymb_slot
    pss = jnp.asarray(pss_freq(cell.n_id_2))
    sss = jnp.asarray(sss_freq(cell.n_id_1, cell.n_id_2, sf_idx))
    lead = grid.shape[:-3]
    flatg = grid.reshape(*lead, grid.shape[-3], -1)
    p0 = overlay(flatg[..., 0, :], pss, (nsym - 1) * nre + k)
    p0 = overlay(p0, sss, (nsym - 2) * nre + k)
    flatg = jnp.concatenate([p0[..., None, :], flatg[..., 1:, :]], axis=-2)
    return flatg.reshape(grid.shape)


def enb_dl_gen_signal(grid, cell: Cell):
    """Per-port grids -> time samples [..., P, sf_sample_len]
    (srslte_enb_dl_gen_signal, enb_dl.c:389)."""
    return ofdm_tx_sf(grid, cell)
