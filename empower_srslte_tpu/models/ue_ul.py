"""UE uplink subframe generation (lib/src/phy/ue/ue_ul.c parity).

Composes PUSCH / PUCCH / SRS into the UL grid, applies the SC-FDMA
half-subcarrier shift, CFO pre-compensation and timing advance, and
produces time samples — the UE TX counterpart of models/enb_dl.py's
composer. The eNB receive side lives in models/enb_ul.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..ops.ofdm import freq_shift_half_subcarrier, ofdm_tx_sf
from ..ops.sync import cfo_correct
from ..utils.cell import Cell
from .pucch import PucchConfig, pucch_f1_encode, pucch_f2_encode
from .pusch import PuschConfig, pusch_encode
from .refsignal_ul import srs_put
from .sch import DlschPlan


def ue_ul_generate(cell: Cell, *, pusch: tuple | None = None,
                   pucch: tuple | None = None, srs: dict | None = None,
                   cfo: float = 0.0, timing_advance: int = 0):
    """Build one UL subframe.

    pusch: (tb_bits[..., tbs], PuschConfig, DlschPlan | UciPlan) or None
           — with a UciPlan the subframe carries multiplexed CQI/RI/ACK
           (srslte_ue_ul_pusch_encode_rnti_softbuffer_cfg's uci_data path)
    pucch: (PucchConfig, bits tuple or payload array) or None
    srs:   dict(n_prb_srs=..., prb_start=..., comb=..., cyclic_shift=...)
    Returns time samples [..., sf_sample_len].
    """
    from .pusch import UciPlan, pusch_encode_uci

    grid = None
    if pusch is not None:
        tb, cfg, plan = pusch
        if isinstance(plan, UciPlan):
            grid = pusch_encode_uci(tb, cfg, plan)
        else:
            grid = pusch_encode(tb, cfg, plan)
    if grid is None:
        grid = jnp.zeros((cell.nsymb_sf, cell.nof_re), jnp.complex64)
    if pucch is not None:
        pcfg, payload, *rest = pucch
        if pcfg.format in ("2", "2a", "2b"):
            ack = tuple(rest[0]) if rest else ()
            grid = grid + pucch_f2_encode(pcfg, np.asarray(payload, np.int8),
                                          ack)
        else:
            grid = grid + pucch_f1_encode(pcfg, tuple(payload))
    if srs is not None:
        grid = srs_put(grid, cell, **srs)

    samples = ofdm_tx_sf(grid, cell)
    samples = freq_shift_half_subcarrier(samples, cell, direction=1)
    if cfo:
        samples = cfo_correct(samples, -cfo, cell.fft_size)
    if timing_advance:
        samples = jnp.roll(samples, -timing_advance, axis=-1)
    return samples


@functools.lru_cache(maxsize=None)
def ue_ul_pusch_jit(cell: Cell, cfg, plan, timing_advance: int = 0):
    """Cached jitted PUSCH-subframe generator for one (config, plan).

    The UE stack transmits a granted PUSCH most TTIs; the eager chain
    (turbo encode scans + DFT precoding + iFFT) re-traces per call
    otherwise. Call as ``fn(tb_bits)`` -> time samples."""
    import jax

    return jax.jit(lambda tb: ue_ul_generate(
        cell, pusch=(tb, cfg, plan), timing_advance=timing_advance))


def enb_ul_receive_grid(samples, cell: Cell):
    """eNB side: undo the half-subcarrier shift and FFT to the UL grid
    (srslte_enb_ul_fft analog)."""
    from ..ops.ofdm import ofdm_rx_sf

    shifted = freq_shift_half_subcarrier(samples, cell, direction=-1)
    return ofdm_rx_sf(shifted, cell)
