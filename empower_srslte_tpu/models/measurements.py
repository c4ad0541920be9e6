"""UE measurement reporting: CQI / PMI / RI from channel estimates.

Capability parity with the reference's reporting path (srslte_ue_dl RI/PMI
selection, ue_dl.c:684-763, and srslte_cqi_from_snr in cqi.c): maps the
post-equalization SINR to the CQI index whose spectral efficiency fits,
selects rank and precoder from the estimated channel, and packs the
report for PUCCH format 2 / PUSCH UCI transport (models/uci.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.equalizer import (
    condition_number_db,
    pmi_select_1layer,
    pmi_select_2layer,
)

#: SNR (dB) thresholds for CQI 1..15 (the 36.213 Table 7.2.3-1 spectral
#: efficiencies mapped through the AWGN capacity gap, matching the
#: reference's srslte_cqi_from_snr staircase).
CQI_SNR_DB = (-6.7, -4.7, -2.3, 0.2, 2.4, 4.3, 5.9, 8.1, 10.3, 11.7,
              14.1, 16.3, 18.7, 21.0, 22.7)


def cqi_from_snr(snr_db):
    """SNR (dB) -> CQI index [...] (0 = out of range)."""
    snr_db = jnp.asarray(snr_db)
    th = jnp.asarray(np.asarray(CQI_SNR_DB, np.float32))
    return jnp.sum(snr_db[..., None] >= th, axis=-1).astype(jnp.int32)


def snr_from_chest(h, noise_est):
    """Average post-MRC SNR (dB) from a channel estimate [..., nsymb, nre]."""
    p = jnp.mean(jnp.abs(h) ** 2, axis=(-1, -2))
    return 10.0 * jnp.log10(jnp.maximum(p / noise_est, 1e-10))


def select_rank_2x2(h, noise_est=1e-3, cn_threshold_db: float = 17.0):
    """RI selection for a 2x2 channel (ue_dl.c select_ri analog): rank 2
    when the channel is well-conditioned, else rank 1.

    h [..., rx, port, n] -> ri [...] in {1, 2}.
    """
    cn = condition_number_db(h)
    return jnp.where(cn < cn_threshold_db, 2, 1).astype(jnp.int32)


def ue_measurement_report(h, noise_est=1e-3):
    """Full (RI, PMI, CQI) report from a 2-port channel estimate
    h [..., rx, port, n]."""
    ri = select_rank_2x2(h, noise_est)
    pmi2, sinr2 = pmi_select_2layer(h, noise_est)
    pmi1, sinr1 = pmi_select_1layer(h, noise_est)
    # wideband SNR proxy: best single-layer beamforming gain
    snr_db = 10.0 * jnp.log10(jnp.maximum(
        jnp.max(sinr1, axis=-1), 1e-10))
    cqi = cqi_from_snr(snr_db)
    pmi = jnp.where(ri == 2, pmi2, pmi1)
    return dict(ri=ri, pmi=pmi, cqi=cqi, snr_db=snr_db)


_sb_cache: dict = {}


def subband_snrs(samples, cell, sf_idx: int, noise_floor: float = 1e-3):
    """Per-subband post-chest SNR (dB) from one subframe of IQ.

    The frequency-selective analog of snr_from_chest: LS CRS estimate ->
    per-RE |h|^2 grouped into 36.213 Table 7.2.1-3 subbands of k PRBs
    (12k subcarriers). Feeds the hl-subband CQI report the reference
    packs in cqi.c:45 and the eNB's per-RBG link adaptation.

    Returns np.float32 [N] with N = cqi_nof_subbands(cell.nof_prb).
    """
    import jax

    from .uci import cqi_hl_subband_size, cqi_nof_subbands
    from ..ops.chest import chest_dl, noise_est_pilots
    from ..ops.ofdm import ofdm_rx_sf
    from ..utils import device_complex

    n_sub = cqi_nof_subbands(cell.nof_prb)
    k_sc = 12 * cqi_hl_subband_size(cell.nof_prb)
    key = ("sb", repr(cell), sf_idx)
    if key not in _sb_cache:
        def f(x):
            grid = ofdm_rx_sf(x[None], cell)[0]
            h = chest_dl(grid[None], cell, sf_idx, port=0)[0]
            noise = jnp.maximum(
                noise_est_pilots(grid[None], cell, sf_idx)[0],
                noise_floor)
            p = jnp.abs(h) ** 2                       # [nsymb, nre]
            pad = (-p.shape[-1]) % k_sc
            p = jnp.pad(p, ((0, 0), (0, pad)))
            sb = jnp.mean(
                p.reshape(p.shape[0], -1, k_sc), axis=(0, 2))
            # the tail subband may be partial: rescale its zero padding
            scale = jnp.asarray(
                [k_sc / min(k_sc, cell.nof_re - i * k_sc)
                 for i in range(sb.shape[0])], jnp.float32)
            return 10.0 * jnp.log10(
                jnp.maximum(sb * scale / noise, 1e-10))

        _sb_cache[key] = jax.jit(f)
    out = np.asarray(_sb_cache[key](device_complex(samples)),
                     np.float32)
    return out[:n_sub]


_rsrp_cache: dict = {}


def cell_rsrp(samples, cell, sf_idx: int) -> float:
    """RSRP of a (serving or neighbour) cell from one subframe: LS
    channel estimate at that cell's CRS positions, mean |h|^2 in dB
    (chest_dl.c get_rsrp; srsue intra-frequency neighbour measurement).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.chest import chest_dl
    from ..ops.ofdm import ofdm_rx_sf
    from ..utils import device_complex

    key = (repr(cell), sf_idx)
    if key not in _rsrp_cache:
        def f(x):
            grid = ofdm_rx_sf(x[None], cell)[0]
            h = chest_dl(grid[None], cell, sf_idx, port=0)
            return jnp.mean(jnp.abs(h) ** 2)

        _rsrp_cache[key] = jax.jit(f)
    p = float(np.asarray(_rsrp_cache[key](device_complex(samples))))
    return 10.0 * np.log10(max(p, 1e-12))
