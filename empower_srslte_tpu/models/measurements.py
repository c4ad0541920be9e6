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
