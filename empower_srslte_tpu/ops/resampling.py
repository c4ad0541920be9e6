"""Resampling and interpolation (lib/src/phy/resampling/ parity).

interp.c's linear vector interpolation (used by chest), integer
decimation with anti-alias FIR, and a polyphase arbitrary-ratio resampler
— batched jnp throughout.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp


def interp_linear(x, factor: int):
    """Linear interpolation by an integer factor: [..., N] -> [..., N*f]
    (srslte_interp_linear_* analog, extrapolating the tail)."""
    n = x.shape[-1]
    right = jnp.concatenate([x[..., 1:], 2 * x[..., -1:] - x[..., -2:-1]],
                            axis=-1)
    t = jnp.asarray(np.arange(factor, dtype=np.float32) / factor)
    out = x[..., :, None] * (1 - t) + right[..., :, None] * t
    return out.reshape(*x.shape[:-1], n * factor)


@functools.lru_cache(maxsize=64)
def _lowpass_fir(ntaps: int, cutoff: float) -> np.ndarray:
    n = np.arange(ntaps) - (ntaps - 1) / 2
    h = np.sinc(2 * cutoff * n) * np.hamming(ntaps)
    return (h / h.sum()).astype(np.float32)


def _fir(x, taps: np.ndarray):
    l = len(taps)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(l // 2, l - 1 - l // 2)])
    out = 0
    t = jnp.asarray(taps)
    for i in range(l):
        out = out + t[i] * xp[..., i : i + x.shape[-1]]
    return out


def decimate(x, factor: int, ntaps: int = 33):
    """Anti-aliased decimation: [..., N] -> [..., N//f]."""
    if factor == 1:
        return x
    y = _fir(x, _lowpass_fir(ntaps, 0.5 / factor))
    return y[..., ::factor]


def upsample(x, factor: int, ntaps: int = 33):
    """Zero-stuffing + lowpass interpolation: [..., N] -> [..., N*f]."""
    if factor == 1:
        return x
    n = x.shape[-1]
    up = jnp.zeros((*x.shape[:-1], n * factor), x.dtype)
    up = up.at[..., ::factor].set(x * factor)
    return _fir(up, _lowpass_fir(ntaps, 0.5 / factor))


def resample_ratio(x, p: int, q: int):
    """Rational-ratio resampling by p/q (srslte_resample_arb analog)."""
    from math import gcd

    g = gcd(p, q)
    p, q = p // g, q // g
    return decimate(upsample(x, p), q)
