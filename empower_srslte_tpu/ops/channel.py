"""Channel models for tests and BLER evaluation.

Capability parity with lib/src/phy/channel/ (ch_awgn.c AWGN via Box-Muller
gauss.c) plus a simple tapped-delay fading model for frequency-selective
tests. Device-side via jax.random for batched BLER sweeps.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def awgn(key, x, n0: float):
    """Add complex AWGN of total power n0 (per complex sample)."""
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(n0 / 2)
    n = (jax.random.normal(kr, x.shape) + 1j * jax.random.normal(ki, x.shape))
    return x + (std * n).astype(x.dtype)


def awgn_np(rng: np.random.Generator, x: np.ndarray, n0: float) -> np.ndarray:
    n = rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
    return (x + np.sqrt(n0 / 2) * n).astype(np.complex64)


def snr_to_n0(x, snr_db: float) -> float:
    p = float(np.mean(np.abs(np.asarray(x)) ** 2))
    return p / 10 ** (snr_db / 10)


def rayleigh_taps(rng: np.random.Generator, delays: list[int],
                  powers_db: list[float]) -> np.ndarray:
    """Random static tapped-delay-line impulse response (EPA/EVA style)."""
    h = np.zeros(max(delays) + 1, np.complex64)
    for d, p in zip(delays, powers_db):
        amp = 10 ** (p / 20) / np.sqrt(2)
        h[d] += amp * (rng.normal() + 1j * rng.normal())
    return h


def apply_multipath(x, h_taps):
    """Convolve samples [..., N] with taps [L] (same-length output)."""
    l = len(h_taps)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(l - 1, 0)])
    kern = jnp.asarray(np.asarray(h_taps))
    out = 0
    for i in range(l):
        out = out + kern[i] * xp[..., l - 1 - i : xp.shape[-1] - i]
    return out
