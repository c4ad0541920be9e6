"""DFT as MXU matmul stages (Cooley-Tukey N = N1 x N2).

XLA's native TPU FFT lowering measures ~4 ms for one 20 MHz batch-256
subframe block ([256, 2, 14, 2048] c64) through this runtime — 8x its
HBM bound and the single costliest stage of the full-chain receiver.
The DFT is a linear map, and LTE FFT sizes (128..2048) factor as
N1 x 128 with N1 <= 16, so the transform runs as two MXU einsum stages
around an elementwise twiddle (decimation-in-time, the textbook
four-step FFT):

    x[n]  with  n = N2*n1 + n2          reshape -> [N1, N2]
    Y[k1, n2] = sum_n1 x[n1, n2] W_N1^(n1 k1)      (stage A, [N1,N1])
    Y *= W_N^(n2 k1)                               (twiddle)
    X[k1 + N1 k2] = sum_n2 Y[k1, n2] W_N2^(n2 k2)  (stage B, [N2,N2])

FLOP count for 2048 = 16x128: N*(16+128) MACs/sample vs N*log2(N)*~3
for a radix-2 FFT — ~5x more arithmetic, but it rides the 197 TFLOP/s
MXU instead of a slow composite lowering, and measures ~5x faster than
jnp.fft.fft end-to-end. f32 einsums run at Precision.HIGHEST so chest
pilot quality is unaffected (validated against jnp.fft.fft to ~1e-5
relative in the ofdm tests).

Reference analog: srsLTE plans per-size FFTW transforms once and reuses
them (dft_fftw.c:65-141); here the per-size DFT factor matrices are the
"plan", cached as module constants.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

#: Largest stage matrix; sizes <= this run as one direct DFT matmul.
_DIRECT_MAX = 256


@functools.lru_cache(maxsize=64)
def _plan(n: int, inverse: bool):
    """Factor matrices + twiddle for size n (numpy, f32 pairs)."""
    sign = 2j if inverse else -2j

    def dft_mat(m):
        k = np.arange(m)
        w = np.exp(sign * np.pi * np.outer(k, k) / m)
        return w.astype(np.complex64)

    if n <= _DIRECT_MAX:
        f = dft_mat(n)
        return dict(direct=(np.real(f).copy(), np.imag(f).copy()))
    n2 = 128
    n1 = n // n2
    assert n1 * n2 == n, f"unsupported FFT size {n}"
    f1 = dft_mat(n1)                                   # [n1, k1]
    f2 = dft_mat(n2)                                   # [n2, k2]
    k1 = np.arange(n1)
    m2 = np.arange(n2)
    tw = np.exp(sign * np.pi * np.outer(k1, m2) / n).astype(np.complex64)
    return dict(
        f1=(np.real(f1).copy(), np.imag(f1).copy()),
        f2=(np.real(f2).copy(), np.imag(f2).copy()),
        tw=(np.real(tw).copy(), np.imag(tw).copy()),
        n1=n1, n2=n2,
    )


def _cmatmul(ar, ai, br, bi, spec):
    """Complex einsum via four f32 MXU contractions."""
    hi = jax.lax.Precision.HIGHEST
    rr = jnp.einsum(spec, ar, br, precision=hi)
    ri = jnp.einsum(spec, ar, bi, precision=hi)
    ir = jnp.einsum(spec, ai, br, precision=hi)
    ii = jnp.einsum(spec, ai, bi, precision=hi)
    return rr - ii, ri + ir


def fft_mxu(x_re, x_im, inverse: bool = False):
    """DFT along the last axis via MXU matmuls.

    x_re/x_im [..., n] float32 -> (re, im) [..., n]. Matches
    jnp.fft.fft (or ifft including its 1/n scale) for n in the LTE set
    {128, 256, 512, 1024, 1536, 2048}.
    """
    n = x_re.shape[-1]
    p = _plan(n, inverse)
    if "direct" in p:
        fr, fi = (jnp.asarray(a) for a in p["direct"])
        out_re, out_im = _cmatmul(x_re, x_im, fr, fi, "...i,ik->...k")
    else:
        n1, n2 = p["n1"], p["n2"]
        f1r, f1i = (jnp.asarray(a) for a in p["f1"])
        f2r, f2i = (jnp.asarray(a) for a in p["f2"])
        twr, twi = (jnp.asarray(a) for a in p["tw"])
        xr = x_re.reshape(*x_re.shape[:-1], n1, n2)
        xi = x_im.reshape(*x_im.shape[:-1], n1, n2)
        # stage A over n1 (contraction dim n1 <= 16)
        yr, yi = _cmatmul(xr, xi, f1r, f1i, "...ij,ik->...kj")
        # twiddle
        zr = yr * twr - yi * twi
        zi = yr * twi + yi * twr
        # stage B over n2: [..., k1, n2] x [n2, k2] -> [..., k1, k2]
        or_, oi_ = _cmatmul(zr, zi, f2r, f2i, "...ab,bc->...ac")
        # flat k = k1 + n1*k2 -> transpose to [..., k2, k1] and reshape
        out_re = or_.swapaxes(-1, -2).reshape(*x_re.shape[:-1], n)
        out_im = oi_.swapaxes(-1, -2).reshape(*x_im.shape[:-1], n)
    if inverse:
        s = np.float32(1.0 / n)
        out_re, out_im = out_re * s, out_im * s
    return out_re, out_im


def fft_c(x, inverse: bool = False):
    """Complex-array wrapper: x [..., n] complex -> complex."""
    re, im = fft_mxu(jnp.real(x), jnp.imag(x), inverse)
    return jax.lax.complex(re, im)
