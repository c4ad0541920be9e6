"""PRACH: random access preambles (36.211 5.7), format 0.

Capability parity with lib/src/phy/phch/prach.c: Zadoff-Chu root sequence
tables (logical->physical mapping, binary spec data), preamble generation
(prach.c:519), and frequency-domain detection — 839-point correlation
against candidate roots, IDFT, peak search over zero-correlation zones
returning preamble index and timing offset (prach_detect_offset,
prach.c:575-677).
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np

import jax.numpy as jnp

from ..utils.cell import Cell

_DATA = pathlib.Path(__file__).resolve().parent.parent / "data"

#: ZC sequence length, preamble formats 0-3.
NZC = 839
#: Sequence duration for format 0 (0.8 ms) as a fraction of a subframe.
SEQ_DURATION = 0.0008
#: N_cs table for format 0, unrestricted set (36.211 Table 5.7.2-2).
NCS_UNRESTRICTED = (0, 13, 15, 18, 22, 26, 32, 38, 46, 59, 76, 93, 119,
                    167, 279, 419)


@functools.lru_cache(maxsize=1)
def root_table() -> np.ndarray:
    """Logical -> physical root sequence index (36.211 Table 5.7.2-4)."""
    return np.load(_DATA / "prach_root_seq.npy")


@functools.lru_cache(maxsize=1024)
def zc_root(u: int) -> np.ndarray:
    """x_u(n) = exp(-j pi u n (n+1) / NZC)."""
    n = np.arange(NZC)
    return np.exp(-1j * np.pi * u * n * (n + 1) / NZC).astype(np.complex64)


def preamble_freq(rsi: int, preamble_idx: int, zcz: int = 1) -> np.ndarray:
    """Frequency-domain preamble (839 bins) for (root-seq index, index).

    ``rsi``: logical root sequence index (cell config); ``zcz``:
    zero-correlation-zone config -> N_cs. Preambles first sweep cyclic
    shifts of a root, then consecutive roots (36.211 5.7.2).
    """
    ncs = NCS_UNRESTRICTED[zcz]
    shifts_per_root = NZC // ncs if ncs > 0 else 1
    root_off, v = divmod(preamble_idx, shifts_per_root) if ncs else (preamble_idx, 0)
    u = int(root_table()[(rsi + root_off) % 838])
    x = zc_root(u)
    cv = v * ncs
    xv = np.roll(x, -cv)
    return np.fft.fft(xv).astype(np.complex64) / np.sqrt(NZC)


def prach_seq_len(cell: Cell) -> int:
    """Samples in the 0.8 ms sequence window at the cell rate."""
    return int(cell.srate * SEQ_DURATION)


def prach_freq_bins(cell: Cell, freq_offset_prb: int = 0) -> np.ndarray:
    """Bins of the length-(seq_len) DFT carrying the 839 ZC subcarriers.

    The DFT of the 0.8 ms window has exactly 1.25 kHz spacing; the
    preamble occupies 839 bins starting at the configured PRB offset from
    the band edge (+7 guard bins, 36.211 5.7.3 K=12 ratio).
    """
    seq_len = prach_seq_len(cell)
    # PRB offset from the band edge -> 15 kHz subcarriers from DC -> x12
    # 1.25 kHz PRACH bins, +7 guard bins (K=12, 36.211 5.7.3)
    sc_from_dc = 12 * freq_offset_prb - cell.nof_re // 2
    first = 12 * sc_from_dc + 7
    return (np.arange(NZC) + first) % seq_len


def prach_gen(cell: Cell, rsi: int, preamble_idx: int, zcz: int = 1,
              freq_offset_prb: int = 0, cp_len: int | None = None) -> np.ndarray:
    """Time-domain preamble at the cell sampling rate (CP + sequence)."""
    seq_len = prach_seq_len(cell)
    spec = np.zeros(seq_len, np.complex64)
    spec[prach_freq_bins(cell, freq_offset_prb)] = preamble_freq(
        rsi, preamble_idx, zcz)
    t = np.fft.ifft(spec).astype(np.complex64) * np.sqrt(seq_len)
    if cp_len is None:
        cp_len = int(0.0001 * cell.srate)  # format 0 CP ~ 0.1 ms
    return np.concatenate([t[-cp_len:], t])


def prach_detect(samples, cell: Cell, rsi: int, zcz: int = 1,
                 freq_offset_prb: int = 0, nof_roots: int | None = None,
                 threshold: float = 13.0):
    """Detect preambles in a window starting at the sequence position.

    samples [..., >= seq_len] -> (detected [..., 64] bool,
    offsets [..., 64] samples, metric [..., 64]). Correlates against
    ``nof_roots`` consecutive roots, IFFTs to the delay domain, and takes
    peaks per zero-correlation zone (prach_detect_offset analog).

    ``threshold`` is peak-to-profile-mean: noise-only bins are ~Exp(mean),
    so over 839 delay bins the false-alarm rate is ~839*exp(-t); t=13
    keeps it < 0.2% per root while a real preamble's coherent gain
    (~NZC) clears it by an order of magnitude.
    """
    seq_len = prach_seq_len(cell)
    win = samples[..., :seq_len]
    spec = jnp.fft.fft(win, axis=-1)
    bins = jnp.asarray(prach_freq_bins(cell, freq_offset_prb))
    x = spec[..., bins] / np.sqrt(seq_len)

    ncs = NCS_UNRESTRICTED[zcz]
    shifts_per_root = NZC // ncs if ncs else 1
    if nof_roots is None:
        nof_roots = -(-64 // shifts_per_root)  # cover all 64 preambles
    det, offs, mets = [], [], []
    for r in range(nof_roots):
        u = int(root_table()[(rsi + r) % 838])
        zf = jnp.asarray(np.conj(np.fft.fft(zc_root(u)) / np.sqrt(NZC)))
        corr = jnp.fft.ifft(x * zf, axis=-1)             # delay domain, 839
        p = jnp.abs(corr) ** 2
        mean = jnp.mean(p, axis=-1, keepdims=True)
        for v in range(shifts_per_root):
            if len(det) >= 64:
                break
            # preamble with shift C_v = v*Ncs peaks at lag (NZC - C_v);
            # a timing delay of d ZC samples moves the peak to +d inside
            # the zone
            zone_len = ncs if ncs else NZC
            start = (NZC - v * ncs) % NZC
            zidx = jnp.asarray((start + np.arange(zone_len)) % NZC)
            zone = p[..., zidx]
            pk = jnp.max(zone, axis=-1)
            delay = jnp.argmax(zone, axis=-1)
            m = pk / jnp.maximum(mean[..., 0], 1e-20)
            det.append(m > threshold)
            offs.append(delay * seq_len // NZC)
            mets.append(m)
    pad = 64 - len(det)
    if pad > 0:
        z = jnp.zeros_like(mets[0])
        det += [z > 1] * pad
        offs += [jnp.zeros_like(offs[0])] * pad
        mets += [z] * pad
    return (jnp.stack(det, axis=-1), jnp.stack(offs, axis=-1),
            jnp.stack(mets, axis=-1))
