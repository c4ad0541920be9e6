"""K=7 tail-biting convolutional code, rate 1/3 (36.212 5.1.3.1).

Capability parity with lib/src/phy/fec/convcoder.c and viterbi.c (the
port/SSE/AVX2/NEON soft Viterbi decoders behind PBCH and PDCCH,
pbch.c:156,425 / pdcch.c:79,341).

TPU-native design: the decoder is a batched max-log Viterbi — a 64-state
add-compare-select lax.scan with survivor decisions stored per step and a
reverse traceback scan; tail-biting is handled with the standard
wrap-around trick (decode the circularly-extended sequence, keep the
middle copy), all fully batched over codewords (e.g. every PDCCH blind
decoding candidate at once).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

#: Generator polynomials G0=133, G1=171, G2=165 (octal), MSB = newest bit.
POLYS = (0o133, 0o171, 0o165)
NOF_STATES = 64
RATE = 3


@functools.lru_cache(maxsize=1)
def _tables():
    """Transition tables over state s = (u_{k-1}..u_{k-6}).

    next_state[s, u], out_bits[s, u, 3]; and the reverse view
    prev_state[s', b] (b = the shifted-out oldest bit hypothesis) with
    prev_u[s'] = newest input bit implied by s'.
    """
    ns = np.zeros((NOF_STATES, 2), np.int32)
    out = np.zeros((NOF_STATES, 2, RATE), np.int8)
    for s in range(NOF_STATES):
        for u in (0, 1):
            reg = (u << 6) | s
            ns[s, u] = (u << 5) | (s >> 1)
            for j, g in enumerate(POLYS):
                out[s, u, j] = bin(reg & g).count("1") % 2
    ps = np.zeros((NOF_STATES, 2), np.int32)
    pu = np.zeros(NOF_STATES, np.int32)
    pout = np.zeros((NOF_STATES, 2, RATE), np.int8)
    for sp in range(NOF_STATES):
        u = sp >> 5
        pu[sp] = u
        for b in (0, 1):
            s = ((sp & 31) << 1) | b
            ps[sp, b] = s
            pout[sp, b] = out[s, u]
    return ns, out, ps, pu, pout


def conv_encode_np(u: np.ndarray) -> np.ndarray:
    """Tail-biting encode u[..., K] 0/1 -> d[..., 3, K] (initial state =
    last 6 input bits, 36.212 5.1.3.1)."""
    u = np.atleast_2d(np.asarray(u, np.int8))
    ns, out, *_ = _tables()
    b, k = u.shape
    state = np.zeros(b, np.int32)
    for j in range(6):
        state |= u[:, k - 1 - j].astype(np.int32) << (5 - j)
    d = np.empty((b, RATE, k), np.int8)
    for i in range(k):
        ui = u[:, i].astype(np.int32)
        d[:, :, i] = out[state, ui]
        state = ns[state, ui]
    return d


def conv_encode(u):
    """jnp tail-biting encode u[..., K] -> d[..., 3, K]."""
    ns, out, *_ = _tables()
    ns_j, out_j = jnp.asarray(ns), jnp.asarray(out)
    k = u.shape[-1]
    u = u.astype(jnp.int32)
    state = jnp.zeros(u.shape[:-1], jnp.int32)
    for j in range(6):
        state = state | (u[..., k - 1 - j] << (5 - j))

    def step(state, ui):
        o = out_j[state, ui]
        return ns_j[state, ui], o

    _, outs = jax.lax.scan(step, state, jnp.moveaxis(u, -1, 0))
    return jnp.moveaxis(outs, 0, -1)  # [..., 3, K]


def viterbi_decode(llr, wrap: int = 1):
    """Batched tail-biting max-log Viterbi.

    llr [..., 3, K] soft values (positive <=> bit 0) -> bits [..., K].
    ``wrap``: number of extra circular passes prepended AND appended for
    tail-biting convergence (decisions taken from the middle copy).
    """
    ns, out, ps, pu, pout = _tables()
    ps_j = jnp.asarray(ps)                       # [64, 2]
    sign = jnp.asarray(1.0 - 2.0 * pout.astype(np.float32))  # [64, 2, 3]

    *lead, three, k = llr.shape
    b = int(np.prod(lead)) if lead else 1
    x = jnp.moveaxis(llr.reshape(b, 3, k), -1, 0)          # [K, B, 3]
    if wrap:
        x = jnp.concatenate([x] * (1 + 2 * wrap), axis=0)

    def acs(metric, llr_k):
        # metric [B, 64]; llr_k [B, 3]
        # branch metric for (s', b): sum_j sign[s',b,j] * llr[j] / 2
        bm = 0.5 * jnp.einsum("sbj,nj->nsb", sign, llr_k)   # [B, 64, 2]
        cand = metric[:, ps_j] + bm                          # [B, 64, 2]
        best = jnp.argmax(cand, axis=-1)                     # [B, 64]
        new = jnp.take_along_axis(cand, best[..., None], axis=-1)[..., 0]
        new = new - jnp.max(new, axis=-1, keepdims=True)
        return new, best.astype(jnp.int8)

    metric0 = jnp.zeros((b, NOF_STATES), llr.dtype)
    metric, decisions = jax.lax.scan(acs, metric0, x)        # [T, B, 64]
    start_state = jnp.argmax(metric, axis=-1)                # [B]

    pu_j = jnp.asarray(pu)

    def tb(state, dec_k):
        # dec_k [B, 64]: winning predecessor bit for each state
        u = pu_j[state]
        b_sel = jnp.take_along_axis(dec_k, state[:, None], axis=-1)[:, 0]
        prev = ps_j[state, b_sel.astype(jnp.int32)]
        return prev, u.astype(jnp.int8)

    _, bits_rev = jax.lax.scan(tb, start_state, decisions, reverse=True)
    bits_all = bits_rev                                       # [T, B]
    # take the middle copy for tail-biting
    mid = wrap * k if wrap else 0
    bits = bits_all[mid : mid + k]
    return jnp.moveaxis(bits, 0, -1).reshape(*lead, k)
