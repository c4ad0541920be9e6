"""Sequence-parallel turbo decoding: the trellis sharded across chips.

The TPU-native scale-out of the reference's windowed turbo decoder
(lib/src/phy/fec/turbodecoder_win.h): on one chip, windows ride SIMD
lanes with 40-step overlap training; across chips, the trellis is cut
into per-device chunks and the SAME overlap semantics are carried by
ICI collectives —

* the (static) parity LLR halos move once via ``lax.ppermute`` between
  ring neighbors,
* each half-iteration's extrinsic/systematic chunk is shared via
  ``all_gather`` so the QPP interleaver (a global permutation) and the
  neighbor overlap rows can be gathered locally.

This is the "turbo-decoder extrinsic LLR halos via ICI collectives"
design from BASELINE.json, implemented with shard_map over a mesh axis.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.fec.tables import qpp_deinterleaver, qpp_interleaver
from ..ops.fec.turbo_decoder import (
    NEG_INF,
    PAD_LLR,
    TurboDecoder,
    _windowed_map_decode,
)


def _pick_window(chunk: int, overlap: int) -> int:
    for w in (128, 96, 64, 160, 192, 256, 48, 320):
        if chunk % w == 0 and w >= overlap:
            return w
    raise ValueError(f"no window divides chunk={chunk}")


def sp_turbo_decode(d_llr, k: int, mesh, axis: str = "sf",
                    iterations: int = 5, overlap: int = 40):
    """Decode d_llr[B, 3, K+4] with the trellis sharded over ``axis``.

    Returns (bits[B, K], llr[B, K]), replicated. The batch may be sharded
    over other mesh axes independently.
    """
    n = mesh.shape[axis]
    assert k % n == 0, (k, n)
    chunk = k // n
    o = overlap
    window = _pick_window(chunk, o)

    dec = TurboDecoder(k=k)
    sys1, par1, sys2t, par2 = dec._split_streams(d_llr)
    b = int(np.prod(sys1.shape[:-1]))
    tm = lambda x: jnp.moveaxis(x.reshape(b, x.shape[-1]), -1, 0)
    sys1_tm = tm(sys1)        # [K+3, B]
    par1_tm = tm(par1)
    par2_tm = tm(par2)
    sys2t_tm = tm(sys2t)      # [3, B]

    pi = jnp.asarray(qpp_interleaver(k))
    pinv = jnp.asarray(qpp_deinterleaver(k))

    exact = np.full(8, NEG_INF, np.float32)
    exact[0] = 0.0
    exact = jnp.asarray(exact)
    uniform = jnp.zeros(8, jnp.float32)

    def ring(x, fwd: bool):
        perm = [(i, (i + (1 if fwd else -1)) % n) for i in range(n)]
        return jax.lax.ppermute(x, axis, perm)

    def shard_fn(sys1_full, par1_pay, par2_pay, par1_tail, par2_tail,
                 sys2t_full):
        idx = jax.lax.axis_index(axis)
        start = idx * chunk
        zeros_h = jnp.zeros((o + 3, b), jnp.float32)

        # --- static parity halos: one ppermute each way per decoder ------
        def par_halos(par_loc, tail):
            lead = ring(par_loc[-(o + 3):], fwd=True)      # from left nbr
            lead = jnp.where(idx == 0, zeros_h, lead)
            trail = ring(par_loc[: o + 3], fwd=False)      # from right nbr
            trail_last = jnp.concatenate(
                [tail, jnp.zeros((o, b), jnp.float32)], axis=0)
            trail = jnp.where(idx == n - 1, trail_last, trail)
            return lead, trail

        p1_lead, p1_trail = par_halos(par1_pay, par1_tail)
        p2_lead, p2_trail = par_halos(par2_pay, par2_tail)

        a_init = jnp.where(idx == 0, exact, uniform)
        b_init = jnp.where(idx == n - 1, exact, uniform)

        def local_map(lsa_full_t, par_loc, p_lead, p_trail):
            """One constituent decode of this shard's rows.

            lsa_full_t: [K+3, B] systematic+a-priori incl. tail (full);
            halo rows for lsa slice locally from the padded full array.
            """
            pad = jnp.full((o + 3, b), PAD_LLR, jnp.float32)
            full_pd = jnp.concatenate([pad, lsa_full_t, pad], axis=0)
            lsa_loc = jax.lax.dynamic_slice_in_dim(
                full_pd, start + (o + 3), chunk, axis=0)
            s_lead = jax.lax.dynamic_slice_in_dim(full_pd, start, o + 3, axis=0)
            s_trail = jax.lax.dynamic_slice_in_dim(
                full_pd, start + (o + 3) + chunk, o + 3, axis=0)
            halo = (s_lead, p_lead, s_trail, p_trail)
            return _windowed_map_decode(
                lsa_loc, par_loc, chunk, o, window, a_init, b_init,
                halo=halo, boundary=(True, True))

        sys_pay = sys1_full[:k]

        # iterations ride a lax.scan (one compiled body, not `iterations`
        # unrolled copies); the deinterleaved a-posteriori llr is a cheap
        # byproduct, carried so the last iteration's value falls out
        def body(carry, _):
            ext2, _ = carry
            lsa1_full = jnp.concatenate([sys_pay + ext2, sys1_full[k:]], axis=0)
            llr1_loc = local_map(lsa1_full, par1_pay, p1_lead, p1_trail)
            llr1 = jax.lax.all_gather(llr1_loc, axis, axis=0, tiled=True)
            ext1 = llr1 - lsa1_full[:k]

            lsa2_pay = (sys_pay + ext1)[pi, :]
            lsa2_full = jnp.concatenate([lsa2_pay, sys2t_full], axis=0)
            llr2_loc = local_map(lsa2_full, par2_pay, p2_lead, p2_trail)
            llr2 = jax.lax.all_gather(llr2_loc, axis, axis=0, tiled=True)
            ext2 = (llr2 - lsa2_pay)[pinv, :]
            return (ext2, llr2[pinv, :]), None

        zero = jnp.zeros((k, b), jnp.float32)
        (_, llr2_deint), _ = jax.lax.scan(
            body, (zero, zero), None, length=iterations)
        return llr2_deint

    spec_shard = P(axis, None)
    spec_rep = P(None, None)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec_rep, spec_shard, spec_shard, spec_rep, spec_rep,
                  spec_rep),
        out_specs=spec_rep,
        check_vma=False,
    )
    llr = fn(sys1_tm, par1_tm[:k], par2_tm[:k], par1_tm[k:], par2_tm[k:],
             sys2t_tm)
    llr_out = jnp.moveaxis(llr, 0, -1).reshape(*sys1.shape[:-1], k)
    bits = (llr_out < 0).astype(jnp.int8)
    return bits, llr_out
