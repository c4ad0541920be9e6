"""Sequence-parallel turbo decoding: the trellis sharded across chips.

The TPU-native scale-out of the reference's windowed turbo decoder
(lib/src/phy/fec/turbodecoder_win.h): on one chip, windows ride SIMD
lanes; across chips, the trellis is cut into per-device window chunks.

Two implementations:

* ``sp_turbo_decode_nii`` — the DEPLOYED decoder, trellis-sharded: the
  flagship NII Pallas kernel (ops/fec/turbo_decoder_pallas2.py) runs
  per shard on its windows, and the next-iteration-initialization
  boundary metrics the kernel already materializes per window edge
  ([T, 1, 8, sub, lanes] slices) are exchanged between ring neighbors
  via ``lax.ppermute`` each half-iteration — exactly the metrics a
  single chip passes between adjacent windows, so the sharded decode is
  BIT-IDENTICAL to the single-chip kernel. The QPP interleaver is a
  global permutation, so each half-iteration's extrinsics are shared
  via ``all_gather`` (rate 1/1 of the extrinsic volume — the ICI-bound
  collective of this design).
* ``sp_turbo_decode`` — the original scan-decoder formulation with
  40-step overlap retraining halos, kept as a cross-check (it shares no
  kernel code with the NII path and validates the same sharding
  topology with reference overlap-training semantics).

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


def sp_turbo_decode_nii(d_llr, k: int, mesh, axis: str = "sf",
                        iterations: int = 5, sub: int = 8,
                        lanes: int | None = None,
                        interpret: bool | None = None):
    """Trellis-sharded decode with the deployed NII Pallas kernel.

    d_llr [..., 3, K+4] -> (bits [..., K], llr [..., K]), replicated.
    The window axis (K) is sharded over mesh axis ``axis``; each
    half-iteration ships one boundary-metric slice per shard edge via
    ``ppermute`` and the extrinsic chunk via ``all_gather``. Decisions
    are bit-identical to the single-chip ``TurboDecoder.decode_tiles``
    at equal (window, sub, lanes) geometry — asserted in
    tests/test_parallel.py and the driver dryrun.

    ``interpret`` defaults to True off-TPU (the dryrun's CPU mesh runs
    the same kernel code in interpreter mode).
    """
    from ..ops.fec.turbo_decoder_pallas2 import (from_tiles, map_decode_nii,
                                                 to_tiles)

    n = mesh.shape[axis]
    assert k % n == 0, (k, n)
    chunk = k // n
    l = _pick_window(chunk, 16)
    assert chunk % l == 0
    n_loc = chunk // l                      # windows per shard
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    dec = TurboDecoder(k=k)
    sys1, par1, sys2t, par2 = dec._split_streams(
        d_llr.astype(jnp.float32))
    lead = sys1.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    if lanes is None:
        lanes = 1
        while lanes < 256 and sub * lanes * 2 <= b:
            lanes *= 2
    tile = sub * lanes
    bp = (-b) % tile
    tm = lambda x: jnp.moveaxis(x.reshape(b, x.shape[-1]), -1, 0)
    cp = (lambda x: jnp.pad(x, ((0, 0), (0, bp)))) if bp else (lambda x: x)
    pad8 = lambda x: jnp.pad(x, ((0, 8 - x.shape[0]), (0, 0)))
    # tiles() takes a TIME-MAJOR [rows, b] array (tm applied by caller)
    tiles = lambda x2d: to_tiles(cp(x2d), lanes, sub)

    pi = jnp.asarray(qpp_interleaver(k))
    pinv = jnp.asarray(qpp_deinterleaver(k))
    sys_t = tiles(tm(sys1[..., :k]))        # [T, K, sub, lanes]
    par1_t = tiles(tm(par1[..., :k]))
    par2_t = tiles(tm(par2[..., :k]))
    ut1 = tiles(pad8(tm(sys1[..., k:])))    # [T, 8, sub, lanes]
    pt1 = tiles(pad8(tm(par1[..., k:])))
    ut2 = tiles(pad8(tm(sys2t)))
    pt2 = tiles(pad8(tm(par2[..., k:])))
    sys_int = sys_t[:, pi]
    t_tiles = sys_t.shape[0]

    def ring(x, fwd: bool):
        perm = [(i, (i + (1 if fwd else -1)) % n) for i in range(n)]
        return jax.lax.ppermute(x, axis, perm)

    def shard_fn(sys_loc, sysi_loc, p1_loc, p2_loc, ut1, pt1, ut2, pt2):
        i = jax.lax.axis_index(axis)
        start = i * chunk
        bounds1 = jnp.stack([
            jnp.where(i == 0, 0, -1),
            jnp.where(i == n - 1, n_loc - 1, -1)]).astype(jnp.int32)

        def dec_call(u, p, ut, pt, a_raw, b_raw, apr):
            # boundary-metric exchange: window w's alpha init is the
            # end-of-window alpha of window w-1 (left neighbor's last
            # window at the shard edge); its beta init is the
            # start-of-window beta of window w+1 (right neighbor's
            # first window at the edge) — the same slot convention the
            # kernel uses on one chip (map_decode_nii docstring).
            a_st = jnp.concatenate([ring(a_raw[:, -1:], True), a_raw],
                                   axis=1)
            b_st = jnp.concatenate([b_raw, ring(b_raw[:, :1], False)],
                                   axis=1)
            ext, a_next, b_next = map_decode_nii(
                u, p, ut, pt, a_st, b_st, l=l, lanes=lanes, sub=sub,
                apr=apr, bounds=bounds1, interpret=interpret)
            # carry the RAW per-window outputs (map_decode_nii embeds
            # them at +1 / 0 in its single-chip slot arrays)
            return ext, a_next[:, 1:], b_next[:, :-1]

        # gather only the LOCAL chunk of each permutation: slicing the
        # static index first (pi_loc/pinv_loc) instead of permuting the
        # full-K array and then slicing saves an n-times-redundant
        # gather per shard per half-iteration
        pi_loc = jax.lax.dynamic_slice_in_dim(pi, start, chunk)
        pinv_loc = jax.lax.dynamic_slice_in_dim(pinv, start, chunk)

        def body(carry, _):
            ext2_loc, _e1, _e2, a1, b1, a2, b2 = carry
            ext1_loc, a1, b1 = dec_call(sys_loc, p1_loc, ut1, pt1,
                                        a1, b1, ext2_loc)
            ext1 = jax.lax.all_gather(ext1_loc, axis, axis=1, tiled=True)
            ext1_int_loc = jnp.take(ext1, pi_loc, axis=1)
            ext2i_loc, a2, b2 = dec_call(sysi_loc, p2_loc, ut2, pt2,
                                         a2, b2, ext1_int_loc)
            ext2i = jax.lax.all_gather(ext2i_loc, axis, axis=1,
                                       tiled=True)
            ext2_nat_loc = jnp.take(ext2i, pinv_loc, axis=1)
            return (ext2_nat_loc, ext1_int_loc, ext2i_loc,
                    a1, b1, a2, b2), None

        zext = jnp.zeros((t_tiles, chunk, sub, lanes), sys_loc.dtype)
        zst = jnp.zeros((t_tiles, n_loc, 8, sub, lanes), sys_loc.dtype)
        (_, ext1_last, ext2_last, *_st), _ = jax.lax.scan(
            body, (zext, zext, zext, zst, zst, zst, zst), None,
            length=iterations)
        # a-posteriori exactly as the single-chip driver forms it
        # (turbo_decoder.py decode_tiles: sys_int + ext1_int + ext2i)
        llr_loc = sysi_loc + ext1_last + ext2_last
        llr_int = jax.lax.all_gather(llr_loc, axis, axis=1, tiled=True)
        return llr_int[:, pinv]

    spec_rows = P(None, axis)
    spec_rep = P()
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec_rows, spec_rows, spec_rows, spec_rows,
                  spec_rep, spec_rep, spec_rep, spec_rep),
        out_specs=spec_rep,
        check_vma=False,
    )
    llr_full = fn(sys_t, sys_int, par1_t, par2_t, ut1, pt1, ut2, pt2)
    llr2d = from_tiles(llr_full)
    if bp:
        llr2d = llr2d[:, :b]
    llr_out = jnp.moveaxis(llr2d, 0, -1).reshape(*lead, k)
    bits = (llr_out < 0).astype(jnp.int8)
    return bits, llr_out


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
