"""Sub-stage profile of the fused dlsch path at rx_20mimo shapes."""

import sys

import _pathfix  # noqa: F401  (repo root on sys.path)
import time

import numpy as np
import jax
import jax.numpy as jnp

from empower_srslte_tpu.models import ra
from empower_srslte_tpu.models.pdsch import PdschConfig
from empower_srslte_tpu.models.sch import dlsch_encode
from empower_srslte_tpu.ops.equalizer import MimoType
from empower_srslte_tpu.ops.fec.derm_tiles import (build_tile_plan,
                                                   parity_rows_interleaved)
from empower_srslte_tpu.ops.fec.tables import qpp_interleaver
from empower_srslte_tpu.utils import Cell
from empower_srslte_tpu.utils.crc import CRC24B


def _sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x))


def timeit(name, fn, *args, reps=5):
    r = fn(*args)
    _sync(r)
    r = fn(*args)
    _sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    _sync(r)
    dt = (time.time() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.2f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    cell = Cell(nof_prb=100, nof_ports=2, id=1)
    mod, tbs = ra.mcs_to_tbs(27, 100)
    cfg = PdschConfig(cell=cell, sf_idx=1, cfi=1, mod=mod,
                      mimo=MimoType.SPATIAL_MUX, nof_layers=2,
                      nof_codewords=2)
    plan = cfg.plan(tbs)
    g = plan.g

    tb = rng.integers(0, 2, size=(batch, tbs)).astype(np.int8)
    cw = jax.jit(lambda t: dlsch_encode(t, plan))(jnp.asarray(tb))
    llr2 = jnp.concatenate([x[None] for x in (cw, cw)], axis=0)
    llrs = (1.0 - 2.0 * llr2.astype(jnp.float32)) * 8.0
    llrs = jax.device_put(np.asarray(llrs))

    lanes, sub = 256, 8
    rest = 2
    k, mem = 5824, [(i, e, f, off) for i, (kk, e, f, off)
                    in enumerate(plan.cb_plans)]
    members = tuple((e, f, r * g + off) for r in range(rest)
                    for (_i, e, f, off) in mem)
    tplan = build_tile_plan(k, members, plan.rv, sub,
                            rest * g, rest * g + 1)

    def make_src(llrs):
        x = llrs.reshape(rest, lanes, g).astype(jnp.bfloat16)
        src = jnp.swapaxes(x, -1, -2).reshape(rest * g, lanes)
        return jnp.concatenate(
            [src, jnp.zeros((2, lanes), jnp.bfloat16)], axis=0)

    idxs = {n: jnp.asarray(tplan[n]) for n in
            ("sys", "par1", "par2", "ut1", "pt1", "ut2", "pt2")}

    @jax.jit
    def takes_only(llrs):
        src = make_src(llrs)
        outs = [jnp.take(src, idxs[n], axis=0)[0] for n in idxs]
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    @jax.jit
    def takes_tiles(llrs):
        src = make_src(llrs)
        return [jnp.take(src, idxs[n], axis=0)[0] for n in idxs]

    dec = plan.decoder(k)

    @jax.jit
    def dec_fixed1(llrs):
        tiles = takes_tiles.__wrapped__(llrs)
        llr_int = dec.decode_tiles(*tiles, iterations=1)
        return jnp.sum(llr_int.astype(jnp.float32))

    p_int = jnp.asarray(parity_rows_interleaved(CRC24B.poly, 24, k))

    @jax.jit
    def dec_es(llrs):
        tiles = takes_tiles.__wrapped__(llrs)

        def crc_check(li):
            bits = (li < 0).astype(jnp.float32)
            snd = jnp.einsum("tksl,kc->tcsl", bits, p_int,
                             preferred_element_type=jnp.float32)
            return jnp.all(jnp.mod(snd, 2.0) == 0.0)

        llr_int = dec.decode_tiles(*tiles, crc_check=crc_check)
        return jnp.sum(llr_int.astype(jnp.float32))

    from empower_srslte_tpu.models.sch import _dlsch_decode_fused

    @jax.jit
    def full_fused(llrs):
        _bits, ok, _soft = _dlsch_decode_fused(llrs, plan, lanes, sub, False)
        return jnp.sum(ok)

    @jax.jit
    def crc_only(llr_int):
        bits = (llr_int < 0).astype(jnp.float32)
        snd = jnp.einsum("tksl,kc->tcsl", bits, p_int,
                         preferred_element_type=jnp.float32)
        return jnp.all(jnp.mod(snd, 2.0) == 0.0)

    li = takes_tiles(llrs)[0]

    print(f"batch={batch}, platform={jax.devices()[0].platform}")
    timeit("takes x7 (fused transpose)", takes_only, llrs)
    timeit("takes + decode fixed-1", dec_fixed1, llrs)
    timeit("takes + decode early-stop", dec_es, llrs)
    timeit("crc einsum alone (1 tile arr)", crc_only, li)
    timeit("full fused dlsch (2 cw)", full_fused, llrs)


if __name__ == "__main__":
    main()
