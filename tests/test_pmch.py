"""PMCH/eMBMS tests incl. the many-carrier sharded batch (config 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from empower_srslte_tpu.models.pmch import (
    PmchConfig,
    pmch_chest,
    pmch_decode,
    pmch_encode,
    pmch_re_indices,
)
from empower_srslte_tpu.parallel import make_mesh
from empower_srslte_tpu.ops.modem import Mod
from empower_srslte_tpu.utils import CP, Cell


def _cfg(prb=25, area=5):
    cell = Cell(nof_prb=prb, id=1, cp=CP.EXT)
    return PmchConfig(cell=cell, area_id=area, sf_idx=2, cfi=1)


class TestPmch:
    def test_re_map_excludes_rs(self):
        cfg = _cfg()
        idx = pmch_re_indices(cfg.cell, cfg.sf_idx, cfg.cfi)
        nre = cfg.cell.nof_re
        # no PMCH RE on an MBSFN RS position
        from empower_srslte_tpu.models.pmch import mbsfn_rs

        rows, syms, _ = mbsfn_rs(cfg.area_id, cfg.cell.nof_prb, cfg.sf_idx)
        rs_flat = {int(s) * nre + int(k) for row, s in zip(rows, syms) for k in row}
        assert not (set(idx.tolist()) & rs_flat)

    def test_roundtrip_awgn(self, rng):
        cfg = _cfg()
        tbs = 7480
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(2, tbs)).astype(np.int8)
        grid = pmch_encode(jnp.asarray(tb), cfg, plan)
        h = 0.9 * np.exp(1j * 0.5)
        rx = grid * h
        n0 = 2e-3
        rx = rx + jnp.asarray((rng.normal(size=rx.shape)
                               + 1j * rng.normal(size=rx.shape))
                              ).astype(jnp.complex64) * np.sqrt(n0 / 2)
        bits, ok, _ = pmch_decode(rx, cfg, plan, noise_est=n0)
        assert np.asarray(ok).all()
        assert np.array_equal(np.asarray(bits), tb)

    def test_area_scrambling_isolates(self, rng):
        cfg_a = _cfg(area=5)
        cfg_b = _cfg(area=9)
        tbs = 4392
        plan = cfg_a.plan(tbs)
        tb = rng.integers(0, 2, size=(1, tbs)).astype(np.int8)
        grid = pmch_encode(jnp.asarray(tb), cfg_a, plan)
        _, ok, _ = pmch_decode(grid, cfg_b, plan)
        assert not np.asarray(ok).any()  # wrong area id -> CRC fails

    def test_many_carrier_sharded_batch(self, rng):
        # BASELINE config 5: [carrier, sf] batch of MBSFN subframes decoded
        # under the mesh.
        mesh = make_mesh(8, carriers=4)
        cfg = _cfg(prb=6)
        tbs = 1096
        plan = cfg.plan(tbs)
        tb = rng.integers(0, 2, size=(4, 2, tbs)).astype(np.int8)
        shard = NamedSharding(mesh, P("carrier", "sf"))

        @jax.jit
        def step(tb_bits):
            grid = pmch_encode(tb_bits, cfg, plan)
            bits, ok, _ = pmch_decode(grid * 0.8, cfg, plan, noise_est=1e-4)
            return bits, ok

        tb_dev = jax.device_put(jnp.asarray(tb), shard)
        bits, ok = step(tb_dev)
        assert np.asarray(ok).all()
        assert np.array_equal(np.asarray(bits), tb)
