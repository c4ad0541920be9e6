"""UL DMRS group/sequence hopping parity (36.211 5.5.1.3/5.5.1.4).

Goldens generated from the reference's own sequence generator
(phy_common.c:342 srslte_group_hopping_f_gh and refsignal_ul.c:154
generate_srslte_sequence_hopping_v driven by a minimal harness compiled
against lib/src/phy/common/sequence.c; see tools/nas_oracle.cc header
for the oracle pattern).
"""

import numpy as np
import pytest

from empower_srslte_tpu.models import refsignal_ul as rs
from empower_srslte_tpu.utils.cell import Cell

# reference f_gh[ns] % 30 per cell id
FGH_GOLDEN = {
    1: [4, 28, 12, 4, 14, 19, 12, 16, 12, 4, 24, 29, 12, 24, 8, 22, 24,
        9, 4, 26],
    123: [7, 1, 3, 13, 5, 0, 11, 18, 19, 9, 4, 20, 21, 9, 19, 22, 4, 0,
          18, 18],
    456: [9, 12, 29, 29, 19, 22, 12, 1, 3, 5, 0, 28, 12, 5, 7, 22, 6,
          15, 7, 26],
}

# reference v[ns] per (cell id, delta_ss)
V_GOLDEN = {
    (1, 0): [0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0],
    (1, 1): [1, 0, 0, 0, 0, 0, 1, 0, 1, 1, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0],
    (123, 0): [1, 0, 0, 0, 1, 1, 0, 0, 0, 1, 0, 1, 1, 0, 0, 0, 1, 0, 0,
               1],
    (123, 1): [1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 1, 0, 0, 1, 1, 1, 1, 1, 0,
               0],
    (456, 0): [1, 1, 1, 0, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 1, 1,
               1],
    (456, 1): [1, 1, 1, 0, 1, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 0, 0, 1, 1,
               0],
}


class TestHoppingGoldens:
    @pytest.mark.parametrize("cell_id", [1, 123, 456])
    def test_f_gh(self, cell_id):
        got = rs.group_hopping_f_gh(cell_id)
        assert list(got) == FGH_GOLDEN[cell_id]

    @pytest.mark.parametrize("cell_id,dss", [(1, 0), (1, 1), (123, 0),
                                             (123, 1), (456, 0), (456, 1)])
    def test_v(self, cell_id, dss):
        got = rs.sequence_hopping_v(cell_id, dss)
        assert list(got) == V_GOLDEN[(cell_id, dss)]


class TestDmrsHopping:
    def test_u_per_slot(self):
        # refsignal_ul.c: u = (f_gh + (cell_id%30) + delta_ss) % 30
        for ns in range(20):
            u, v = rs.dmrs_u_v(123, ns, 6, delta_ss=1, group_hopping=True)
            assert u == (FGH_GOLDEN[123][ns] + (123 % 30) + 1) % 30
            assert v == 0                  # group hopping excludes v

    def test_sequence_hopping_v_selection(self):
        for ns in range(20):
            u, v = rs.dmrs_u_v(456, ns, 6, sequence_hopping=True)
            assert v == V_GOLDEN[(456, 0)][ns]
        # < 6 PRB: no sequence hopping
        _, v = rs.dmrs_u_v(456, 0, 5, sequence_hopping=True)
        assert v == 0

    def test_dmrs_slots_differ_under_hopping(self):
        cell = Cell(id=123, nof_prb=25)
        hop = rs.pusch_dmrs(cell, 6, sf_idx=3, group_hopping=True)
        flat = rs.pusch_dmrs(cell, 6, sf_idx=3)
        assert not np.allclose(hop[0], hop[1])
        assert np.allclose(flat[0], flat[1])

    def test_chest_with_hopping_round_trip(self):
        """TX DMRS with hopping -> chest with matching config recovers a
        flat channel; a mismatched (non-hopping) receiver does not."""
        import jax.numpy as jnp

        cell = Cell(id=123, nof_prb=25)
        from empower_srslte_tpu.models.pusch import (PuschConfig,
                                                     pusch_encode)
        from empower_srslte_tpu.models.sch import DlschPlan

        cfg = PuschConfig(cell=cell, rnti=0x46, sf_idx=2, prb_start=4,
                          n_prb=6, group_hopping=True)
        tb = np.zeros(cfg.plan(104).tbs, np.int8)
        grid = pusch_encode(jnp.asarray(tb[None]), cfg, cfg.plan(104))
        h = rs.chest_ul_pusch(grid, cell, 4, 6, sf_idx=2,
                              group_hopping=True)
        assert np.allclose(np.abs(np.asarray(h)), 1.0, atol=0.05)
        h_bad = rs.chest_ul_pusch(grid, cell, 4, 6, sf_idx=2)
        assert not np.allclose(np.abs(np.mean(np.asarray(h_bad))), 1.0,
                               atol=0.2)

    def test_srs_group_hopping(self):
        cell = Cell(id=123, nof_prb=25)
        s0 = rs.srs_sequence(cell, 4, sf_idx=0, group_hopping=True)
        s1 = rs.srs_sequence(cell, 4, sf_idx=1, group_hopping=True)
        assert not np.allclose(s0, s1)
