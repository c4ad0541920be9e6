"""PRACH formats 0-4 + restricted sets (36.211 5.7; prach.c:56-330).

Loopback sweeps in the style of the reference's phch/test/prach_test.c
(gen -> delay -> detect over formats, zero-correlation configs and
high-speed flags), plus table checks of the restricted-set shift layout
(prach.c:266-305) and the format timing tables (prach.c:56-61).
"""

import numpy as np
import pytest

from empower_srslte_tpu.models import prach
from empower_srslte_tpu.utils.cell import Cell

CELL = Cell(id=1, nof_prb=50)


class TestTables:
    def test_format_timing(self):
        # Table 5.7.1-1 lengths at 30.72 Msps (prach.c:56-61)
        assert [prach.TCP_TS[f] for f in range(5)] == \
            [3168, 21024, 6240, 21024, 448]
        assert [prach.TSEQ_TS[f] for f in range(5)] == \
            [24576, 24576, 49152, 49152, 4096]
        # total lengths at the cell rate
        for f in range(4):
            assert prach.prach_total_len(CELL, f) == int(round(
                CELL.srate * (prach.TCP_TS[f] + prach.TSEQ_TS[f])
                / 30.72e6))

    def test_config_index_to_format(self):
        assert prach.preamble_format(0) == 0
        assert prach.preamble_format(17) == 1
        assert prach.preamble_format(35) == 2
        assert prach.preamble_format(51) == 3
        assert prach.preamble_format(70) == 4

    def test_format4_roots(self):
        # Table 5.7.2-5 starts 1, 138, 2, 137 ... (prach.c:160)
        roots = prach.root_table(4)
        assert list(roots[:6]) == [1, 138, 2, 137, 3, 136]
        assert len(roots) == 138

    def test_restricted_params_match_reference_algorithm(self):
        # spot values computed by the prach.c:266-305 formulas
        for u in (129, 710, 140, 699, 25):
            for ncs in (15, 22, 46, 100):
                n_shift, d_start, n_group, n_neg, v_max = \
                    prach.restricted_params(u, ncs)
                p_ = pow(u, -1, 839)
                d_u = p_ if p_ < 839 // 2 else 839 - p_
                if ncs <= d_u < 839 // 3:
                    assert n_shift == d_u // ncs
                    assert d_start == 2 * d_u + n_shift * ncs
                elif 839 // 3 <= d_u <= (839 - ncs) // 2:
                    assert n_shift == (839 - 2 * d_u) // ncs
                assert v_max >= 0

    def test_preamble_table_unrestricted(self):
        t = prach.preamble_table(128, 1)       # Ncs=13 -> 64 shifts/root
        assert len(t) == 64
        assert t[0][0] == t[1][0] and t[1][1] == 13
        t4 = prach.preamble_table(0, 0, fmt=4)  # Ncs=2 -> 69 shifts/root
        assert len(t4) == 64 and t4[0][0] == 1

    def test_preamble_table_restricted_distinct(self):
        t = prach.preamble_table(128, 4, high_speed=True)
        assert len(t) == 64
        # restricted shifts differ from the unrestricted v*Ncs ladder
        tu = prach.preamble_table(128, 4, high_speed=False)
        assert t != tu


def _loopback(fmt, zcz, idx, delay, high_speed=False, snr_db=None):
    rsi = 128 if fmt != 4 else 2
    pre = prach.prach_gen(CELL, rsi, idx, zcz=zcz, fmt=fmt,
                          high_speed=high_speed)
    cp = prach.prach_cp_len(CELL, fmt)
    reps = 2 if fmt in (2, 3) else 1
    sig = np.zeros(cp + reps * prach.prach_seq_len(CELL, fmt) + delay + 64,
                   np.complex64)
    sig[delay : delay + len(pre)] = pre
    if snr_db is not None:
        rng = np.random.default_rng(3)
        n0 = 10 ** (-snr_db / 10)
        sig = sig + (rng.normal(size=sig.shape)
                     + 1j * rng.normal(size=sig.shape)
                     ).astype(np.complex64) * np.sqrt(n0 / 2)
    # receiver aligned to the nominal sequence start (after CP)
    win = sig[cp:]
    det, offs, mets = prach.prach_detect(
        win[None], CELL, rsi, zcz=zcz, fmt=fmt, high_speed=high_speed)
    det = np.asarray(det[0])
    offs = np.asarray(offs[0])
    return det, offs


class TestLoopback:
    @pytest.mark.parametrize("fmt", [0, 1, 2, 3])
    def test_formats_0_to_3(self, fmt):
        det, offs = _loopback(fmt, zcz=1, idx=7, delay=0)
        assert det[7] and not det[:7].any() and not det[8:].any()

    def test_format4(self):
        det, offs = _loopback(4, zcz=2, idx=5, delay=0)
        assert det[5] and det.sum() == 1

    @pytest.mark.parametrize("zcz", [2, 5, 10])
    def test_zcz_sweep(self, zcz):
        det, _ = _loopback(0, zcz=zcz, idx=11, delay=0)
        assert det[11] and det.sum() == 1

    def test_restricted_set(self):
        det, _ = _loopback(0, zcz=4, idx=23, delay=0, high_speed=True)
        assert det[23] and det.sum() == 1

    def test_timing_offset(self):
        delay = 96                             # samples at cell rate
        det, offs = _loopback(0, zcz=6, idx=3, delay=delay)
        assert det[3]
        # offset reported in cell-rate samples (via the Nzc delay grid)
        got = int(offs[3])
        step = prach.prach_seq_len(CELL, 0) // prach.NZC
        assert abs(got - delay) <= 2 * step

    def test_with_noise(self):
        det, _ = _loopback(1, zcz=5, idx=31, delay=32, snr_db=0)
        assert det[31]

    def test_format2_repetition_gain(self):
        # the repeated sequence must still detect when only the second
        # half-window carries it cleanly
        det, _ = _loopback(2, zcz=5, idx=9, delay=0, snr_db=-3)
        assert det[9]
