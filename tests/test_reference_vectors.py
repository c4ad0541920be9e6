"""Decode the reference's own recorded IQ captures (tier-2 parity).

The reference checks in four over-the-air captures and asserts its
receiver decodes them (lib/src/phy/phch/test/CMakeLists.txt:213-218).
These tests run OUR receiver on the SAME files with the SAME cell
parameters and assert the same outcomes:

* ``pbch_file_test -i signal.1.92M.dat`` — cell 6 PRB / 2 ports /
  id 150: MIB decodes to the exact 24-bit payload hard-coded at
  pbch_file_test.c:48.
* ``pcfich_file_test -c 150 -n 50 -p 2 -i signal.10M.dat`` — CFI = 1
  with high correlation (pcfich_file_test.c:249).
* ``pdsch_pdcch_file_test -c 1 -f 3 -n 6 -p 1 -i signal.1.92M.amar.dat``
  — blind SI-RNTI search over the frame finds a DCI and decodes the
  SIB1 transport block (pdsch_pdcch_file_test.c:188-199).
* ``pmch_file_test -i pmch_100prbs_MCS2_SR0.bin`` — the MBSFN subframe
  (non-mbsfn region 2, area id 1, MCS 2) decodes
  (pmch_file_test.c:194).

Skipped when /root/reference is not present.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/lib/src/phy/phch/test"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference captures not present")


def _load(name):
    return np.fromfile(os.path.join(REF, name), dtype=np.complex64)


# pbch_file_test.c:48 — the expected MIB payload for signal.1.92M.dat
EXPECTED_MIB_BITS = [0, 1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 1, 1, 0, 0,
                     0, 0, 0, 0, 0, 0, 0, 0]


class TestPbchCapture:
    def test_mib_payload_bit_exact(self):
        from empower_srslte_tpu.models.pbch import mib_unpack, pbch_decode
        from empower_srslte_tpu.models.ue_dl import estimate_channel
        from empower_srslte_tpu.ops.ofdm import ofdm_rx_sf
        from empower_srslte_tpu.utils import device_complex
        from empower_srslte_tpu.utils.cell import Cell

        samples = _load("signal.1.92M.dat")
        cell = Cell(nof_prb=6, nof_ports=2, id=150)
        sf0 = samples[: cell.sf_sample_len]
        grid = ofdm_rx_sf(device_complex(sf0)[None], cell)[0]
        h, n0 = estimate_channel(grid[None], cell, 0)
        bits, sfn_mod4, ports, ok = pbch_decode(
            grid[None], h[0, 0][None], cell,
            noise_est=float(np.asarray(n0[0])))
        assert bool(np.asarray(ok)[0]), "PBCH CRC failed on the capture"
        assert list(np.asarray(bits)[0]) == EXPECTED_MIB_BITS
        mib = mib_unpack(np.asarray(bits)[0])
        assert mib["nof_prb"] == 50          # the capture's cell is 10 MHz
        assert int(np.asarray(ports)[0]) == 2

    def test_ue_mib_facade(self):
        from empower_srslte_tpu.models.ue_dl import ue_mib_decode
        from empower_srslte_tpu.utils.cell import Cell

        samples = _load("signal.1.92M.dat")
        cell = Cell(nof_prb=6, id=150)
        mib = ue_mib_decode(samples[: cell.sf_sample_len], 150)
        assert mib is not None
        assert mib["nof_prb"] == 50


class TestPcfichCapture:
    def test_cfi_is_1(self):
        from empower_srslte_tpu.models.pcfich import pcfich_decode
        from empower_srslte_tpu.models.ue_dl import estimate_channel
        from empower_srslte_tpu.ops.ofdm import ofdm_rx_sf
        from empower_srslte_tpu.utils import device_complex
        from empower_srslte_tpu.utils.cell import Cell

        # the capture holds ~half a subframe at the standard 15.36 Msps
        # rate; the C test reads a full flen buffer and proceeds with
        # whatever it got (pcfich_file_test.c:216) — zero-pad instead
        samples = _load("signal.10M.dat")
        cell = Cell(nof_prb=50, nof_ports=2, id=150)
        pad = cell.sf_sample_len - len(samples)
        assert pad > 0
        samples = np.concatenate(
            [samples, np.zeros(pad, np.complex64)])
        grid = ofdm_rx_sf(device_complex(samples)[None], cell)[0]
        h, n0 = estimate_channel(grid[None], cell, 0)
        cfi, corr = pcfich_decode(grid[None], h[0][None], cell, 0,
                                  noise_est=float(np.asarray(n0[0])))
        assert int(np.asarray(cfi)[0]) == 1
        # the reference requires correlation 2.8/3.2 on the valid half
        # subframe; our normalized metric also averages over the
        # zero-padded half, so demand a smaller (still decisive) margin
        assert float(np.asarray(corr)[0]) > 0.1


class TestSib1Capture:
    def test_blind_si_rnti_decodes_sib1(self):
        from empower_srslte_tpu.models.ue_dl import ue_dl_decode
        from empower_srslte_tpu.utils.cell import Cell

        samples = _load("signal.1.92M.amar.dat")
        cell = Cell(nof_prb=6, nof_ports=1, id=1)
        sf_len = cell.sf_sample_len
        tbs = {}
        for sf_idx in range(min(10, len(samples) // sf_len)):
            sf = samples[sf_idx * sf_len : (sf_idx + 1) * sf_len]
            for r in ue_dl_decode(sf, cell, sf_idx, 0xFFFF):
                if r.crc_ok and r.tb_bits is not None:
                    tbs[sf_idx] = np.packbits(
                        np.asarray(r.tb_bits).ravel())
        assert tbs, "no SI-RNTI PDSCH decoded from the capture"
        # the frame carries SIB1 in subframe 5 and a SystemInformation
        # message in its SI window — both parse as BCCH-DL-SCH
        from empower_srslte_tpu.rrc import messages as rrc_msg

        names = {sf: rrc_msg.unpack_bcch_dlsch(bytes(tb.tobytes()))[0]
                 for sf, tb in tbs.items()}
        assert names.get(5) == "systemInformationBlockType1", names
        assert "systemInformation" in names.values(), names


class TestPmchCapture:
    def test_mbsfn_subframe_decodes(self):
        from empower_srslte_tpu.models import ra
        from empower_srslte_tpu.models.pmch import PmchConfig, pmch_decode
        from empower_srslte_tpu.ops.modem import Mod
        from empower_srslte_tpu.ops.ofdm import ofdm_rx_sf_mbsfn
        from empower_srslte_tpu.utils import device_complex
        from empower_srslte_tpu.utils.cell import CP, Cell

        samples = _load("pmch_100prbs_MCS2_SR0.bin")
        cell = Cell(nof_prb=100, nof_ports=1, id=1, cp=CP.EXT,
                    reduced_rates=True)
        assert len(samples) == cell.sf_sample_len
        grid = ofdm_rx_sf_mbsfn(device_complex(samples)[None], cell,
                                non_mbsfn_region=2)[0]
        mod, tbs = ra.mcs_to_tbs(2, 100)
        assert mod is Mod.QPSK
        cfg = PmchConfig(cell=cell, area_id=1, sf_idx=1, cfi=2,
                         mod=Mod.QPSK)
        bits, ok, _ = pmch_decode(grid[None], cfg, cfg.plan(tbs),
                                  noise_est=1e-3)
        assert bool(np.asarray(ok)[0]), "PMCH CRC failed on the capture"
