"""Foundation tests: cell dimensioning, Gold sequences, CRC, bit utils.

Mirrors the reference's utils/common unit tier (SURVEY.md section 4 tier 1):
self-checking properties plus spot goldens from the 36.211/36.212 specs.
"""

import numpy as np
import pytest

from empower_srslte_tpu.utils import (
    CP,
    CRC8,
    CRC16,
    CRC24A,
    CRC24B,
    Cell,
    bits,
    gold_sequence,
)
from empower_srslte_tpu.utils import cell as cell_mod
from empower_srslte_tpu.utils import sequence as seq_mod


class TestCell:
    @pytest.mark.parametrize(
        "prb,fft,sf_len",
        [(6, 128, 1920), (15, 256, 3840), (25, 512, 7680), (50, 1024, 15360), (75, 1536, 23040), (100, 2048, 30720)],
    )
    def test_dimensioning_normal_cp(self, prb, fft, sf_len):
        c = Cell(nof_prb=prb)
        assert c.fft_size == fft
        assert c.sf_sample_len == sf_len
        assert c.srate == 15e3 * fft
        assert c.nsymb_sf == 14
        assert c.sf_re_len == 14 * prb * 12

    def test_cp_lengths(self):
        c = Cell(nof_prb=100)
        assert c.cp_len_slot == (160,) + (144,) * 6
        assert sum(c.cp_len_slot) + 7 * 2048 == 15360
        e = Cell(nof_prb=100, cp=CP.EXT)
        assert e.cp_len_slot == (512,) * 6
        assert e.nsymb_sf == 12

    def test_cell_ids(self):
        c = Cell(id=301)
        assert c.n_id_1 == 100 and c.n_id_2 == 1
        with pytest.raises(ValueError):
            Cell(id=504)
        with pytest.raises(ValueError):
            Cell(nof_prb=33)

    def test_hashable_static_arg(self):
        assert hash(Cell()) == hash(Cell(nof_prb=50))
        assert Cell() != Cell(nof_prb=100)


class TestGold:
    def test_balance_and_determinism(self):
        c = gold_sequence(0x12345, 4096)
        assert c.shape == (4096,)
        assert set(np.unique(c)) <= {0, 1}
        # Gold sequences are balanced to within a small bound
        assert abs(int(c.sum()) - 2048) < 200
        assert np.array_equal(c, gold_sequence(0x12345, 4096))

    def test_prefix_consistency(self):
        long = gold_sequence(777, 2048)
        short = gold_sequence(777, 128)
        assert np.array_equal(long[:128], short)

    def test_distinct_cinit(self):
        a = gold_sequence(1, 1024)
        b = gold_sequence(2, 1024)
        assert np.any(a != b)

    def test_x1_recurrence_direct(self):
        # Independently verify against a naive bit-by-bit generator.
        c_init, n = 0xABCDE, 500
        nc = seq_mod.NC
        x1 = [0] * (nc + n + 31)
        x2 = [0] * (nc + n + 31)
        x1[0] = 1
        for i in range(31):
            x2[i] = (c_init >> i) & 1
        for i in range(nc + n):
            x1[i + 31] = (x1[i + 3] + x1[i]) % 2
            x2[i + 31] = (x2[i + 3] + x2[i + 2] + x2[i + 1] + x2[i]) % 2
        expect = [(x1[nc + i] + x2[nc + i]) % 2 for i in range(n)]
        assert np.array_equal(gold_sequence(c_init, n), np.array(expect, dtype=np.int8))

    def test_prs_qpsk(self):
        r = seq_mod.prs_sequence(42, 100)
        assert r.dtype == np.complex64
        np.testing.assert_allclose(np.abs(r), 1.0, rtol=1e-6)


class TestCrc:
    @pytest.mark.parametrize("crc", [CRC8, CRC16, CRC24A, CRC24B])
    def test_attach_then_check_zero(self, crc, rng):
        msg = rng.integers(0, 2, size=128).astype(np.int8)
        with_crc = crc.attach(msg)
        assert len(with_crc) == 128 + crc.order
        assert np.all(crc.compute(with_crc) == 0)

    @pytest.mark.parametrize("crc", [CRC16, CRC24A, CRC24B])
    def test_detects_single_bit_error(self, crc, rng):
        msg = rng.integers(0, 2, size=64).astype(np.int8)
        good = crc.attach(msg)
        for pos in [0, 17, len(good) - 1]:
            bad = good.copy()
            bad[pos] ^= 1
            assert np.any(crc.compute(bad) != 0)

    def test_crc16_known_vector(self):
        # CCITT-16 with zero init over "123456789" ASCII = 0x31C3
        data = bits.unpack_bytes(np.frombuffer(b"123456789", dtype=np.uint8))
        crc = CRC16.compute(data)
        assert bits.bits_to_uint(crc) == 0x31C3

    @pytest.mark.parametrize("crc", [CRC8, CRC16, CRC24A, CRC24B])
    def test_device_matches_host(self, crc, rng):
        import jax.numpy as jnp

        msgs = rng.integers(0, 2, size=(4, 320)).astype(np.int8)
        host = np.stack([crc.compute(m) for m in msgs])
        dev = np.asarray(crc.jnp_compute(jnp.asarray(msgs)))
        assert np.array_equal(host, dev)
        ok = np.asarray(crc.jnp_check(jnp.asarray(np.stack([crc.attach(m) for m in msgs]))))
        assert ok.all()

    def test_device_check_large_k_exact(self, rng):
        # f32 matmul parity must stay exact at turbo max CB size (6144+24).
        import jax.numpy as jnp

        msg = np.ones(6144, dtype=np.int8)  # worst-case row sums
        good = CRC24A.attach(msg)
        assert bool(CRC24A.jnp_check(jnp.asarray(good[None]))[0])
        bad = good.copy()
        bad[6000] ^= 1
        assert not bool(CRC24A.jnp_check(jnp.asarray(bad[None]))[0])


class TestBits:
    def test_pack_roundtrip(self, rng):
        data = rng.integers(0, 256, size=33, dtype=np.uint8)
        assert np.array_equal(bits.pack_bits(bits.unpack_bytes(data)), data)

    def test_uint_roundtrip(self):
        assert bits.bits_to_uint(bits.uint_to_bits(0xDEAD, 16)) == 0xDEAD

    def test_jnp_pack_unpack(self, rng):
        import jax.numpy as jnp

        data = rng.integers(0, 256, size=(3, 16), dtype=np.uint8)
        unpacked = bits.jnp_unpack_bits(jnp.asarray(data))
        packed = bits.jnp_pack_bits(unpacked)
        assert np.array_equal(np.asarray(packed), data)
        host = np.stack([bits.unpack_bytes(row) for row in data])
        assert np.array_equal(np.asarray(unpacked), host)
