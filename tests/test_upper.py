"""Upper-stack tests: RLC TM/UM/AM (incl. loss stress), PDCP, GTP-U,
security algorithms — the lib/test/upper tier (rlc_am_test,
rlc_stress_test, security vectors).
"""

import numpy as np
import pytest

from empower_srslte_tpu.upper import (
    PdcpEntity,
    RlcAm,
    RlcTm,
    RlcUm,
    gtpu_pack,
    gtpu_unpack,
)
from empower_srslte_tpu.upper import security
from empower_srslte_tpu.upper.pdcp import PdcpConfig


class TestGtpu:
    def test_roundtrip(self):
        pdu = gtpu_pack(0xDEADBEEF, b"ip packet bytes")
        teid, payload = gtpu_unpack(pdu)
        assert teid == 0xDEADBEEF and payload == b"ip packet bytes"

    def test_malformed(self):
        with pytest.raises(ValueError):
            gtpu_unpack(b"\x00\x00")
        good = gtpu_pack(1, b"abc")
        with pytest.raises(ValueError):
            gtpu_unpack(bytes([0x50]) + good[1:])  # wrong version


class TestRlc:
    def test_tm_passthrough(self):
        tm = RlcTm()
        tm.write_sdu(b"hello")
        pdu = tm.read_pdu(100)
        tm.write_pdu(pdu)
        assert tm.rx_sdus == [b"hello"]

    def test_um_segmentation_reassembly(self):
        tx, rx = RlcUm(), RlcUm()
        sdu = bytes(range(256)) * 4
        tx.write_sdu(sdu)
        while (pdu := tx.read_pdu(100)) is not None:
            rx.write_pdu(pdu)
        assert rx.rx_sdus == [sdu]

    def test_um_out_of_order(self):
        tx, rx = RlcUm(), RlcUm()
        tx.write_sdu(b"A" * 150)
        pdus = []
        while (p := tx.read_pdu(80)) is not None:
            pdus.append(p)
        for p in reversed(pdus):
            rx.write_pdu(p)
        assert rx.rx_sdus == [b"A" * 150]

    def test_am_retransmission(self, rng):
        tx, rx = RlcAm(), RlcAm()
        sdus = [bytes([i]) * (50 + 10 * i) for i in range(8)]
        for s in sdus:
            tx.write_sdu(s)
        # lossy link: drop ~30% of data PDUs, run status exchange
        for _ in range(50):
            pdu = tx.read_pdu(60)
            if pdu is not None and rng.uniform() > 0.3:
                rx.write_pdu(pdu)
            rx.tick()                  # t-Reordering (36.322 5.1.3.2.4)
            status = rx.get_status_pdu()
            if status is not None:
                tx.write_pdu(status)
            if len(rx.rx_sdus) == len(sdus):
                break
        assert rx.rx_sdus == sdus

    def test_am_stress_random_drops(self, rng):
        # rlc_stress_test.cc analog: sustained traffic over a bad link
        tx, rx = RlcAm(poll_pdu=3), RlcAm()
        sent = []
        delivered_target = 30
        pending = 0
        step = 0
        while len(rx.rx_sdus) < delivered_target and step < 3000:
            step += 1
            if pending < 40 and len(sent) < delivered_target:
                sdu = bytes([len(sent) & 0xFF]) * int(rng.integers(20, 200))
                sent.append(sdu)
                tx.write_sdu(sdu)
                pending += 1
            pdu = tx.read_pdu(int(rng.integers(40, 120)))
            if pdu is not None and rng.uniform() > 0.25:
                rx.write_pdu(pdu)
            if step % 5 == 0:
                st = rx.get_status_pdu()
                if st is not None and rng.uniform() > 0.1:
                    tx.write_pdu(st)
        assert rx.rx_sdus == sent[: len(rx.rx_sdus)]
        assert len(rx.rx_sdus) >= delivered_target


class TestSecurity:
    def test_aes_fips(self):
        ct = security.aes128_encrypt_block(
            bytes.fromhex("000102030405060708090a0b0c0d0e0f"),
            bytes.fromhex("00112233445566778899aabbccddeeff"))
        assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"

    def test_cmac_rfc4493(self):
        key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
        assert security.aes_cmac(key, b"").hex() == \
            "bb1d6929e95937287fa37d129b756746"
        m = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
        assert security.aes_cmac(key, m).hex() == \
            "070a16b46b4d4144f79bdd9dd04a287c"

    def test_eea2_33401_vector(self):
        k = bytes.fromhex("d3c5d592327fb11c4035c6680af8c6d1")
        pt = bytes.fromhex("981ba6824c1bfb1ab485472029b71d80"
                           "8ce33e2cc3c0b5fc1f3de8a6dc66b1f0")
        got = security.eea2(k, 0x398A59B4, 0x15, 1, pt)
        assert got.hex() == ("e9fed8a63d155304d71df20bf3e82214"
                             "b20ed7dad2f233dc3c22d7bdeeed8e78")
        # decipher = cipher
        assert security.eea2(k, 0x398A59B4, 0x15, 1, got) == pt

    def test_eia2_properties(self):
        k = bytes.fromhex("2bd6459f82c5b300952c49104881ff48")
        mac = security.eia2(k, 7, 3, 0, b"signalling message")
        assert len(mac) == 4
        assert mac != security.eia2(k, 8, 3, 0, b"signalling message")
        assert mac != security.eia2(k, 7, 3, 0, b"signalling messagf")

    def test_eea1_33401_annexc3_set1(self):
        # 33.401 v13.1.0 Annex C.3 test set 1 (same vectors as the
        # reference's lib/test/common/test_eea1.cc)
        k = bytes.fromhex("d3c5d592327fb11c4035c6680af8c6d1")
        pt = bytes.fromhex("981ba6824c1bfb1ab485472029b71d80"
                           "8ce33e2cc3c0b5fc1f3de8a6dc66b1f0")
        ct = bytes.fromhex("5d5bfe75eb04f68ce0a12377ea00b37d"
                           "47c6a0ba06309155086a859c4341b378")
        assert security.eea1(k, 0x398A59B4, 0x15, 1, pt, 253) == ct
        back = security.eea1(k, 0x398A59B4, 0x15, 1, ct, 253)
        exp = bytearray(pt)
        exp[-1] &= 0xF8  # tail bits past LENGTH are zeroed
        assert back == bytes(exp)

    def test_eea1_33401_annexc3_set2(self):
        k = bytes.fromhex("2bd6459f82c440e0952c49104805ff48")
        pt = bytes.fromhex(
            "7ec61272743bf1614726446a6c38ced166f6ca76eb5430044286346cef13"
            "0f92922b03450d3a9975e5bd2ea0eb55ad8e1b199e3ec4316020e9a1b285"
            "e762795359b7bdfd39bef4b2484583d5afe082aee638bf5fd5a606193901"
            "a08f4ab41aab9b134880")
        ct = bytes.fromhex(
            "3f67850714b8da69efb727ed7a6c0c50714ad736c4f5600006e3525be807"
            "c467c677ff864af45fba09c27cde38f87a1f84d59ab255408f2c7b82f9ea"
            "d41a1fe65eabebfbc1f3a4c56c9a26fcf7b3d66d0220ee4775bc58170a2b"
            "12f3431d11b344d6e36c")
        assert security.eea1(k, 0xC675A64B, 0x0C, 1, pt, 798) == ct

    def test_eia1_properties(self):
        # No EIA1 in the reference (liblte_security.h has eea1+eia2 only);
        # the SNOW3G core is validated by the EEA1 goldens above, so only
        # the UIA2 MAC wrapper is checked structurally here.
        k = bytes.fromhex("2bd6459f82c5b300952c49104881ff48")
        mac = security.eia1(k, 0x38A6F056, 0x1F, 0, b"324bc98@{**")
        assert len(mac) == 4
        assert mac != security.eia1(k, 0x38A6F056, 0x1F, 1, b"324bc98@{**")
        assert mac != security.eia1(k, 0x38A6F057, 0x1F, 0, b"324bc98@{**")
        assert mac != security.eia1(k, 0x38A6F056, 0x1F, 0, b"324bc98@{*+")
        # length-in-bits sensitivity (same bytes, different bit length)
        assert security.eia1(k, 1, 0, 0, b"\xAA", 7) != \
            security.eia1(k, 1, 0, 0, b"\xAA", 8)

    def test_kdf_family(self):
        # 33.401 Annex A chain: deterministic, correct lengths, distinct
        k_asme = security.generate_k_asme(
            b"\x01" * 16, b"\x02" * 16, b"\x03" * 6, b"\x04" * 6,
            "001", "01")
        assert len(k_asme) == 32
        k_enb = security.generate_k_enb(k_asme, 7)
        nh = security.generate_nh(k_asme, k_enb)
        k_enb_star = security.generate_k_enb_star(k_enb, pci=123,
                                                  earfcn_dl=3400)
        assert len(k_enb) == 32 and len(nh) == 32 and len(k_enb_star) == 32
        assert k_enb != nh != k_enb_star
        nas_enc, nas_int = security.generate_k_nas(k_asme, 1, 2)
        rrc_enc, rrc_int = security.generate_k_rrc(k_enb, 1, 2)
        up_enc, up_int = security.generate_k_up(k_enb, 1, 2)
        keys = {nas_enc, nas_int, rrc_enc, rrc_int, up_enc, up_int}
        assert len(keys) == 6 and all(len(x) == 16 for x in keys)

    def test_milenage_35207_set1(self):
        k = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
        rand = bytes.fromhex("23553cbe9637a89d218ae64dae47bf35")
        op = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")
        opc = security.milenage_opc(k, op)
        assert opc.hex() == "cd63cb71954a9f4e48a5994e37a02baf"
        maca, _ = security.milenage_f1(
            k, opc, rand, bytes.fromhex("ff9bb4d0b607"), bytes.fromhex("b9b9"))
        assert maca.hex() == "4a9ffac354dfafb3"
        res, ck, ik, ak = security.milenage_f2345(k, opc, rand)
        assert res.hex() == "a54211d5e3ba50bf"
        assert ck.hex() == "b40ba9a3c58b2a05bbf0d987b21bf8cb"
        assert ik.hex() == "f769bcd751044604127672711c6d3441"
        assert ak.hex() == "aa689c648370"


class TestPdcp:
    def test_drb_plain_roundtrip(self):
        tx, rx = PdcpEntity(), PdcpEntity()
        for i in range(5):
            pdu = tx.write_sdu(bytes([i]) * 20)
            assert rx.write_pdu(pdu) == bytes([i]) * 20

    def test_drb_ciphered(self):
        cfg = PdcpConfig(cipher="eea2", key_enc=bytes(range(16)))
        tx, rx = PdcpEntity(cfg), PdcpEntity(cfg)
        pdu = tx.write_sdu(b"user ip payload")
        assert b"user ip payload" not in pdu  # actually ciphered
        assert rx.write_pdu(pdu) == b"user ip payload"

    def test_srb_integrity(self):
        cfg = PdcpConfig(is_control=True, integrity="eia2",
                         key_int=bytes(range(16)))
        tx, rx = PdcpEntity(cfg), PdcpEntity(cfg)
        pdu = tx.write_sdu(b"rrc message")
        assert rx.write_pdu(pdu) == b"rrc message"
        # tampering must be detected
        tx2, rx2 = PdcpEntity(cfg), PdcpEntity(cfg)
        bad = bytearray(tx2.write_sdu(b"rrc message"))
        bad[3] ^= 0xFF
        assert rx2.write_pdu(bytes(bad)) is None
        assert rx2.integrity_failures == 1

    def test_sn_wrap_hfn(self):
        tx = PdcpEntity()
        for _ in range(4096):
            tx.write_sdu(b"x")
        assert tx.tx_hfn == 1 and tx.tx_sn == 0
