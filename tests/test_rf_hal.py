"""RF HAL: device registry/auto-probe, file/net devices, radio layer
(rf_dev.h vtable + rf_imp.c probe + radio.cc parity)."""

import numpy as np
import pytest

from empower_srslte_tpu.runtime.rf import (FileRfDevice, NetRfDevice, Radio,
                                           RfDevice, register_device,
                                           rf_open)


class TestRegistry:
    def test_open_by_name_and_unknown(self):
        with pytest.raises(ValueError, match="unknown rf device"):
            rf_open("does_not_exist")

    def test_auto_probe_falls_through(self, tmp_path):
        # no args match file/net requirements -> a plugin that always
        # opens wins the probe
        class AlwaysOpens(RfDevice):
            name = "zztest"

            def __init__(self, args=""):
                super().__init__()

            def recv_with_time(self, n):
                return np.zeros(n, np.complex64), 0

            def send_timed(self, s, t):
                pass

        register_device(AlwaysOpens)
        dev = rf_open(None, "")
        assert isinstance(dev, RfDevice)

    def test_vtable_setters(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"")
        dev = rf_open("file", f"tx={p}")
        assert dev.set_rx_srate(11.52e6) == 11.52e6
        assert dev.set_rx_gain(40.0) == 40.0
        dev.start_rx_stream()
        assert dev.streaming
        dev.close()


class TestFileDevice:
    def test_loopback_with_timestamps(self, tmp_path):
        p = str(tmp_path / "iq.bin")
        tx = FileRfDevice(f"tx={p}")
        burst = (np.arange(100) + 1j * np.arange(100)).astype(np.complex64)
        tx.send_timed(burst, timestamp=None)
        # timed TX with a gap: device zero-fills to stay sample-accurate
        tx.send_timed(burst, timestamp=250)
        tx.close()

        rx = FileRfDevice(f"rx={p}")
        got, ts0 = rx.recv_with_time(100)
        assert ts0 == 0
        np.testing.assert_array_equal(got, burst)
        gap, ts1 = rx.recv_with_time(150)
        assert ts1 == 100
        assert np.all(gap == 0)
        got2, ts2 = rx.recv_with_time(100)
        assert ts2 == 250
        np.testing.assert_array_equal(got2, burst)

    def test_rx_loops_at_eof(self, tmp_path):
        p = str(tmp_path / "iq.bin")
        tx = FileRfDevice(f"tx={p}")
        tx.send_timed(np.ones(64, np.complex64), None)
        tx.close()
        rx = FileRfDevice(f"rx={p}")
        got, _ = rx.recv_with_time(100)
        assert len(got) == 100 and np.all(got == 1)


class TestNetDevice:
    def test_udp_stream(self):
        rx = NetRfDevice("rx_port=23456")
        tx = NetRfDevice("tx_addr=127.0.0.1,tx_port=23456")
        burst = (np.arange(256) - 1j).astype(np.complex64)
        tx.send_timed(burst, None)
        got, ts = rx.recv_with_time(256)
        np.testing.assert_array_equal(got, burst)
        assert ts == 0
        rx.close()
        tx.close()


class TestRadio:
    def test_earfcn_tuning_and_tx_advance(self, tmp_path):
        p = str(tmp_path / "iq.bin")
        radio = Radio(FileRfDevice(f"tx={p}"), tx_advance_samples=10)
        radio.set_tx_srate(1.92e6)
        # band 7: dl_earfcn 3400 -> 2.685 GHz, ul 2.565 GHz
        radio.dev.set_rx_freq(0)
        radio.set_tx_freq_earfcn(3400)
        assert abs(radio.dev.tx_freq - 2.565e9) < 1e6
        radio.tx(np.ones(50, np.complex64), timestamp=100)
        assert not radio.is_start_of_burst
        radio.tx_end()
        assert radio.is_start_of_burst
        radio.close()
        rx = FileRfDevice(f"rx={p}")
        got, _ = rx.recv_with_time(90)
        # tx advance pulled the burst 10 samples early (90 zeros first)
        assert np.all(got == 0)
        got2, _ = rx.recv_with_time(50)
        assert np.all(got2 == 1)


class TestAgcLoop:
    def test_gain_converges_to_target(self):
        """srslte_agc_process loop (agc.c:188-196): the exponential
        update drives the output level to the target within a few
        frames, from both directions."""
        from empower_srslte_tpu.ops.agc import Agc

        rng = np.random.default_rng(0)
        for amp in (0.01, 5.0):                 # weak and strong inputs
            agc = Agc(target=1.0, bandwidth=0.7)
            level = None
            for _ in range(50):
                x = amp * (rng.normal(size=1024)
                           + 1j * rng.normal(size=1024)) / np.sqrt(2)
                y = agc.process(x)
                level = np.sqrt(np.mean(np.abs(y) ** 2))
            assert abs(level - 1.0) < 0.15, (amp, level)
            assert abs(agc.output_level() - 1.0) < 0.15

    def test_hardware_gain_callback(self):
        """agc.c:126 set_gain_callback: the AGC asks the radio for gain
        in dB (clamped to [min,max]) instead of scaling in software."""
        from empower_srslte_tpu.ops.agc import Agc

        asked = []

        def radio_gain(db):
            asked.append(db)
            return float(np.clip(db, 0.0, 30.0))  # radio's own range

        rng = np.random.default_rng(1)
        agc = Agc(target=1.0, bandwidth=0.7, set_gain_callback=radio_gain,
                  min_gain_db=-30, max_gain_db=30)
        x = 0.01 * (rng.normal(size=512) + 1j * rng.normal(size=512))
        for _ in range(10):
            y = agc.process(x)
        assert asked, "callback never invoked"
        # weak input -> the loop asks for increasing gain
        assert asked[-1] > asked[0]
        # software path untouched when the radio owns the gain
        assert np.array_equal(y, x)

    def test_lock_freezes_gain(self):
        from empower_srslte_tpu.ops.agc import Agc

        agc = Agc(target=1.0)
        agc.process(np.ones(64, np.complex64) * 0.1)
        g = agc.gain
        agc.set_lock(True)
        agc.process(np.ones(64, np.complex64) * 7.0)
        assert agc.gain == g
