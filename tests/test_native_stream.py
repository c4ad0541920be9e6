"""Native C++ ring-buffer streaming tests (runtime/stream.py + native/)."""

import time

import numpy as np
import pytest

from empower_srslte_tpu.runtime.stream import SampleStream, load_native

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="no native toolchain")


def test_push_read_roundtrip(rng):
    data = (rng.normal(size=20000) + 1j * rng.normal(size=20000)).astype(np.complex64)
    with SampleStream(1 << 15) as s:
        s.push(data)
        out, ts = s.read(20000)
        assert ts == 0
        assert np.array_equal(out, data)


def test_timestamps_monotonic(rng):
    data = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(np.complex64)
    with SampleStream(1 << 14) as s:
        s.push(data)
        _, t0 = s.read(1000)
        _, t1 = s.read(1000)
        assert (t0, t1) == (0, 1000)


def test_overflow_counted(rng):
    small = SampleStream(1 << 10)  # 1024 samples
    data = np.ones(5000, np.complex64)
    small.push(data)
    assert small.overflows > 0
    small.close()


def test_file_producer(tmp_path, rng):
    data = (rng.normal(size=30000) + 1j * rng.normal(size=30000)).astype(np.complex64)
    p = tmp_path / "iq.bin"
    data.tofile(p)
    with SampleStream(1 << 16) as s:
        s.start_file(str(p))
        out, _ = s.read(30000, timeout_ms=3000)
        assert np.array_equal(out, data)


def test_udp_producer(rng):
    from empower_srslte_tpu.runtime.io import NetSink

    data = (rng.normal(size=8192) + 1j * rng.normal(size=8192)).astype(np.complex64)
    with SampleStream(1 << 15) as s:
        port = s.start_udp("127.0.0.1", 0)
        sink = NetSink("127.0.0.1", port)
        sink.write(data)
        time.sleep(0.3)
        out, _ = s.read(8192, timeout_ms=2000)
        assert np.array_equal(out, data)
        sink.close()
