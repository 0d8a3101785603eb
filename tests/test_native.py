"""Native ingest library (csrc/ingest.cpp) vs the numpy reference path.

The capture format is the reference's packed uint16 (256*Q + I,
normalized v/127.5 - (1+1j), src/gpsrecv.py:168-172); the native unpack
must be bit-identical to the numpy fallback."""

import numpy as np
import pytest

native = pytest.importorskip("gps_sdr_tpu.runtime._native")

from gps_sdr_tpu.runtime import sources  # noqa: E402
from gps_sdr_tpu.runtime.buffer import make_buffer  # noqa: E402


def _numpy_unpack(words):
    # correctly-rounded reference: double math, single rounding to f32
    im, re = np.divmod(words, 256)
    return (np.float32(re / 127.5 - 1.0)
            + 1j * np.float32(im / 127.5 - 1.0)).astype(np.complex64)


def test_unpack_matches_numpy():
    rng = np.random.default_rng(0)
    words = rng.integers(0, 65536, size=10000, dtype=np.uint16)
    np.testing.assert_array_equal(native.unpack_iq(words),
                                  _numpy_unpack(words))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    words = rng.integers(0, 65536, size=4096, dtype=np.uint16)
    iq = _numpy_unpack(words)
    np.testing.assert_array_equal(native.pack_iq(iq), words)
    # and against the numpy pack
    np.testing.assert_array_equal(native.pack_iq(iq), sources.pack_iq(iq))


def test_unpack_file(tmp_path):
    rng = np.random.default_rng(2)
    words = rng.integers(0, 65536, size=8192, dtype=np.uint16)
    path = tmp_path / "cap.bin"
    words.tofile(path)
    blk = native.unpack_iq_file(str(path), 1024, 2048)
    np.testing.assert_array_equal(blk, _numpy_unpack(words[1024:3072]))
    assert native.unpack_iq_file(str(path), 8000, 2048) is None  # short


def test_native_ring_drop_oldest():
    ring = native.NativeRing(capacity=4, block_samples=8)
    mk = lambda v: np.full(8, v + 0j, np.complex64)
    for v in range(6):          # overflow at v=4: clears 4, drops 4
        ring.push(mk(v))
    assert len(ring) == 2       # blocks 4, 5 remain
    blk, skipped = ring.pop()
    assert skipped == 4
    np.testing.assert_array_equal(blk, mk(4))
    blk, skipped = ring.pop()
    assert skipped == 0
    np.testing.assert_array_equal(blk, mk(5))
    assert ring.pop() is None
    ring.close()


def test_native_ring_concurrent_overflow():
    """Producer overruns a tiny ring while a consumer drains it.

    Pins the CAS-based drop-oldest fix: every delivered block must be
    internally consistent (never torn), delivered + skipped must account
    for every push, and sequence numbers must be strictly increasing."""
    import threading

    n_push, cap, blk = 3000, 4, 64
    ring = native.NativeRing(capacity=cap, block_samples=blk)
    blocks = [np.full(blk, v + 0j, np.complex64) for v in range(n_push)]

    def produce():
        for b in blocks:
            ring.push(b)

    got, skips = [], 0
    t = threading.Thread(target=produce)
    t.start()
    done = False
    while not done:
        done = not t.is_alive()
        while True:                      # drain (again after join: no race)
            r = ring.pop()
            if r is None:
                break
            b, s = r
            vals = np.unique(b.real)
            assert vals.size == 1, f"torn block: {vals}"
            got.append(int(vals[0]))
            skips += s
    t.join()
    assert len(got) + skips == n_push
    assert got == sorted(got) and len(set(got)) == len(got)
    assert got[-1] == n_push - 1         # newest block always survives
    ring.close()


def test_make_buffer_prefers_native():
    buf = make_buffer(4, block_samples=16)
    assert type(buf).__name__ == "_RingAdapter"
    b = np.arange(16, dtype=np.complex64)
    buf.push(b)
    out, skipped = buf.pull()
    np.testing.assert_array_equal(out, b)
    assert skipped == 0
