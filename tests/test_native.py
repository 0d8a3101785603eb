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


def test_navscan_native_matches_python(monkeypatch):
    """The native subframe scanner (csrc/navscan.cpp) must reproduce
    the Python walk exactly — decoded dicts, ST anchors, and the
    buffer-trim position — on buffers with noise prefixes, inverted
    streams, parity-corrupted subframes, and false preambles."""
    pytest.importorskip("gps_sdr_tpu.models._navscan")
    import numpy as np

    from gps_sdr_tpu.models import navmsg

    rng = np.random.default_rng(7)

    def build_stream(flip_prob, invert, corrupt_every):
        chunks = [((rng.integers(0, 2, rng.integers(5, 60)) * 2 - 1)
                   .astype(np.int8))]           # noise prefix
        for k in range(4):
            sub = navmsg.encode_subframe(
                1 if k % 2 == 0 else 3, {}, tow=1000 + 6 * k)
            pm = (2 * sub - 1).astype(np.int8)
            if corrupt_every and k % corrupt_every == 1:
                pm[17] = -pm[17]                # parity break
            chunks.append(pm)
        bits = np.concatenate(chunks)
        if invert:
            bits = (-bits).astype(np.int8)
        flips = rng.random(bits.shape[0]) < flip_prob
        bits = np.where(flips, -bits, bits).astype(np.int8)
        return bits

    def scan(bits, native):
        nd = navmsg.NavDecoder(ngps=65536)
        nd.bits = bits.copy()
        nd.bits_st = np.arange(bits.shape[0], dtype=np.int64) * 1313
        with monkeypatch.context() as m:
            m.setenv("GSDR_NAVSCAN", "1" if native else "0")
            out = nd._scan_buffer()
        return out, nd.bits.copy(), nd.bits_st.copy()

    n_decoded = 0
    for case in range(12):
        bits = build_stream(flip_prob=[0.0, 0.0, 0.002][case % 3],
                            invert=case % 2 == 1,
                            corrupt_every=[0, 2][case % 2])
        got_n, bits_n, st_n = scan(bits, True)
        got_p, bits_p, st_p = scan(bits, False)
        assert got_n == got_p, f"case {case}: dict mismatch"
        np.testing.assert_array_equal(bits_n, bits_p)
        np.testing.assert_array_equal(st_n, st_p)
        n_decoded += len(got_n)
    assert n_decoded >= 20      # the cases actually decoded subframes
