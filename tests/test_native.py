"""Native host-I/O extension: build, pipe reads, YUV conversion."""

import os

import numpy as np
import pytest

from pythoncrt_tpu import native


def test_extension_builds():
    mod = native.get()
    if mod is None:
        pytest.skip("no C compiler available on this host")
    assert hasattr(mod, "readinto_exact")
    assert hasattr(mod, "yuv420p_to_rgb24")


def test_readinto_exact_pipe():
    import threading

    r, w = os.pipe()
    payload = os.urandom(1 << 16)

    def writer():
        for i in range(0, len(payload), 4096):
            os.write(w, payload[i:i + 4096])
        os.close(w)

    t = threading.Thread(target=writer)
    t.start()
    buf = bytearray(len(payload))
    with os.fdopen(r, "rb", buffering=0) as f:
        got = native.readinto_exact(f, memoryview(buf))
    t.join()
    assert got == len(payload)
    assert bytes(buf) == payload


def test_readinto_exact_short_read_eof():
    r, w = os.pipe()
    os.write(w, b"abc")
    os.close(w)
    buf = bytearray(10)
    with os.fdopen(r, "rb", buffering=0) as f:
        got = native.readinto_exact(f, memoryview(buf))
    assert got == 3
    assert bytes(buf[:3]) == b"abc"


def _yuv_ref(src, w, h):
    a = np.frombuffer(src, np.uint8)
    yp = a[: w * h].reshape(h, w).astype(np.int64)
    up = a[w * h: w * h + w * h // 4].reshape(h // 2, w // 2).astype(np.int64)
    vp = a[w * h + w * h // 4:].reshape(h // 2, w // 2).astype(np.int64)
    u = up.repeat(2, 0).repeat(2, 1) - 128
    v = vp.repeat(2, 0).repeat(2, 1) - 128
    c = 298 * (yp - 16)
    out = np.stack(
        [
            np.clip((c + 409 * v + 128) >> 8, 0, 255),
            np.clip((c - 100 * u - 208 * v + 128) >> 8, 0, 255),
            np.clip((c + 516 * u + 128) >> 8, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    return out


def test_yuv420p_to_rgb24_matches_reference(rng):
    w, h = 64, 48
    src = rng.integers(0, 256, w * h * 3 // 2, dtype=np.uint8).tobytes()
    got = native.yuv420p_to_rgb24(src, w, h)
    np.testing.assert_array_equal(got, _yuv_ref(src, w, h))


def test_yuv_python_fallback_matches_native(rng, monkeypatch):
    if native.get() is None:
        pytest.skip("no native module to compare against")
    w, h = 32, 16
    src = rng.integers(0, 256, w * h * 3 // 2, dtype=np.uint8).tobytes()
    native_out = native.yuv420p_to_rgb24(src, w, h)
    monkeypatch.setattr(native, "_mod", None)
    monkeypatch.setattr(native, "_tried", True)
    fallback_out = native.yuv420p_to_rgb24(src, w, h)
    np.testing.assert_array_equal(native_out, fallback_out)


def test_yuv_rejects_bad_sizes():
    if native.get() is None:
        pytest.skip("no native module")
    with pytest.raises(ValueError):
        native.get().yuv420p_to_rgb24(b"xx", memoryview(bytearray(12)), 2, 2)
