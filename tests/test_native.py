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


def test_readinto_oserror_propagates(monkeypatch):
    """A mid-read OSError from the native loop PROPAGATES: the C read
    may already have consumed part of a frame, and silently restarting
    the Python fallback from the current pipe offset would shift every
    later frame boundary (silent corruption)."""

    class FakeMod:
        @staticmethod
        def readinto_exact(fd, buf):
            raise OSError(5, "injected I/O error")

    monkeypatch.setattr(native, "get", lambda: FakeMod)
    r, w = os.pipe()
    try:
        with os.fdopen(r, "rb", buffering=0) as f:
            with pytest.raises(OSError, match="injected"):
                native.readinto_exact(f, memoryview(bytearray(4)))
    finally:
        os.close(w)


def test_readinto_no_fd_falls_back(monkeypatch):
    """File-likes without a real fd (BytesIO) use the Python loop."""
    import io

    class FakeMod:
        @staticmethod
        def readinto_exact(fd, buf):  # pragma: no cover
            raise AssertionError("native path must not be used")

    monkeypatch.setattr(native, "get", lambda: FakeMod)
    buf = bytearray(3)
    got = native.readinto_exact(io.BytesIO(b"xyz"), memoryview(buf))
    assert got == 3 and bytes(buf) == b"xyz"


def test_corrupt_cached_so_recovers(tmp_path, monkeypatch):
    """A corrupt cached .so (interrupted/raced build) is deleted on the
    failed load so a later run rebuilds, instead of permanently
    disabling the native path. The corrupt file is planted WITHOUT ever
    loading a good copy from that inode first (dlopen over an
    in-process-mapped overwritten file is a SIGBUS, which a fresh
    process — the real resume scenario — never does)."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    path = native._build()  # compile only, no load
    if path is None:
        pytest.skip("no C compiler available on this host")
    path.write_bytes(b"not an ELF")  # simulate a raced/interrupted build
    monkeypatch.setattr(native, "_mod", None)
    monkeypatch.setattr(native, "_tried", False)
    assert native.get() is None  # corrupt load fails this process...
    assert not path.exists()  # ...but drops the bad file
    monkeypatch.setattr(native, "_mod", None)
    monkeypatch.setattr(native, "_tried", False)
    assert native.get() is not None  # next run rebuilds cleanly


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
