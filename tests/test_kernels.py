"""Pallas kernel correctness vs the oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from pythoncrt_tpu import oracle
from pythoncrt_tpu.kernels import warp as kwarp

H, W = 32, 256  # kernel needs H%8==0, W%128==0


@pytest.mark.parametrize("strength", [0.15, 0.5, 1.0, -0.5])
def test_warp_kernel_matches_oracle(strength, rng):
    imgs = rng.random((2, H, W, 3), dtype=np.float32)
    tables = kwarp.build_warp_tables(H, W, strength)
    got = np.asarray(kwarp.warp_nhwc(imgs, tables, interpret=True))
    map_x, map_y = oracle.barrel_warp_maps(H, W, strength)
    for b in range(2):
        want = oracle.ops.remap_bilinear_const0(imgs[b], map_x, map_y)
        # 3-pass bf16 split drops the lo*lo term: bound ~2*2^-18
        # (~7.6e-6), 500x below the 1-LSB budget of 3.9e-3
        err = np.abs(got[b] - want).max()
        assert err < 2e-5, f"strength={strength} err={err}"


def test_warp_tables_reject_bad_shapes():
    with pytest.raises(ValueError):
        kwarp.build_warp_tables(30, 256, 0.2)
    with pytest.raises(ValueError):
        kwarp.build_warp_tables(32, 200, 0.2)


def test_warp_zero_strength_identityish(rng):
    imgs = rng.random((1, H, W, 3), dtype=np.float32)
    tables = kwarp.build_warp_tables(H, W, 0.0)
    got = np.asarray(kwarp.warp_nhwc(imgs, tables, interpret=True))
    np.testing.assert_allclose(got[0], imgs[0], atol=2e-5)


class TestGlitchKernel:
    def test_shear_matches_take_along_axis(self, rng):
        from pythoncrt_tpu.kernels import glitch as kglitch

        B, H, W, L = 2, 48, 256, 16
        imgs = rng.random((B, H, W, 3), dtype=np.float32)
        y0 = 20  # 28 rows -> pads to 32
        rows = H - y0
        seg_offs = rng.normal(0, 5, (B, rows, W // L)).astype(np.float32)
        got = np.asarray(
            kglitch.shear_band_batched(imgs, y0, seg_offs, L, interpret=True)
        )
        seg_index = np.arange(W) // L
        for b in range(B):
            per_px = seg_offs[b][:, seg_index]
            want = oracle.apply_glitch_gather(imgs[b], y0, per_px)
            # 2-term bf16 value split: bound ~2^-17, 160x below 1 LSB
            np.testing.assert_allclose(got[b], want, atol=1e-5)

    def test_shear_per_row_offsets(self, rng):
        from pythoncrt_tpu.kernels import glitch as kglitch

        B, H, W = 1, 32, 128
        imgs = rng.random((B, H, W, 3), dtype=np.float32)
        y0 = 8
        offs = rng.normal(0, 200, (B, H - y0, 1)).astype(np.float32)  # big -> wraps
        got = np.asarray(kglitch.shear_band_batched(imgs, y0, offs, W, interpret=True))
        want = oracle.apply_glitch_gather(imgs[0], y0, offs[0, :, 0])
        np.testing.assert_allclose(got[0], want, atol=1e-5)

    def test_rows_above_band_untouched(self, rng):
        from pythoncrt_tpu.kernels import glitch as kglitch

        B, H, W, L = 1, 32, 128, 8
        imgs = rng.random((B, H, W, 3), dtype=np.float32)
        y0 = 13  # 19 rows -> pad 5 identity rows
        offs = rng.normal(0, 3, (B, H - y0, W // L)).astype(np.float32)
        got = np.asarray(kglitch.shear_band_batched(imgs, y0, offs, L, interpret=True))
        np.testing.assert_array_equal(got[0, :y0], imgs[0, :y0])
