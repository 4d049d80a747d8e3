"""Oracle self-tests: primitives vs OpenCV (when available) and the
reference's published math (SURVEY.md §3.3 / §2).

The oracle is the framework's declared ground truth; the cv2
cross-checks pin it to the upstream reference's actual binary behavior
within small tolerances.
"""

import numpy as np
import pytest

from pythoncrt_tpu import EffectParams
from pythoncrt_tpu import oracle
from pythoncrt_tpu.oracle import ops

cv2 = pytest.importorskip("cv2", reason="cv2 cross-checks need OpenCV")


class TestResize:
    def test_nearest_matches_cv2(self, rng):
        img = rng.random((37, 53, 3), dtype=np.float32)
        for oh, ow in [(18, 26), (74, 106), (37, 53), (7, 9)]:
            ours = ops.resize_nearest(img, oh, ow)
            ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_NEAREST)
            np.testing.assert_array_equal(ours, ref)

    def test_bilinear_matches_cv2(self, rng):
        img = rng.random((40, 64, 3), dtype=np.float32)
        for oh, ow in [(20, 32), (80, 128), (13, 100)]:
            ours = ops.resize_bilinear(img, oh, ow)
            ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
            assert np.max(np.abs(ours - ref)) < 2e-6

    def test_bilinear_upsample_matches_cv2(self, rng):
        # grain upsample path: tiny -> large
        img = rng.standard_normal((5, 8), dtype=np.float32)
        ours = ops.resize_bilinear(img, 48, 64)
        ref = cv2.resize(img, (64, 48), interpolation=cv2.INTER_LINEAR)
        assert np.max(np.abs(ours - ref)) < 2e-6


class TestBlur:
    @pytest.mark.parametrize("sigma", [0.5, 1.2, 2.0, 4.0])
    def test_gaussian_matches_cv2(self, rng, sigma):
        img = rng.random((32, 48, 3), dtype=np.float32)
        k = max(1, int(round(sigma * 3)) * 2 + 1)
        ours = ops.gaussian_blur_replicate(img, k, k, sigma, sigma)
        ref = cv2.GaussianBlur(img, (k, k), sigmaX=sigma, sigmaY=sigma,
                               borderType=cv2.BORDER_REPLICATE)
        assert np.max(np.abs(ours - ref)) < 2e-6

    def test_horizontal_only_matches_cv2(self, rng):
        # triad softness path: (k, 1) kernel
        img = rng.random((16, 48, 3), dtype=np.float32)
        s = 0.5
        k = max(3, int(round(s * 3)) * 2 + 1)
        ours = ops.gaussian_blur_replicate(img, k, 1, s, 0.0)
        ref = cv2.GaussianBlur(img, (k, 1), sigmaX=s, sigmaY=0,
                               borderType=cv2.BORDER_REPLICATE)
        assert np.max(np.abs(ours - ref)) < 2e-6


class TestRemap:
    @pytest.mark.parametrize("strength", [0.3, -0.3, 1.0])
    def test_barrel_warp_matches_cv2(self, rng, strength):
        img = rng.random((36, 60, 3), dtype=np.float32)
        map_x, map_y = oracle.barrel_warp_maps(36, 60, strength)
        ours = ops.remap_bilinear_const0(img, map_x, map_y)
        ref = cv2.remap(img, map_x, map_y, interpolation=cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        assert np.max(np.abs(ours - ref)) < 2e-6

    def test_to_uint8_matches_convert_scale_abs(self, rng):
        img = rng.random((16, 16, 3), dtype=np.float32)
        ours = ops.to_uint8(img)
        ref = cv2.convertScaleAbs(img, alpha=255.0, beta=0)
        np.testing.assert_array_equal(ours, ref)


class TestMasks:
    def test_scanline_1d_values(self):
        m = oracle.scanline_mask_1d(8, 0.6, 2.0, 0.0)
        y = np.arange(8, dtype=np.float32)
        expect = 1.0 - 0.6 * 0.5 * (1.0 + np.sin((2.0 * np.pi / 2.0) * y))
        np.testing.assert_allclose(m, expect.astype(np.float32), rtol=1e-6)

    def test_scanline_2d_flat_matches_1d_shape(self):
        m2 = oracle.scanline_mask_2d(16, 24, 0.5, 3.0, 1.5, 0.0, 1.0)
        m1 = oracle.scanline_mask_1d(16, 0.5, 3.0, 1.5)
        np.testing.assert_allclose(m2, np.broadcast_to(m1[:, None], (16, 24)), atol=1e-6)

    def test_scanline_zero_strength_is_ones(self):
        np.testing.assert_array_equal(oracle.scanline_mask_2d(4, 4, 0.0, 2.0, 0.0, 10.0, 2.0),
                                      np.ones((4, 4), np.float32))

    def test_triad_mask_columns(self):
        m = oracle.triad_mask(2, 9, 0.4, softness_px=0.0)
        assert m.shape == (2, 9, 3)
        for c in range(3):
            bright = m[0, np.arange(9) % 3 == c, c]
            dim = m[0, np.arange(9) % 3 != c, c]
            np.testing.assert_allclose(bright, 1.0)
            np.testing.assert_allclose(dim, 0.6, rtol=1e-6)

    def test_triad_softness_preserves_row_mean(self):
        m = oracle.triad_mask(4, 90, 0.5, softness_px=1.5)
        # blur is normalized: interior mean per channel unchanged
        np.testing.assert_allclose(m[:, 10:-10, :].mean(), (1 - 0.5) + 0.5 / 3, atol=1e-3)

    def test_vignette_center_and_corner(self):
        v = oracle.vignette_mask(31, 41, 0.3)
        assert v[15, 20] == pytest.approx(1.0, abs=1e-3)
        assert v[0, 0] == pytest.approx(1.0 - 0.3 * min(1.0, ((0 - 20) / 20.5) ** 2 + ((0 - 15) / 15.5) ** 2), abs=1e-5)

    def test_vignette_clip_r2(self):
        v = oracle.vignette_mask(11, 11, 1.0)
        assert v.min() >= 0.0  # r^2 clipped at 1


class TestColorAdjust:
    def test_identity_passthrough(self, rng):
        img = rng.random((8, 8, 3), dtype=np.float32)
        out = oracle.apply_color_adjustments(img, 0.0, 1.0, 1.0, 1.0, 0.0)
        np.testing.assert_array_equal(out, img)

    def test_saturation_zero_is_luma(self, rng):
        img = rng.random((8, 8, 3), dtype=np.float32)
        out = oracle.apply_color_adjustments(img, 0.0, 1.0, 1.0, 0.0, 0.0)
        luma = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
        for c in range(3):
            np.testing.assert_allclose(out[..., c], np.clip(luma, 0, 1), atol=1e-6)

    def test_temperature_gains(self):
        img = np.full((2, 2, 3), 0.5, np.float32)
        out = oracle.apply_color_adjustments(img, 0.0, 1.0, 1.0, 1.0, 0.5)
        np.testing.assert_allclose(out[..., 0], 0.5 * 1.25, rtol=1e-6)
        np.testing.assert_allclose(out[..., 1], 0.5)
        np.testing.assert_allclose(out[..., 2], 0.5 * 0.75, rtol=1e-6)

    def test_brightness_contrast(self):
        img = np.full((1, 1, 3), 0.25, np.float32)
        out = oracle.apply_color_adjustments(img, 0.1, 2.0, 1.0, 1.0, 0.0)
        np.testing.assert_allclose(out, (0.25 - 0.5) * 2 + 0.5 + 0.1, rtol=1e-6)


class TestTriadApply:
    def test_fast_path_gamma_one(self, rng):
        img = rng.random((4, 9, 3), dtype=np.float32)
        mask = oracle.triad_mask(4, 9, 0.3)
        out = oracle.apply_triad(img, mask, gamma=1.0, preserve_luma=False)
        np.testing.assert_allclose(out, np.clip(img * mask, 0, 1))

    def test_lut_quantization_observable(self):
        # values inside the same LUT bin map to the same output
        img = np.full((1, 3, 3), 0.5001, np.float32)
        img2 = np.full((1, 3, 3), 0.5004, np.float32)  # same 1024-bin
        mask = oracle.triad_mask(1, 3, 0.5)
        a = oracle.apply_triad(img, mask, 2.2, False)
        b = oracle.apply_triad(img2, mask, 2.2, False)
        np.testing.assert_array_equal(a, b)

    def test_preserve_luma_ratio(self, rng):
        img = rng.random((8, 9, 3), dtype=np.float32) * 0.8 + 0.1
        mask = oracle.triad_mask(8, 9, 0.6)
        out_p = oracle.apply_triad(img, mask, 2.2, True)
        out_n = oracle.apply_triad(img, mask, 2.2, False)
        luma = lambda x: (0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]).mean()
        # preserve_luma keeps mean luma closer to input than the plain path
        assert abs(luma(out_p) - luma(img ** 2.2) ** (1 / 2.2)) < abs(luma(out_n) - luma(img))


class TestGlitch:
    def test_export_fields_deterministic(self):
        b1, s1, l1 = oracle.glitch_fields_export(64, 120, 10.0, 5, 0.5)
        b2, s2, l2 = oracle.glitch_fields_export(64, 120, 10.0, 5, 0.5)
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(s1, s2)
        assert l1 == l2 == max(8, min(32, 120 // 120))

    def test_export_seed_follows_reference_formula(self):
        # same int(|phase|*2) -> same fields even for different float phase
        b1, s1, _ = oracle.glitch_fields_export(32, 200, 5.1, 4, 0.4)
        b2, s2, _ = oracle.glitch_fields_export(32, 200, 5.3, 4, 0.4)
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(s1, s2)

    def test_gather_wraps_modulo(self):
        img = np.arange(12, dtype=np.float32).reshape(1, 4, 3).repeat(4, axis=0)
        offs = np.array([1.0, -1.0, 0.0, 2.0], np.float32)
        out = oracle.apply_glitch_gather(img, 0, offs)
        np.testing.assert_array_equal(out[0, 0], img[0, 1])
        np.testing.assert_array_equal(out[1, 0], img[1, 3])  # -1 wraps
        np.testing.assert_array_equal(out[2], img[2])

    def test_rows_band(self):
        assert oracle.glitch_rows(100, 0.25) == (75, 25)
        assert oracle.glitch_rows(100, 0.0) == (100, 0)
        assert oracle.glitch_rows(100, 1.0) == (0, 100)


class TestPersistence:
    def test_blend_formula(self, rng):
        prev = rng.random((4, 4, 3), dtype=np.float32)
        cur = rng.random((4, 4, 3), dtype=np.float32)
        out = oracle.persistence_blend(prev, cur, 0.3)
        np.testing.assert_allclose(out, np.float32(0.3) * prev + np.float32(0.7) * cur, atol=1e-7)

    def test_no_prev_passthrough(self, rng):
        cur = rng.random((4, 4, 3), dtype=np.float32)
        assert oracle.persistence_blend(None, cur, 0.5) is cur


class TestFullChain:
    def test_defaults_run_and_bounded(self, frames_small):
        p = EffectParams().clamped()
        noise = np.random.default_rng(0).standard_normal((48, 64), dtype=np.float32)
        out = oracle.apply_effects(frames_small[0], p, phase_px=1.0, noise_field=noise)
        assert out.shape == frames_small[0].shape
        assert out.dtype == np.float32
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_all_identity_params_is_passthrough(self, frames_small):
        p = EffectParams(
            scanline_strength=0.0, triad_strength=0.0, aberration_px=0,
            bloom_strength=0.0, noise_strength=0.0, vignette_strength=0.0,
            persistence=0.0, pixel_size=1, fast_bloom=False,
        )
        out = oracle.apply_effects(frames_small[0], p)
        np.testing.assert_array_equal(oracle.ops.to_uint8(out), frames_small[0])

    def test_preview_vs_export_glitch_differ(self, frames_small):
        p = EffectParams(glitch_amp_px=6, glitch_height_frac=0.5,
                         scanline_strength=0.0, triad_strength=0.0, aberration_px=0,
                         bloom_strength=0.0, noise_strength=0.0, vignette_strength=0.0,
                         pixel_size=1, fast_bloom=False)
        a = oracle.apply_effects(frames_small[3], p, phase_px=100.0, engine="export")
        b = oracle.apply_effects(frames_small[3], p, phase_px=100.0, engine="preview")
        assert not np.array_equal(a, b)
