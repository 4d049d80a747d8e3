"""Reference-compatible API shim: signatures and behavior."""

import numpy as np
import pytest

from pythoncrt_tpu import compat, oracle
from pythoncrt_tpu.params import EffectParams


def test_mask_builders_match_oracle():
    np.testing.assert_array_equal(
        compat.make_triad_mask(4, 9, 0.4, 0.5), oracle.triad_mask(4, 9, 0.4, 0.5)
    )
    np.testing.assert_array_equal(
        compat.make_vignette(8, 8, 0.3), oracle.vignette_mask(8, 8, 0.3)
    )
    np.testing.assert_array_equal(
        compat.make_scanline_mask_dynamic(16, 0.5, 2.0, 1.0),
        oracle.scanline_mask_1d(16, 0.5, 2.0, 1.0),
    )


def test_shift_channel_semantics(rng):
    a = rng.random((4, 6), dtype=np.float32)
    assert compat.shift_channel(a, 0, 0) is a
    np.testing.assert_array_equal(
        compat.shift_channel(a, 2, 1), np.roll(np.roll(a, 1, 0), 2, 1)
    )


def test_apply_static_effects_reference_signature(frames_small):
    """Positional call exactly as the reference makes it
    (crt_filter.py:1045-1078)."""
    h, w = 48, 64
    triad = compat.make_triad_mask(h, w, 0.35, 0.5)
    vig = compat.make_vignette(h, w, 0.25)
    out = compat.apply_static_effects(
        frames_small[0],
        0.6,          # scanline_strength
        triad,
        2.2, False,   # triad gamma / preserve luma
        1,            # aberration
        1.2, 0.25, 0.0,  # bloom sigma/strength/threshold
        0.0,          # noise (off -> deterministic compare below)
        vig,
        2.0, 5.0,     # scanline period/phase
        True, 2,      # fast_bloom, pixel_size
        0, 0.0,       # glitch
        time_sec=0.5,
    )
    assert out.dtype == np.float32 and out.shape == frames_small[0].shape
    # equals the oracle with the same params and explicit masks
    p = EffectParams(
        scanline_strength=0.6, triad_strength=0.0, triad_gamma=2.2,
        aberration_px=1, bloom_sigma=1.2, bloom_strength=0.25,
        noise_strength=0.0, vignette_strength=0.0, fast_bloom=True,
        pixel_size=2, scanline_period_px=2.0,
    )
    want = oracle.apply_effects(
        frames_small[0], p, phase_px=5.0, time_sec=0.5, triad=triad, vignette=vig
    )
    np.testing.assert_array_equal(out, want)


def test_apply_crt_effect_stateful(frames_small):
    triad = None
    out1, state1 = compat.apply_crt_effect(
        frames_small[0], 0.5, triad, 2.2, False, 0,
        0.0, 0.0, 0.0, 0.0, None,
        0.6,   # persistence
        None,  # state_prev
        2.0, 0.0, False, 1,
    )
    assert out1.dtype == np.uint8
    out2, state2 = compat.apply_crt_effect(
        frames_small[1], 0.5, triad, 2.2, False, 0,
        0.0, 0.0, 0.0, 0.0, None,
        0.6, state1, 2.0, 0.0, False, 1,
    )
    # persistence pulls frame 2 toward frame 1's state
    plain, _ = compat.apply_crt_effect(
        frames_small[1], 0.5, triad, 2.2, False, 0,
        0.0, 0.0, 0.0, 0.0, None,
        0.0, None, 2.0, 0.0, False, 1,
    )
    d_blend = np.abs(out2.astype(int) - oracle.ops.to_uint8(state1).astype(int)).mean()
    d_plain = np.abs(plain.astype(int) - oracle.ops.to_uint8(state1).astype(int)).mean()
    assert d_blend < d_plain


def test_persistence_state_resize_on_mismatch(rng):
    """A mismatched previous state is bilinearly resized and blended, not
    dropped (crt_filter.py:689-693) — e.g. preview resolution changed
    mid-stream."""
    import cv2

    prev = rng.random((12, 16, 3), dtype=np.float32)
    cur = rng.random((24, 32, 3), dtype=np.float32)
    got = oracle.persistence_blend(prev, cur, 0.6)
    prev_rs = cv2.resize(prev, (32, 24), interpolation=cv2.INTER_LINEAR)
    want = np.clip(np.float32(0.6) * prev_rs + np.float32(0.4) * cur, 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # and through the reference-signature preview API
    out, state = compat.apply_crt_effect(
        (cur * 255).astype(np.uint8), 0.5, None, 2.2, False, 0,
        0.0, 0.0, 0.0, 0.0, None,
        0.6, prev, 2.0, 0.0, False, 1,
    )
    assert state.shape == cur.shape and out.dtype == np.uint8


def test_barrel_warp_matches_oracle(rng):
    img = rng.random((24, 32, 3), dtype=np.float32)
    got = compat.apply_barrel_warp(img, 0.4)
    map_x, map_y = oracle.barrel_warp_maps(24, 32, 0.4)
    np.testing.assert_array_equal(got, oracle.ops.remap_bilinear_const0(img, map_x, map_y))
    assert compat.apply_barrel_warp(img, 0.0) is img


def test_process_video_reference_signature(tmp_path):
    import cv2

    from conftest import synth_frames
    from test_pipeline import write_clip

    src = write_clip(tmp_path / "in.mp4", synth_frames(6, 32, 48, seed=4))
    used_gpu = compat.process_video(
        src, tmp_path / "out.mp4",
        width=None, height=None,
        scanline_strength=0.6, triad_strength=0.35, triad_gamma=2.2,
        triad_preserve_luma=False, triad_softness=0.5, aberration_px=1,
        bloom_sigma=1.2, bloom_strength=0.25, noise_strength=1.5,
        vignette_strength=0.25, persistence=0.2, fps=None, crf=18,
        target_bitrate_kbps=0, scanline_speed_px_s=30.0,
        scanline_period_px=2.0, fast_bloom=True, pixel_size=2,
        gpu=False, nvenc_preset="p4",
    )
    assert used_gpu is False
    cap = cv2.VideoCapture(str(tmp_path / "out.mp4"))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()
