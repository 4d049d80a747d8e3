"""Fused stripe-pipeline kernel (kernels/fused.py): the whole stage
1-11 chain in one Pallas pass, feeding the warp kernel planar. Every
config must match BOTH the per-stage engine path (bitwise in interpret
mode — identical op order, same XLA backend) and the CPU oracle
(<= 1 LSB, the BASELINE.json contract)."""

import os

import numpy as np
import pytest

from pythoncrt_tpu import CRTEngine, EffectParams

from conftest import synth_frames
from test_engine_vs_oracle import identity_params, render_oracle

H, W, B, FPS = 48, 256, 4, 24.0

FULL = dict(
    scanline_strength=0.6, triad_strength=0.35, triad_softness=0.5,
    aberration_px=1, bloom_sigma=1.2, bloom_strength=0.25,
    fast_bloom=False, noise_strength=1.5, vignette_strength=0.25,
    persistence=0.0, pixel_size=2, grain_size=2, warp_strength=0.15,
    flicker_strength=0.2, flicker_hz=2.0, brightness=0.02,
    contrast=1.05, gamma=1.1, saturation=0.9, temperature=0.1,
)

# name -> (overrides on identity params, expect fused, expect prologue)
CASES = {
    # the c3 headline shape: u8 prologue + blur + epilogue + planar warp
    "c3_full": (FULL, True, True),
    # pixelate size outside {1,2,4,8}: prologue ineligible, XLA pre runs
    "px3_pre_off": ({**FULL, "pixel_size": 3}, True, False),
    # no warp -> f32 emit, stage 12 never runs
    "no_warp": ({**FULL, "warp_strength": 0.0}, True, True),
    # glitch after warp: fused+warp emit, then NHWC glitch
    "with_glitch": ({**FULL, "glitch_amp_px": 4, "glitch_height_frac": 0.3,
                     "scanline_speed_px_s": 45.0}, True, True),
    # persistence after warp: same NHWC re-entry, then the scan
    "with_persistence": ({**FULL, "persistence": 0.5}, True, True),
    # luma-preserving triad + bloom knee
    "luma_knee": ({**FULL, "triad_preserve_luma": True,
                   "bloom_threshold": 0.3}, True, True),
    # gather-path grain upsample (grain_size outside the matmul gate)
    "grain3": ({**FULL, "grain_size": 3, "noise_strength": 12.0}, True, True),
    # bloom alone through the fused kernel (minimal epilogue)
    "bloom_only": (dict(bloom_strength=0.4, bloom_sigma=1.7,
                        fast_bloom=False), True, True),
    # aberration without pixelate (pure lane rolls in the prologue)
    "ab_only": (dict(aberration_px=2, bloom_strength=0.3, bloom_sigma=1.0,
                     vignette_strength=0.3), True, True),
    # triad mul-only early-out (gamma≈1, no luma): XLA keeps the stage
    "triad_g1": ({**FULL, "triad_gamma": 1.0}, False, True),
    # 2-D scanlines: outside the fused envelope
    "scan_2d": ({**FULL, "scanline_angle": 12.0,
                 "scanline_thickness": 2.0}, False, True),
    # the c4 temporal config: fast-bloom core + glitch + persistence
    "c4_fast": (dict(scanline_strength=0.6, triad_strength=0.35,
                     aberration_px=1, bloom_strength=0.25, fast_bloom=True,
                     noise_strength=1.5, vignette_strength=0.25,
                     persistence=0.6, pixel_size=1, glitch_amp_px=6,
                     glitch_height_frac=0.3, scanline_speed_px_s=120.0),
                True, True),
    # fast bloom alone with the knee
    "fast_knee": (dict(bloom_strength=0.5, fast_bloom=True,
                       bloom_threshold=0.35), True, True),
    # BLOOM OFF: the kernel still folds prologue+epilogue into one pass
    # (the c2-class retro stack: scanlines + triad + aberration + noise)
    "c2_retro": (dict(scanline_strength=0.6, triad_strength=0.35,
                      triad_softness=0.5, aberration_px=2,
                      noise_strength=4.0, bloom_strength=0.0), True, True),
    # bloom off + the FULL prologue/epilogue/warp chain
    "no_bloom_warp": ({**FULL, "bloom_strength": 0.0}, True, True),
    # bloom off, c1-class (scanlines + vignette only): multiplier-only
    # stacks stay XLA (the fused kernel measured a net loss there)
    "c1_scan_vig": (dict(scanline_strength=0.6, vignette_strength=0.25,
                         bloom_strength=0.0), False, True),
    # bloom off + px=3: prologue ineligible -> XLA pre, kernel epilogue
    "no_bloom_px3": (dict(scanline_strength=0.6, triad_strength=0.35,
                          noise_strength=4.0, pixel_size=3,
                          bloom_strength=0.0), True, False),
}


def build(params, **kw):
    kw.setdefault("rng", "host")  # the oracle needs the host noise field
    return CRTEngine(params, H, W, FPS, interpret=True, pallas="on", **kw)


@pytest.mark.parametrize("name", sorted(CASES))
def test_fused_matches_per_stage_and_oracle(name):
    overrides, expect_fused, _ = CASES[name]
    p = identity_params(**overrides)
    frames = synth_frames(B, H, W, seed=3)

    eng = build(p)
    assert eng._pallas_fused == expect_fused, name
    got, state = eng.process(frames)
    got = np.asarray(got)

    if expect_fused:
        os.environ["PCRT_NO_FUSED"] = "1"
        try:
            ref_eng = build(p)
            assert not ref_eng._pallas_fused
            want, ref_state = ref_eng.process(frames)
        finally:
            del os.environ["PCRT_NO_FUSED"]
        want = np.asarray(want)
        # same backend, same op order -> equal to within an isolated
        # rounding ulp (FMA-contraction class; e.g. the knee division
        # contracts differently between kernels). Never more than 1 LSB,
        # and essentially never at all.
        dps = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert dps.max() <= 1 and (dps > 0).mean() < 1e-3, (
            f"{name}: fused vs per-stage max {dps.max()}, "
            f"frac {(dps > 0).mean():.2e}"
        )
        if getattr(eng, "_warp_emit_u8", False):
            # the uint8 cast folded into the warp kernel: the carried
            # state is the QUANTIZED last frame by construction —
            # assert exactly that (it can differ from ref_state by the
            # same isolated ulps the outputs may)
            np.testing.assert_array_equal(
                np.rint(np.asarray(state) * 255.0).astype(np.uint8),
                got[-1])
        else:
            # the carried f32 state may differ by FMA-contraction ulps
            # (the blur's mul+add chains contract differently between
            # the fused kernel and XLA's fusion choices — same class as
            # the bloom3 contract in PARITY.md); the u8 output above is
            # bitwise
            np.testing.assert_allclose(
                np.asarray(state), np.asarray(ref_state), rtol=0, atol=2e-6
            )

    oracle_want = render_oracle(eng, frames)
    diff = np.abs(got.astype(np.int32) - oracle_want.astype(np.int32))
    assert diff.max() <= 1, f"{name}: vs oracle max {diff.max()}"


def test_fused_prologue_gating():
    """The spec records whether the u8 prologue folded in."""
    p = identity_params(**FULL)
    eng = build(p)
    assert eng._fused_spec.pre

    p3 = identity_params(**{**FULL, "pixel_size": 3})
    eng3 = build(p3)
    assert eng3._pallas_fused and not eng3._fused_spec.pre

    # text BEFORE the bloom (text.after=False) forces the XLA prologue
    from pythoncrt_tpu import TextParams

    pt = identity_params(**{**FULL, "text": TextParams(text="hi", after=False)})
    ov = np.zeros((H, W, 4), np.uint8)
    ov[10:20, 30:90] = (255, 80, 40, 200)
    engt = CRTEngine(pt, H, W, FPS, interpret=True, pallas="on", text_rgba=ov)
    assert engt._pallas_fused and not engt._fused_spec.pre


def test_fused_native_rng_noise():
    """Native (on-device counter) rng noise rides the same operand
    plumbing: the fused path's vmapped field generation must reproduce
    the per-stage path's draws exactly."""
    p = identity_params(**FULL)
    frames = synth_frames(B, H, W, seed=5)
    eng = build(p, rng="native")
    assert eng._pallas_fused
    got, _ = eng.process(frames)
    os.environ["PCRT_NO_FUSED"] = "1"
    try:
        want, _ = build(p, rng="native").process(frames)
    finally:
        del os.environ["PCRT_NO_FUSED"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_warp_feed_dtype_equivalence():
    """The fused kernel hands the warp stage rint(m*255) as uint8 by
    default (half the window-DMA bytes); PCRT_WARP_FEED=bf16 restores
    the round-2 bf16 feed. Integers <= 255 are exact in both dtypes,
    so the output bytes must be IDENTICAL."""
    p = identity_params(**FULL)
    frames = synth_frames(B, H, W, seed=13)
    eng = build(p)
    assert eng._fused_spec.emit == "u8_255"
    got, _ = eng.process(frames)
    os.environ["PCRT_WARP_FEED"] = "bf16"
    try:
        engb = build(p)
        assert engb._fused_spec.emit == "bf16_255"
        want, _ = engb.process(frames)
    finally:
        del os.environ["PCRT_WARP_FEED"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_warp_emit_u8_opt_in():
    """PCRT_WARP_U8OUT=1 folds the final clip(rint)->uint8 cast into
    the warp kernel's output store (measured slower on-chip — the u8
    tiling RMWs — but kept for A/B). Byte-identical by construction."""
    p = identity_params(**FULL)
    frames = synth_frames(B, H, W, seed=17)
    eng = build(p)
    assert eng._warp_emit_scaled and not eng._warp_emit_u8
    want, _ = eng.process(frames)
    os.environ["PCRT_WARP_U8OUT"] = "1"
    try:
        engu = build(p)
        assert engu._warp_emit_u8
        got, state = engu.process(frames)
    finally:
        del os.environ["PCRT_WARP_U8OUT"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # the carried state is the quantized last frame by construction
    np.testing.assert_array_equal(
        np.rint(np.asarray(state) * 255.0).astype(np.uint8),
        np.asarray(got)[-1])


def test_fused_off_on_cpu_backend():
    """Without interpret (and off-TPU), the fused path must not engage
    in auto mode — CPU XLA serves the whole chain."""
    p = identity_params(**FULL)
    eng = CRTEngine(p, H, W, FPS, pallas="auto")
    assert not eng._pallas_fused


@pytest.mark.parametrize("mode", ["raw", "half"])
def test_grain_inkernel_forms(monkeypatch, mode):
    """Both in-kernel grain forms through the FUSED kernel (interpret):
    the default raw-field double dot and the half-window row dot
    (PCRT_GRAIN_RAW=0) must match the per-stage XLA path within the
    usual sparse-1-LSB envelope and the oracle within 1 LSB."""
    if mode == "half":
        monkeypatch.setenv("PCRT_GRAIN_RAW", "0")
    p = identity_params(**{**FULL, "noise_strength": 10.0, "grain_size": 2})
    frames = synth_frames(B, H, W, seed=7)
    eng = build(p, rng="host")
    assert eng._pallas_fused and eng._fused_spec.grain_g == 2
    assert eng._fused_spec.grain_raw == (mode == "raw")
    got, _ = eng.process(frames)
    os.environ["PCRT_NO_FUSED"] = "1"
    try:
        ref, _ = build(p, rng="host").process(frames)
    finally:
        del os.environ["PCRT_NO_FUSED"]
    dps = np.abs(np.asarray(got).astype(int) - np.asarray(ref).astype(int))
    assert dps.max() <= 1 and (dps > 0).mean() < 1e-3


def test_pick_ty_policy(monkeypatch):
    """Pin the stripe-height policy: the measured optima (ROADMAP.md
    round-5 re-sweep; official spc-2 A/B ty=40 453.8 vs ty=24 449.8 at
    4K) and the ~29 MB charged-liveness cap that encodes the Mosaic
    pipelining knee. A silent change here is a perf regression even
    though every ty is numerically correct."""
    from pythoncrt_tpu.kernels.fused import pick_ty_fused

    monkeypatch.delenv("PCRT_FUSED_TY", raising=False)
    assert pick_ty_fused(1080, 1920) == 40   # c3/c4: 800 vs 708 at ty=24
    assert pick_ty_fused(2160, 3840) == 40   # c5 4K: the r5 re-sweep pick
    # wider than 4K: ty=40's charged liveness crosses the cap, the
    # ladder falls to the tallest ty that both divides h and fits
    assert pick_ty_fused(1920, 4224) == 32
    # tiny frames: divisibility + the 16-row halo floor pick ty=24
    assert pick_ty_fused(48, 256) == 24
    # force knob: honored when legal, refused (None -> caller falls
    # back to bloom3/XLA) when not a multiple of 8 or not dividing h
    monkeypatch.setenv("PCRT_FUSED_TY", "24")
    assert pick_ty_fused(2160, 3840) == 24
    monkeypatch.setenv("PCRT_FUSED_TY", "20")
    assert pick_ty_fused(2160, 3840) is None
    monkeypatch.setenv("PCRT_FUSED_TY", "64")
    assert pick_ty_fused(2160, 3840) is None  # 2160 % 64 != 0
