"""Planar layout (engine layout="planar"): bit-identical to the NHWC
layout on every config class. Transposes carry no arithmetic, so the
two layouts must agree BITWISE — on the uint8 outputs and on the f32
carried state — whether the config runs the zero-relayout planar fast
path (planar_ok) or the edge-conversion fallback (glitch/text-after).
"""

import numpy as np
import pytest

from pythoncrt_tpu import CRTEngine

from conftest import synth_frames
from test_engine_vs_oracle import identity_params
from test_fused import CASES, FULL, H, W, B, FPS


def build(params, **kw):
    kw.setdefault("rng", "host")
    return CRTEngine(params, H, W, FPS, interpret=True, pallas="on", **kw)


# every fused-path class plus the fallback classes (glitch, 2-D scan)
LAYOUT_CASES = ["c3_full", "no_warp", "with_glitch", "with_persistence",
                "c4_fast", "c2_retro", "c1_scan_vig", "scan_2d",
                "px3_pre_off"]


@pytest.mark.parametrize("name", LAYOUT_CASES)
def test_planar_matches_nhwc(name):
    overrides = CASES[name][0]
    p = identity_params(**overrides)
    frames = synth_frames(B, H, W, seed=7)

    eng_n = build(p)
    out_n, st_n = eng_n.process(frames)
    out_n, st_n = np.asarray(out_n), np.asarray(st_n)

    eng_p = build(p, layout="planar")
    out_p, st_p = eng_p.process(np.transpose(frames, (0, 3, 1, 2)))
    out_p, st_p = np.asarray(out_p), np.asarray(st_p)

    assert out_p.shape == (B, 3, H, W)
    assert st_p.shape == (3, H, W)
    np.testing.assert_array_equal(np.transpose(out_p, (0, 2, 3, 1)), out_n)
    np.testing.assert_array_equal(np.transpose(st_p, (1, 2, 0)), st_n)


def test_planar_ok_resolution():
    """planar_ok engages exactly where every stage is layout-agnostic."""
    assert build(identity_params(**FULL), layout="planar").planar_ok
    # the glitch kernel is planar-native -> fast path holds
    assert build(identity_params(**CASES["with_glitch"][0]),
                 layout="planar").planar_ok
    # persistence is elementwise -> planar fast path holds
    assert build(identity_params(**CASES["with_persistence"][0]),
                 layout="planar").planar_ok
    # non-fused config -> fallback
    assert not build(identity_params(**CASES["c1_scan_vig"][0]),
                     layout="planar").planar_ok
    # 2-D scanlines: fused kernel rejects -> fallback
    assert not build(identity_params(**CASES["scan_2d"][0]),
                     layout="planar").planar_ok


def test_planar_state_carry():
    """Persistence state round-trips across batches in planar layout."""
    p = identity_params(**CASES["with_persistence"][0])
    frames = synth_frames(2 * B, H, W, seed=11)

    eng_n = build(p)
    o1, s1 = eng_n.process(frames[:B], np.arange(B))
    o2, s2 = eng_n.process(frames[B:], np.arange(B, 2 * B), state=s1)

    eng_p = build(p, layout="planar")
    pf = np.transpose(frames, (0, 3, 1, 2))
    q1, t1 = eng_p.process(pf[:B], np.arange(B))
    q2, t2 = eng_p.process(pf[B:], np.arange(B, 2 * B), state=t1)

    np.testing.assert_array_equal(np.transpose(np.asarray(q2), (0, 2, 3, 1)),
                                  np.asarray(o2))
    np.testing.assert_array_equal(np.transpose(np.asarray(t2), (1, 2, 0)),
                                  np.asarray(s2))


GBR = (1, 2, 0)  # ffmpeg gbrp: plane i holds color GBR[i]


@pytest.mark.parametrize("name", ["c3_full", "no_warp", "c2_retro",
                                  "with_glitch", "luma_knee"])
def test_planar_gbr_matches_rgb(name):
    """channel_order="gbr": feeding ffmpeg's gbrp plane order must give
    the same bytes as RGB planes, permuted — through the fused kernel's
    per-channel constants (fast path) and the edge permute (fallback)."""
    overrides = CASES[name][0]
    p = identity_params(**overrides)
    frames = synth_frames(B, H, W, seed=5)
    planes_rgb = np.transpose(frames, (0, 3, 1, 2))

    eng_r = build(p, layout="planar")
    out_r, st_r = eng_r.process(planes_rgb)
    out_r, st_r = np.asarray(out_r), np.asarray(st_r)

    eng_g = build(p, layout="planar", channel_order="gbr")
    out_g, st_g = eng_g.process(planes_rgb[:, list(GBR)])
    out_g, st_g = np.asarray(out_g), np.asarray(st_g)

    np.testing.assert_array_equal(out_g, out_r[:, list(GBR)])
    np.testing.assert_array_equal(st_g, st_r[list(GBR)])


@pytest.mark.parametrize("name", ["c3_full", "luma_knee"])
def test_planar_gbr_epilogue_xla_matches_rgb(name, monkeypatch):
    """PCRT_FUSED_EPI=xla (stages 7-11 as an XLA epilogue instead of
    in-kernel) must honor the gbr plane order exactly like the fused
    kernel's branded spec.corder: the triad mask rows and the
    preserve-luma weights permute to each plane's color."""
    monkeypatch.setenv("PCRT_FUSED_EPI", "xla")
    overrides = CASES[name][0]
    p = identity_params(**overrides)
    frames = synth_frames(B, H, W, seed=5)
    planes_rgb = np.transpose(frames, (0, 3, 1, 2))

    eng_r = build(p, layout="planar")
    assert eng_r._fused_epi_xla
    out_r = np.asarray(eng_r.process(planes_rgb)[0])

    eng_g = build(p, layout="planar", channel_order="gbr")
    out_g = np.asarray(eng_g.process(planes_rgb[:, list(GBR)])[0])

    np.testing.assert_array_equal(out_g, out_r[:, list(GBR)])


def test_layout_auto_resolution():
    assert build(identity_params(**FULL), layout="auto").layout == "planar"
    assert build(identity_params(**CASES["c1_scan_vig"][0]),
                 layout="auto").layout == "nhwc"


def test_planar_shape_check():
    with pytest.raises(ValueError):
        build(identity_params(**FULL), layout="planar").process(
            synth_frames(B, H, W, seed=0))
    with pytest.raises(ValueError):
        CRTEngine(identity_params(**FULL), H, W, FPS, layout="bogus")


def test_planar_mismatched_state_rejected():
    """The layout-dependent state-shape guard (engine.process): a
    planar engine expects a (3, H, W) carry and must refuse an
    NHWC-shaped one (same documented-deviation refusal as NHWC,
    PARITY.md — never a silent transpose)."""
    p = identity_params(**CASES["with_persistence"][0])
    eng_p = build(p, layout="planar")
    pf = np.transpose(synth_frames(B, H, W, seed=13), (0, 3, 1, 2))
    with pytest.raises(ValueError, match="documented deviation"):
        eng_p.process(pf, np.arange(B),
                      state=np.zeros((H, W, 3), np.float32))
