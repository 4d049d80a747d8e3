"""TPU-native CRT effect engine.

One engine, not two: the reference splits preview/export into two
near-duplicate Python functions (crt_filter.py:531 vs :702) because of
host threading; here a single pure batched transform

    step : (frames_u8 [B,H,W,3], aux, state [H,W,3]) -> (out_u8, state)

serves both, compiled once per parameter set. Design (SURVEY.md §7):

- All ~35 effect parameters are *static*: identity stages vanish at
  trace time, constants fold, and XLA fuses the surviving stages into
  one program over the NHWC batch.
- Masks, LUT grids, warp tables, resize taps and text overlays are
  precomputed on the host by the oracle (single source of truth for
  bit-accuracy) and uploaded once as device constants.
- Per-frame temporal inputs (scanline phase, flicker gain) are computed
  host-side in f64 (matching the reference's NumPy scalar math) and
  shipped as (B,) f32 arrays.
- Noise / glitch randomness: "native" mode draws on device from
  counter-based keys (fold_in(seed, frame_index) — deterministic,
  reproducible, jit-contained); "host" mode injects reference-exact
  fields for parity testing.
- The persistence IIR s_t = p*s_{t-1} + (1-p)*x_t (crt_filter.py:1092)
  runs as a lax.scan over the batch axis after the vmapped stateless
  chain, carrying one frame across batch (and shard) boundaries.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

def _enable_compile_cache() -> None:
    """Engine programs are large (the whole effect stack fuses into one
    XLA program) and TPU compiles can take minutes; the persistent
    compilation cache makes every (params, shape) configuration a
    one-time compile across processes. TPU-only: cached CPU AOT results
    are machine-feature-sensitive (observed cross-machine warnings)."""
    if os.environ.get("PCRT_NO_COMPILE_CACHE"):
        return
    try:
        if jax.default_backend() != "tpu":
            return
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~/.cache"), "pythoncrt_tpu", "xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass

from . import oracle
from .oracle import ops as oops
from .ops import blur as oblur
from .ops import color as ocolor
from .ops import glitch as oglitch
from .ops import resize as oresize
from .ops import warp as owarp
from .params import EffectParams


def _draw_normal(key, gh: int, gw: int, dt) -> jax.Array:
    """Per-frame (gh, gw) standard-normal grain field for rng="native".

    Default: jax.random.normal (erfinv transform — XLA lowers it to a
    log1p + two 9-term polynomial branches per element; measured 63.6
    us/f on c4's full-res field, 13.5% of the step).

    PCRT_NORMAL_IMPL=bm: paired Box-Muller — one (gh, gw/2) uniform
    pair makes TWO normals (z1 = r*cos(2*pi*u2), z2 = r*sin(2*pi*u2),
    r = sqrt(-2*ln(u1))), halving the transcendental work per element;
    the halves land side-by-side (iid, so any fixed arrangement is a
    valid field). Exact N(0,1) by construction — distribution-legal for
    rng="native" exactly like the threefry/rbg choice (PARITY.md: the
    native stream never promises the reference's numpy draws, only the
    distribution; parity tests feed the SAME field to engine and
    oracle). Keyed per frame (fold_in upstream), elementwise after the
    draw, so batch-shape/resume invariance is automatic
    (test_native_rng_resume_invariant covers both impls).

    MEASURED SLOWER on-chip (c4 full-res grain, the best case for it:
    1771.1 vs 1906.0 fps, r4 A/B) — the halves concatenate, the second
    uniform draw, and the cos/sin lowering cost more than erfinv's
    log1p + poly9. Stays an A/B knob; erfinv stays the default.
    """
    if os.environ.get("PCRT_NORMAL_IMPL") == "bm":
        k1, k2 = jax.random.split(key)
        hw = (gw + 1) // 2
        tiny = np.float32(np.finfo(np.float32).tiny)
        u1 = jax.random.uniform(k1, (gh, hw), jnp.float32, minval=tiny)
        u2 = jax.random.uniform(k2, (gh, hw), jnp.float32)
        r = jnp.sqrt(np.float32(-2.0) * jnp.log(u1))
        th = np.float32(2.0 * np.pi) * u2
        field = jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)], axis=1)
        field = field[:, :gw]
        return field.astype(dt).astype(jnp.float32)
    return jax.random.normal(key, (gh, gw), dt).astype(jnp.float32)


class FrameAux(NamedTuple):
    """Per-frame dynamic inputs (each leaf has a leading batch axis)."""

    frame_idx: jax.Array  # (B,) int32
    phase: jax.Array  # (B,) f32 scanline phase in px
    flicker: jax.Array  # (B,) f32 flicker gain (1.0 when flicker off)
    noise: Optional[jax.Array] = None  # (B, gh, gw) f32 std-normal (host mode)
    glitch_base: Optional[jax.Array] = None  # (B, rows) f32 (host mode)
    glitch_seg: Optional[jax.Array] = None  # (B, rows, segs) f32 (host mode)


class CRTEngine:
    """Compiled effect pipeline for one (params, H, W, fps) configuration.

    Args:
      params: effect parameters (clamped; static — changing them builds a
        new engine / triggers recompilation, like loading a new preset).
      height, width: frame size.
      fps: output frame rate (drives phase/time per frame index).
      engine: "export" (canonical algorithm set, crt_filter.py:702-861)
        or "preview" (the preview glitch variant, :664-686).
      rng: "native" (on-device counter-based draws) or "host"
        (reference-exact fields injected through FrameAux).
      seed: base RNG seed for native mode.
      text_rgba: optional (H, W, 4) uint8 overlay (host-rasterized once;
        see pythoncrt_tpu.text).
      lut_exact: replicate the triad 1024-bin LUT quantization.
      precision: "exact" (default; <=1 LSB vs the CPU oracle — hi/lo
        bf16-split matmuls in the Pallas kernels, LUT-exact triad) or
        "fast" (single-pass bf16 matmuls + direct pow; ~2^-8 relative
        kernel error, up to a few uint8 LSB vs the oracle — a documented
        deviation for throughput-first renders).
      assoc_scan: use an O(log B) associative scan for the persistence
        recurrence instead of lax.scan (throughput mode; same math, f32
        reassociation differences only).
      layout: "nhwc" (default) — process() takes/returns (B, H, W, 3)
        uint8 and the state is (H, W, 3). "planar" — (B, 3, H, W) /
        (3, H, W). The fused stripe kernel and the warp kernel both
        work on planar arrays internally, so the planar layout skips
        the NHWC<->planar relayouts at the step boundary entirely when
        the config qualifies (self.planar_ok; otherwise the step
        converts at the edges and is merely layout-compatible). "auto"
        resolves to "planar" when the config qualifies, else "nhwc" —
        read self.layout after construction to learn the I/O contract.
        The host pipeline feeds planar frames straight out of ffmpeg's
        planar-RGB decode (-pix_fmt gbrp) so no host repack happens
        either. Values are bit-identical across layouts (transposes
        carry no arithmetic); tests assert it.
      channel_order: which color each PLANE of a planar frame holds —
        "rgb" (default) or "gbr" (ffmpeg's gbrp plane order, so decoded
        planes feed the kernels untouched and outputs pipe back to the
        encoder untouched). Per-channel constants (aberration shifts,
        temperature gains, Rec.709 luma weights, the triad mask) are
        permuted to match; output planes come back in the same order.
        Only meaningful with layout "planar"/"auto".
    """

    def __init__(
        self,
        params: EffectParams,
        height: int,
        width: int,
        fps: float,
        *,
        engine: str = "export",
        rng: str = "native",
        seed: int = 0,
        text_rgba: Optional[np.ndarray] = None,
        lut_exact: bool = True,
        precision: str = "exact",
        assoc_scan: bool = False,
        pallas: str = "auto",
        interpret: bool = False,
        layout: str = "nhwc",
        channel_order: str = "rgb",
    ) -> None:
        if engine not in ("export", "preview"):
            raise ValueError(f"engine must be 'export' or 'preview', got {engine!r}")
        if rng not in ("native", "host"):
            raise ValueError(f"rng must be 'native' or 'host', got {rng!r}")
        if pallas not in ("auto", "on", "off"):
            raise ValueError(f"pallas must be auto/on/off, got {pallas!r}")
        if precision not in ("exact", "fast"):
            raise ValueError(f"precision must be 'exact' or 'fast', got {precision!r}")
        if layout not in ("nhwc", "planar", "auto"):
            raise ValueError(
                f"layout must be 'nhwc', 'planar' or 'auto', got {layout!r}")
        if channel_order not in ("rgb", "gbr"):
            raise ValueError(
                f"channel_order must be 'rgb' or 'gbr', got {channel_order!r}")
        if channel_order != "rgb" and layout == "nhwc":
            raise ValueError("channel_order requires layout 'planar'/'auto'")
        _enable_compile_cache()
        p = params.clamped()
        self.params = p
        self.h, self.w = int(height), int(width)
        self.fps = float(fps)
        self.engine = engine
        self.rng = rng
        self.seed = int(seed)
        self.precision = precision
        self._exact = precision == "exact"
        self.lut_exact = bool(lut_exact) and self._exact
        self.assoc_scan = bool(assoc_scan)
        self._interpret = bool(interpret)
        self.layout = layout
        self.channel_order = channel_order
        # plane i of a planar frame holds color _plane_colors[i]
        # (0=R, 1=G, 2=B); gbr is ffmpeg's gbrp plane order
        self._plane_colors = (0, 1, 2) if channel_order == "rgb" else (1, 2, 0)
        self._resolve_pallas(pallas)
        self._build_consts(text_rgba)
        # planar_ok: every stage downstream of the fused kernel is
        # layout-agnostic (warp kernel is planar-native; persistence and
        # the uint8 cast are elementwise), so the planar layout runs the
        # whole step without a single NHWC<->planar relayout. Glitch and
        # text-after still consume NHWC — those configs convert at the
        # step edges instead (correct, no faster).
        p = self.params
        self.planar_ok = bool(
            self._pallas_fused
            and self._fused_spec is not None and self._fused_spec.pre
            and not (p.glitch_on and getattr(self, "_glitch_rows", 0) > 0
                     and not self._pallas_glitch)
            and not (self._has_text and p.text.after)
            and (not p.warp_on or self._pallas_warp)
        )
        if self.layout == "auto":
            self.layout = "planar" if self.planar_ok else "nhwc"
        if (self.layout == "planar" and self.planar_ok
                and self._plane_colors != (0, 1, 2)):
            # the fused kernel sees the planes untransposed: brand the
            # spec with the plane->color map so its per-channel constants
            # (aberration shifts, temp gains, luma weights) permute along
            import dataclasses

            self._fused_spec = dataclasses.replace(
                self._fused_spec, corder=self._plane_colors)
        # Constants (masks, warp tables, index maps) are passed as jit
        # ARGUMENTS, not closure captures: captured arrays embed as HLO
        # literals, which blows up compile time at 1080p+ (tens of MB of
        # warp/triad tables). As parameters they stay resident in HBM
        # across calls and the program compiles quickly.
        self._jstep = jax.jit(self._step)
        self._jmstep = jax.jit(self._multi_step)

    # ------------------------------------------------------------------
    # Pallas kernel selection
    # ------------------------------------------------------------------

    def _resolve_pallas(self, mode: str) -> None:
        """Decide per hot op whether the hand-written Pallas kernel or the
        XLA fallback runs. XLA lowers the warp/glitch gathers to scalar
        loops on TPU (measured 31/13 ms per 1080p frame), so the kernels
        are on by default on TPU; CPU keeps the XLA path (tests exercise
        the kernels in interpret mode explicitly)."""
        p = self.params
        self.pallas_mode = mode
        if mode == "off":
            enabled = False
        elif mode == "on":
            enabled = True
        else:
            enabled = self._interpret or jax.default_backend() == "tpu"
        shape_ok = self.h % 8 == 0 and self.w % 128 == 0
        self._pallas_warp = bool(enabled and p.warp_on and shape_ok)
        glitch_ok = False
        if p.glitch_on:
            from . import oracle as _o

            y0, rows = _o.glitch_rows(self.h, p.glitch_height_frac)
            glitch_ok = rows > 0 and self.w % 128 == 0 and y0 - ((-rows) % 8) >= 0
        self._pallas_glitch = bool(enabled and glitch_ok)
        # The retired stripe bloom kernel (kernels/bloom.py) measured
        # SLOWER than XLA (4.2-4.9 vs 1.7 ms/frame — unaligned lane
        # slices become multi-pass rotates); PCRT_PALLAS_BLOOM=1 still
        # opts in for A/B. The banded-matmul kernel (kernels/bloom2.py)
        # replaces it as the default: both bloom variants as one fused
        # pass, horizontal taps on the MXU, no lane shifts at all.
        self._pallas_bloom = bool(
            enabled and p.bloom_on and not p.fast_bloom and shape_ok
            and os.environ.get("PCRT_PALLAS_BLOOM") == "1"
        )
        if self._pallas_bloom:
            from .kernels import bloom as _kb

            self._bloom_spec = _kb.build_bloom_spec(
                self.h, self.w, p.bloom_sigma, p.bloom_strength, p.bloom_threshold
            )
        # Dispatch is measured per variant at 1080p: the fast (half-res
        # down+up) composite wins big in the kernel (0.94 -> ~0.4 ms/f),
        # but for the gaussian variant XLA's fused shifted-adds still
        # beat the banded matmul (0.65 vs 0.82 ms/f — the kernel pays
        # K=384 windows and per-program DMA for taps XLA folds into the
        # elementwise chain). PCRT_BLOOM2_GAUSS=1 opts the gaussian in
        # for A/B on other shapes.
        # Round-3 gaussian default: the bloom3 stripe kernel (exact fused
        # blur+composite with VMEM row reuse) replaces the XLA shifted-
        # slice form, whose two blur fusions re-read the full frame once
        # per tap (~735 us/f at 1080p, xprof r3). PCRT_NO_BLOOM3=1 (or
        # PCRT_BLOOM2_GAUSS=1) restores the previous dispatch for A/B.
        self._pallas_bloom3 = False
        self._bloom3_fast = False
        if (enabled and p.bloom_on and shape_ok
                and not self._pallas_bloom
                and os.environ.get("PCRT_NO_BLOOM3") != "1"
                and not (p.fast_bloom and os.environ.get("PCRT_BLOOM2_FAST") == "1")
                and not (not p.fast_bloom and os.environ.get("PCRT_BLOOM2_GAUSS") == "1")):
            from .kernels import bloom3 as _kb3

            try:
                if p.fast_bloom:
                    # replaces bloom2's banded-matmul fast bloom (0.83
                    # ms/f in-engine): the half-res down+up is 2-tap
                    # arithmetic, not a matmul problem
                    self._bloom3_spec = _kb3.build_bloom3_fast_spec(
                        self.h, self.w, p.bloom_strength, p.bloom_threshold,
                    )
                    self._bloom3_fast = True
                else:
                    self._bloom3_spec = _kb3.build_bloom3_spec(
                        self.h, self.w, p.bloom_sigma, p.bloom_strength,
                        p.bloom_threshold,
                    )
                self._pallas_bloom3 = True
            except ValueError:
                pass  # unsupported radius/shape -> bloom2/XLA fallback
        self._pallas_bloom2 = False
        # bloom2 is the one kernel that is NOT bit-identical to the
        # oracle's pass order (~2^-20 reassociation, PARITY.md) and it
        # sits upstream of the triad LUT cliff — so it is A/B OPT-IN
        # only, never a silent fallback (degenerate shapes where bloom3/
        # fused reject, e.g. h < ty+16, take the exact XLA form instead)
        want2 = ((p.fast_bloom and os.environ.get("PCRT_BLOOM2_FAST") == "1")
                 or os.environ.get("PCRT_BLOOM2_GAUSS") == "1")
        if (enabled and p.bloom_on and shape_ok and want2
                and not self._pallas_bloom and not self._pallas_bloom3
                and os.environ.get("PCRT_NO_BLOOM2") != "1"):
            from .kernels import bloom2 as _kb2

            try:
                self._bloom2_spec = _kb2.build_bloom2_spec(
                    self.h, self.w,
                    variant="fast" if p.fast_bloom else "gaussian",
                    sigma=p.bloom_sigma, strength=p.bloom_strength,
                    threshold=p.bloom_threshold,
                )
                self._pallas_bloom2 = True
            except ValueError:
                pass  # band too wide for the lane halo -> XLA fallback
        # Persistence scan: one Pallas program walks ALL B frames of an
        # (8, 128) tile with the carry in registers — the lax.scan pays
        # XLA per-step dispatch (measured ~3x the HBM traffic at 1080p).
        # Bit-identical step sequence; assoc_scan keeps its own path.
        self._pallas_persist = bool(
            enabled and p.persistence_on and not self.assoc_scan
            and self.h % 8 == 0 and (self.w * 3) % 128 == 0
        )
        if self._pallas_warp:
            from .kernels import warp as _kw

            # The kernel runs in the int domain on a u8 feed (bf16 via
            # PCRT_WARP_FEED=bf16; see kernels/warp.py). row_align stays
            # 8: narrow-dtype DMA from a sublane-8 origin verified
            # correct on v5e for both feeds (scripts/check_onchip_parity
            # re-checks the shipped path end-to-end on the real chip),
            # and 16-alignment would grow the window band (byp 32 -> 40
            # at 1080p = +25% matmul M for nothing).
            self._warp_tables = _kw.build_warp_tables(
                self.h, self.w, p.warp_strength, row_align=8
            )

    def _resolve_fused(self, text_rgba: Optional[np.ndarray]) -> None:
        """Decide whether the fused stripe pipeline (kernels/fused.py)
        replaces the per-stage path: bloom in the middle, pixelate/
        aberration/grade folded in front of the blur and triad/scanline/
        vignette/flicker/noise behind it, emitting the int-domain warp
        feed directly. The round-3 xprof showed the per-stage XLA glue
        around the bloom kernel re-crossing HBM ~580 us/frame at 1080p;
        the fold removes those passes and reads u8 windows (4x less DMA).
        PCRT_NO_FUSED=1 restores the per-stage dispatch for A/B."""
        p = self.params
        self._pallas_fused = False
        self._fused_spec = None
        # A/B: PCRT_FUSED_EPI=xla keeps stages 7-11 OUT of the kernel —
        # one memory-bound planar XLA fusion whose pow transcendentals
        # hide under the HBM stream, vs ~0.19 ms/f of exposed VPU
        # transcendentals in-kernel (round-3 ablation).
        self._fused_epi_xla = os.environ.get("PCRT_FUSED_EPI") == "xla"
        epi_xla = self._fused_epi_xla
        enabled = self._interpret or jax.default_backend() == "tpu"
        if self.pallas_mode == "off" or os.environ.get("PCRT_NO_FUSED") == "1":
            return
        if self.pallas_mode != "on" and not enabled:
            return
        if (self._pallas_bloom or self._pallas_bloom2) and p.bloom_on:
            return  # explicit A/B opt-ins take precedence
        if p.scanlines_on and not p.scanlines_1d and not epi_xla:
            return  # 2-D scanlines need sin/pow per pixel — XLA path
        if p.triad_on and not epi_xla:
            g = float(p.triad_gamma)
            if g <= 0.0 or ((not p.triad_preserve_luma) and abs(g - 1.0) < 1e-3):
                return  # apply_triad's mul-only early-out — keep XLA
        has_text_before = (text_rgba is not None and p.text.enabled
                           and not p.text.after)
        pre = not has_text_before and (
            not p.pixelate_on or int(p.pixel_size) in (1, 2, 4, 8))
        feed = ("bf16_255" if os.environ.get("PCRT_WARP_FEED") == "bf16"
                else "u8_255")  # u8 halves the warp window DMA bytes
        emit = (feed if (p.warp_on and self._pallas_warp and not epi_xla)
                else "f32")
        from .kernels import fused as _kf

        t = float(p.temperature)
        triad_in = p.triad_on and not epi_xla
        kw = dict(
            pre=pre,
            triad=triad_in, triad_gamma=float(p.triad_gamma),
            triad_luma=bool(p.triad_preserve_luma), lut_exact=self.lut_exact,
            scanlines=p.scanlines_on and not epi_xla,
            vignette=p.vignette_on and not epi_xla,
            vig_strength=float(p.vignette_strength),
            flicker=p.flicker_on and not epi_xla,
            noise=p.noise_on and not epi_xla,
            noise_scale=float(p.noise_strength) / 255.0,
            emit=emit,
        )
        if kw["noise"] and self._grain_lerp:
            # in-kernel grain row lerp: operand becomes the half-field
            # stripe windows (see _grain_field / kernels/fused.py);
            # grain_raw additionally moves the COLUMN dot in-kernel
            # (operand = raw-field windows, R_w resident in VMEM)
            kw.update(grain_g=2,
                      grain_off=tuple(o for o, _ in self.GRAIN2_ROWS),
                      grain_frac=tuple(float(f) for _, f in self.GRAIN2_ROWS),
                      grain_raw=os.environ.get("PCRT_GRAIN_RAW") != "0")
        if pre:
            kw.update(
                px=int(p.pixel_size) if p.pixelate_on else 1,
                ab=int(p.aberration_px) if p.aberration_on else 0,
                saturation=float(p.saturation),
                temp_r=float(np.clip(1.0 + 0.5 * t, 0.5, 1.5)) if t != 0.0 else 1.0,
                temp_b=float(np.clip(1.0 - 0.5 * t, 0.5, 1.5)) if t != 0.0 else 1.0,
                brightness=float(p.brightness), contrast=float(p.contrast),
                inv_gamma=(1.0 / float(p.gamma))
                if (p.gamma != 1.0 and p.gamma > 0.0) else 1.0,
            )
        if not p.bloom_on:
            # Bloom-off configs still win by folding the per-stage HBM
            # chain into one pass — measured 3.3x on the c2 retro stack
            # (1349 -> 4517 fps at 720p: triad pows + noise + aberration
            # rolls were separate XLA passes). Multiplier-only stacks
            # (scanlines/vignette/flicker, e.g. c1) stay XLA: those fuse
            # into the convert pass already, and the stripe kernel's
            # per-program overhead measured a net LOSS there (8809 ->
            # 6137 fps at 480p).
            folded = (triad_in or kw["noise"] or emit != "f32"
                      or (pre and (kw.get("px", 1) != 1
                                   or kw.get("ab", 0) != 0
                                   or kw.get("saturation", 1.0) != 1.0
                                   or kw.get("temp_r", 1.0) != 1.0
                                   or kw.get("brightness", 0.0) != 0.0
                                   or kw.get("contrast", 1.0) != 1.0
                                   or kw.get("inv_gamma", 1.0) != 1.0)))
            if not folded:
                return
        try:
            self._fused_spec = _kf.build_fused_spec(
                self.h, self.w, sigma=float(p.bloom_sigma),
                strength=float(p.bloom_strength), fast=bool(p.fast_bloom),
                threshold=float(p.bloom_threshold), bloom=p.bloom_on, **kw)
            self._pallas_fused = True
        except ValueError:
            if not pre:
                return
            # retry without the prologue (e.g. non-analytic pixelate maps)
            kw2 = {k: v for k, v in kw.items()
                   if k not in ("px", "ab", "saturation", "temp_r", "temp_b",
                                "brightness", "contrast", "inv_gamma")}
            kw2["pre"] = False
            try:
                self._fused_spec = _kf.build_fused_spec(
                    self.h, self.w, sigma=float(p.bloom_sigma),
                    strength=float(p.bloom_strength), fast=bool(p.fast_bloom),
                    threshold=float(p.bloom_threshold), bloom=p.bloom_on,
                    **kw2)
                self._pallas_fused = True
            except ValueError:
                pass

    # ------------------------------------------------------------------
    # Host-side constant tables (oracle is the single source of truth)
    # ------------------------------------------------------------------

    def _build_consts(self, text_rgba: Optional[np.ndarray]) -> None:
        p, h, w = self.params, self.h, self.w
        # Grain half-row decomposition gate (shared by _resolve_fused
        # and the grain-const build below, so every path — fused kernel,
        # planar/NHWC XLA epilogues, preview — computes the SAME field):
        # upsample columns only on the MXU (field @ R_w at gh rows, ~1/4
        # of the old (R_h @ field) @ R_w MACs) and lerp rows in f32
        # (in-kernel for the fused path — its operand shrinks to the
        # half-field windows). Same envelope as the mx gate: grain_size
        # 2 (bf16-exact 0.25/0.75 taps), field bf16 truncation ~2^-9
        # under the noise_strength/255 scale; the f32 row lerp only
        # TIGHTENS the old bound (one bf16-input dot instead of two).
        # PCRT_GRAIN_LERP=0 restores the two-dot form for A/B.
        g_sz = max(1, int(p.grain_size))
        self._grain_lerp = (
            p.noise_on and g_sz == 2 and h % 2 == 0 and h // 2 >= 2
            and float(p.noise_strength) <= 32.0
            and os.environ.get("PCRT_GRAIN_GATHER") != "1"
            and os.environ.get("PCRT_GRAIN_ROLL") != "1"
            and os.environ.get("PCRT_GRAIN_LERP") != "0")
        self._resolve_fused(text_rgba)
        c: dict = {}

        if p.pixelate_on:
            y_map, x_map = oracle.pixelate_index_maps(h, w, p.pixel_size)
            c["pix_y"] = jnp.asarray(y_map)
            # Aberration (stage 2, wrap-around x roll per channel) and
            # pixelate (stage 3, static nearest gather) are both static
            # index maps on x, so they COMPOSE: one per-channel map runs
            # on the uint8 input and the aberration rolls vanish.
            ab = int(p.aberration_px) if p.aberration_on else 0
            xm = {0: (x_map - ab) % w, 1: x_map, 2: (x_map + ab) % w}
            self._pix_chan_maps = ab != 0
            if self._pix_chan_maps:
                c["pix_x"], c["pix_x_r"], c["pix_x_b"] = (
                    jnp.asarray(xm[1]), jnp.asarray(xm[0]), jnp.asarray(xm[2])
                )
            else:
                c["pix_x"] = jnp.asarray(x_map)
            # gathers are fusion barriers on TPU; shift-selected rolls
            # fuse into the elementwise chain (static per config)
            self._pix_shifts = (
                oresize.roll_gather_shifts(y_map),
                tuple(oresize.roll_gather_shifts(xm[i]) for i in range(3)),
            )

        if p.bloom_on:
            if self._pallas_bloom2:
                from .kernels import bloom2 as _kb2

                c["bloom2_m"] = _kb2.build_bloom2_consts(self._bloom2_spec)
            elif p.fast_bloom:
                h2, w2 = max(1, h // 2), max(1, w // 2)
                c["bloom_down"] = tuple(jnp.asarray(a) for a in
                                        (*oops.bilinear_taps(h, h2), *oops.bilinear_taps(w, w2)))
                c["bloom_up"] = tuple(jnp.asarray(a) for a in
                                      (*oops.bilinear_taps(h2, h), *oops.bilinear_taps(w2, w)))
            else:
                k = max(1, int(round(p.bloom_sigma * 3)) * 2 + 1)
                taps = tuple(float(t) for t in oops.gaussian_kernel_1d(k, p.bloom_sigma))
                self._bloom_taps = taps

        if p.triad_on:
            # The aperture-grille mask is y-invariant (the soften blur is
            # x-only), so ONE (W, 3) row broadcasts — an (H, W, 3) device
            # constant would re-cross HBM once per frame inside the mask
            # fusion (25 MB/frame at 1080p, xprof r3). Same bytes.
            c["triad"] = jnp.asarray(
                oracle.triad_mask(1, w, p.triad_strength, p.triad_softness)[0]
            )

        if p.scanlines_on:
            self._sl_omega = np.float32(2.0 * np.pi / max(1e-6, p.scanline_period_px))
            if p.scanlines_1d:
                c["sl_y"] = jnp.asarray(np.arange(h, dtype=np.float32))
            else:
                c["sl_slant"] = jnp.asarray(oracle.scanline_slant(h, w, p.scanline_angle))
                self._sl_inv_sharp = np.float32(
                    1.0 / float(np.clip(p.scanline_thickness, 0.1, 4.0))
                )

        if p.vignette_on:
            # Separable form: r2 = ny2[:, None] + nx2[None, :] built
            # inside the fusion from two vectors — the (H, W) mask
            # constant cost an 8 MB/frame fusion re-read (xprof r3).
            # The f32 vector add rounds once where the oracle rounds its
            # f64 sum once: <= 1 ulp on the mask value, far below the
            # uint8 budget (suite-asserted).
            yy = np.arange(h, dtype=np.float64)
            xx = np.arange(w, dtype=np.float64)
            cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
            rx, ry = max(1.0, w / 2.0), max(1.0, h / 2.0)
            ny = (yy - cy) / ry
            nx = (xx - cx) / rx
            c["vig_ny2"] = jnp.asarray((ny * ny).astype(np.float32))
            c["vig_nx2"] = jnp.asarray((nx * nx).astype(np.float32))
            self._vig_strength = np.float32(p.vignette_strength)

        if p.noise_on:
            g = max(1, int(p.grain_size))
            self._grain_hw = (max(1, h // g), max(1, w // g)) if g > 1 else (h, w)
            self._grain_mx = False
            self._grain_roll = False
            if g > 1:
                gh, gw = self._grain_hw
                # Exact-2x upsample as repeat + static rolls
                # (ops/resize.py:resize2x_roll): f32 lerps in the
                # oracle's tap order, BITWISE equal to the numpy oracle
                # (tests/test_kernels.py). Measured SLOWER on-chip than
                # the two MXU dots it was meant to replace (c3 677 vs
                # 820 fps, 2026-08-18: XLA materializes the roll/select
                # chain as several full-res passes instead of one
                # fusion), so it is opt-in (PCRT_GRAIN_ROLL=1) — useful
                # when bit-exactness of the grain field matters more
                # than speed (the mx form truncates the field to bf16).
                roll_ok = (g == 2 and h == 2 * gh and w == 2 * gw
                           and os.environ.get("PCRT_GRAIN_ROLL") == "1")
                if roll_ok:
                    self._grain_roll = True
                    ylo, yf = oops.bilinear_taps(gh, h)
                    xlo, xf = oops.bilinear_taps(gw, w)
                    c["grain_wy"] = (jnp.asarray((1.0 - yf).reshape(h, 1)),
                                     jnp.asarray(yf.reshape(h, 1)))
                    c["grain_wx"] = (jnp.asarray((1.0 - xf).reshape(1, w)),
                                     jnp.asarray(xf.reshape(1, w)))
                # The matmul form is contract-safe only where its bf16
                # input truncation stays under the 1-LSB budget: err_u8
                # ~ 2^-9 * |field| * noise_strength <= 5*strength/512,
                # and the tap weights must be bf16-exact (grain_size 2:
                # 0.25/0.75). Outside that envelope, keep the gathers.
                mx_ok = (g == 2 and p.noise_strength <= 32.0
                         and os.environ.get("PCRT_GRAIN_GATHER") != "1")
                if roll_ok:
                    pass
                elif not mx_ok:
                    c["grain_taps"] = tuple(jnp.asarray(a) for a in
                                            (*oops.bilinear_taps(gh, h), *oops.bilinear_taps(gw, w)))
                else:
                    # The 2-tap bilinear upsample as two small MXU
                    # matmuls (rows then cols, same order as the oracle):
                    # XLA lowers the take-based lerp to row/col gathers
                    # (fusion barriers; the 0.153 ms/f noise stage is
                    # mostly these), while R_h @ field @ R_w is two
                    # dense ops. For grain_size 2 the tap weights
                    # (0.25/0.75) are exact in bf16, so the default
                    # TPU matmul precision adds only the field's own
                    # ~2^-9 input rounding — ~1e-2 LSB after the
                    # noise_strength/255 scale, far under the 1-LSB
                    # budget (tests cover the composed engine).
                    self._grain_mx = True
                    xlo, xf = oops.bilinear_taps(gw, w)
                    rw = np.zeros((gw, w), np.float32)
                    np.add.at(rw, (xlo, np.arange(w)), 1.0 - xf)
                    np.add.at(rw, (np.minimum(xlo + 1, gw - 1), np.arange(w)), xf)
                    c["grain_rw"] = jnp.asarray(rw)
                    if self._grain_lerp:
                        c["grain_rh2"] = jnp.asarray(self.grain_row_matrix(
                            h, gh + 2, g, self.GRAIN2_ROWS)).astype(
                                jnp.bfloat16)
                        # column matrix for the all-in-kernel form
                        # (grain_raw): zero-padded to the 128-lane
                        # quantum so the raw-field operand blocks tile
                        # cleanly; the pad rows multiply zero columns
                        # (exact zeros)
                        c["grain_rw_bf"] = jnp.asarray(rw).astype(
                            jnp.bfloat16)
                        gwp = -(-gw // 128) * 128
                        c["grain_rw_kp"] = jnp.asarray(np.pad(
                            rw, ((0, gwp - gw), (0, 0)))).astype(
                                jnp.bfloat16)
                        if (self._pallas_fused
                                and self._fused_spec.grain_g > 1):
                            # the fused kernel's per-stripe (ty, wrows)
                            # row-upsample matrix, as a jit ARGUMENT
                            # (constants-as-arguments rule; advisor r3)
                            sp = self._fused_spec
                            wrows = -(-(sp.ty // sp.grain_g + 2) // 8) * 8
                            c["grain_rh_k"] = jnp.asarray(
                                self.grain_row_matrix(
                                    sp.ty, wrows, sp.grain_g,
                                    self.GRAIN2_ROWS)).astype(jnp.bfloat16)
                    else:
                        ylo, yf = oops.bilinear_taps(gh, h)
                        rh = np.zeros((h, gh), np.float32)
                        np.add.at(rh, (np.arange(h), ylo), 1.0 - yf)
                        np.add.at(rh, (np.arange(h),
                                       np.minimum(ylo + 1, gh - 1)), yf)
                        c["grain_rh"] = jnp.asarray(rh)

        if p.warp_on:
            if self._pallas_warp:
                from .kernels import warp as _kw

                # One-hot matmul masks: ~2 GB at 1080p, built ON DEVICE
                # (host->HBM would ship gigabytes; instead only the small
                # (H, W) tables cross the bus) and passed as jit args so
                # they live in HBM across steps.
                t = self._warp_tables
                # Compensated bf16 mask rounding: ONE matmul pass in
                # exact mode (worst case ~0.75 uint8 LSB pre-rint, still
                # within the <=1 LSB contract — bound and validation in
                # build_warp_masks / PARITY.md; engine suite green at
                # <=1 LSB with it forced). Saved 86 us/f at 1080p.
                # PCRT_WARP_2PASS=1 restores the 2^-17 two-pass split.
                self._warp_1pass = (
                    self._exact and os.environ.get("PCRT_WARP_2PASS") != "1"
                )
                c["warp_m"] = jax.jit(
                    functools.partial(_kw.build_warp_masks, wxd=t.wxd,
                                      byp=t.byp,
                                      exact=self._exact and not self._warp_1pass,
                                      split=t.split,
                                      compensated=self._warp_1pass)
                )(t.dxl, t.dxr, t.wx0, t.wx1, t.ylrel, t.yrrel, t.wy0, t.wy1)
            else:
                map_x, map_y = oracle.barrel_warp_maps(h, w, p.warp_strength)
                x0, fx = oops.split_map(map_x)
                y0, fy = oops.split_map(map_y)
                c["warp"] = tuple(jnp.asarray(a) for a in (y0, x0, fy, fx))

        if p.glitch_on:
            y0, rows = oracle.glitch_rows(h, p.glitch_height_frac)
            self._glitch_y0, self._glitch_rows = y0, rows
            if rows > 0:
                ridx = np.arange(rows, dtype=np.float32)
                if self.engine == "preview":
                    amp = float(p.glitch_amp_px) * np.exp(-3.0 * (ridx / max(1.0, float(rows))))
                else:
                    amp = float(p.glitch_amp_px) * (1.0 - ridx / max(1.0, float(rows)))
                    seg_len = max(8, min(32, w // 120 if w >= 120 else 8))
                    self._glitch_seg_len = seg_len
                    self._glitch_num_segs = (w + seg_len - 1) // seg_len
                    c["glitch_seg_index"] = jnp.asarray(
                        (np.arange(w, dtype=np.int32) // seg_len).astype(np.int32)
                    )
                c["glitch_amp"] = jnp.asarray(amp.astype(np.float32))

        if text_rgba is not None and self.params.text.enabled:
            ov = np.asarray(text_rgba)
            if ov.shape[:2] != (h, w):
                raise ValueError(f"text overlay shape {ov.shape[:2]} != frame {(h, w)}")
            c["text_alpha"] = jnp.asarray(ov[..., 3:4].astype(np.float32) / 255.0)
            c["text_rgb"] = jnp.asarray(ov[..., :3].astype(np.float32) / 255.0)
        self._has_text = "text_alpha" in c

        # When the Pallas warp is the LAST stage before the uint8 cast
        # (no text-after, no glitch, no persistence), it emits f32 in
        # [0, 255] and _finish rints that directly — the whole f32->u8
        # epilogue folds into the kernel's output pass.
        self._warp_emit_scaled = bool(
            self._pallas_warp
            and not p.persistence_on
            and not p.glitch_on
            and not (self._has_text and p.text.after)
        )
        # ... and when it is, the uint8 cast CAN fold into the kernel's
        # output store (PCRT_WARP_U8OUT=1) — but that measured SLOWER
        # on-chip (738 vs 815 fps c3: u8 stores of 8-row tiles RMW the
        # (32,128) u8 tiling), so the default keeps the f32 [0,255]
        # emit + XLA's clamp/convert pass. Opt-in kept for A/B.
        self._warp_emit_u8 = bool(
            self._warp_emit_scaled
            and os.environ.get("PCRT_WARP_U8OUT") == "1"
        )

        self._c = c

    @property
    def _base_key(self):
        """Base RNG key, re-derived from the Python-int seed INSIDE the
        trace (threefry seeding is deterministic, ~2 fused ops). A
        device-resident key captured as a closure constant stalled
        jaxpr->MLIR lowering for 60-70 s per process on this rig: the
        constant handler's `_value` fetch of the extended-dtype key
        array crawls through the axon relay (measured round 3,
        scripts/ — the CLI's whole "3-minute warm start" was this one
        8-byte constant).

        PCRT_RNG_IMPL selects the PRNG implementation for the NATIVE
        rng mode (default threefry2x32). "rbg" (XLA's hardware
        RngBitGenerator) measured +6 fps at 1080p but is a CLOSED
        round-4 decision, kept opt-in only: under vmap its draws are a
        function of the whole batched call shape, not of each frame's
        folded key — measured round 4 (test_native_rng_resume_invariant
        run with rbg: 32% of pixels differ when the same frames are
        re-rendered in a different batch split). That breaks the
        batch-, shard- and segment-resume-invariance rng="native"
        promises (draws must be a pure function of (seed, frame_idx)).
        threefry is counter-based per element, so the invariance holds
        for any batch/shard split; the test pins it."""
        impl = os.environ.get("PCRT_RNG_IMPL")
        return jax.random.key(self.seed, impl=impl) if impl \
            else jax.random.key(self.seed)

    # ------------------------------------------------------------------
    # Per-frame chain (vmapped over the batch axis)
    # ------------------------------------------------------------------

    def _frame_pre_bloom(self, c: dict, frame_u8: jax.Array, aux_row) -> jax.Array:
        """Stages 1-5 for one frame (vmapped).

        Stages 2-3 (aberration roll, pixelate gather) are static index
        maps, which commute with the /255 convert — so they run on the
        UINT8 input (4x less roll/gather traffic than after stage 1),
        with aberration composed into pixelate's per-channel x maps
        when both are on. Values are bit-identical either way."""
        p = self.params
        x = frame_u8

        if p.pixelate_on:  # stages 2+3 composed
            ys, xss = self._pix_shifts
            if self._pix_chan_maps:
                maps = (c["pix_x_r"], c["pix_x"], c["pix_x_b"])
                chans = []
                for ci in range(3):
                    if ys is not None and xss[ci] is not None:
                        chans.append(oresize.remap_nearest_rolls(
                            x[..., ci], c["pix_y"], maps[ci], ys, xss[ci]))
                    else:
                        chans.append(oresize.remap_nearest(
                            x[..., ci], c["pix_y"], maps[ci]))
                x = jnp.stack(chans, axis=-1)
            elif ys is not None and xss[1] is not None:
                x = oresize.remap_nearest_rolls(x, c["pix_y"], c["pix_x"], ys, xss[1])
            else:
                x = oresize.remap_nearest(x, c["pix_y"], c["pix_x"])
        elif p.aberration_on:  # stage 2 alone: wrap rolls on uint8
            x = jnp.stack(
                [
                    jnp.roll(x[..., 0], p.aberration_px, axis=1),
                    x[..., 1],
                    jnp.roll(x[..., 2], -p.aberration_px, axis=1),
                ],
                axis=-1,
            )

        img = x.astype(jnp.float32) / 255.0  # stage 1

        img = ocolor.color_adjust(  # stage 4
            img, p.brightness, p.contrast, p.gamma, p.saturation, p.temperature
        )

        if self._has_text and not p.text.after:  # stage 5
            img = ocolor.composite_text(img, c["text_alpha"], c["text_rgb"])
        return img

    def _frame_bloom_xla(self, c: dict, img: jax.Array) -> jax.Array:
        """Stage 6 (XLA path; the Pallas kernel replaces this on TPU for
        the gaussian variant)."""
        p = self.params
        src = img
        if p.bloom_threshold > 0.0:
            thr = np.float32(min(0.99, max(0.0, p.bloom_threshold)))
            src = jnp.clip((img - thr) / np.float32(max(1e-6, 1.0 - float(thr))), 0.0, 1.0)
        if p.fast_bloom:
            ds = oresize.resize_bilinear(src, *c["bloom_down"])
            blurred = oresize.resize_bilinear(ds, *c["bloom_up"])
        else:
            blurred = oblur.gaussian_blur_replicate(src, self._bloom_taps, self._bloom_taps)
        return jnp.clip(img + np.float32(p.bloom_strength) * blurred, 0.0, 1.0)

    def _frame_post_bloom(self, c: dict, img: jax.Array, aux_row) -> jax.Array:
        """Stages 7-11 for one frame (vmapped)."""
        p = self.params
        frame_idx, phase, flicker, noise, g_base, g_seg = aux_row

        if p.triad_on:  # stage 7
            img = ocolor.apply_triad(
                img, c["triad"], p.triad_gamma, p.triad_preserve_luma, self.lut_exact
            )

        if p.scanlines_on:  # stage 8
            if p.scanlines_1d:
                sl = self._scanline_mul_1d(c, phase)
                img = jnp.clip(img * sl[:, None, None], 0.0, 1.0)
            else:
                s = 0.5 * (1.0 + jnp.sin(self._sl_omega * (c["sl_slant"] + phase)))
                shaped = jnp.power(s, self._sl_inv_sharp)
                sl2 = 1.0 - np.float32(p.scanline_strength) * shaped
                img = jnp.clip(img * sl2[:, :, None], 0.0, 1.0)

        if p.vignette_on:  # stage 9
            r2 = c["vig_ny2"][:, None] + c["vig_nx2"][None, :]
            v = 1.0 - self._vig_strength * jnp.clip(r2, 0.0, 1.0)
            img = jnp.clip(img * v[:, :, None], 0.0, 1.0)

        if p.flicker_on:  # stage 10
            img = jnp.clip(img * flicker, 0.0, 1.0)

        if p.noise_on:  # stage 11
            field = self._grain_field(c, frame_idx, noise)
            field = field * np.float32(p.noise_strength / 255.0)
            img = jnp.clip(img + field[:, :, None], 0.0, 1.0)

        # stages 12-14 (warp, text-after, glitch) run at batch level in
        # _batch_effects so the Pallas kernels see whole batches.
        return img

    def _scanline_mul_1d(self, c: dict, phase) -> jax.Array:
        """Stage-8 1-D scanline multiplier (H,) for one frame — shared
        by the vmapped XLA epilogue and the fused-kernel operand builder
        (same traced ops, so the two paths are bit-identical)."""
        s = 0.5 * (1.0 + jnp.sin(self._sl_omega * (c["sl_y"] + phase)))
        return 1.0 - np.float32(self.params.scanline_strength) * s

    # (W-window index offset, row frac) per output-row residue k: for
    # g=2, full[2q] = 0.25*W[q] + 0.75*W[q+1] and full[2q+1] =
    # 0.75*W[q+1] + 0.25*W[q+2], where W = half padded with one
    # edge-replicated row on top (the replicate pad reproduces oracle
    # bilinear_taps' lo-clip/frac-clip edge rows: both reduce to the
    # edge row's value). Shared verbatim by the XLA row dot below and
    # the fused kernel's in-kernel dot (kernels/fused.py).
    GRAIN2_ROWS = ((0, np.float32(0.75)), (1, np.float32(0.25)))

    @staticmethod
    def grain_row_matrix(rows: int, cols: int, g: int, taps) -> np.ndarray:
        """(rows, cols) bf16 row-upsample matrix over a padded window:
        row r = q*g+k carries (1-frac[k], frac[k]) at cols (q+off[k],
        q+off[k]+1). bf16-exact weights + explicit bf16 operand casts
        make the XLA dot and the Mosaic in-kernel dot produce BITWISE
        identical f32: each product is exact in f32, the padding zeros
        add exactly, and the single p1+p2 rounding is order-free — a VPU
        slice/interleave lerp form measured ~500 us/f in Mosaic
        (sublane-offset slices + stack interleave), the MXU dot is free."""
        m = np.zeros((rows, cols), np.float32)
        for k, (off, fr) in enumerate(taps):
            rr = np.arange(k, rows, g)
            qq = rr // g
            m[rr, qq + off] = 1.0 - fr
            m[rr, qq + off + 1] = fr
        return m

    def _grain_rows_full(self, c: dict, half: jax.Array) -> jax.Array:
        """(gh, W) half-field -> (2*gh, W) row-upsampled field via the
        bf16 row-matrix dot (exact bilinear for H == 2*gh, cf.
        oracle/ops.py bilinear_taps; same bits as the fused kernel's
        in-register dot)."""
        halp = jnp.concatenate([half[:1], half, half[-1:]], 0)
        return jax.lax.dot(c["grain_rh2"], halp.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

    def _grain_field(self, c: dict, frame_idx, noise,
                     half: bool = False, raw: bool = False) -> jax.Array:
        """Stage-11 un-scaled grain field (H, W) for one frame: generate
        (native rng) or take the host field, then upsample. Shared by the
        vmapped XLA epilogue and the fused-kernel operand builder.

        half=True (grain-lerp mode only): return the column-upsampled
        (gh, W) half-field; the fused kernel lerps the rows in-register
        (its grain operand halves and the R_h dot disappears).

        (Columns-first upsample measured NEUTRAL at 1080p pre-lerp —
        with the row lerp it is the point: the MXU dot runs at gh rows.)"""
        p = self.params
        gh, gw = self._grain_hw
        if noise is None:
            key = jax.random.fold_in(self._base_key, frame_idx)
            # PCRT_GRAIN_DRAW=bf16: draw the normal field at bf16 (16
            # random bits/element -> half the threefry work; the values
            # land on the bf16 grid the MXU/kernel dots truncate to
            # anyway) and widen to f32 for the shared downstream paths.
            # Distribution-legal for rng="native" (PARITY.md); measured
            # NEUTRAL on-chip (c4 full-res grain, the worst case:
            # 1465.3 -> 1461.9 fps — threefry bit-gen is not the cost,
            # the box-muller transform is), so it stays opt-in/A/B.
            dt = (jnp.bfloat16 if os.environ.get("PCRT_GRAIN_DRAW") == "bf16"
                  else jnp.float32)
            field = _draw_normal(jax.random.fold_in(key, 11), gh, gw, dt)
        else:
            field = noise
        if p.grain_size > 1:
            if self._grain_roll:
                field = oresize.resize2x_roll(field, *c["grain_wy"],
                                              *c["grain_wx"])
            elif self._grain_mx:
                if self._grain_lerp:
                    if raw:
                        return field  # pre-upsample (gh, gw)
                    # explicit bf16 operands: the same bits as the
                    # in-kernel column dot (grain_raw mode) — 2-nonzero
                    # contractions are order-free in f32 accumulation
                    hf = jax.lax.dot(
                        field.astype(jnp.bfloat16), c["grain_rw_bf"],
                        preferred_element_type=jnp.float32)
                    field = hf if half else self._grain_rows_full(c, hf)
                else:
                    field = (c["grain_rh"] @ field) @ c["grain_rw"]
            else:
                field = oresize.resize_bilinear(field, *c["grain_taps"])
        return field

    def _glitch_seg_offsets(self, frame_idx, g_base, g_seg, c):
        """Per-frame glitch offsets at segment granularity: (rows, S)
        export / (rows, 1) preview. base + seg is constant within a
        segment, so per-segment values fully determine the per-pixel map
        (via the static segment index) and per-segment rint equals the
        reference's per-pixel rint (crt_filter.py:853-855)."""
        rows = self._glitch_rows
        amp = c["glitch_amp"]
        if self.engine == "preview":
            if g_base is None:
                key = jax.random.fold_in(self._base_key, frame_idx)
                offs = oglitch.native_preview_offsets(jax.random.fold_in(key, 14), rows, amp)
            else:
                offs = g_base
            return offs[:, None]  # (rows, 1)
        if g_base is None or g_seg is None:
            key = jax.random.fold_in(self._base_key, frame_idx)
            base, seg = oglitch.native_export_fields(
                jax.random.fold_in(key, 14), rows, self._glitch_num_segs, amp
            )
        else:
            base, seg = g_base, g_seg
        return base[:, None] + seg  # (rows, S)

    def _fused_stages(self, frames_u8, aux: FrameAux, c: dict):
        """Stages 1-11 in ONE Pallas stripe pass (kernels/fused.py) —
        plus stage 12 when the spec emits the warp kernel's planar
        [0,255] integer feed directly (uint8 by default, bf16 via
        PCRT_WARP_FEED — zero layout/domain glue between the two
        kernels). Returns (imgs, warped):

          warped=False: imgs NHWC f32 [0,1] after stage 11
          warped=True + _warp_emit_scaled: imgs PLANAR f32 [0,255]
            (_finish casts to uint8 and transposes — the cheapest
            possible layout restore, on 1-byte elements)
          warped=True otherwise: imgs NHWC f32 [0,1] after stage 12
        """
        from .kernels import fused as _kf

        spec = self._fused_spec
        planar = self.layout == "planar" and self.planar_ok
        if spec.pre:
            # planar: the frames already sit in the kernel's layout — the
            # u8 NHWC->planar relayout (xprof r3: ~48 us/f at 1080p)
            # disappears from the step entirely
            x = frames_u8 if planar else jnp.transpose(frames_u8, (0, 3, 1, 2))
        else:
            pre = jax.vmap(functools.partial(self._frame_pre_bloom, c))(frames_u8, aux)
            x = jnp.transpose(pre, (0, 3, 1, 2))
        kw = {}
        if spec.noise:
            hf = spec.grain_g > 1
            raw = hf and spec.grain_raw
            if aux.noise is None:
                fields = jax.vmap(
                    lambda fi: self._grain_field(c, fi, None, half=hf,
                                                 raw=raw)
                )(aux.frame_idx)
            else:
                fields = jax.vmap(
                    lambda fi, nz: self._grain_field(c, fi, nz, half=hf,
                                                     raw=raw)
                )(aux.frame_idx, aux.noise)
            if raw:
                # pad the raw-field columns to the operand's 128-lane
                # quantum (the R_w pad rows are zeros — exact products)
                gwp = c["grain_rw_kp"].shape[0]
                fields = jnp.pad(
                    fields, ((0, 0), (0, 0), (0, gwp - fields.shape[2])))
                kw["grain_rw"] = c["grain_rw_kp"]
            if hf:
                # (B, gh, W) half-fields -> (B, nyt, wrows, W) stripe
                # windows (one edge-replicated pad row on top, the
                # overlap rows can't be expressed as a plain BlockSpec).
                # wrows rounds ty/g+2 up to the 8-row sublane quantum —
                # a 22-row block forces Mosaic relayouts on every
                # program; the pad rows are replicated bottom rows the
                # kernel never reads
                tyg = spec.ty // spec.grain_g
                nyt = self.h // spec.ty
                wrows = -(-(tyg + 2) // 8) * 8
                pad_bot = wrows - tyg - 1
                halp = jnp.concatenate(
                    [fields[:, :1], fields]
                    + [fields[:, -1:]] * pad_bot, 1)
                fields = jnp.stack(
                    [jax.lax.slice_in_dim(halp, pp * tyg, pp * tyg + wrows,
                                          axis=1)
                     for pp in range(nyt)], 1)
            kw["grain"] = fields
            if spec.grain_g > 1:
                # the (ty, wrows) row-upsample matrix rides as a jit
                # argument (constants-as-arguments rule, advisor r3).
                # Sliced per-stripe form == the full-H matrix's stripe
                # blocks by construction (grain_row_matrix is
                # stripe-periodic: taps depend on row % ty only).
                kw["grain_rh"] = c["grain_rh_k"]
        if spec.scanlines:
            kw["sl"] = jax.vmap(
                lambda ph: self._scanline_mul_1d(c, ph)
            )(aux.phase)[:, :, None]
        if spec.vignette:
            kw["vy2"] = c["vig_ny2"][:, None]
            kw["vx2"] = c["vig_nx2"][None, :]
        if spec.triad:
            tri = jnp.transpose(c["triad"])  # (W, 3) -> (3, W)
            if spec.corder != (0, 1, 2):
                # plane i: color corder[i]
                tri = tri[np.array(spec.corder)]
            kw["tri"] = tri[:, None, :]  # (3, 1, W)
        if spec.flicker:
            kw["flicker"] = aux.flicker[:, None]
        out = _kf.fused_pipeline(x, spec, interpret=self._interpret, **kw)
        if self._fused_epi_xla:
            out = self._post_bloom_planar(out, aux, c)
        feed_warp = self.params.warp_on and self._pallas_warp
        if not feed_warp:
            if planar:
                return out, False  # stays planar through _finish
            return jnp.transpose(out, (0, 2, 3, 1)), False
        if self._fused_epi_xla:
            dt = (jnp.bfloat16 if os.environ.get("PCRT_WARP_FEED") == "bf16"
                  else jnp.uint8)
            out = jnp.rint(out * np.float32(255.0)).astype(dt)

        from .kernels import warp as _kw2

        warped = _kw2.warp_planar(
            out, self._warp_tables, c["warp_m"], self._interpret,
            self._exact and not getattr(self, "_warp_1pass", False),
            int_domain=True,
            debug=os.environ.get("PCRT_WARP_DEBUG", ""),
            emit_u8=self._warp_emit_u8,
        )
        if self._warp_emit_scaled:
            return warped, True
        if planar:
            return warped * np.float32(1.0 / 255.0), True
        return jnp.transpose(warped, (0, 2, 3, 1)) * np.float32(1.0 / 255.0), True

    def _post_bloom_planar(self, imgs, aux: FrameAux, c: dict):
        """Stages 7-11 on the planar (B, 3, H, W) layout in XLA — the
        same f32 op sequence per element as _frame_post_bloom (only the
        broadcasting direction differs), feeding the warp kernel without
        a layout change. PCRT_FUSED_EPI=xla A/B vs the in-kernel
        epilogue."""
        p = self.params
        if p.triad_on:  # stage 7
            # planes may be in gbr pipe order: permute the mask rows to
            # each plane's COLOR, same as the in-kernel epilogue brands
            # spec.corder (the luma inside permutes its gathers too)
            pc = self._fused_spec.corder if self._fused_spec else (0, 1, 2)
            tri = jnp.transpose(c["triad"])  # (W, 3) -> (3, W), rgb rows
            if pc != (0, 1, 2):
                tri = tri[np.array(pc)]
            imgs = ocolor.apply_triad_planar(
                imgs, tri[:, None, :],
                p.triad_gamma, p.triad_preserve_luma, self.lut_exact,
                corder=pc)
        if p.scanlines_on:  # stage 8
            if p.scanlines_1d:
                sl = jax.vmap(lambda ph: self._scanline_mul_1d(c, ph))(aux.phase)
                imgs = jnp.clip(imgs * sl[:, None, :, None], 0.0, 1.0)
            else:
                def sl2_of(ph):
                    s = 0.5 * (1.0 + jnp.sin(self._sl_omega * (c["sl_slant"] + ph)))
                    shaped = jnp.power(s, self._sl_inv_sharp)
                    return 1.0 - np.float32(p.scanline_strength) * shaped

                sl2 = jax.vmap(sl2_of)(aux.phase)  # (B, H, W)
                imgs = jnp.clip(imgs * sl2[:, None], 0.0, 1.0)
        if p.vignette_on:  # stage 9
            r2 = c["vig_ny2"][:, None] + c["vig_nx2"][None, :]
            v = 1.0 - self._vig_strength * jnp.clip(r2, 0.0, 1.0)
            imgs = jnp.clip(imgs * v[None, None], 0.0, 1.0)
        if p.flicker_on:  # stage 10
            imgs = jnp.clip(imgs * aux.flicker[:, None, None, None], 0.0, 1.0)
        if p.noise_on:  # stage 11
            if aux.noise is None:
                field = jax.vmap(
                    lambda fi: self._grain_field(c, fi, None)
                )(aux.frame_idx)
            else:
                field = jax.vmap(
                    lambda fi, nz: self._grain_field(c, fi, nz)
                )(aux.frame_idx, aux.noise)
            field = field * np.float32(p.noise_strength / 255.0)
            imgs = jnp.clip(imgs + field[:, None], 0.0, 1.0)
        return imgs

    def _batch_effects(self, frames_u8, aux: FrameAux, c: dict):
        """Full stateless chain over a batch: vmapped per-frame stages
        with the heavy structured ops (gaussian bloom 6, warp 12,
        glitch 14) lifted to batch level for the Pallas kernels (or XLA
        fallbacks). The fused stripe kernel replaces stages 1-11 (and
        feeds 12 directly) when _resolve_fused accepted the config."""
        p = self.params
        warped = False
        if self._pallas_fused:
            imgs, warped = self._fused_stages(frames_u8, aux, c)
            if warped and self._warp_emit_scaled:
                return imgs  # planar f32 [0,255]; _finish restores layout
        else:
            imgs = jax.vmap(functools.partial(self._frame_pre_bloom, c))(frames_u8, aux)
            if p.bloom_on:  # stage 6
                if self._pallas_bloom3:
                    from .kernels import bloom3 as _kb3

                    fn = _kb3.bloom3_fast_nhwc if self._bloom3_fast else _kb3.bloom3_nhwc
                    imgs = fn(imgs, self._bloom3_spec, self._interpret)
                elif self._pallas_bloom2:
                    from .kernels import bloom2 as _kb2

                    imgs = _kb2.bloom2_nhwc(
                        imgs, self._bloom2_spec, c["bloom2_m"], self._interpret
                    )
                elif self._pallas_bloom:
                    from .kernels import bloom as _kb

                    imgs = _kb.bloom_nhwc(imgs, self._bloom_spec, self._interpret)
                else:
                    imgs = jax.vmap(functools.partial(self._frame_bloom_xla, c))(imgs)
            imgs = jax.vmap(functools.partial(self._frame_post_bloom, c))(imgs, aux)

        if p.warp_on and not warped:  # stage 12
            if self._pallas_warp:
                from .kernels import warp as _kw

                imgs = _kw.warp_nhwc(
                    imgs, self._warp_tables, c["warp_m"], self._interpret,
                    self._exact and not getattr(self, "_warp_1pass", False),
                    int_domain=True,
                    emit_scaled=self._warp_emit_scaled,
                    emit_u8=self._warp_emit_u8,
                    # timing-probe modes (dma/noop: WRONG output) for the
                    # engine-level ablation — the only trusted instrument
                    # on this rig (standalone kernel timings are relay
                    # artifacts; see ROADMAP.md round 3)
                    debug=os.environ.get("PCRT_WARP_DEBUG", ""),
                )
            else:
                imgs = jax.vmap(
                    lambda im: owarp.bilinear_gather_const0(im, *c["warp"])
                )(imgs)

        if self._has_text and p.text.after:  # stage 13 (broadcasts over B)
            imgs = ocolor.composite_text(imgs, c["text_alpha"], c["text_rgb"])

        if p.glitch_on and self._glitch_rows > 0:  # stage 14
            seg_offs = jax.vmap(
                lambda fi, gb, gs: self._glitch_seg_offsets(fi, gb, gs, c)
            )(aux.frame_idx, aux.glitch_base, aux.glitch_seg)  # (B, rows, S)
            if self._pallas_glitch:
                from .kernels import glitch as _kg

                seg_len = self.w if self.engine == "preview" else self._glitch_seg_len
                # static |offset| bound from the static amplitude param
                # sizes the kernel's bounded window (preview draws are
                # CLIPPED to +-amp; export draws are |base| <= 0.4*amp
                # plus N(0, (0.7*amp)^2) segments — 8 sigma here is a
                # ~1e-15/draw event, and the runtime fits-cond still
                # routes any larger draw to the full-width kernel)
                if self.engine == "preview":
                    bound = float(p.glitch_amp_px)
                else:
                    bound = 6.0 * float(p.glitch_amp_px)
                if self.layout == "planar" and self.planar_ok:
                    # imgs stayed planar from the fused/warp chain; the
                    # glitch kernel is planar-native (no band transpose)
                    imgs = _kg.shear_band_batched_planar(
                        imgs, self._glitch_y0, seg_offs, seg_len,
                        self._interpret, self._exact, off_bound_px=bound,
                    )
                else:
                    imgs = _kg.shear_band_batched(
                        imgs, self._glitch_y0, seg_offs, seg_len,
                        self._interpret, self._exact, off_bound_px=bound,
                    )
            else:
                if self.engine == "preview":
                    per_px = seg_offs[:, :, 0]
                else:
                    per_px = jnp.take(seg_offs, c["glitch_seg_index"], axis=2)
                imgs = jax.vmap(
                    lambda im, o: oglitch.shear_band(im, self._glitch_y0, o)
                )(imgs, per_px)
        return imgs

    # ------------------------------------------------------------------
    # Batched step with persistence scan
    # ------------------------------------------------------------------

    def _finish(self, imgs, state, first_arr, allow_pallas: bool = True):
        """Persistence scan over the batch axis + uint8 cast (stage 15).

        allow_pallas=False keeps the lax.scan path — MultiClipEngine
        vmaps _finish over the clip axis, and a vmapped pallas_call is
        a measured pathology (ROADMAP.md round-1 notes)."""
        p = self.params
        planar = self.layout == "planar" and self.planar_ok
        if self._warp_emit_scaled:
            # imgs are f32 in [0, 255] — or already uint8 when the cast
            # folded into the warp kernel (_warp_emit_u8) — straight
            # from the warp (persistence is off by construction of the
            # flag); the uint8 cast is just rint + clip, no *255 pass.
            if imgs.dtype == jnp.uint8:
                out = imgs
                stt = imgs[-1].astype(jnp.float32) * np.float32(1.0 / 255.0)
            else:
                out = jnp.clip(jnp.rint(imgs), 0.0, 255.0).astype(jnp.uint8)
                stt = imgs[-1] * np.float32(1.0 / 255.0)
            if self._pallas_fused and (self._fused_spec.emit
                                       in ("bf16_255", "u8_255")
                                       or self._fused_epi_xla):
                if planar:
                    # planar layout: the kernel chain's layout IS the
                    # output layout — nothing left to restore
                    return out, stt
                # fused path kept the planar kernel layout end-to-end;
                # restore NHWC on the 1-byte output (4x cheaper than a
                # f32 transpose) and normalize the carried state.
                return (jnp.transpose(out, (0, 2, 3, 1)),
                        jnp.transpose(stt, (1, 2, 0)))
            return out, stt
        if p.persistence_on:
            if planar and self._pallas_persist and allow_pallas \
                    and self.w % 128 == 0:
                from .kernels import persist as _kp

                # planar (B, 3H, W) flatten is a free view of the planar
                # batch (no transpose contract needed at all)
                b = imgs.shape[0]
                outs, ns = _kp.persistence_scan(
                    imgs.reshape(b, 3 * self.h, self.w),
                    state.reshape(3 * self.h, self.w),
                    first_arr, p.persistence, self._interpret, emit_u8=True,
                )
                return outs.reshape(imgs.shape), ns.reshape(state.shape)
            if not planar and self._pallas_persist and allow_pallas:
                from .kernels import persist as _kp

                # Planar flatten + fused uint8 emit (one shared wrapper
                # carries the layout-bitcast contract for both this and
                # the multi-clip path — persist.persistence_scan_nhwc).
                return _kp.persistence_scan_nhwc(
                    imgs, state, first_arr, p.persistence, self._interpret,
                )
            pp = np.float32(p.persistence)
            om = np.float32(1.0 - p.persistence)
            first = first_arr[0]

            def blend(prev, cur):
                b = jnp.clip(pp * prev + om * cur, 0.0, 1.0)
                return b, b

            # First frame of a stream has no previous state: it passes
            # through unblended (crt_filter.py:1094-1095). `first` is a
            # traced flag so one compiled program serves both cases.
            out0 = jnp.where(
                first, imgs[0], jnp.clip(pp * state + om * imgs[0], 0.0, 1.0)
            )
            if self.assoc_scan:
                rest = self._assoc_persistence(imgs[1:], out0)
            else:
                _, rest = jax.lax.scan(blend, out0, imgs[1:])
            outs = jnp.concatenate([out0[None], rest], axis=0)
            new_state = outs[-1]
        else:
            outs = imgs
            new_state = imgs[-1]
        return ocolor.to_uint8(outs), new_state

    def _step(self, frames_u8, aux: FrameAux, state, first_arr, c: dict):
        if self.layout == "planar" and not self.planar_ok:
            # layout-compatible fallback (glitch / text-after / XLA-warp
            # configs): convert at the step edges; the body runs NHWC in
            # RGB order (inv[c] = which plane holds color c; XLA folds
            # the channel permute into the same relayout copy)
            pc = np.array(self._plane_colors)
            inv = np.argsort(pc)  # inv[c] = which plane holds color c
            frames_u8 = jnp.transpose(frames_u8, (0, 2, 3, 1))[..., inv]
            state = jnp.transpose(state, (1, 2, 0))[..., inv]
            out, ns = self._finish(
                self._batch_effects(frames_u8, aux, c), state, first_arr
            )
            return (jnp.transpose(out[..., pc], (0, 3, 1, 2)),
                    jnp.transpose(ns[..., pc], (2, 0, 1)))
        return self._finish(self._batch_effects(frames_u8, aux, c), state, first_arr)

    def _multi_step(self, frames_stack, aux_stack, state, first_arr, c: dict):
        """N sequential _step chunks inside ONE compiled dispatch.

        frames_stack: (n, B, ...) uint8; aux_stack: FrameAux whose
        leaves carry a leading (n, B, ...); state/first_arr as in
        _step. Returns ((n, B, ...) uint8 outputs, final state).

        lax.scan threads the persistence state chunk-to-chunk exactly
        like n successive _step calls (the first-frame flag drops after
        chunk 0), so the math is identical — the point is dispatch
        amortization: the per-call launch overhead (this rig's relay
        charges ~0.1 ms/frame of it at B=32; real hosts pay PCIe
        dispatch) is paid once per n chunks while the per-iteration
        working set stays one chunk. Used by the pipeline's
        steps_per_call batching and bench.py.
        """

        def body(carry, xs):
            st, first = carry
            frames, aux = xs
            out, ns = self._step(frames, aux, st, first, c)
            return (ns, jnp.zeros_like(first)), out

        (ns, _), outs = jax.lax.scan(
            body, (state, first_arr), (frames_stack, aux_stack))
        return outs, ns

    def _assoc_persistence(self, imgs, state0):
        """O(log B) associative scan for s_t = p*s_{t-1} + (1-p)*x_t.

        The pair (A, b) composes as (A2*A1, A2*b1 + b2); the clip in the
        reference is a mathematical no-op (convex combination of [0,1]
        values), applied once at the end for safety.
        """
        p = np.float32(self.params.persistence)
        om = np.float32(1.0 - self.params.persistence)
        n = imgs.shape[0]
        A = jnp.full((n,) + (1,) * (imgs.ndim - 1), p, imgs.dtype)
        b = om * imgs

        def combine(x, y):
            ax, bx = x
            ay, by = y
            return ax * ay, ay * bx + by

        As, bs = jax.lax.associative_scan(combine, (A, b), axis=0)
        return jnp.clip(As * state0[None] + bs, 0.0, 1.0)

    # ------------------------------------------------------------------
    # Host API
    # ------------------------------------------------------------------

    def make_aux(self, frame_indices: np.ndarray) -> FrameAux:
        """Build per-frame dynamic inputs for the given absolute frame
        indices. Host f64 scalar math matches the reference exactly
        (phase: crt_filter.py:1043, flicker: :632, time: :1064)."""
        p = self.params
        idx = np.asarray(frame_indices, dtype=np.int64)
        t = idx / float(self.fps)
        # keep the f64 phase: the reference seeds the glitch RNG from
        # int(|phase|*k) of the f64 value (crt_filter.py:841/:670), and a
        # f32 round near an integer boundary would flip the whole frame's
        # glitch field
        phase64 = t * p.scanline_speed_px_s
        phase = phase64.astype(np.float32)
        if p.flicker_on:
            flicker = (
                1.0 + 0.25 * p.flicker_strength * np.sin(2.0 * np.pi * p.flicker_hz * t)
            ).astype(np.float32)
        else:
            flicker = np.ones(idx.shape[0], np.float32)

        noise = g_base = g_seg = None
        if self.rng == "host":
            if p.noise_on:
                gh, gw = self._grain_hw
                # independent per-frame streams keyed by frame index
                noise = np.stack(
                    [
                        np.random.default_rng((self.seed, int(i))).standard_normal(
                            (gh, gw), dtype=np.float32
                        )
                        for i in idx
                    ]
                )
            if p.glitch_on and self._glitch_rows > 0:
                if self.engine == "preview":
                    g_base = np.stack(
                        [
                            oracle.glitch_offsets_preview(
                                self.h, self.w, float(ph), p.glitch_amp_px, p.glitch_height_frac
                            )
                            for ph in phase64
                        ]
                    )
                else:
                    bases, segs = [], []
                    for ph in phase64:
                        base, seg, _ = oracle.glitch_fields_export(
                            self.h, self.w, float(ph), p.glitch_amp_px, p.glitch_height_frac
                        )
                        bases.append(base)
                        segs.append(seg)
                    g_base, g_seg = np.stack(bases), np.stack(segs)

        return FrameAux(
            frame_idx=jnp.asarray(idx.astype(np.int32)),
            phase=jnp.asarray(phase),
            flicker=jnp.asarray(flicker),
            noise=None if noise is None else jnp.asarray(noise),
            glitch_base=None if g_base is None else jnp.asarray(g_base),
            glitch_seg=None if g_seg is None else jnp.asarray(g_seg),
        )

    def make_aux_at(self, times_sec, noise_fields=None) -> FrameAux:
        """Aux rows for arbitrary TIME positions. The GUI preview runs
        on wall-clock time rather than frame indices (reference on_tick,
        crt_filter.py:1810-1852), so phase/flicker derive from the given
        f64 times with the same formulas as make_aux, and host-rng noise
        takes INJECTED per-frame fields (the preview's time-seeded
        grain, gui_qt.render_preview_frame) instead of index-keyed
        draws. frame_idx is the nearest frame number (only native-rng
        keys read it)."""
        p = self.params
        t = np.asarray(times_sec, dtype=np.float64)
        phase64 = t * p.scanline_speed_px_s
        phase = phase64.astype(np.float32)
        if p.flicker_on:
            flicker = (1.0 + 0.25 * p.flicker_strength
                       * np.sin(2.0 * np.pi * p.flicker_hz * t)
                       ).astype(np.float32)
        else:
            flicker = np.ones(t.shape[0], np.float32)
        noise = g_base = g_seg = None
        if self.rng == "host":
            if p.noise_on:
                if noise_fields is None:
                    raise ValueError(
                        "host-rng preview aux needs injected noise_fields")
                noise = np.asarray(noise_fields, np.float32)
            if p.glitch_on and self._glitch_rows > 0:
                if self.engine == "preview":
                    g_base = np.stack([
                        oracle.glitch_offsets_preview(
                            self.h, self.w, float(ph), p.glitch_amp_px,
                            p.glitch_height_frac)
                        for ph in phase64])
                else:
                    bases, segs = [], []
                    for ph in phase64:
                        base, seg, _ = oracle.glitch_fields_export(
                            self.h, self.w, float(ph), p.glitch_amp_px,
                            p.glitch_height_frac)
                        bases.append(base)
                        segs.append(seg)
                    g_base, g_seg = np.stack(bases), np.stack(segs)
        return FrameAux(
            frame_idx=jnp.asarray(np.rint(t * self.fps).astype(np.int32)),
            phase=jnp.asarray(phase),
            flicker=jnp.asarray(flicker),
            noise=None if noise is None else jnp.asarray(noise),
            glitch_base=None if g_base is None else jnp.asarray(g_base),
            glitch_seg=None if g_seg is None else jnp.asarray(g_seg),
        )

    def process_at(self, frames_u8, times_sec, noise_fields=None,
                   state=None):
        """process() addressed by TIME instead of frame index (the GUI
        preview's access pattern — see make_aux_at). Same compiled step."""
        frames_u8 = jnp.asarray(frames_u8)
        aux = self.make_aux_at(times_sec, noise_fields)
        first = state is None
        if first:
            state = self.init_state()
        return self._jstep(
            frames_u8, aux, state, jnp.full((1,), first, jnp.bool_), self._c
        )

    def init_state(self) -> jax.Array:
        if self.layout == "planar":
            return jnp.zeros((3, self.h, self.w), jnp.float32)
        return jnp.zeros((self.h, self.w, 3), jnp.float32)

    def process(self, frames_u8, frame_indices=None, state=None):
        """Run a batch. frames_u8: (B, H, W, 3) uint8 (numpy or device)
        — or (B, 3, H, W) when the engine was built with layout="planar"
        (output and state shapes follow the same layout).
        Returns (out_u8 (B, H, W, 3) device array, new_state).

        Pass state=None for the first batch of a stream; thereafter pass
        the returned state to carry the persistence tail across batches.
        """
        frames_u8 = jnp.asarray(frames_u8)
        exp = ((3, self.h, self.w) if self.layout == "planar"
               else (self.h, self.w, 3))
        if frames_u8.shape[1:] != exp:
            raise ValueError(
                f"frames shape {frames_u8.shape[1:]} != {exp} for "
                f"layout={self.layout!r}")
        b = frames_u8.shape[0]
        if frame_indices is None:
            frame_indices = np.arange(b)
        aux = self.make_aux(np.asarray(frame_indices))
        first = state is None
        state_exp = ((3, self.h, self.w) if self.layout == "planar"
                     else (self.h, self.w, 3))
        if first:
            state = self.init_state()
        elif tuple(jnp.asarray(state).shape) != state_exp:
            # Stated deviation (PARITY.md): the reference bilinearly
            # resizes a shape-mismatched persistence carry mid-stream
            # (crt_filter.py:689-693 — a GUI-preview situation where the
            # preview size changes under a running stream). The export
            # engine compiles for ONE static shape, so it refuses
            # instead; the GUI preview path renders through the oracle,
            # which implements the resize-blend (oracle.persistence_blend).
            # (Static tuple compare — an init_state() call here would
            # allocate a full device zeros per steady-state batch.)
            raise ValueError(
                f"persistence state shape {jnp.asarray(state).shape} != "
                f"{state_exp}: CRTEngine does not resize a "
                "mid-stream carry (documented deviation, PARITY.md; the "
                "oracle/GUI preview path does)")
        return self._jstep(
            frames_u8, aux, state, jnp.full((1,), first, jnp.bool_), self._c
        )

    def process_stack(self, frames_stack, frame_indices, state=None):
        """Run n sequential chunks in ONE device dispatch (_multi_step).

        frames_stack: (n, B, H, W, 3) uint8 — or (n, B, 3, H, W) for
        layout="planar". frame_indices: (n, B) absolute frame indices.
        Returns ((n, B, ...) uint8 outputs, final persistence state) —
        bitwise identical to n successive process() calls (tested); the
        point is one dispatch's launch overhead per n chunks.
        """
        frames_stack = jnp.asarray(frames_stack)
        n, b = frames_stack.shape[0], frames_stack.shape[1]
        exp = ((3, self.h, self.w) if self.layout == "planar"
               else (self.h, self.w, 3))
        if frames_stack.shape[2:] != exp:
            raise ValueError(
                f"frames shape {frames_stack.shape[2:]} != {exp} for "
                f"layout={self.layout!r}")
        idx = np.asarray(frame_indices).reshape(n, b)
        aux = self.make_aux(idx.reshape(-1))
        aux = jax.tree.map(
            lambda a: jnp.reshape(a, (n, b) + a.shape[1:]), aux)
        first = state is None
        if first:
            state = self.init_state()
        return self._jmstep(
            frames_stack, aux, state, jnp.full((1,), first, jnp.bool_),
            self._c)

    def jitted_step(self):
        """The compiled step (frames, aux, state, first_arr, consts) ->
        (out_u8, state) — for benchmarking and sharded wrappers."""
        return self._jstep

    def jitted_multi_step(self):
        """The compiled n-chunk step (see _multi_step): stacked
        (n, B, ...) frames/aux in, (n, B, ...) outputs + final state
        out, one device dispatch per n chunks."""
        return self._jmstep
