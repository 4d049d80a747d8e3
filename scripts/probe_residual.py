"""Probe the c3 residual (~1.3 ms/frame, ROADMAP item 5) with honest
timings on the axon relay: every iteration CHAINS on the previous
result (x = f(x)), so no two calls have identical inputs and the relay
cannot dedup them (plain repeat-same-input loops measured 0.001
ms/frame for 1.6 GB of HBM traffic — physically impossible).

Run on the TPU: python scripts/probe_residual.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 32, 1080, 1920


def time_chain(name, fns, x0, iters=10):
    """fns: list of jitted fns composed per iteration, x = fN(...f1(x))."""
    x = x0
    for _ in range(2):  # two warmups (compile + relay hiccup)
        for f in fns:
            x = f(x)
    jax.block_until_ready(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        for f in fns:
            x = f(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / (iters * B) * 1e3
    print(f"{name:50s} {dt:7.3f} ms/frame", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    u8 = jax.device_put(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
    f32 = jax.device_put((rng.random((B, H, W, 3)) * 0.9 + 0.01).astype(np.float32))
    f32p = jax.device_put(jnp.transpose(f32, (0, 3, 1, 2)) + 0.0)

    print(f"backend {jax.default_backend()}  {B}x{H}x{W}", flush=True)

    to_f = jax.jit(lambda x: x.astype(jnp.float32) / 255.0)
    to_u = jax.jit(lambda x: jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8))
    time_chain("u8->f32->u8 round trip (NHWC)", [to_f, to_u], u8)

    fwd = jax.jit(lambda x: jnp.transpose(x, (0, 3, 1, 2)))
    back = jax.jit(lambda x: jnp.transpose(x, (0, 2, 3, 1)))
    time_chain("f32 NHWC<->planar transpose round trip", [fwd, back], f32)

    fwd8 = jax.jit(lambda x: jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32) / 255.0)
    back8 = jax.jit(lambda x: jnp.clip(
        jnp.round(jnp.transpose(x, (0, 2, 3, 1)) * 255.0), 0, 255).astype(jnp.uint8))
    time_chain("u8 NHWC -> f32 planar -> u8 NHWC (fused)", [fwd8, back8], u8)

    grade = jax.jit(lambda x: jnp.clip(jnp.power(
        jnp.clip((x - 0.5) * 1.002 + 0.001, 0, 1), 1 / 1.001), 0, 1))
    time_chain("grade chain f32 NHWC (pow+2clip)", [grade], f32)
    time_chain("grade chain f32 planar", [grade], f32p)

    copy = jax.jit(lambda x: x * np.float32(1.0000001))
    time_chain("1 HBM round trip f32 NHWC (x*c)", [copy], f32)
    time_chain("1 HBM round trip f32 planar", [copy], f32p)

    # pixelate (two axis-takes), measured alone
    from pythoncrt_tpu import oracle
    from pythoncrt_tpu.ops import resize as oresize

    ym, xm = oracle.pixelate_index_maps(H, W, 2)
    ymj, xmj = jnp.asarray(ym), jnp.asarray(xm)
    pix = jax.jit(lambda x: jax.vmap(
        lambda im: oresize.remap_nearest(im, ymj, xmj))(x) * np.float32(0.999))
    time_chain("pixelate two-takes (NHWC)", [pix], f32)
    pixp = jax.jit(lambda x: jnp.take(jnp.take(x, ymj, axis=2), xmj, axis=3)
                   * np.float32(0.999))
    time_chain("pixelate two-takes (planar)", [pixp], f32p)

    # gaussian bloom XLA (k=7 taps), NHWC vs planar
    from pythoncrt_tpu.oracle import ops as oops
    from pythoncrt_tpu.ops import blur as oblur

    taps = tuple(float(t) for t in oops.gaussian_kernel_1d(7, 1.2))
    bloomv = jax.jit(lambda x: jnp.clip(
        x + np.float32(0.25) * jax.vmap(
            lambda im: oblur.gaussian_blur_replicate(im, taps, taps))(x), 0, 1))
    time_chain("gaussian bloom k=7 (NHWC vmap)", [bloomv], f32)

    # fast bloom: taps path vs full-res stencil (planar)
    h2, w2 = H // 2, W // 2
    bd = tuple(jnp.asarray(a) for a in (*oops.bilinear_taps(H, h2), *oops.bilinear_taps(W, w2)))
    bu = tuple(jnp.asarray(a) for a in (*oops.bilinear_taps(h2, H), *oops.bilinear_taps(w2, W)))
    fb = jax.jit(lambda x: jnp.clip(x + np.float32(0.25) * jax.vmap(
        lambda im: oresize.resize_bilinear(
            oresize.resize_bilinear(im, *bd), *bu))(x), 0, 1))
    time_chain("fast bloom taps path (NHWC)", [fb], f32)

    def fast_bloom_stencil(x):  # planar (B,3,H,W)
        # Cy then Cx, 4-tap parity stencils == up(down(x)) per axis
        hpar = (jnp.arange(H, dtype=jnp.int32) % 2)[:, None].astype(jnp.float32)
        wpar = (jnp.arange(W, dtype=jnp.int32) % 2)[None, :].astype(jnp.float32)

        def axis_pass(v, axis, par):
            # even out: .125 v[-2] .125 v[-1] .375 v[0] .375 v[+1]
            # odd out:  .375 v[-1] .375 v[0] .125 v[+1] .125 v[+2]
            s = lambda k: jnp.roll(v, -k, axis=axis)  # noqa: E731
            even = 0.125 * s(-2) + 0.125 * s(-1) + 0.375 * s(0) + 0.375 * s(1)
            odd = 0.375 * s(-1) + 0.375 * s(0) + 0.125 * s(1) + 0.125 * s(2)
            return jnp.where(par > 0, odd, even)

        blur = axis_pass(axis_pass(x, 2, hpar[None, None]), 3, wpar[None, None])
        return jnp.clip(x + np.float32(0.25) * blur, 0, 1)

    time_chain("fast bloom full-res stencil (planar, approx)",
               [jax.jit(fast_bloom_stencil)], f32p)

    # noise stage: native RNG draw + grain upsample + add
    gh, gw = H // 2, W // 2
    gt = tuple(jnp.asarray(a) for a in (*oops.bilinear_taps(gh, H), *oops.bilinear_taps(gw, W)))
    key = jax.random.key(0)

    def noise_stage(x):
        f = jax.random.normal(key, (B, gh, gw), jnp.float32)
        f = jax.vmap(lambda g: oresize.resize_bilinear(g, *gt))(f)
        return jnp.clip(x + f[..., None] * np.float32(1.5 / 255.0), 0, 1)

    time_chain("noise: draw+upsample+add (NHWC)", [jax.jit(noise_stage)], f32)

    def noise_stage_p(x):
        f = jax.random.normal(key, (B, gh, gw), jnp.float32)
        f = jax.vmap(lambda g: oresize.resize_bilinear(g, *gt))(f)
        return jnp.clip(x + f[:, None] * np.float32(1.5 / 255.0), 0, 1)

    time_chain("noise: draw+upsample+add (planar)", [jax.jit(noise_stage_p)], f32p)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
