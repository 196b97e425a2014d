"""Premultiplied alpha-over compositing and u8 quantization.

The reference's compositing is whatever Cairo does under ``ctx.fill()`` —
source-over in premultiplied space onto an ARGB32 surface, with the stage
cleared to transparent each frame (reference canvas-renderer.ts:70-71).
Here each draw contributes ``src_premul * coverage`` over the accumulated
frame:

    dst = src_rgb * src_a * cov + dst * (1 - src_a * cov)

Final readback converts premultiplied float -> straight u8 the way
node-canvas/Cairo do on PNG export (divide by alpha, round).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def over_premul(dst_pm: jnp.ndarray, src_rgba: jnp.ndarray,
                coverage: jnp.ndarray) -> jnp.ndarray:
    """One painter's-algorithm step.

    dst_pm: (..., H, W, 4) premultiplied accumulator.
    src_rgba: (..., H, W, 4) straight-alpha source color field.
    coverage: (..., H, W) in [0, 1].
    """
    cov = coverage[..., None]
    src_a = src_rgba[..., 3:4]
    src_pm = jnp.concatenate(
        [src_rgba[..., :3] * src_a, src_a], axis=-1
    )
    return src_pm * cov + dst_pm * (1.0 - src_a * cov)


BLEND_MODES = (
    "multiply", "screen", "lighten", "darken", "difference", "add",
    "subtract", "invert", "overlay", "hardlight",
)

# Group-compositing modes: not separable color blends — they operate on
# the BACKDROP plane as a whole (Flash's layer/alpha/erase family).
# "layer" is plain source-over of the composed group; "alpha" rewrites
# the backdrop's alpha from the source's (a soft mask); "erase" removes
# backdrop where the source is opaque.  alpha/erase only make sense
# inside an offscreen group buffer — the scene compiler guarantees one.
GROUP_MODES = ("layer", "alpha", "erase")


def _blend_fn(mode: str):
    """Separable blend function B(Cb, Cs) on straight colors in [0, 1].

    W3C compositing-1 formulas for the shared modes; Flash's add /
    subtract are the clamped linear forms and ``invert`` ignores the
    source color entirely (1 - Cb) — framework extension semantics, the
    reference has no blend modes at all."""
    if mode == "multiply":
        return lambda cb, cs: cb * cs
    if mode == "screen":
        return lambda cb, cs: cb + cs - cb * cs
    if mode == "lighten":
        return jnp.maximum
    if mode == "darken":
        return jnp.minimum
    if mode == "difference":
        return lambda cb, cs: jnp.abs(cb - cs)
    if mode == "add":
        return lambda cb, cs: jnp.minimum(1.0, cb + cs)
    if mode == "subtract":
        return lambda cb, cs: jnp.maximum(0.0, cb - cs)
    if mode == "invert":
        return lambda cb, cs: 1.0 - cb
    if mode == "hardlight":
        return lambda cb, cs: jnp.where(
            cs <= 0.5, cb * (2.0 * cs),
            cb + (2.0 * cs - 1.0) - cb * (2.0 * cs - 1.0))
    if mode == "overlay":
        hl = _blend_fn("hardlight")
        return lambda cb, cs: hl(cs, cb)
    raise ValueError(f"unsupported blend mode {mode!r}")


def blend_premul(dst_pm: jnp.ndarray, src_pm: jnp.ndarray, mode: str,
                 channel_axis: int = -1) -> jnp.ndarray:
    """Composite premultiplied ``src_pm`` onto ``dst_pm`` under a blend
    mode (PDF/W3C group compositing):

        Co_pm = (1-ab)*Cs_pm + (1-as)*Cb_pm + as*ab*B(Cb, Cs)
        ao    = as + ab - as*ab

    ``channel_axis`` locates the 4-wide (r, g, b, a) axis (the fused
    kernel's planes keep it at axis 2; image-space frames at -1).

    The GROUP_MODES bypass the separable formula: on premultiplied
    planes "layer" is source-over, "alpha" scales every backdrop
    channel by the source alpha (premul algebra keeps color/alpha
    consistent under a pure alpha rescale), and "erase" scales by its
    complement."""

    def take(x, sl):
        idx = [slice(None)] * x.ndim
        idx[channel_axis] = sl
        return x[tuple(idx)]

    if mode in GROUP_MODES:
        src_a = take(src_pm, slice(3, 4))
        if mode == "layer":
            return src_pm + dst_pm * (1.0 - src_a)
        if mode == "alpha":
            return dst_pm * src_a
        return dst_pm * (1.0 - src_a)
    b = _blend_fn(mode)

    src_rgb = take(src_pm, slice(0, 3))
    src_a = take(src_pm, slice(3, 4))
    dst_rgb = take(dst_pm, slice(0, 3))
    dst_a = take(dst_pm, slice(3, 4))
    cs = src_rgb / jnp.maximum(src_a, 1e-6)
    cb = dst_rgb / jnp.maximum(dst_a, 1e-6)
    out_rgb = ((1.0 - dst_a) * src_rgb + (1.0 - src_a) * dst_rgb
               + src_a * dst_a * b(cb, cs))
    out_a = src_a + dst_a - src_a * dst_a
    return jnp.concatenate([out_rgb, out_a], axis=channel_axis)


def composite_draws(coverages: jnp.ndarray, colors: jnp.ndarray) -> jnp.ndarray:
    """Composite P draws in order.  coverages (P, H, W), colors (P, H, W, 4)
    straight RGBA -> (H, W, 4) premultiplied float."""

    def step(dst, inputs):
        cov, col = inputs
        return over_premul(dst, col, cov), None

    p, h, w = coverages.shape
    init = jnp.zeros((h, w, 4), jnp.float32)
    out, _ = jax.lax.scan(step, init, (coverages, colors))
    return out


def premul_to_straight_u8(frame_pm: jnp.ndarray) -> jnp.ndarray:
    """Premultiplied float RGBA -> straight u8 through PREMULTIPLIED-u8
    quantization (ARGB32 parity).

    Both behavior-defining pipelines store premultiplied *bytes* and derive
    straight RGBA from them: Cairo/node-canvas surfaces are ARGB32
    (getImageData / PNG export un-premultiplies the quantized bytes), and
    the Flash player captures the same way — at alpha 2 the only straight
    channel values that exist are {0, 128, 255}.  Quantizing straight
    values directly (the previous behavior) diverges by up to 127 u8 steps
    on low-alpha AA edge pixels even when the premultiplied pixel agrees
    exactly; this path reproduces the goldens' low-alpha structure.
    Pixels whose alpha byte is 0 are fully zero (premultiplied surfaces
    carry no color at zero alpha)."""
    a8 = jnp.round(jnp.clip(frame_pm[..., 3:4], 0.0, 1.0) * 255.0)
    # Premul bytes never exceed the alpha byte (min bounds the top; premul
    # channels are nonnegative so no low clip), and a8 == 0 forces pm8 == 0
    # hence rgb8 == 0 — no visibility select needed.
    pm8 = jnp.minimum(jnp.round(frame_pm[..., :3] * 255.0), a8)
    rgb8 = jnp.round(pm8 * (255.0 / jnp.maximum(a8, 1.0)))
    return jnp.concatenate([rgb8, a8], axis=-1).astype(jnp.uint8)


def composite_to_u8(coverages, colors) -> np.ndarray:
    return np.asarray(premul_to_straight_u8(composite_draws(coverages, colors)))


def composite_solid_layers(coverages: jnp.ndarray,
                           colors: jnp.ndarray) -> jnp.ndarray:
    """Painter's-algorithm composite of CONSTANT-color layers.

    coverages (L, H, W), colors (L, 4) straight RGBA ->
    (H, W, 4) premultiplied float.  The common inner step of every batched
    solid pipeline (direct, scanline, sharded)."""

    def step(dst, inputs):
        cov, col = inputs
        src_a = col[3]
        src_pm = jnp.concatenate([col[:3] * src_a, col[3:]], axis=0)
        return (
            src_pm[None, None, :] * cov[..., None]
            + dst * (1.0 - src_a * cov[..., None]),
            None,
        )

    _, h, w = coverages.shape
    init = jnp.zeros((h, w, 4), jnp.float32)
    out, _ = jax.lax.scan(step, init, (coverages, colors))
    return out
