"""Fill-style (paint) evaluation: per-pixel straight-alpha RGBA fields.

Replaces the Canvas2D paint machinery the reference leans on
(reference ts/src/lib/renderers/canvas-renderer.ts:292-334):

* solid colors (canvas-renderer.ts:317-318),
* focal/radial gradients via ``createRadialGradient(lerp(0, 16384, focal), 0,
  0 -> 0, 0, 16384)`` — the SWF gradient square has radius 16384 twips
  (canvas-renderer.ts:320-330),
* bitmap patterns with a fill matrix, repeat/no-repeat and a smoothing flag
  (canvas-renderer.ts:295-315); a registered-but-undecoded bitmap falls back
  to the placeholder color rgba(0.2, 0.6, 0.8, 0.9) (canvas-renderer.ts:299),
* linear gradients per the SWF spec (x from -16384 to 16384) — the reference
  leaves these unimplemented and throws (canvas-renderer.ts:332-333); we
  support them as a framework extension.

Everything here is elementwise/gather XLA that fuses behind ``jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GRAD_RADIUS = 16384.0

SPREAD_PAD = 0
SPREAD_REFLECT = 1
SPREAD_REPEAT = 2

PAINT_SOLID = 0
PAINT_LINEAR = 1
PAINT_FOCAL = 2
PAINT_BITMAP = 3


@dataclasses.dataclass(frozen=True)
class Paint:
    """A resolved, device-space paint.

    ``inv_matrix`` maps device pixel coordinates into paint space (gradient
    units / bitmap pixels): the inverse of CTM ∘ fill_matrix.
    """

    kind: int
    color: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    inv_matrix: Tuple[float, float, float, float, float, float] = (
        1.0, 0.0, 0.0, 1.0, 0.0, 0.0,
    )
    # Gradients
    stop_ratios: Optional[np.ndarray] = None  # (K,) f32 in [0, 1]
    stop_colors: Optional[np.ndarray] = None  # (K, 4) f32 straight RGBA
    focal_point: float = 0.0
    spread: int = SPREAD_PAD
    # SWF gradient interpolation space: "s-rgb" interpolates stop colors
    # directly (the reference's behavior — it ignores the flag);
    # "linear-rgb" applies the sRGB transfer function around the
    # interpolation, per the SWF colorSpace flag.
    color_space: str = "s-rgb"
    # Bitmaps
    image: Optional[np.ndarray] = None  # (h, w, 4) uint8
    repeating: bool = False
    smoothed: bool = True
    # Non-repeating pattern edge semantics: 'canvas' renders TRANSPARENT
    # outside the image — Canvas2D createPattern('no-repeat') semantics
    # (canvas-renderer.ts:306-309) AND the player's measured behavior
    # (the textured golden matches the fade, PERF.md round 2; the scene
    # compiler passes 'canvas' for every quality).  'flash' clamps edge
    # texels outward (kept for comparison studies).
    edge_mode: str = "flash"
    # Flash renders at quality "high" by supersampling 4x4 per pixel; the
    # golden corpus was captured from the real player at that quality
    # (reference tests/capture/server/index.js), so bitmap paints default to
    # the same 4x4 box-supersampled sampling.  Set 1 for raw bilinear.
    supersample: int = 4


def solid_paint(rgba) -> Paint:
    return Paint(kind=PAINT_SOLID, color=tuple(float(c) for c in rgba))


def _apply_spread(t, spread: int):
    if spread == SPREAD_PAD:
        return jnp.clip(t, 0.0, 1.0)
    if spread == SPREAD_REPEAT:
        return jnp.mod(t, 1.0)
    if spread == SPREAD_REFLECT:
        m = jnp.mod(t, 2.0)
        return 1.0 - jnp.abs(m - 1.0)
    raise ValueError(f"unknown spread {spread}")


def _interp_stops(t, ratios, colors):
    """Piecewise-linear color ramp (Canvas gradient semantics), straight
    alpha.  ``t``: (H, W); ratios (K,), colors (K, 4)."""
    flat = t.reshape(-1)
    channels = [
        jnp.interp(flat, ratios, colors[:, ch]).reshape(t.shape)
        for ch in range(4)
    ]
    return jnp.stack(channels, axis=-1)


def _focal_gradient_t(sx, sy, focal_point: float):
    """Canvas createRadialGradient((f*R, 0), 0) -> ((0, 0), R) parameter.

    With circles c(t) = lerp(c0, 0) and r(t) = t*R, solve |p - c(t)| = r(t)
    for the largest t (the canvas spec picks the greatest ω with r(ω) > 0).
    """
    fx = focal_point * GRAD_RADIUS
    pdx = sx - fx
    pdy = sy
    cdx = -fx  # c1 - c0
    dr = GRAD_RADIUS
    a = cdx * cdx - dr * dr
    b = pdx * cdx  # r0 = 0
    cc = pdx * pdx + pdy * pdy
    # |pd - t*cd|^2 = (t*R)^2  ->  a t^2 - 2 b t + cc = 0
    #   ->  t = (b ± sqrt(b² - a cc)) / a   (NOT (-b ± sq)/a: the linear
    # coefficient is -2b, a sign an earlier revision dropped — verified
    # against a brute-force circle solve: f=0.5, p=(R,0) must give t=1).
    disc = jnp.maximum(b * b - a * cc, 0.0)
    sq = jnp.sqrt(disc)
    safe_a = jnp.where(jnp.abs(a) < 1e-6, 1e-6, a)
    t1 = (b + sq) / safe_a
    t2 = (b - sq) / safe_a
    # The canvas spec picks the greatest ω.
    t = jnp.maximum(t1, t2)
    # Degenerate a ~ 0 (focal on the rim): -2 b t + cc = 0.  Guard the
    # denominator: the where() discards the b ~ 0 lane but the division
    # still executes (and warns) on it.
    safe_b = jnp.where(jnp.abs(b) < 1e-9, 1e-9, b)
    t_lin = jnp.where(jnp.abs(b) < 1e-9, 0.0, cc / (2.0 * safe_b))
    return jnp.where(jnp.abs(a) < 1e-6, t_lin, t)


def _fetch(img, ix, iy, repeating: bool, edge_mode: str = "flash"):
    """Texel fetch: repeating fills wrap; clipped fills clamp edge texels
    outward under 'flash' edge_mode (the player's behavior) or read as
    transparent outside the image under 'canvas' edge_mode (Canvas2D
    no-repeat pattern semantics, canvas-renderer.ts:306-309)."""
    h, w = img.shape[:2]
    if repeating:
        ix = jnp.mod(ix, w).astype(jnp.int32)
        iy = jnp.mod(iy, h).astype(jnp.int32)
        return img[iy, ix]
    cx = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
    cy = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
    texel = img[cy, cx]
    if edge_mode == "canvas":
        inside = ((ix >= 0) & (ix <= w - 1)
                  & (iy >= 0) & (iy <= h - 1))[..., None]
        return jnp.where(inside, texel, 0.0)
    return texel


def _bilinear_sample(img, sx, sy, repeating: bool,
                     edge_mode: str = "flash"):
    """Sample (h, w, 4) float at coords (texel centers at integer+0.5)."""
    x = sx - 0.5
    y = sy - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    c00 = _fetch(img, x0, y0, repeating, edge_mode)
    c10 = _fetch(img, x0 + 1, y0, repeating, edge_mode)
    c01 = _fetch(img, x0, y0 + 1, repeating, edge_mode)
    c11 = _fetch(img, x0 + 1, y0 + 1, repeating, edge_mode)
    top = c00 * (1.0 - tx) + c10 * tx
    bot = c01 * (1.0 - tx) + c11 * tx
    return top * (1.0 - ty) + bot * ty


def _nearest_sample(img, sx, sy, repeating: bool, edge_mode: str = "flash"):
    return _fetch(img, jnp.floor(sx), jnp.floor(sy), repeating, edge_mode)




def _srgb_to_linear(c):
    """sRGB EOTF, applied to straight RGB channels (alpha stays linear)."""
    return jnp.where(c <= 0.04045, c / 12.92,
                     ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c):
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * c ** (1.0 / 2.4) - 0.055)


def _gradient_rgba(paint: Paint, t) -> jnp.ndarray:
    """Stop interpolation honoring the SWF colorSpace flag."""
    ratios = jnp.asarray(paint.stop_ratios, jnp.float32)
    colors = jnp.asarray(paint.stop_colors, jnp.float32)
    if paint.color_space == "linear-rgb":
        colors = jnp.concatenate(
            [_srgb_to_linear(colors[:, :3]), colors[:, 3:]], axis=1)
        out = _interp_stops(t, ratios, colors)
        return jnp.concatenate(
            [_linear_to_srgb(out[..., :3]), out[..., 3:]], axis=-1)
    return _interp_stops(t, ratios, colors)


def paint_field(paint: Paint, height: int, width: int) -> jnp.ndarray:
    """Evaluate a paint to an (H, W, 4) straight-alpha RGBA field.

    Solid paints take a constant fast path; gradient/bitmap paints compute
    per-pixel fields that XLA fuses with the subsequent compositing.
    """
    if paint.kind == PAINT_SOLID:
        color = jnp.asarray(paint.color, dtype=jnp.float32)
        return jnp.broadcast_to(color, (height, width, 4))

    if paint.kind in (PAINT_LINEAR, PAINT_FOCAL):
        # One implementation: the traced twin with a concrete matrix
        # (identical math — python-float scalars weak-type to f32 like
        # the f32 array elements it indexes).
        return paint_field_traced(
            paint, np.asarray(paint.inv_matrix, np.float32), height,
            width)

    if paint.kind == PAINT_BITMAP:
        img = jnp.asarray(paint.image).astype(jnp.float32) / 255.0
        # Filter PREMULTIPLIED (Cairo/ARGB32 semantics): averaging straight
        # RGBA against transparent padding darkens colors at fade-outs
        # (e.g. the canvas no-repeat edge); premultiplied filtering keeps
        # the straight color and fades only alpha.  Un-premultiplied at the
        # end — paint_field's contract is straight RGBA.
        img = img.at[..., :3].multiply(img[..., 3:4])
        a, b, c, d, e, f = paint.inv_matrix
        n = max(1, int(paint.supersample))
        if b == 0.0 and c == 0.0 and paint.smoothed:
            # Axis-aligned case (every corpus bitmap fill): supersampled
            # bilinear sampling is SEPARABLE — fold the subsample box
            # filter and the bilinear hats into one resampling-weight
            # matrix per axis and evaluate as two small matmuls on the
            # MXU instead of 64 gathers per pixel (~50x faster).
            # Downscaled axes (footprint >= 1 texel) use the EXACT box
            # filter (area average — pixman GOOD / player semantics);
            # upscaled axes keep supersampled bilinear.  supersample=1
            # explicitly requests RAW bilinear (the documented contract),
            # so the box substitution only applies when supersampling.
            wx = _separable_axis_weights(
                paint, width, img.shape[1], a, e)   # (W_out, W_img)
            wy = _separable_axis_weights(
                paint, height, img.shape[0], d, f)  # (H_out, H_img)
            # (H_img, W_img, 4) -> (H_out, W_out, 4)
            tmp = jnp.einsum("hwc,xw->hxc", img, wx,
                             precision=jax.lax.Precision.HIGHEST)
            return _unpremul(jnp.einsum("hxc,yh->yxc", tmp, wy,
                                        precision=jax.lax.Precision.HIGHEST))

        th, tw = int(paint.image.shape[0]), int(paint.image.shape[1])
        from .texfield import (
            MAX_KERNEL_TEXELS, auto_ywin, bitmap_field_planes,
        )

        if th * tw <= MAX_KERNEL_TEXELS:
            # Non-axis-aligned sampling: the gather path costs 16
            # fetches/px at supersample 2 (measured 49.8 ms/frame at
            # 512^2 on TPU); the MXU contraction kernel is ~26x faster
            # and agrees to ~1e-4 (PERF.md, tests/test_texfield.py).
            invs_np = np.asarray([paint.inv_matrix], np.float32)
            return bitmap_field_planes(
                paint.image, invs_np,
                height, width, supersample=n,
                repeating=paint.repeating, smoothed=paint.smoothed,
                edge_mode=paint.edge_mode,
                ywin=auto_ywin(invs_np, th,
                               repeating=paint.repeating))[0]

        # Large textures (beyond the MXU kernel's texel budget): one
        # implementation of the supersampled gather — the traced twin.
        return paint_field_traced(
            paint, np.asarray(paint.inv_matrix, np.float32), height,
            width)

    raise ValueError(f"unknown paint kind {paint.kind}")


def _unpremul(field_pm):
    """Premultiplied RGBA field -> straight (paint_field's contract)."""
    alpha = field_pm[..., 3:4]
    safe = jnp.maximum(alpha, 1e-6)
    rgb = jnp.where(alpha > 1e-6, field_pm[..., :3] / safe, 0.0)
    return jnp.concatenate([rgb, alpha], axis=-1)


def paint_field_traced(paint: Paint, inv6, height: int, width: int,
                       stop_colors=None) -> jnp.ndarray:
    """``paint_field`` with a TRACED device->paint matrix.

    The per-frame twin used by the transform sweep's field baking
    (ops.transform.bake_sweep_fields): ``inv6`` is a (6,) traced array
    (the paint inverse composed with each frame's inverse), so one jit
    of this function vmaps over a whole animation's frames.  Bitmap
    paints always take the general supersampled gather path — the
    axis-aligned separable fast path needs concrete b/c to specialize,
    and an animating matrix is not concrete — which is exactly the path
    ``paint_field`` takes for any rotated frame, so per-frame renders
    and sweep-baked fields agree bit-for-bit on non-axis-aligned
    animations.  ``stop_colors``: optional (K, 4) traced override of a
    gradient's stop colors (per-frame color-transform fades)."""
    a, b, c, d, e, f = (inv6[k] for k in range(6))
    if paint.kind == PAINT_SOLID:
        color = jnp.asarray(paint.color, dtype=jnp.float32)
        return jnp.broadcast_to(color, (height, width, 4))

    if paint.kind in (PAINT_LINEAR, PAINT_FOCAL):
        py = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5
        px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
        sx = a * px + c * py + e
        sy = b * px + d * py + f
        if paint.kind == PAINT_LINEAR:
            t = (sx + GRAD_RADIUS) / (2.0 * GRAD_RADIUS)
        else:
            t = _focal_gradient_t(sx, sy, paint.focal_point)
        t = _apply_spread(t, paint.spread)
        if stop_colors is None:
            return _gradient_rgba(paint, t)
        ratios = jnp.asarray(paint.stop_ratios, jnp.float32)
        colors = jnp.asarray(stop_colors, jnp.float32)
        if paint.color_space == "linear-rgb":
            colors = jnp.concatenate(
                [_srgb_to_linear(colors[:, :3]), colors[:, 3:]], axis=1)
            out = _interp_stops(t, ratios, colors)
            return jnp.concatenate(
                [_linear_to_srgb(out[..., :3]), out[..., 3:]], axis=-1)
        return _interp_stops(t, ratios, colors)

    if paint.kind == PAINT_BITMAP:
        img = jnp.asarray(paint.image).astype(jnp.float32) / 255.0
        img = img.at[..., :3].multiply(img[..., 3:4])  # premul filtering
        n = max(1, int(paint.supersample))
        sample = _bilinear_sample if paint.smoothed else _nearest_sample
        py = jnp.arange(height, dtype=jnp.float32)[:, None]
        px = jnp.arange(width, dtype=jnp.float32)[None, :]
        acc = jnp.zeros((height, width, 4), jnp.float32)
        for ky in range(n):
            for kx in range(n):
                ox = (kx + 0.5) / n
                oy = (ky + 0.5) / n
                ssx = a * (px + ox) + c * (py + oy) + e
                ssy = b * (px + ox) + d * (py + oy) + f
                acc = acc + sample(img, ssx, ssy, paint.repeating,
                                   paint.edge_mode)
        return _unpremul(acc / (n * n))

    raise ValueError(f"unknown paint kind {paint.kind}")


def _box_weights(n_out: int, n_img: int, scale: float, offset: float,
                 repeating: bool, edge_mode: str = "flash") -> jnp.ndarray:
    """(n_out, n_img) EXACT box-filter weights along one axis: output pixel
    i averages the texels its footprint [scale*i+offset, scale*(i+1)+offset)
    overlaps (texel j covers [j, j+1) in sample space, matching _fetch's
    floor convention).  This is the n -> infinity limit of the
    supersampled-nearest sampling and the correct area-average for
    DOWNSCALED patterns: measured on the textured golden it beats the 4x4
    bilinear approximation 0.0533 -> ~0.02 of pixels >2/255 (PERF.md).
    Matches pixman's GOOD-filter downscale behavior (area averaging) and
    the player's."""
    out = np.arange(n_out, dtype=np.float64)[:, None]
    lo = scale * out + offset
    hi = scale * (out + 1.0) + offset
    lo, hi = np.minimum(lo, hi), np.maximum(lo, hi)
    length = np.maximum(hi - lo, 1e-12)
    j = np.arange(n_img, dtype=np.float64)[None, :]
    if repeating:
        w = np.zeros((n_out, n_img))
        k0 = int(np.floor(lo.min() / n_img))
        k1 = int(np.floor(hi.max() / n_img))
        for k in range(k0, k1 + 1):
            jj = j + k * n_img
            w += np.clip(np.minimum(hi, jj + 1.0) - np.maximum(lo, jj),
                         0.0, None)
    else:
        w = np.clip(np.minimum(hi, j + 1.0) - np.maximum(lo, j), 0.0, None)
        if edge_mode != "canvas":
            # Clamp-to-edge: out-of-range footprint lands on edge texels.
            w[:, 0:1] += np.clip(np.minimum(hi, 0.0) - lo, 0.0, None)
            w[:, -1:] += np.clip(hi - np.maximum(lo, float(n_img)), 0.0,
                                 None)
    return np.asarray(w / length, np.float32)


def _resample_weights(n_out: int, n_img: int, scale: float, offset: float,
                      supersample: int, repeating: bool,
                      edge_mode: str = "flash") -> np.ndarray:
    """(n_out, n_img) weights: output pixel i = sum_j w[i, j] * img[j]
    under box-supersampled bilinear sampling along one axis
    (coords = scale * (i + (k+0.5)/n) + offset, texel centers at +0.5),
    with SWF wrap (repeat) or clamp-to-edge semantics — exactly the
    weights the gather path (_bilinear_sample/_fetch) applies.  Computed
    host-side in f32 (mirrors the former jnp trace math bit-for-bit:
    concrete python scalars weak-typed to f32 either way)."""
    out_ids = np.arange(n_out, dtype=np.float32)[:, None]
    img_ids = np.arange(n_img, dtype=np.float32)[None, :]
    w = np.zeros((n_out, n_img), np.float32)
    f32 = np.float32
    for k in range(supersample):
        coord = (f32(scale) * (out_ids + f32((k + 0.5) / supersample))
                 + f32(offset) - f32(0.5))
        x0 = np.floor(coord)
        t = coord - x0
        if repeating:
            i0 = np.mod(x0, f32(n_img))
            i1 = np.mod(x0 + f32(1.0), f32(n_img))
        elif edge_mode == "canvas":
            # Out-of-range taps contribute nothing (transparent outside):
            # leave the raw indices so the one-hot match fails.
            i0, i1 = x0, x0 + f32(1.0)
        else:
            i0 = np.clip(x0, f32(0.0), f32(n_img - 1.0))
            i1 = np.clip(x0 + f32(1.0), f32(0.0), f32(n_img - 1.0))
        w = w + np.where(img_ids == i0, f32(1.0) - t, f32(0.0))
        w = w + np.where(img_ids == i1, t, f32(0.0))
    return (w / f32(supersample)).astype(np.float32)


def _separable_axis_weights(paint: "Paint", n_out: int, n_img: int,
                            scale: float, offset: float) -> np.ndarray:
    """One axis of the separable (axis-aligned, smoothed) resampling:
    the EXACT box filter on downscaled axes when supersampling (pixman
    GOOD / player semantics), folded supersampled bilinear otherwise —
    the single definition shared by the per-frame path (paint_field) and
    the sweep bake (ops.transform.bake_sweep_fields), so both produce
    identical fields for axis-aligned frames."""
    n = max(1, int(paint.supersample))
    if abs(scale) >= 1.0 and n > 1:
        return _box_weights(n_out, n_img, scale, offset,
                            paint.repeating, paint.edge_mode)
    return _resample_weights(n_out, n_img, scale, offset, n,
                             paint.repeating, paint.edge_mode)


def separable_frames_mask(paint: "Paint", invs) -> np.ndarray:
    """(F,) bool: which composed device->paint inverses paint_field
    would route through the separable axis-aligned path.  The sweep
    bake must send exactly these frames through the same weights —
    baking them with supersampled bilinear instead silently diverges
    from per-frame renders whenever an axis is DOWNSCALED (the per-frame
    path then uses the exact box filter)."""
    invs = np.asarray(invs, np.float32).reshape(-1, 6)
    if paint.kind != PAINT_BITMAP or not paint.smoothed:
        return np.zeros(invs.shape[0], bool)
    return (invs[:, 1] == 0.0) & (invs[:, 2] == 0.0)


def separable_field_stack(paint: "Paint", invs, height: int,
                          width: int) -> jnp.ndarray:
    """(F, H, W, 4) straight-RGBA fields for axis-aligned frames via the
    separable path — per-frame weight matrices built host-side
    (identical to paint_field's), contracted as two batched einsums."""
    invs = np.asarray(invs, np.float32).reshape(-1, 6)
    img = jnp.asarray(paint.image).astype(jnp.float32) / 255.0
    img = img.at[..., :3].multiply(img[..., 3:4])  # premul filtering
    wx = np.stack([
        _separable_axis_weights(paint, width, img.shape[1], float(a),
                                float(e))
        for a, _b, _c, _d, e, _f in invs])   # (F, W_out, W_img)
    wy = np.stack([
        _separable_axis_weights(paint, height, img.shape[0], float(d),
                                float(f))
        for _a, _b, _c, d, _e, f in invs])   # (F, H_out, H_img)
    tmp = jnp.einsum("hwc,fxw->fhxc", img, jnp.asarray(wx),
                     precision=jax.lax.Precision.HIGHEST)
    return _unpremul(jnp.einsum("fhxc,fyh->fyxc", tmp, jnp.asarray(wy),
                                precision=jax.lax.Precision.HIGHEST))
