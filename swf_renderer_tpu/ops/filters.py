"""Bitmap filters (PlaceObject3 SURFACEFILTERLIST — framework
extension; the reference has none).

Filters apply to a display object's COMPOSED premultiplied image (the
same group isolation as masks/blends): blur is the player's iterated
box blur (a box of width ``ceil(2 * blur)`` per pass approaches a
Gaussian by 3 passes), drop shadow / glow build on the blurred alpha,
and color matrix is the 20-term affine on straight RGBA.  All ops work
on (..., H, W, 4) premul f32 with transparent-black outside the frame
(XLA fuses the cumsum-based box blur; no Pallas needed — this is
bandwidth-trivial next to the rasterizer).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BlurFilter:
    blur_x: float  # px
    blur_y: float
    passes: int = 1


@dataclasses.dataclass(frozen=True)
class DropShadowFilter:
    color: Tuple[float, float, float, float]  # straight RGBA [0,1]
    blur_x: float
    blur_y: float
    angle: float      # radians
    distance: float   # px
    strength: float = 1.0
    inner: bool = False
    knockout: bool = False
    passes: int = 1


@dataclasses.dataclass(frozen=True)
class GlowFilter:
    color: Tuple[float, float, float, float]
    blur_x: float
    blur_y: float
    strength: float = 1.0
    inner: bool = False
    knockout: bool = False
    passes: int = 1


@dataclasses.dataclass(frozen=True)
class ColorMatrixFilter:
    # Row-major 4x5: out_ch = sum(m[ch, :4] * in_rgba) + m[ch, 4]/255
    matrix: Tuple[float, ...]  # 20 terms


Filter = object  # union of the above, by isinstance


def _box_blur_axis(img: jnp.ndarray, radius_px: float, axis: int
                   ) -> jnp.ndarray:
    """One box-blur pass along ``axis`` with a FRACTIONAL box width
    (2*radius+1 px), zero (transparent) padding — the fractional edge
    taps make the kernel vary continuously with the blur amount.

    Implemented as a cumulative-sum prefix difference: O(H*W) per pass
    regardless of radius."""
    if radius_px <= 0:
        return img
    n = img.shape[axis]
    r_int = int(math.floor(radius_px))
    frac = radius_px - r_int
    width = 2.0 * radius_px + 1.0
    # Prefix sums with a leading zero: window sum = c[i+hi] - c[i-lo].
    c = jnp.cumsum(img, axis=axis)
    zero = jnp.zeros_like(jnp.take(c, jnp.array([0]), axis=axis))
    c = jnp.concatenate([zero, c], axis=axis)  # length n+1

    def win(lo, hi):
        # sum over [i-lo, i+hi] inclusive, clipped to the frame.
        idx = jnp.arange(n)
        top = jnp.clip(idx + hi + 1, 0, n)
        bot = jnp.clip(idx - lo, 0, n)
        return (jnp.take(c, top, axis=axis)
                - jnp.take(c, bot, axis=axis))

    total = win(r_int, r_int)
    if frac > 0:
        # The fractional tails: frac of the next texel on each side.
        left = win(r_int + 1, r_int) - total   # adds texel at -(r+1)
        right = win(r_int, r_int + 1) - total  # adds texel at +(r+1)
        total = total + frac * (left + right)
    return total / width


def box_blur(img: jnp.ndarray, blur_x: float, blur_y: float,
             passes: int = 1) -> jnp.ndarray:
    """The player's blur: ``passes`` iterated box blurs of radius
    blur/2 on each axis (blur_x/blur_y are the filter's FULL widths in
    px; three passes approximate a Gaussian)."""
    out = img
    for _ in range(max(1, int(passes))):
        if blur_x > 1:
            out = _box_blur_axis(out, (blur_x - 1.0) / 2.0, axis=-2)
        if blur_y > 1:
            out = _box_blur_axis(out, (blur_y - 1.0) / 2.0, axis=-3)
    return out


def apply_filter(img_pm: jnp.ndarray, filt) -> jnp.ndarray:
    """Apply one filter to a premul (..., H, W, 4) image."""
    if isinstance(filt, BlurFilter):
        return box_blur(img_pm, filt.blur_x, filt.blur_y, filt.passes)
    if isinstance(filt, (DropShadowFilter, GlowFilter)):
        distance = getattr(filt, "distance", 0.0)
        angle = getattr(filt, "angle", 0.0)
        alpha = img_pm[..., 3:4]
        if distance:
            dx = distance * math.cos(angle)
            dy = distance * math.sin(angle)
            alpha = _shift2d(alpha, dy, dx)
        shadow_a = box_blur(alpha, filt.blur_x, filt.blur_y,
                            filt.passes) * filt.strength
        if filt.inner:
            # Inner shadow/glow: shade the OBJECT where the (inverted,
            # shifted) silhouette is missing coverage.
            inv = jnp.clip(1.0 - shadow_a, 0.0, 1.0) * img_pm[..., 3:4]
            shade = jnp.concatenate(
                [inv * jnp.asarray(filt.color[:3], img_pm.dtype)
                 * filt.color[3], inv * filt.color[3]], axis=-1)
            base = (jnp.zeros_like(img_pm) if filt.knockout else img_pm)
            return shade + base * (1.0 - shade[..., 3:4])
        shadow_a = jnp.clip(shadow_a, 0.0, 1.0)
        shadow = jnp.concatenate(
            [shadow_a * jnp.asarray(filt.color[:3], img_pm.dtype)
             * filt.color[3], shadow_a * filt.color[3]], axis=-1)
        if filt.knockout:
            # Knockout: the shadow shows only OUTSIDE the object.
            return shadow * (1.0 - img_pm[..., 3:4])
        # Object over its shadow.
        return img_pm + shadow * (1.0 - img_pm[..., 3:4])
    if isinstance(filt, ColorMatrixFilter):
        m = jnp.asarray(filt.matrix, img_pm.dtype).reshape(4, 5)
        a = img_pm[..., 3:4]
        safe = jnp.maximum(a, 1e-6)
        straight = jnp.concatenate(
            [jnp.where(a > 1e-6, img_pm[..., :3] / safe, 0.0), a],
            axis=-1)
        out = (jnp.einsum("...c,kc->...k", straight, m[:, :4])
               + m[:, 4] / 255.0)
        out = jnp.clip(out, 0.0, 1.0)
        oa = out[..., 3:4]
        return jnp.concatenate([out[..., :3] * oa, oa], axis=-1)
    raise NotImplementedError(f"NotImplementedFilter: {filt!r}")


def apply_filters(img_pm: jnp.ndarray, filters) -> jnp.ndarray:
    for f in filters:
        img_pm = apply_filter(img_pm, f)
    return img_pm


def _shift2d(img: jnp.ndarray, dy: float, dx: float) -> jnp.ndarray:
    """Subpixel translate with bilinear weights and transparent-black
    borders (shadow offsets are rarely integral)."""
    iy, fy = int(math.floor(dy)), dy - math.floor(dy)
    ix, fx = int(math.floor(dx)), dx - math.floor(dx)

    def ishift(a, sy, sx):
        out = a
        h, w = a.shape[-3], a.shape[-2]
        out = jnp.roll(out, (sy, sx), axis=(-3, -2))
        ys = jnp.arange(h)
        xs = jnp.arange(w)
        ymask = ((ys >= sy) if sy >= 0 else (ys < h + sy))
        xmask = ((xs >= sx) if sx >= 0 else (xs < w + sx))
        return (out * ymask[:, None, None] * xmask[None, :, None])

    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx
    out = w00 * ishift(img, iy, ix)
    if w01:
        out = out + w01 * ishift(img, iy, ix + 1)
    if w10:
        out = out + w10 * ishift(img, iy + 1, ix)
    if w11:
        out = out + w11 * ishift(img, iy + 1, ix + 1)
    return out
