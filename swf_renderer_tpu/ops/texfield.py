"""MXU bitmap-field baking: per-frame pattern planes without gathers.

The transform sweep's bitmap layers need a device-space RGBA plane per
frame (the reference replays the pattern under the frame matrix at draw
time, reference ts/src/lib/renderers/canvas-renderer.ts:179-184,
295-315).  The straightforward bake — ``style.paint_field_traced``
vmapped over frames — is supersampled bilinear via XLA gathers:
16 texel fetches per pixel at supersample 2, measured 49.8 ms/frame at
512^2 on one v5e (PERF.md), ~250x the sweep kernel itself.  TPUs hate
gathers; they love matmuls.

This kernel re-expresses the same sampling as dense contractions
against the (small) texture, the same trick the placement kernel uses
for row one-hots:

    out[p, c] = sum_k sum_ty sum_tx  wy_k[p, ty] * wx_k[p, tx] * img[ty, tx, c]

with ``wx_k``/``wy_k`` the bilinear (or nearest) tap weights of
subsample k — built as VPU comparisons against a texel iota, never
gathered.  Contracting tx on the MXU ((4*Th, Tw) @ (Tw, xblk*128)
lane-merged pixels) and ty with exact f32 VPU sublane reductions per
channel quarter keeps every intermediate in VMEM.  Weight construction
handles the exact
fetch semantics of ``style._fetch``: repeat (wrap), flash (clamp — for
bilinear, clamping the COORDINATE is identical to clamping both taps),
and canvas (transparent outside).  Filtering runs on premultiplied
values like ``paint_field`` (un-premultiplied by the wrapper).

Weights are mathematically identical to the gather path's; summation
order differs, so results agree to float rounding (~1e-6), far below a
u8 quantum — tests pin the kernel against ``paint_field_traced``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coverage import _on_tpu

LANE = 128

# Beyond this many texels the dense contraction's O(pixels * texels)
# work loses to the gather path (the corpus textures are ~100x128).
MAX_KERNEL_TEXELS = 256 * 256

# Scoped-VMEM budget for the kernel's live intermediates.  The hard
# limit is 16 MB; leave headroom for Mosaic's own buffers and the
# double-buffered output block.
_VMEM_BUDGET = 10 * 2**20


def _kernel_vmem_bytes(th_pad: int, tw_pad: int, xblk: int) -> int:
    """Estimated live f32 bytes inside one _texfield_kernel step: the
    resident channel-stacked texture + per-subsample wx, wy4, b4, r
    (= wy4*b4) + the 8-sublane accumulator/output block."""
    xl = xblk * LANE
    img4 = 4 * th_pad * tw_pad * 4
    wx = tw_pad * xl * 4
    tall = 3 * (4 * th_pad * xl * 4)  # wy4, b4, r
    acc = 2 * 8 * xl * 4
    return img4 + wx + tall + acc


def _auto_xblk(th_pad: int, tw_pad: int) -> int:
    """Largest xblk in {8,4,2,1} whose intermediates fit the VMEM
    budget: at the 256x256 texel cap, xblk=8 would hold ~14 MB live
    (wy4/b4/r are (1024, 1024) each) and fail to compile on the chip —
    the footprint, not a fixed constant, must pick the block width."""
    for xblk in (8, 4, 2, 1):
        if _kernel_vmem_bytes(th_pad, tw_pad, xblk) <= _VMEM_BUDGET:
            return xblk
    return 1


def _axis_weights(coord, t_iota, n_tex: int, repeating: bool,
                  edge_mode: str, smoothed: bool):
    """(T, LANE) tap weights for one axis of one subsample.

    ``coord``: (1, LANE) sample coordinate in texel units (the raw
    ``sx`` of style.paint_field_traced — texel centers at integer + 0.5);
    ``t_iota``: (T, 1) texel indices (sublane layout, padded rows have
    index >= n_tex).
    """
    n = np.float32(n_tex)
    if smoothed:
        xc = coord - 0.5  # texel-center space: taps floor(xc), +1
        if repeating:
            d = jnp.mod(xc - t_iota, n)  # [0, n)
            w = (jnp.maximum(0.0, 1.0 - d)
                 + jnp.maximum(0.0, 1.0 - (n - d)))
        elif edge_mode == "canvas":
            w = jnp.maximum(0.0, 1.0 - jnp.abs(xc - t_iota))
        else:  # flash: clamp-to-edge == clamping the coordinate
            xcc = jnp.clip(xc, 0.0, n - 1.0)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(xcc - t_iota))
    else:
        fx = jnp.floor(coord)
        if repeating:
            w = (jnp.mod(fx - t_iota, n) < 0.5).astype(jnp.float32)
        elif edge_mode == "canvas":
            w = (fx == t_iota).astype(jnp.float32)
        else:
            w = (jnp.clip(fx, 0.0, n - 1.0) == t_iota).astype(jnp.float32)
    if repeating:
        # Padded texel rows alias under mod: mask them explicitly.
        w = w * (t_iota < n).astype(jnp.float32)
    return w


def _texfield_kernel(invs_ref, img_ref, out_ref, *,
                     xblk: int, th: int, tw: int, th_pad: int,
                     tw_pad: int, supersample: int, repeating: bool,
                     smoothed: bool, edge_mode: str, hp: int):
    f = pl.program_id(0)
    xb = pl.program_id(1)
    yb = pl.program_id(2)
    ga, gb, gc, gd, ge, gf = (invs_ref[f, k] for k in range(6))
    n = supersample
    inv_n2 = np.float32(1.0 / (n * n))

    # All xblk x-values share one lane axis: lane l is pixel
    # (x = xb*xblk + l // LANE, y = yb*LANE + l % LANE) — one
    # (4*THp, TWp) @ (TWp, xblk*LANE) contraction per subsample instead
    # of xblk small ones (8x fewer MXU dispatches; measured 3.09 ->
    # see PERF.md).
    xl = xblk * LANE
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, xl), 1)
    ylf = (yb * LANE + jnp.mod(lane, LANE)).astype(jnp.float32)
    xlf = (xb * xblk + jnp.floor_divide(lane, LANE)).astype(jnp.float32)
    tx_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tw_pad, 1), 0).astype(jnp.float32)
    # ty indices repeated per channel: sublane t of the stacked image is
    # texel row t % th_pad of channel t // th_pad.
    ty4 = jnp.mod(jax.lax.broadcasted_iota(
        jnp.int32, (4 * th_pad, 1), 0), th_pad).astype(jnp.float32)

    del hp

    def sub(k, acc):
        kf = k.astype(jnp.float32)
        ox = (jnp.mod(kf, n) + 0.5) / n
        oy = (jnp.floor_divide(kf, n) + 0.5) / n
        sx = ga * (xlf + ox) + gc * (ylf + oy) + ge  # (1, XL)
        sy = gb * (xlf + ox) + gd * (ylf + oy) + gf
        wx = _axis_weights(sx, tx_iota, tw, repeating, edge_mode,
                           smoothed)          # (TWp, XL)
        wy4 = _axis_weights(sy, ty4, th, repeating, edge_mode,
                            smoothed)         # (4*THp, XL)
        # Contract tx on the MXU: (4*THp, TWp) @ (TWp, XL).  HIGHEST
        # precision: Mosaic's DEFAULT feeds bf16-rounded operands to the
        # MXU — measured 0.007 (±1.8/255) error vs the gather oracle,
        # eating the whole ≤2/255 budget (HIGH is unsupported in
        # Mosaic; PERF.md has the cost table).
        b4 = jnp.dot(img_ref[...], wx,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        # Contract ty per channel as exact f32 VPU sublane reductions
        # over each THp quarter — the earlier (8, 4*THp) @ (4*THp, XL)
        # selection matmul was 2x dot1's padded MAC count AND needed
        # HIGHEST itself (measured in PERF.md).
        r = wy4 * b4
        rows = [jnp.sum(r[c * th_pad:(c + 1) * th_pad], axis=0,
                        keepdims=True) for c in range(4)]
        return acc + jnp.concatenate(
            rows + [jnp.zeros((4, xl), jnp.float32)], axis=0)

    acc = jax.lax.fori_loop(
        0, n * n, sub, jnp.zeros((8, xl), jnp.float32))
    out_ref[0, 0, 0] = acc * inv_n2


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "supersample", "repeating", "smoothed",
    "edge_mode", "interpret", "xblk"))
def bitmap_field_planes(img, invs, height: int, width: int,
                        supersample: int = 4, repeating: bool = False,
                        smoothed: bool = True, edge_mode: str = "flash",
                        interpret: bool = None,
                        xblk: int | None = None) -> jnp.ndarray:
    """(Th, Tw, 4) u8 texture + (F, 6) device->texel inverses ->
    (F, H, W, 4) f32 straight-RGBA field planes, gather-free.

    Drop-in twin of vmapping ``style.paint_field_traced`` over frames
    for PAINT_BITMAP (same sampling semantics, see module docstring) at
    MXU rather than gather throughput."""
    if interpret is None:
        interpret = not _on_tpu()
    th, tw = int(img.shape[0]), int(img.shape[1])
    th_pad = max(8, -(-th // 8) * 8)
    tw_pad = max(8, -(-tw // 8) * 8)
    if xblk is None:
        xblk = _auto_xblk(th_pad, tw_pad)
    fcount = invs.shape[0]
    wp = -(-width // xblk) * xblk
    hp = -(-height // LANE) * LANE

    imgf = jnp.asarray(img).astype(jnp.float32) / 255.0
    imgf = imgf.at[..., :3].multiply(imgf[..., 3:4])  # premul filtering
    imgf = jnp.pad(imgf, ((0, th_pad - th), (0, tw_pad - tw), (0, 0)))
    # (THp, TWp, 4) -> channel-stacked (4*THp, TWp).
    img4 = imgf.transpose(2, 0, 1).reshape(4 * th_pad, tw_pad)

    kernel = functools.partial(
        _texfield_kernel, xblk=xblk, th=th, tw=tw, th_pad=th_pad,
        tw_pad=tw_pad, supersample=int(supersample),
        repeating=bool(repeating), smoothed=bool(smoothed),
        edge_mode=str(edge_mode), hp=hp)
    xb_n, yb_n = wp // xblk, hp // LANE
    out = pl.pallas_call(
        kernel,
        grid=(fcount, xb_n, yb_n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4 * th_pad, tw_pad), lambda f, xb, yb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 8, xblk * LANE),
                               lambda f, xb, yb: (f, xb, yb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (fcount, xb_n, yb_n, 8, xblk * LANE), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(invs, jnp.float32), img4)

    # (F, XB, YB, 8, xblk*LANE): lane l of (f, xb, yb) is pixel
    # (x = xb*xblk + l // LANE, y = yb*LANE + l % LANE), channels on
    # sublanes 0..3 -> (F, 4, WP, HP) -> (F, H, W, 4) straight RGBA.
    out = out[:, :, :, :4, :].reshape(
        fcount, xb_n, yb_n, 4, xblk, LANE)
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(fcount, 4, wp, hp)
    pm = out[:, :, :width, :height].transpose(0, 3, 2, 1)
    alpha = pm[..., 3:4]
    safe = jnp.maximum(alpha, 1e-6)
    rgb = jnp.where(alpha > 1e-6, pm[..., :3] / safe, 0.0)
    return jnp.concatenate([rgb, alpha], axis=-1)
