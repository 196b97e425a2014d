"""Fused scanline resolve: cumsum + fill rule + composite in one pass.

After the scatter phase, the scanline pipeline needs, per layer:

    winding = area_plane + cumsum_x(cover_plane)
    coverage = fill_rule(winding)
    frame = over(frame, color * coverage)

Done as separate XLA ops this costs ~11 log-passes for the cumsum plus a
round trip per stage (~2 ms per 4-layer 1080p frame).  This Pallas kernel
does all of it in a single VMEM residency per 8-row strip:

* the prefix sum along x runs 128 lanes at a time through the MXU — a
  (8, 128) x (128, 128) multiply with an upper-triangular ones matrix IS a
  cumsum — with an (8, 1) running carry between chunks;
* the fill rule and the premultiplied alpha-over composite across layers
  happen in registers;
* output is the premultiplied float frame strip (u8 quantization fuses into
  XLA's copy afterwards).

HBM traffic per frame drops to one read of the two planes + one frame write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coverage import FILL_RULE_EVENODD, FILL_RULE_NONZERO

STRIP_H = 8
LANE = 128


def _resolve_kernel(colors_ref, area_ref, cover_ref, out_ref, *,
                    fill_rule: int, n_layers: int, stride: int):
    # Upper-triangular ones: U[k, j] = 1 iff k <= j, so x @ U = cumsum(x).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    tri = (row_ids <= col_ids).astype(jnp.float32)

    n_chunks = stride // LANE

    r = jnp.zeros((STRIP_H, stride), jnp.float32)
    g = jnp.zeros((STRIP_H, stride), jnp.float32)
    b = jnp.zeros((STRIP_H, stride), jnp.float32)
    a = jnp.zeros((STRIP_H, stride), jnp.float32)

    for layer in range(n_layers):
        # Prefix sum along x, 128 lanes per MXU step with a running carry.
        parts = []
        carry = jnp.zeros((STRIP_H, 1), jnp.float32)
        for ch in range(n_chunks):
            chunk = cover_ref[layer, :, ch * LANE : (ch + 1) * LANE]
            csum = (
                jnp.dot(chunk, tri, preferred_element_type=jnp.float32)
                + carry
            )
            carry = csum[:, LANE - 1 :]
            parts.append(csum)
        winding = jnp.concatenate(parts, axis=1) + area_ref[layer, :, :]

        if fill_rule == FILL_RULE_NONZERO:
            cov = jnp.minimum(jnp.abs(winding), 1.0)
        else:
            m = jnp.mod(winding, 2.0)
            cov = 1.0 - jnp.abs(m - 1.0)

        col_r = colors_ref[layer, 0]
        col_g = colors_ref[layer, 1]
        col_b = colors_ref[layer, 2]
        col_a = colors_ref[layer, 3]
        ca = col_a * cov  # effective source alpha
        keep = 1.0 - ca
        r = col_r * ca + r * keep
        g = col_g * ca + g * keep
        b = col_b * ca + b * keep
        a = ca + a * keep

    out_ref[0, :, :] = r
    out_ref[1, :, :] = g
    out_ref[2, :, :] = b
    out_ref[3, :, :] = a


@functools.partial(
    jax.jit, static_argnames=("fill_rule", "interpret")
)
def resolve_frame(
    area_plane: jax.Array,   # (L, H, S) f32, S multiple of 128
    cover_plane: jax.Array,  # (L, H, S) f32
    colors: jax.Array,       # (L, 4) f32 straight RGBA
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = False,
) -> jax.Array:
    """-> (4, H, S) premultiplied float frame (channel-major)."""
    n_layers, height, stride = area_plane.shape
    assert stride % LANE == 0, stride
    assert height % STRIP_H == 0, height

    kernel = functools.partial(
        _resolve_kernel,
        fill_rule=fill_rule,
        n_layers=n_layers,
        stride=stride,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, height, stride), jnp.float32),
        grid=(height // STRIP_H,),
        in_specs=[
            pl.BlockSpec((n_layers, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_layers, STRIP_H, stride), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, STRIP_H, stride), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, STRIP_H, stride), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(colors, area_plane, cover_plane)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "fill_rule", "interpret")
)
def render_scanline_fused(
    rows: jax.Array,    # (F, L, N) int32 — PRESORTED by (row, col) per draw
    cols: jax.Array,    # (F, L, N) int32
    area: jax.Array,    # (F, L, N) f32
    cover: jax.Array,   # (F, L, N) f32
    colors: jax.Array,  # (F, L, 4) f32
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = False,
) -> jax.Array:
    """Batched scanline pipeline with the fused resolve kernel.

    Scatter uses sorted segment-sum (cells must be presorted by flattened
    (row, col) per draw — the host packers do this).  Returns (F, H, W, 4)
    uint8 frames.
    """
    from .composite import premul_to_straight_u8

    f, l, n = rows.shape
    stride = ((width + 1 + LANE - 1) // LANE) * LANE
    pad_h = -height % STRIP_H
    h_pad = height + pad_h

    def one_frame(_, inputs):
        fr, fc, fa, fv, fcol = inputs  # (L, N), (L, 4)
        base = jnp.arange(l, dtype=jnp.int32)[:, None] * (h_pad * stride)
        flat = (base + fr * stride).reshape(-1)
        area_plane = jax.ops.segment_sum(
            fa.reshape(-1), flat + fc.reshape(-1),
            num_segments=l * h_pad * stride, indices_are_sorted=False,
        ).reshape(l, h_pad, stride)
        cover_plane = jax.ops.segment_sum(
            fv.reshape(-1), flat + fc.reshape(-1) + 1,
            num_segments=l * h_pad * stride, indices_are_sorted=False,
        ).reshape(l, h_pad, stride)
        frame_pm = resolve_frame(area_plane, cover_plane, fcol, fill_rule,
                                 interpret)
        frame_pm = jnp.moveaxis(frame_pm, 0, -1)[:height, :width, :]
        return None, premul_to_straight_u8(frame_pm)

    _, frames = jax.lax.scan(one_frame, None,
                             (rows, cols, area, cover, colors))
    return frames
