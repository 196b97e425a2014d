"""On-device morph-sweep rasterizer: O(1) host work in the ratio count.

The reference interpolates every path command on the CPU for each ratio
(reference ts/src/lib/renderers/canvas-renderer.ts:207-266), and round 1's
flagship morph path still lowered every ratio host-side (seconds of C++
cell-splitting for a 256-step sweep the device renders in ~2 ms).  This
module moves the ENTIRE per-ratio pipeline on device:

* **Host, once per morph shape** (`morph_pieces`): split each matched
  start/end edge pair at uniform t so every piece's |dy| <= 1 at EVERY
  ratio (|dy(r)| = |(1-r)dy_s + r dy_e| is linear in r, so bounded by its
  endpoints).  Uniform-t subdivision commutes with the endpoint lerp, so
  piece p of the lerped edge equals the lerp of piece p.
* **Device, per ratio** (one Pallas grid step): lerp the piece tables,
  evaluate each piece's EXACT analytic coverage ramp over all columns
  (the identical trapezoid math as coverage.coverage_numpy, restricted to
  the <= 2 pixel rows a piece can touch), and place rows with an MXU
  one-hot matmul

      cov^T[x, y] = sum_p ramp_p(x) * [row_p == y]

  — the flat-block placement trick turned sideways: the ramp factor is
  bf16-split into 3 exact passes, the row one-hot is bf16-exact, so the
  placement reproduces the f32 coverage bit-exactly.  Fill rule,
  alpha-over composite and premul-u8 quantization reuse the shared
  flat-block resolve tail.

Frames come out transposed (W, H) — the ramp wants columns in sublanes
and the one-hot wants rows in lanes; the host view transposes for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coverage import (
    FILL_RULE_NONZERO, _h01, _on_tpu, layer_rules, normalize_fill_rule,
)
from .flatblock import composite_quantize_pack, fill_rule_cov

LANE = 128


def morph_pieces(pairs, e_multiple: int = 128):
    """Split matched morph edge-pair tables into row-bounded pieces.

    ``pairs``: list of (edges_start (E, 4), edges_end (E, 4), color_start,
    color_end) per draw — models.morph_geometry.morph_fill_edge_pairs
    output.  Returns (tab_s, tab_e, suby_s, suby_e, colors_s, colors_e):
      tab_*  (P, 4, 1, EP) f32 — x0, y0, x1, y1 lane layout
      suby_* (P, 2, EP, 1) f32 — y0, y1 sublane layout (for the row
                                  one-hot, avoiding an on-device transpose)
    Padding pieces are all-zero (degenerate, dy = 0 -> no contribution).
    """
    split = []
    for es, ee, cs, ce in pairs:
        es = np.asarray(es, np.float64)
        ee = np.asarray(ee, np.float64)
        dy = np.maximum(np.abs(es[:, 3] - es[:, 1]),
                        np.abs(ee[:, 3] - ee[:, 1]))
        n = np.maximum(1, np.ceil(dy)).astype(int)
        ps, pe = [], []
        for (s_row, e_row, k) in zip(es, ee, n):
            t = np.linspace(0.0, 1.0, k + 1)
            for tbl, out in ((s_row, ps), (e_row, pe)):
                xs = tbl[0] + t * (tbl[2] - tbl[0])
                ys = tbl[1] + t * (tbl[3] - tbl[1])
                out.append(np.stack([xs[:-1], ys[:-1], xs[1:], ys[1:]], 1))
        split.append((np.concatenate(ps), np.concatenate(pe), cs, ce))

    p = len(split)
    e_max = max(s.shape[0] for s, _, _, _ in split)
    ep = max(e_multiple, -(-e_max // e_multiple) * e_multiple)
    tab_s = np.zeros((p, 4, 1, ep), np.float32)
    tab_e = np.zeros((p, 4, 1, ep), np.float32)
    suby_s = np.zeros((p, 2, ep, 1), np.float32)
    suby_e = np.zeros((p, 2, ep, 1), np.float32)
    colors_s = np.zeros((p, 4), np.float32)
    colors_e = np.zeros((p, 4), np.float32)
    for i, (ps, pe, cs, ce) in enumerate(split):
        k = ps.shape[0]
        tab_s[i, :, 0, :k] = ps.T.astype(np.float32)
        tab_e[i, :, 0, :k] = pe.T.astype(np.float32)
        suby_s[i, 0, :k, 0] = ps[:, 1].astype(np.float32)
        suby_s[i, 1, :k, 0] = ps[:, 3].astype(np.float32)
        suby_e[i, 0, :k, 0] = pe[:, 1].astype(np.float32)
        suby_e[i, 1, :k, 0] = pe[:, 3].astype(np.float32)
        colors_s[i], colors_e[i] = cs, ce
    return tab_s, tab_e, suby_s, suby_e, colors_s, colors_e


def _morph_kernel(ratios_ref, cs_ref, ce_ref, *rest, layers: int,
                  wp: int, hp: int, fill_rule: int,
                  x_shift: bool = False):
    xs_ref = None
    if x_shift:
        # Tile-sharding x-origin (SMEM scalar): pieces lerp in GLOBAL
        # device coordinates (bit-identical chain to the single-device
        # kernel) and the shard origin shifts the PIXEL GRID instead of
        # the geometry — integer grid + integer origin add exactly in
        # f32, so sharded columns are BIT-identical to the
        # single-device kernel's (the old host-side piece shift
        # perturbed the lerp rounding by a full quantum).
        xs_ref, *rest = rest
    tabs_ref, tabe_ref, sys_ref, sye_ref, out_ref = rest
    i = pl.program_id(0)
    t = ratios_ref[i]
    xs = xs_ref[0] if x_shift else None
    px = jax.lax.broadcasted_iota(jnp.int32, (wp, 1), 0).astype(jnp.float32)
    if xs is not None:
        px = px + xs  # global pixel grid (exact integer f32 add)
    hlane = jax.lax.broadcasted_iota(
        jnp.int32, (1, hp), 1).astype(jnp.float32)

    rules = layer_rules(fill_rule, layers)
    covs = []
    for lyr in range(layers):
        x0 = (1.0 - t) * tabs_ref[lyr, 0] + t * tabe_ref[lyr, 0]  # (1, EP)
        y0 = (1.0 - t) * tabs_ref[lyr, 1] + t * tabe_ref[lyr, 1]
        x1 = (1.0 - t) * tabs_ref[lyr, 2] + t * tabe_ref[lyr, 2]
        y1 = (1.0 - t) * tabs_ref[lyr, 3] + t * tabe_ref[lyr, 3]
        y0s = (1.0 - t) * sys_ref[lyr, 0] + t * sye_ref[lyr, 0]  # (EP, 1)
        y1s = (1.0 - t) * sys_ref[lyr, 1] + t * sye_ref[lyr, 1]
        rowbase = jnp.floor(jnp.minimum(y0, y1))       # (1, EP)
        rowbase_sub = jnp.floor(jnp.minimum(y0s, y1s))  # (EP, 1)

        acc = jnp.zeros((wp, hp), jnp.float32)
        for k in (0, 1):  # a |dy|<=1 piece touches at most two pixel rows
            py = rowbase + k
            sy0, sy1 = y0 - py, y1 - py
            cy0 = jnp.clip(sy0, 0.0, 1.0)
            cy1 = jnp.clip(sy1, 0.0, 1.0)
            dy = cy1 - cy0
            dyd = sy1 - sy0
            safe = jnp.where(jnp.abs(dyd) < 1e-9, 1.0, dyd)
            t0 = (cy0 - sy0) / safe
            t1 = (cy1 - sy0) / safe
            xa = x0 + t0 * (x1 - x0)
            xb = x0 + t1 * (x1 - x0)
            xmn = jnp.minimum(xa, xb)
            xmx = jnp.maximum(xa, xb)
            span = xmx - xmn
            safe_span = jnp.where(span < 1e-9, 1.0, span)
            rel_mn = xmn - px  # (WP, EP)
            rel_mx = xmx - px
            mean = jnp.where(
                span < 1e-9,
                jnp.clip(0.5 * (rel_mn + rel_mx), 0.0, 1.0),
                (_h01(rel_mx) - _h01(rel_mn)) / safe_span)
            ramp = dy * (1.0 - mean)  # (WP, EP) exact f32 contribution

            onehot = (rowbase_sub + k == hlane).astype(jnp.bfloat16)
            # ramp = hi + mid + lo exactly (3x8 mantissa bits); the one-hot
            # is bf16-exact, so the MXU placement is bit-exact in f32.
            hi = ramp.astype(jnp.bfloat16)
            hi32 = hi.astype(jnp.float32)
            mid = (ramp - hi32).astype(jnp.bfloat16)
            mid32 = mid.astype(jnp.float32)
            lo = (ramp - hi32 - mid32).astype(jnp.bfloat16)
            for part in (hi, mid, lo):
                acc = acc + jnp.dot(part, onehot,
                                    preferred_element_type=jnp.float32)
        covs.append(fill_rule_cov(acc, rules[lyr]))

    def read_color(lyr, ch):
        return (1.0 - t) * cs_ref[lyr, ch] + t * ce_ref[lyr, ch]

    out_ref[0] = composite_quantize_pack(covs, read_color, layers=layers)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "fill_rule", "interpret"))
def render_morph_sweep(
    ratios: jax.Array,    # (R,) f32 in [0, 1]
    tab_s: jax.Array,     # (P, 4, 1, EP) f32
    tab_e: jax.Array,
    suby_s: jax.Array,    # (P, 2, EP, 1) f32
    suby_e: jax.Array,
    colors_s: jax.Array,  # (P, 4) f32
    colors_e: jax.Array,
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = None,
    x_shift: jax.Array = None,  # (1,) f32 tile-shard x-origin
) -> jax.Array:
    """Rasterize a morph shape at every ratio fully on device.

    -> (R, WP, HP) uint32 packed RGBA, TRANSPOSED frames; view with
    ``morph_frames_to_u8``.  One grid step per ratio: lerp pieces,
    analytic coverage ramps, MXU row placement, composite, quantize."""
    if interpret is None:
        interpret = not _on_tpu()
    r = ratios.shape[0]
    layers = tab_s.shape[0]
    fill_rule = normalize_fill_rule(fill_rule, layers)
    wp = -(-width // 8) * 8
    hp = -(-height // LANE) * LANE
    if x_shift is not None:
        x_shift = jnp.asarray(x_shift, jnp.float32).reshape(1)
    kernel = functools.partial(
        _morph_kernel, layers=layers, wp=wp, hp=hp, fill_rule=fill_rule,
        x_shift=x_shift is not None)
    xs_args = [] if x_shift is None else [x_shift]
    xs_specs = ([] if x_shift is None
                else [pl.BlockSpec(memory_space=pltpu.SMEM)])
    return pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + xs_specs + [
            pl.BlockSpec(tab_s.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tab_e.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(suby_s.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(suby_e.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wp, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, wp, hp), jnp.uint32),
        interpret=interpret,
    )(ratios, colors_s, colors_e, *xs_args, tab_s, tab_e, suby_s,
      suby_e)


def morph_frames_to_u8(frames_u32: np.ndarray, height: int,
                       width: int) -> np.ndarray:
    """(R, WP, HP) transposed packed u32 -> (R, H, W, 4) u8 frames."""
    arr = np.asarray(frames_u32).transpose(0, 2, 1)[:, :height, :width]
    arr = np.ascontiguousarray(arr)
    if arr.dtype.byteorder == ">":
        arr = arr.astype("<u4")
    return arr.view(np.uint8).reshape(arr.shape + (4,))
