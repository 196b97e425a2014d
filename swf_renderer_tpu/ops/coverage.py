"""Analytic-coverage rasterization: edge tables -> per-pixel coverage.

This is the TPU-native replacement for Cairo's scanline fill (reference
ts/src/lib/renderers/canvas-renderer.ts:335 — ``ctx.fill()``) and for the
whole Rust gfx pipeline (rs/src/headless_renderer.rs:402-723).

Math
----
For every pixel (cell ``[px, px+1) x [py, py+1)``) and every line segment
``(x0, y0) -> (x1, y1)``, we accumulate the signed area of the part of the
pixel that lies to the RIGHT of the segment, restricted to the segment's
y-span.  Summed over all edges of a closed path, the accumulator equals the
integral of the winding number over the pixel:

    acc(px, py) = ∫∫_pixel  w(x, y) dx dy

exactly (for polygons).  Coverage then follows from the fill rule:

* nonzero: ``min(|acc|, 1)`` — exact wherever the pixel's winding values lie
  in {0, s} for one sign s; conservative otherwise,
* even-odd: triangle wave ``1 - |mod(acc, 2) - 1|``.

Each edge contribution is ~25 elementwise ops — a pure VPU workload.  Padded
all-zero edges contribute exactly 0, so edge tables are padded to static
shapes and no per-path edge count is needed on device.

Layouts
-------
Edge tables are stored transposed, ``(B, 4, E)`` with E a multiple of 128,
rows = x0, y0, x1, y1 — lane-aligned for the VPU.  Output is ``(B, H, W)``
float32 coverage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes (float32 min tile is (8, 128); a taller tile amortizes the
# per-edge loop over more pixels).
TILE_H = 16
TILE_W = 128
EDGE_CHUNK = 8

FILL_RULE_NONZERO = 0
FILL_RULE_EVENODD = 1


def _clamp01(x):
    return jnp.clip(x, 0.0, 1.0)


def _h01(x):
    """Antiderivative of clamp(x, 0, 1): 0 | x^2/2 | x - 1/2."""
    return jnp.where(x <= 0.0, 0.0, jnp.where(x >= 1.0, x - 0.5, 0.5 * x * x))


def edge_contribution(x0, y0, x1, y1, px, py):
    """Signed pixel-area contribution of one edge (broadcasting over all
    arguments).  ``px``/``py`` are the pixel cell origins.

    Shape discipline: pass ``py`` as (H, 1) and ``px`` as (1, W) — all the
    y-only terms (clipping, segment parameters, x-at-clipped-y) then stay
    (H, 1) vectors, and only the final clamp integral touches (H, W).  On
    the TPU VPU that roughly halves the per-edge vector work."""
    sy0 = y0 - py
    sy1 = y1 - py
    cy0 = _clamp01(sy0)
    cy1 = _clamp01(sy1)
    dy = cy1 - cy0  # signed clipped y-extent; 0 for horizontal/outside rows

    dyd = sy1 - sy0
    safe_dyd = jnp.where(jnp.abs(dyd) < 1e-9, 1.0, dyd)
    t0 = (cy0 - sy0) / safe_dyd
    t1 = (cy1 - sy0) / safe_dyd

    dx_seg = x1 - x0
    xa = x0 + t0 * dx_seg  # absolute x at the clipped y window, (H, 1)
    xb = x0 + t1 * dx_seg
    xmn = jnp.minimum(xa, xb)
    xmx = jnp.maximum(xa, xb)

    span = xmx - xmn
    safe_span = jnp.where(span < 1e-9, 1.0, span)
    rel_mn = xmn - px  # (H, W) from here on
    rel_mx = xmx - px
    mean_clamped = jnp.where(
        span < 1e-9,
        _clamp01(0.5 * (rel_mn + rel_mx)),
        (_h01(rel_mx) - _h01(rel_mn)) / safe_span,
    )
    # Area of the pixel row-slab to the right of the edge.
    return dy * (1.0 - mean_clamped)


def apply_fill_rule(acc, fill_rule: int):
    if fill_rule == FILL_RULE_NONZERO:
        return jnp.minimum(jnp.abs(acc), 1.0)
    if fill_rule == FILL_RULE_EVENODD:
        m = jnp.mod(acc, 2.0)
        return 1.0 - jnp.abs(m - 1.0)
    raise ValueError(f"unknown fill rule {fill_rule}")


def normalize_fill_rule(fill_rule, layers: int):
    """One rule for every layer (int) or one PER LAYER (sequence — SWF
    mixes even-odd and DefineShape4 nonzero shapes in one scene).
    Returns the int form when uniform so jit caches collapse to one
    entry; rule arguments are static everywhere, so tuples are valid
    static-argname values."""
    if isinstance(fill_rule, (tuple, list)):
        fill_rule = tuple(fill_rule)
        if len(fill_rule) != layers:
            raise ValueError(f"fill_rule tuple has {len(fill_rule)} "
                             f"entries for {layers} layers")
        if len(set(fill_rule)) == 1:
            return fill_rule[0]
    return fill_rule


def layer_rules(fill_rule, layers: int):
    """Normalized fill rule -> length-``layers`` per-layer rule tuple."""
    return (fill_rule if isinstance(fill_rule, tuple)
            else (fill_rule,) * layers)


# ---------------------------------------------------------------------------
# Pure-XLA reference implementation (also the CPU fallback)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("height", "width", "fill_rule"))
def coverage_xla(edges_t: jax.Array, height: int, width: int,
                 fill_rule: int = FILL_RULE_NONZERO) -> jax.Array:
    """Reference implementation.  ``edges_t``: (B, 4, E) f32 -> (B, H, W)."""
    if edges_t.ndim == 2:
        edges_t = edges_t[None]
    b, _, num_edges = edges_t.shape
    py = jnp.arange(height, dtype=jnp.float32)[:, None]
    px = jnp.arange(width, dtype=jnp.float32)[None, :]

    def per_batch(edges):
        def body(acc, edge):
            x0, y0, x1, y1 = edge
            return acc + edge_contribution(x0, y0, x1, y1, px, py), None

        acc0 = jnp.zeros((height, width), jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, jnp.moveaxis(edges, 0, 1))
        return acc

    acc = jax.vmap(per_batch)(edges_t)
    return apply_fill_rule(acc, fill_rule)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


# Edge-chunk block streamed per innermost grid step (lane-aligned for Mosaic).
EDGE_BLOCK = 128


def _coverage_kernel(bounds_ref, edges_ref, out_ref, *, fill_rule: int,
                     tile_h: int, tile_w: int, edge_chunk: int,
                     scalar_loop: bool = True):
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    ec = pl.program_id(3)
    num_ec = pl.num_programs(3)

    # Full-2D pixel grids: Mosaic vector registers are (8, 128) regardless,
    # so (th, 1)-shaped intermediates save nothing and add broadcasts.
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(
        jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(
        jnp.float32
    )
    tile_y0 = (ty * tile_h).astype(jnp.float32)
    tile_y1 = tile_y0 + tile_h
    py = row + tile_y0  # (th, tw)
    px = col + (tx * tile_w).astype(jnp.float32)

    @pl.when(ec == 0)
    def _():
        out_ref[0, :, :] = jnp.zeros((tile_h, tile_w), jnp.float32)

    # Block-level y-cull: edges are sorted by ymin host-side, so each
    # 128-edge block spans a narrow y band; skip blocks that miss this tile.
    block_hit = jnp.logical_and(
        bounds_ref[0, 0, 0, 1] > tile_y0, bounds_ref[0, 0, 0, 0] < tile_y1
    )

    @pl.when(block_hit)
    def _():
        if scalar_loop:
            # Mosaic path: edge coordinates are scalars (read from SMEM)
            # broadcast against the pixel tile — the per-primitive parameter
            # pattern the TPU compiler handles natively.  (No per-edge
            # branch: a scalar-core lax.cond costs ~0.5us of pipeline stall,
            # more than the predicated vector work it would save; culling
            # happens at block granularity via the pl.when above.)
            # The body handles UNROLL edges per trip so scalar-load latency
            # and loop overhead amortize across several edges' vector work.
            # All edge-only quantities (the segment slope reciprocal in
            # particular) are computed on the scalar core, keeping the
            # vector pipeline to ~45 elementwise ops per edge with a single
            # divide.
            # The VPU is latency-bound on each edge's dependency chain, so
            # the body computes UNROLL edges into INDEPENDENT accumulators —
            # interleavable chains — merged once per trip.
            UNROLL = 4

            def one_edge(e):
                x0 = edges_ref[0, 0, e]
                y0 = edges_ref[0, 1, e]
                x1 = edges_ref[0, 2, e]
                y1 = edges_ref[0, 3, e]
                dyd = y1 - y0  # scalar
                slope = jnp.where(
                    jnp.abs(dyd) < 1e-9, 0.0, (x1 - x0) / dyd
                )  # scalar divide (free relative to the VPU)

                sy0 = y0 - py
                sy1 = y1 - py
                cy0 = _clamp01(sy0)
                cy1 = _clamp01(sy1)
                dy = cy1 - cy0
                xa = x0 + (cy0 - sy0) * slope
                # (cy1 - sy0), NOT (cy1 - sy1): xb is the x-position where
                # the edge crosses the clipped upper y, measured from the
                # segment START (an earlier revision's -sy1 returned x0 for
                # any edge ending inside the row; the interpret path uses
                # edge_contribution and never exercised this).
                xb = x0 + (cy1 - sy0) * slope
                xmn = jnp.minimum(xa, xb)
                xmx = jnp.maximum(xa, xb)
                span = xmx - xmn
                inv_span = 1.0 / jnp.maximum(span, 1e-9)
                rel_mn = xmn - px
                rel_mx = xmx - px
                ramp = (_h01(rel_mx) - _h01(rel_mn)) * inv_span
                mean = jnp.where(
                    span < 1e-9, _clamp01(0.5 * (rel_mn + rel_mx)), ramp
                )
                return dy * (1.0 - mean)

            def body(i, acc):
                parts = [one_edge(i * UNROLL + k) for k in range(UNROLL)]
                return acc + ((parts[0] + parts[1]) + (parts[2] + parts[3]))

            acc = jax.lax.fori_loop(
                0, EDGE_BLOCK // UNROLL, body,
                jnp.zeros((tile_h, tile_w), jnp.float32),
            )
        else:
            # Interpreter path (CPU tests): vectorize over edge sub-chunks.
            acc = jnp.zeros((tile_h, tile_w), jnp.float32)
            for k in range(EDGE_BLOCK // edge_chunk):
                sl = slice(k * edge_chunk, (k + 1) * edge_chunk)
                contrib = edge_contribution(
                    edges_ref[0, 0, sl][:, None, None],
                    edges_ref[0, 1, sl][:, None, None],
                    edges_ref[0, 2, sl][:, None, None],
                    edges_ref[0, 3, sl][:, None, None],
                    px[None],
                    py[None],
                )
                acc = acc + jnp.sum(contrib, axis=0)
        out_ref[0, :, :] += acc

    @pl.when(ec == num_ec - 1)
    def _():
        out_ref[0, :, :] = apply_fill_rule(out_ref[0, :, :], fill_rule)


def _sort_and_bound_edges(edges_t: jax.Array):
    """Sort each draw's edges by ymin (padding rows, identified as all-zero,
    sort to the end) and compute per-128-block (ymin, ymax) bounds.

    Edge order never affects the coverage sum, so sorting is free
    correctness-wise; it makes edge blocks y-coherent so the kernel's
    block-level cull fires."""
    b, _, e = edges_t.shape
    y0 = edges_t[:, 1, :]
    y1 = edges_t[:, 3, :]
    ymin = jnp.minimum(y0, y1)
    ymax = jnp.maximum(y0, y1)
    is_pad = jnp.all(edges_t == 0.0, axis=1)
    key = jnp.where(is_pad, jnp.float32(3.0e38), ymin)
    order = jnp.argsort(key, axis=-1)
    sorted_edges = jnp.take_along_axis(edges_t, order[:, None, :], axis=-1)
    key_sorted = jnp.take_along_axis(key, order, axis=-1)
    ymax_sorted = jnp.take_along_axis(
        jnp.where(is_pad, jnp.float32(-3.0e38), ymax), order, axis=-1
    )
    nb = e // EDGE_BLOCK
    block_min = key_sorted.reshape(b, nb, EDGE_BLOCK).min(axis=-1)
    block_max = ymax_sorted.reshape(b, nb, EDGE_BLOCK).max(axis=-1)
    # (B, NB, 1, 2): trailing unit dim for Mosaic SMEM block-shape rules.
    bounds = jnp.stack([block_min, block_max], axis=-1)[:, :, None, :]
    return sorted_edges, bounds


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "fill_rule", "interpret",
                     "scalar_loop"),
)
def coverage_pallas(
    edges_t: jax.Array,
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = False,
    scalar_loop: bool = None,
) -> jax.Array:
    """Tiled Pallas coverage kernel.

    ``edges_t``: (B, 4, E) f32 with E a multiple of ``EDGE_BLOCK`` (=128);
    the coordinate space is pixels.  Output (B, H, W) f32 coverage in [0, 1].
    H and W are padded to tile multiples internally and cropped on return.

    Grid: (batch, tile_y, tile_x, edge_chunk) with the edge chunks innermost;
    the output tile is revisited across chunks and accumulates the winding
    integral, then the fill rule is applied on the last chunk.  Edge chunks
    stream HBM->VMEM through the pipeline while the VPU works.
    """
    if edges_t.ndim == 2:
        edges_t = edges_t[None]
    b, four, num_edges = edges_t.shape
    assert four == 4, edges_t.shape
    assert num_edges % EDGE_BLOCK == 0

    edges_sorted, bounds = _sort_and_bound_edges(edges_t)

    pad_h = -height % TILE_H
    pad_w = -width % TILE_W
    grid = (
        b,
        (height + pad_h) // TILE_H,
        (width + pad_w) // TILE_W,
        num_edges // EDGE_BLOCK,
    )

    kernel = functools.partial(
        _coverage_kernel,
        fill_rule=fill_rule,
        tile_h=TILE_H,
        tile_w=TILE_W,
        edge_chunk=EDGE_CHUNK,
        scalar_loop=(not interpret) if scalar_loop is None else scalar_loop,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, height + pad_h, width + pad_w),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, 2),
                lambda pb, ty, tx, ec: (pb, ec, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 4, EDGE_BLOCK),
                lambda pb, ty, tx, ec: (pb, 0, ec),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_H, TILE_W),
            lambda pb, ty, tx, ec: (pb, ty, tx),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(bounds, edges_sorted)
    return out[:, :height, :width]


# ---------------------------------------------------------------------------
# Grouped Pallas kernel: 8 edges per VPU op
# ---------------------------------------------------------------------------
#
# The scalar-loop kernel issues ~30 full-tile vector ops per edge; the VPU
# spends most of its lanes recomputing y-terms that don't vary along x.  This
# kernel instead processes 8 edges at a time on the sublane axis against one
# 8-row pixel strip: edge coordinates live in a sublane-major (E, 4) layout
# so an (8, 1) slice loads 8 edges without any lane->sublane transpose, the
# y-only math runs on (8, 1) vectors (one vreg per op), and only the final
# clamp integral runs on (8, TW).  Per (8-edge group x 8-row strip) that is
# ~25 ops covering 8*TW edge-pixel pairs — close to the VPU roofline.

GROUP = 8  # edges per sublane group
STRIP_H = 8  # pixel rows per output strip


def _grouped_kernel(bounds_ref, edges_ref, out_ref, *, fill_rule: int,
                    tile_w: int, edge_block: int):
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    ec = pl.program_id(3)
    num_ec = pl.num_programs(3)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_w), 1).astype(
        jnp.float32
    )
    px = col + (tx * tile_w).astype(jnp.float32)  # (1, tw)
    strip_y0 = (ty * STRIP_H).astype(jnp.float32)

    @pl.when(ec == 0)
    def _():
        out_ref[0, :, :] = jnp.zeros((STRIP_H, tile_w), jnp.float32)

    block_hit = jnp.logical_and(
        bounds_ref[0, 0, 0, 1] > strip_y0,
        bounds_ref[0, 0, 0, 0] < strip_y0 + STRIP_H,
    )

    @pl.when(block_hit)
    def _():
        rows = []
        for r in range(STRIP_H):
            rows.append(jnp.zeros((1, tile_w), jnp.float32))

        def group_body(g, carry):
            base = pl.multiple_of(g * GROUP, GROUP)
            x0 = edges_ref[0, pl.ds(base, GROUP), 0:1]  # (8, 1)
            y0 = edges_ref[0, pl.ds(base, GROUP), 1:2]
            x1 = edges_ref[0, pl.ds(base, GROUP), 2:3]
            y1 = edges_ref[0, pl.ds(base, GROUP), 3:4]

            dyd = y1 - y0
            safe_dyd = jnp.where(jnp.abs(dyd) < 1e-9, 1.0, dyd)
            inv_dyd = 1.0 / safe_dyd
            dx_seg = x1 - x0

            new_rows = []
            for r in range(STRIP_H):
                py = strip_y0 + r
                sy0 = y0 - py
                sy1 = y1 - py
                cy0 = _clamp01(sy0)
                cy1 = _clamp01(sy1)
                dy = cy1 - cy0  # (8, 1)
                t0 = (cy0 - sy0) * inv_dyd
                t1 = (cy1 - sy0) * inv_dyd
                xa = x0 + t0 * dx_seg
                xb = x0 + t1 * dx_seg
                xmn = jnp.minimum(xa, xb)  # (8, 1)
                xmx = jnp.maximum(xa, xb)
                span = xmx - xmn
                inv_span = 1.0 / jnp.where(span < 1e-9, 1.0, span)
                rel_mn = xmn - px  # (8, tw)
                rel_mx = xmx - px
                mean = jnp.where(
                    span < 1e-9,
                    _clamp01(0.5 * (rel_mn + rel_mx)),
                    (_h01(rel_mx) - _h01(rel_mn)) * inv_span,
                )
                contrib = dy * (1.0 - mean)  # (8, tw)
                new_rows.append(
                    carry[r] + jnp.sum(contrib, axis=0, keepdims=True)
                )
            return tuple(new_rows)

        rows = jax.lax.fori_loop(
            0, edge_block // GROUP, group_body, tuple(rows)
        )
        out_ref[0, :, :] += jnp.concatenate(rows, axis=0)

    @pl.when(ec == num_ec - 1)
    def _():
        out_ref[0, :, :] = apply_fill_rule(out_ref[0, :, :], fill_rule)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "fill_rule", "interpret")
)
def coverage_grouped(
    edges_t: jax.Array,
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = False,
) -> jax.Array:
    """Grouped-edge Pallas coverage.  (B, 4, E) -> (B, H, W) f32."""
    if edges_t.ndim == 2:
        edges_t = edges_t[None]
    b, four, num_edges = edges_t.shape
    assert four == 4
    assert num_edges % EDGE_BLOCK == 0

    edges_sorted, bounds = _sort_and_bound_edges(edges_t)
    edges_sl = jnp.swapaxes(edges_sorted, 1, 2)  # (B, E, 4) sublane-major

    pad_h = -height % STRIP_H
    pad_w = -width % TILE_W
    grid = (
        b,
        (height + pad_h) // STRIP_H,
        (width + pad_w) // TILE_W,
        num_edges // EDGE_BLOCK,
    )
    kernel = functools.partial(
        _grouped_kernel,
        fill_rule=fill_rule,
        tile_w=TILE_W,
        edge_block=EDGE_BLOCK,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, height + pad_h, width + pad_w),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, 2),
                lambda pb, ty, tx, ec: (pb, ec, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, EDGE_BLOCK, 4),
                lambda pb, ty, tx, ec: (pb, ec, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, STRIP_H, TILE_W),
            lambda pb, ty, tx, ec: (pb, ty, tx),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(bounds, edges_sl)
    return out[:, :height, :width]


# ---------------------------------------------------------------------------
# Banded Pallas kernel: per-tile-row edge windows
# ---------------------------------------------------------------------------
#
# Edges are pre-split host-side to a bounded y-extent (MAX_EDGE_EXTENT) and
# sorted by ymin.  Any edge overlapping tile row ty then lies in the
# contiguous window [searchsorted(ymin, ty*TH - MAX_EDGE_EXTENT),
# searchsorted(ymin, ty*TH + TH)), so each tile iterates only the edges near
# its band instead of the whole table.  Splitting a segment never changes
# the coverage sum, so this is exact.

MAX_EDGE_EXTENT = 64.0  # px; cap on per-edge |y1 - y0| for banding
SMEM_EDGE_CAP = 2048  # max edges held in SMEM by the banded kernel


def _banded_kernel(ranges_ref, edges_ref, out_ref, *, fill_rule: int,
                   tile_h: int, tile_w: int):
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(
        jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(
        jnp.float32
    )
    py = row + (ty * tile_h).astype(jnp.float32)
    px = col + (tx * tile_w).astype(jnp.float32)

    lo = ranges_ref[0, 0, 0, 0]
    hi = ranges_ref[0, 0, 0, 1]

    def body(e, acc):
        x0 = edges_ref[0, 0, e]
        y0 = edges_ref[0, 1, e]
        x1 = edges_ref[0, 2, e]
        y1 = edges_ref[0, 3, e]
        return acc + edge_contribution(x0, y0, x1, y1, px, py)

    acc = jax.lax.fori_loop(
        lo, hi, body, jnp.zeros((tile_h, tile_w), jnp.float32)
    )
    out_ref[0, :, :] = apply_fill_rule(acc, fill_rule)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "fill_rule", "interpret")
)
def coverage_banded(
    edges_t: jax.Array,
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = False,
) -> jax.Array:
    """Banded Pallas coverage: edges must have y-extent <= MAX_EDGE_EXTENT
    (use :func:`swf_renderer_tpu.models.geometry.split_edges_y`).  (B, 4, E)
    with E <= SMEM_EDGE_CAP -> (B, H, W) coverage."""
    if edges_t.ndim == 2:
        edges_t = edges_t[None]
    b, four, num_edges = edges_t.shape
    assert four == 4
    if num_edges > SMEM_EDGE_CAP:
        raise ValueError(
            f"banded kernel supports at most {SMEM_EDGE_CAP} edges, got "
            f"{num_edges}; use coverage_pallas instead"
        )

    # Sort by ymin (padding rows to the end) and build per-tile-row windows.
    # The window low bound is widened by the draw's actual max edge y-extent,
    # so the kernel is exact for any input; pre-splitting edges (see
    # geometry.split_edges_y) merely tightens the windows.
    y0 = edges_t[:, 1, :]
    y1 = edges_t[:, 3, :]
    ymin = jnp.minimum(y0, y1)
    is_pad = jnp.all(edges_t == 0.0, axis=1)
    key = jnp.where(is_pad, jnp.float32(3.0e38), ymin)
    order = jnp.argsort(key, axis=-1)
    edges_sorted = jnp.take_along_axis(edges_t, order[:, None, :], axis=-1)
    key_sorted = jnp.take_along_axis(key, order, axis=-1)
    max_ext = jnp.max(jnp.abs(y1 - y0), axis=-1)  # (B,) — pads have extent 0

    pad_h = -height % TILE_H
    pad_w = -width % TILE_W
    ty_count = (height + pad_h) // TILE_H
    band_y0 = jnp.arange(ty_count, dtype=jnp.float32) * TILE_H
    lo = jax.vmap(
        lambda k, m: jnp.searchsorted(k, band_y0 - m)
    )(key_sorted, max_ext)
    hi = jax.vmap(
        lambda k: jnp.searchsorted(k, band_y0 + TILE_H)
    )(key_sorted)
    # (B, TY, 1, 2): trailing unit dim so the SMEM block shape's last two
    # dims match the array (a Mosaic block-mapping requirement).
    ranges = jnp.stack([lo, hi], axis=-1).astype(jnp.int32)[:, :, None, :]

    kernel = functools.partial(
        _banded_kernel,
        fill_rule=fill_rule,
        tile_h=TILE_H,
        tile_w=TILE_W,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, height + pad_h, width + pad_w),
                                       jnp.float32),
        grid=(b, ty_count, (width + pad_w) // TILE_W),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, 2),
                lambda pb, ty, tx: (pb, ty, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 4, num_edges),
                lambda pb, ty, tx: (pb, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_H, TILE_W),
            lambda pb, ty, tx: (pb, ty, tx),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(ranges, edges_sorted)
    return out[:, :height, :width]


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def coverage(
    edges_t: jax.Array,
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    use_pallas: bool = True,
    banded: bool = True,
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, XLA fallback elsewhere.

    The banded kernel is preferred when the edge table fits in SMEM; callers
    should pre-split edges to MAX_EDGE_EXTENT (the renderer does).  (Pallas
    interpret mode is exercised explicitly in tests; the XLA path is the
    production CPU fallback since it is much faster than interpretation.)
    """
    if use_pallas and _on_tpu():
        if banded and edges_t.shape[-1] <= SMEM_EDGE_CAP:
            return coverage_banded(edges_t, height, width, fill_rule)
        return coverage_pallas(edges_t, height, width, fill_rule)
    return coverage_xla(edges_t, height, width, fill_rule)


# ---------------------------------------------------------------------------
# NumPy oracle (tests only)
# ---------------------------------------------------------------------------


def coverage_numpy(edges: np.ndarray, height: int, width: int,
                   fill_rule: int = FILL_RULE_NONZERO) -> np.ndarray:
    """Direct NumPy port of the math, one edge at a time.  (E, 4) -> (H, W)."""
    py = np.arange(height, dtype=np.float64)[:, None]
    px = np.arange(width, dtype=np.float64)[None, :]
    acc = np.zeros((height, width), dtype=np.float64)

    def h01(x):
        return np.where(x <= 0.0, 0.0, np.where(x >= 1.0, x - 0.5, 0.5 * x * x))

    for x0, y0, x1, y1 in np.asarray(edges, dtype=np.float64):
        sy0, sy1 = y0 - py, y1 - py
        cy0, cy1 = np.clip(sy0, 0, 1), np.clip(sy1, 0, 1)
        dy = cy1 - cy0
        dyd = sy1 - sy0
        safe = np.where(np.abs(dyd) < 1e-9, 1.0, dyd)
        t0, t1 = (cy0 - sy0) / safe, (cy1 - sy0) / safe
        sx0 = x0 - px
        xa = sx0 + t0 * (x1 - x0)
        xb = sx0 + t1 * (x1 - x0)
        xmn, xmx = np.minimum(xa, xb), np.maximum(xa, xb)
        span = xmx - xmn
        safe_span = np.where(span < 1e-9, 1.0, span)
        mean = np.where(
            span < 1e-9,
            np.clip(0.5 * (xmn + xmx), 0, 1),
            (h01(xmx) - h01(xmn)) / safe_span,
        )
        acc += dy * (1.0 - mean)

    if fill_rule == FILL_RULE_NONZERO:
        return np.minimum(np.abs(acc), 1.0)
    m = np.mod(acc, 2.0)
    return 1.0 - np.abs(m - 1.0)
