"""Styled fused flat-block pipeline vs the legacy coverage+style path.

The fused kernel must reproduce (within u8 rounding) what the layered
reference semantics produce: per-draw coverage, per-pixel paint fields
(solid / linear / focal / bitmap), premultiplied over-composite, straight
u8.  Gradients are evaluated IN-KERNEL from baked stop tables; bitmap
paints stream precomputed chunk-major field planes.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from swf_renderer_tpu.ops import style as style_ops
from swf_renderer_tpu.ops.composite import (
    composite_draws,
    premul_to_straight_u8,
)
from swf_renderer_tpu.ops.coverage import coverage_numpy
from swf_renderer_tpu.ops.flatblock import (
    KernelPaint,
    KPAINT_FOCAL,
    KPAINT_LINEAR,
    LANE,
    field_to_chunkmajor,
    frames_u32_to_u8,
    pack_flat_blocks,
    plane_geometry,
    render_fused_styled,
    sort_blocks_fused,
    group_blocks_fused,
)

import jax


def _polygon_edges(rng, height, width, n=7):
    pts = rng.uniform(0, (width, height), (n, 2)).astype(np.float32)
    closed = np.concatenate([pts, pts[:1]])
    return np.concatenate([closed[:-1], closed[1:]], axis=1)


def _updates(edges, height, width):
    from swf_renderer_tpu.ops.scanline import edges_to_cells

    r, c, a, v = edges_to_cells(edges, height, width)
    rows = np.concatenate([r, r])
    cols = np.concatenate([c, c + 1])
    vals = np.concatenate([a, v - a]).astype(np.float32)
    key = rows.astype(np.int64) * (width + 2) + cols
    order = np.argsort(key, kind="stable")
    key, rows, cols, vals = key[order], rows[order], cols[order], vals[order]
    uniq, inv = np.unique(key, return_inverse=True)
    acc = np.zeros(len(uniq), np.float32)
    np.add.at(acc, inv, vals)
    keep = acc != 0.0
    return ((uniq[keep] // (width + 2)).astype(np.int32),
            (uniq[keep] % (width + 2)).astype(np.int32), acc[keep])


def test_styled_fused_matches_legacy_path():
    rng = np.random.default_rng(5)
    height, width = 48, 260
    frames = 2

    stops_r = np.array([0.0, 0.4, 1.0], np.float32)
    stops_c = np.array([[1, 0, 0, 1], [0, 1, 0, 0.8], [0, 0, 1, 1]],
                       np.float32)
    img = rng.integers(0, 256, (13, 17, 4)).astype(np.uint8)
    paints = [
        style_ops.solid_paint((0.3, 0.6, 0.9, 0.8)),
        style_ops.Paint(kind=style_ops.PAINT_LINEAR,
                        inv_matrix=(140.0, 0.0, 0.0, 140.0,
                                    -16384.0, -8000.0),
                        stop_ratios=stops_r, stop_colors=stops_c,
                        spread=style_ops.SPREAD_PAD),
        style_ops.Paint(kind=style_ops.PAINT_FOCAL,
                        inv_matrix=(160.0, 20.0, -10.0, 160.0,
                                    -12000.0, -9000.0),
                        stop_ratios=stops_r, stop_colors=stops_c,
                        focal_point=0.4, spread=style_ops.SPREAD_REFLECT),
        style_ops.Paint(kind=style_ops.PAINT_BITMAP,
                        inv_matrix=(0.21, 0.0, 0.0, 0.17, 1.5, 0.5),
                        image=img, repeating=True, smoothed=True,
                        supersample=2),
    ]
    layers = len(paints)

    edge_tables = [[_polygon_edges(rng, height, width) for _ in paints]
                   for _ in range(frames)]
    colors = np.zeros((frames, layers, 4), np.float32)
    colors[:, 0] = paints[0].color

    # Legacy reference: per-draw coverage + paint fields + over-composite.
    want = []
    fields = [style_ops.paint_field(p, height, width) for p in paints]
    for f in range(frames):
        covs = np.stack([coverage_numpy(t, height, width)
                         for t in edge_tables[f]])
        pm = composite_draws(jnp.asarray(covs), jnp.stack(fields))
        want.append(np.asarray(premul_to_straight_u8(pm)))
    want = np.stack(want)

    # Styled fused path.
    update_lists = [[_updates(t, height, width) for t in per]
                    for per in edge_tables]
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
        update_lists, height, width, block_pad_multiple=1)
    blocks = sort_blocks_fused(sidx, keep, urc, ucm, uval, layers, ns,
                               block_pad_multiple=1)
    gsi, gfl, gla, grc, gcm, gvv = group_blocks_fused(
        *blocks, layers, ns, group=4, group_pad_multiple=4)

    kpaints = (
        KernelPaint.color(),
        KernelPaint.gradient(KPAINT_LINEAR, paints[1].inv_matrix,
                             stops_r, stops_c, spread=style_ops.SPREAD_PAD),
        KernelPaint.gradient(KPAINT_FOCAL, paints[2].inv_matrix,
                             stops_r, stops_c, focal=0.4,
                             spread=style_ops.SPREAD_REFLECT),
        KernelPaint.field(0),
    )
    fplanes = (np.asarray(field_to_chunkmajor(fields[3], ns, nc)),)
    out = np.asarray(render_fused_styled(
        jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
        jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
        jnp.asarray(colors), tuple(jnp.asarray(f) for f in fplanes),
        frames, layers, ns, nc, kpaints, group=4))
    got32 = out[:, :ns].reshape(frames, ns * 8, nc * LANE)
    got = frames_u32_to_u8(got32, height, width)

    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # Float association differs (in-kernel gradient accumulation, fused
    # composite): off-by-one u8 on knife-edge values only.
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.02


def test_field_to_chunkmajor_roundtrip():
    rng = np.random.default_rng(3)
    height, width = 20, 150
    stride, nc, ns = plane_geometry(height, width)
    field = rng.uniform(0, 1, (height, width, 4)).astype(np.float32)
    cm = np.asarray(field_to_chunkmajor(field, ns, nc))
    assert cm.shape == (ns + 1, 4, LANE, LANE)
    for y, x in [(0, 0), (7, 127), (8, 128), (19, 149), (3, 140)]:
        s, rc, lane = y // 8, (x // LANE) * 8 + y % 8, x % LANE
        np.testing.assert_array_equal(cm[s, :, rc, lane], field[y, x])


def test_styled_spp_matches_single():
    """Multi-strip planes (spp > 1) on the STYLED kernel: bit-identical
    packed-u32 output vs the spp=1 kernel across every paint kind
    (gradients re-derive pixel coords through the strip window; bitmap
    field planes repack spp strips per plane)."""
    from swf_renderer_tpu.native.bindings import (
        native_available, pack_grouped_native,
    )
    from swf_renderer_tpu.ops.flatblock import strips_per_plane
    from swf_renderer_tpu.ops.pipeline import (
        kernel_paints_for, lower_update_lists,
    )

    if not native_available():
        pytest.skip("native packer required for spp > 1")
    rng = np.random.default_rng(17)
    height, width = 64, 250  # stride 384 -> nc=3, nc8=24 -> spp=5
    frames = 2

    stops_r = np.array([0.0, 1.0], np.float32)
    stops_c = np.array([[1, 0, 0, 1], [0, 0, 1, 0.5]], np.float32)
    img = rng.integers(0, 256, (11, 19, 4)).astype(np.uint8)
    paints = [
        style_ops.solid_paint((0.9, 0.4, 0.1, 0.7)),
        style_ops.Paint(kind=style_ops.PAINT_LINEAR,
                        inv_matrix=(130.0, 10.0, -5.0, 130.0,
                                    -16384.0, -8000.0),
                        stop_ratios=stops_r, stop_colors=stops_c),
        style_ops.Paint(kind=style_ops.PAINT_FOCAL,
                        inv_matrix=(150.0, 0.0, 0.0, 150.0,
                                    -9000.0, -9000.0),
                        stop_ratios=stops_r, stop_colors=stops_c,
                        focal_point=-0.3, spread=style_ops.SPREAD_REPEAT),
        style_ops.Paint(kind=style_ops.PAINT_BITMAP,
                        inv_matrix=(0.19, 0.0, 0.0, 0.23, 0.5, 1.5),
                        image=img, repeating=True, smoothed=True,
                        supersample=2),
    ]
    layers = len(paints)
    edge_tables = [[_polygon_edges(rng, height, width) for _ in paints]
                   for _ in range(frames)]
    colors = np.zeros((frames, layers, 4), np.float32)
    colors[:, 0] = paints[0].color
    update_lists = lower_update_lists(edge_tables, height, width,
                                      drop_zeros=True)

    _, nc_geo, ns_geo = plane_geometry(height, width)
    spp = strips_per_plane(nc_geo, ns_geo)
    assert spp > 1

    outs = {}
    for s in (1, spp):
        kp, fields, _ = kernel_paints_for(paints, height, width, spp=s)
        gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
            update_lists, height, width, group=4, spp=s)
        out = np.asarray(render_fused_styled(
            jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
            jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
            jnp.asarray(colors), fields, frames, layers, ns, nc, kp,
            group=4, spp=s))
        got32 = out[:, :ns].reshape(frames, ns * s * 8, nc * LANE)
        outs[s] = frames_u32_to_u8(got32, height, width)
    np.testing.assert_array_equal(outs[1], outs[spp])


def test_render_batch_styled_narrow_uses_spp():
    """The public styled path picks up spp on narrow frames and matches
    the layered reference within u8 rounding."""
    from swf_renderer_tpu.native.bindings import native_available
    from swf_renderer_tpu.ops.pipeline import render_batch_styled

    if not native_available():
        pytest.skip("native packer required for spp > 1")
    rng = np.random.default_rng(23)
    height, width = 56, 200
    paints = [
        style_ops.solid_paint((0.2, 0.8, 0.4, 0.9)),
        style_ops.Paint(kind=style_ops.PAINT_LINEAR,
                        inv_matrix=(160.0, 0.0, 0.0, 160.0,
                                    -16384.0, -6000.0),
                        stop_ratios=np.array([0.0, 1.0], np.float32),
                        stop_colors=np.array([[1, 1, 0, 1], [1, 0, 1, 1]],
                                             np.float32)),
    ]
    edge_tables = [[_polygon_edges(rng, height, width) for _ in paints]]
    got = render_batch_styled(edge_tables, paints, height, width)

    fields = [style_ops.paint_field(p, height, width) for p in paints]
    covs = np.stack([coverage_numpy(t, height, width)
                     for t in edge_tables[0]])
    want = np.asarray(premul_to_straight_u8(
        composite_draws(jnp.asarray(covs), jnp.stack(fields))))
    diff = np.abs(got[0].astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1


def test_multipass_chain_is_exact():
    """Deep draw lists render in chained passes; the chain composite is a
    left fold, so pass-chaining must be BIT-IDENTICAL to one giant
    chain-form pass over all layers (interpret mode has no VMEM limit, so
    the oracle pass can hold 40 accumulator planes)."""
    from swf_renderer_tpu.native.bindings import (
        native_available, pack_grouped_native,
    )
    from swf_renderer_tpu.ops.flatblock import strips_per_plane
    from swf_renderer_tpu.ops.pipeline import (
        lower_update_lists, render_batch_styled, split_layer_groups,
    )

    if not native_available():
        pytest.skip("native packer required")
    rng = np.random.default_rng(47)
    height, width = 48, 180
    frames, n_layers = 2, 40
    paints = [style_ops.solid_paint(tuple(rng.uniform(0.2, 1.0, 4)))
              for _ in range(n_layers)]
    groups = split_layer_groups(paints)
    assert len(groups) == 3  # 16 + 16 + 8

    edge_tables = [[_polygon_edges(rng, height, width)
                    for _ in range(n_layers)] for _ in range(frames)]
    got = render_batch_styled(edge_tables, paints, height, width)

    # Oracle: ONE chain-form pass over all 40 layers.
    _, nc_geo, ns_geo = plane_geometry(height, width)
    spp = strips_per_plane(nc_geo, ns_geo)
    update_lists = lower_update_lists(edge_tables, height, width,
                                      drop_zeros=True)
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        update_lists, height, width, group=6, spp=spp)
    colors = np.stack([[p.color for p in paints]] * frames).astype(
        np.float32)
    kpaints = tuple(KernelPaint.color() for _ in paints)
    out = np.asarray(render_fused_styled(
        jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
        jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
        jnp.asarray(colors), (), frames, n_layers, ns, nc, kpaints,
        group=6, spp=spp, chain=True))
    want32 = out[:, :ns].reshape(frames, ns * spp * 8, nc * LANE)
    want = frames_u32_to_u8(want32, height, width)
    np.testing.assert_array_equal(got, want)


def test_multipass_matches_layered_oracle():
    """64 draws (incl. gradients + >4 bitmaps) through the multipass
    flat-block path vs the layered coverage+fields oracle: within one u8
    step (float association differs between the fused chain and the XLA
    composite)."""
    from swf_renderer_tpu.native.bindings import native_available
    from swf_renderer_tpu.ops.pipeline import (
        render_batch_styled, split_layer_groups,
    )

    if not native_available():
        pytest.skip("native packer required")
    rng = np.random.default_rng(53)
    height, width = 40, 150
    n_layers = 64
    paints = []
    for i in range(n_layers):
        kind = i % 8
        if kind == 5:
            paints.append(style_ops.Paint(
                kind=style_ops.PAINT_LINEAR,
                inv_matrix=(200.0, 0.0, 0.0, 200.0, -16384.0,
                            -4000.0 * (i % 3)),
                stop_ratios=np.array([0.0, 1.0], np.float32),
                stop_colors=np.array([[1, 0, 0, 1], [0, 1, 0, 0.6]],
                                     np.float32)))
        elif kind == 6:
            img = rng.integers(0, 256, (7, 9, 4)).astype(np.uint8)
            paints.append(style_ops.Paint(
                kind=style_ops.PAINT_BITMAP,
                inv_matrix=(0.3, 0.0, 0.0, 0.3, 0.0, 0.0),
                image=img, repeating=True, smoothed=True, supersample=1))
        else:
            paints.append(style_ops.solid_paint(
                tuple(rng.uniform(0.2, 1.0, 4))))
    assert len(split_layer_groups(paints)) >= 4

    edge_tables = [[_polygon_edges(rng, height, width, n=5)
                    for _ in range(n_layers)]]
    got = render_batch_styled(edge_tables, paints, height, width)

    fields = [style_ops.paint_field(p, height, width) for p in paints]
    covs = np.stack([coverage_numpy(t, height, width)
                     for t in edge_tables[0]])
    want = np.asarray(premul_to_straight_u8(
        composite_draws(jnp.asarray(covs), jnp.stack(fields))))
    diff = np.abs(got[0].astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()


@pytest.mark.parametrize("use_spp", [False, True])
def test_vfold_placement_bit_identical(use_spp):
    """vfold placement (value parts scale the (BLK, LANE) step matrix,
    uval read sublane-oriented) is BIT-identical to the one-hot-side
    production kernel: every MXU product is the same bf16 pair in the
    same k order (_place_delta docstring), so the raw packed-u32 output
    must match exactly — on single-strip AND multi-strip (spp > 1)
    planes, where the fold actually shrinks the per-pass elementwise
    work (plane_rows > BLK).

    This identity holds in interpret mode (this test, CPU) but NOT on
    the chip: Mosaic miscompiles the vfold branch (byte_dmax 221 —
    excess-precision folding family, PERF.md round 4), which with the
    -21% timing is why vfold is permanently off in production."""
    from swf_renderer_tpu.native.bindings import (
        native_available, pack_grouped_native,
    )
    from swf_renderer_tpu.ops.flatblock import strips_per_plane
    from swf_renderer_tpu.ops.pipeline import (
        kernel_paints_for, lower_update_lists,
    )

    if not native_available():
        pytest.skip("native packer required")
    rng = np.random.default_rng(29)
    height, width = 64, 250
    frames = 2
    stops_r = np.array([0.0, 1.0], np.float32)
    stops_c = np.array([[1, 0, 0, 1], [0, 0, 1, 0.5]], np.float32)
    paints = [
        style_ops.solid_paint((0.9, 0.4, 0.1, 0.7)),
        style_ops.Paint(kind=style_ops.PAINT_LINEAR,
                        inv_matrix=(130.0, 10.0, -5.0, 130.0,
                                    -8000.0, -8000.0),
                        stop_ratios=stops_r, stop_colors=stops_c),
    ]
    layers = len(paints)
    edge_tables = [[_polygon_edges(rng, height, width) for _ in paints]
                   for _ in range(frames)]
    colors = np.zeros((frames, layers, 4), np.float32)
    colors[:, 0] = paints[0].color
    update_lists = lower_update_lists(edge_tables, height, width,
                                      drop_zeros=True)
    _, nc_geo, ns_geo = plane_geometry(height, width)
    spp = strips_per_plane(nc_geo, ns_geo) if use_spp else 1
    kp, fields, _ = kernel_paints_for(paints, height, width, spp=spp)
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        update_lists, height, width, group=4, spp=spp)
    outs = {}
    for vf in (False, True):
        outs[vf] = np.asarray(render_fused_styled(
            jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
            jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
            jnp.asarray(colors), fields, frames, layers, ns, nc, kp,
            group=4, spp=spp, vfold=vf))
    np.testing.assert_array_equal(outs[False], outs[True])
    if use_spp:
        assert spp > 1
