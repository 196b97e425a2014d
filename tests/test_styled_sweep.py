"""Gradient paints on the on-device transform sweep.

The reference replays gradient fills under a new matrix for free
(canvas-renderer.ts:179-184, 292-335: the CTM applies at draw time and
the gradient rides it).  The sweep kernel evaluates sRGB linear/focal
gradients IN-KERNEL with per-frame composed matrices (paint inverse ∘
frame inverse, from SMEM), so gradient-filled shapes animate with the
same O(1) host work as solids.

Oracle: per frame, transform the edges on host, compute the gradient
field with an INDEPENDENTLY composed matrix (numpy 3x3 inversion, not
the Affine helper), composite layered.
"""

import dataclasses

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from swf_renderer_tpu.ops import style as style_ops
from swf_renderer_tpu.ops.composite import (
    composite_draws,
    premul_to_straight_u8,
)
from swf_renderer_tpu.ops.coverage import coverage_numpy
from swf_renderer_tpu.ops.morph import morph_frames_to_u8
from swf_renderer_tpu.ops.transform import (
    affine_pieces,
    render_affine_sweep,
    sweep_paints,
)


def _star_edges(cx, cy, r_out, r_in, points=7):
    ang = np.linspace(0, 2 * np.pi, 2 * points, endpoint=False)
    rad = np.where(np.arange(2 * points) % 2 == 0, r_out, r_in)
    pts = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)],
                   1).astype(np.float32)
    closed = np.concatenate([pts, pts[:1]])
    return np.concatenate([closed[:-1], closed[1:]], axis=1)


def _rotation_mats(frames, cx, cy, scale=1.0):
    mats = []
    for i in range(frames):
        th = 2 * np.pi * i / frames
        a, b = np.cos(th) * scale, np.sin(th) * scale
        e = cx - a * cx + b * cy
        f = cy - b * cx - a * cy
        mats.append((a, b, -b, a, e, f))
    return np.asarray(mats, np.float32)


def _np_affine_3x3(m):
    a, b, c, d, e, f = m
    return np.array([[a, c, e], [b, d, f], [0, 0, 1]], np.float64)


def _np_compose_inv(paint_inv, frame_mat):
    """paint_inv ∘ frame^-1 via plain 3x3 math (independent oracle)."""
    g = _np_affine_3x3(paint_inv) @ np.linalg.inv(_np_affine_3x3(frame_mat))
    return (g[0, 0], g[1, 0], g[0, 1], g[1, 1], g[0, 2], g[1, 2])


def _oracle_frame(tables, paints, mat, height, width):
    covs, fields = [], []
    for t, p in zip(tables, paints):
        a, b, c, d, e, f = mat
        x0, y0, x1, y1 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
        xt = np.stack([a * x0 + c * y0 + e, b * x0 + d * y0 + f,
                       a * x1 + c * y1 + e, b * x1 + d * y1 + f],
                      1).astype(np.float32)
        covs.append(coverage_numpy(xt, height, width))
        if p.kind == style_ops.PAINT_SOLID:
            fields.append(np.broadcast_to(
                np.asarray(p.color, np.float32), (height, width, 4)))
        else:
            pf = dataclasses.replace(
                p, inv_matrix=_np_compose_inv(p.inv_matrix, mat))
            fields.append(np.asarray(style_ops.paint_field(
                pf, height, width)))
    pm = composite_draws(jnp.asarray(np.stack(covs), jnp.float32),
                         jnp.asarray(np.stack(fields), jnp.float32))
    return np.asarray(premul_to_straight_u8(pm))


def _scene():
    tables = [
        _star_edges(60.0, 48.0, 40.0, 18.0),
        _star_edges(55.0, 50.0, 24.0, 10.0, points=5),
        _star_edges(70.0, 40.0, 18.0, 8.0, points=6),
    ]
    paints = [
        style_ops.solid_paint((0.9, 0.2, 0.1, 0.9)),
        style_ops.Paint(
            kind=style_ops.PAINT_LINEAR,
            inv_matrix=(300.0, 0.0, 0.0, 300.0, -16384.0, -15000.0),
            stop_ratios=np.array([0.0, 0.45, 1.0], np.float32),
            stop_colors=np.array([[1, 1, 0, 1], [0, 1, 1, 0.8],
                                  [1, 0, 1, 1]], np.float32),
            spread=style_ops.SPREAD_REFLECT),
        style_ops.Paint(
            kind=style_ops.PAINT_FOCAL,
            inv_matrix=(500.0, 40.0, -30.0, 500.0, -20000.0, -19000.0),
            stop_ratios=np.array([0.0, 1.0], np.float32),
            stop_colors=np.array([[0.2, 0.4, 1, 1], [1, 0.3, 0, 0.5]],
                                 np.float32),
            focal_point=0.4),
    ]
    return tables, paints


def test_gradient_sweep_matches_host_oracle():
    height, width = 96, 120
    tables, paints = _scene()
    colors = [p.color if p.kind == style_ops.PAINT_SOLID else (0, 0, 0, 0)
              for p in paints]
    mats = _rotation_mats(6, 60.0, 48.0)

    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    kpaints, grad_mats = sweep_paints(paints, mats)
    assert grad_mats is not None and grad_mats.shape == (6, 3, 6)
    out = render_affine_sweep(
        jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
        jnp.asarray(colarr), height, width,
        paints=kpaints, grad_mats=jnp.asarray(grad_mats))
    got = morph_frames_to_u8(np.asarray(out), height, width)

    for i in range(len(mats)):
        want = _oracle_frame(tables, paints, mats[i], height, width)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        # Same association-noise budget as the solid sweep oracle test;
        # gradient ramps add one more rounding site at stop boundaries.
        assert diff.max() <= 2, (i, diff.max())
        assert (diff > 1).mean() < 2e-3


def test_gradient_sweep_scaled_track():
    """Anisotropic scaling: the gradient must scale WITH the shape (the
    composed matrix undoes the frame transform before the paint map)."""
    height, width = 64, 64
    tables = [_star_edges(32.0, 32.0, 14.0, 6.0)]
    paints = [style_ops.Paint(
        kind=style_ops.PAINT_LINEAR,
        inv_matrix=(800.0, 0.0, 0.0, 800.0, -16384.0, -25600.0),
        stop_ratios=np.array([0.0, 1.0], np.float32),
        stop_colors=np.array([[1, 0, 0, 1], [0, 0, 1, 1]], np.float32))]
    mats = np.asarray([
        (1.0, 0.0, 0.0, 1.0, 0.0, 0.0),
        (1.8, 0.3, -0.2, 1.5, 3.0, -4.0),
        (0.6, -0.1, 0.2, 0.5, 8.0, 10.0),
    ], np.float32)
    tab, subxy, colarr = affine_pieces(tables, [(0, 0, 0, 0)], mats)
    kpaints, grad_mats = sweep_paints(paints, mats)
    out = render_affine_sweep(
        jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
        jnp.asarray(colarr), height, width,
        paints=kpaints, grad_mats=jnp.asarray(grad_mats))
    got = morph_frames_to_u8(np.asarray(out), height, width)
    for i in range(len(mats)):
        want = _oracle_frame(tables, paints, mats[i], height, width)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())


def test_render_batch_routes_gradient_animation():
    """render_batch detects a moving-matrix animation of a GRADIENT-
    filled shape and routes it through the transform sweep (previously
    any non-solid paint forfeited the sweep to per-frame host
    relowering), matching per-frame renders."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    size = 500
    grad_matrix = ast.Matrix(
        scale_x=Sfixed16P16.from_value(size / 32768.0),
        scale_y=Sfixed16P16.from_value(size / 32768.0),
        rotate_skew0=Sfixed16P16.from_value(0.0),
        rotate_skew1=Sfixed16P16.from_value(0.0),
        translate_x=size // 2, translate_y=size // 2,
    )
    gradient = ast.Gradient(
        spread=ast.GradientSpread.PAD,
        color_space=ast.ColorSpace.S_RGB,
        colors=[
            ast.GradientStop(ratio=0,
                             color=ast.StraightSRgba8(255, 40, 20, 255)),
            ast.GradientStop(ratio=255,
                             color=ast.StraightSRgba8(20, 40, 255, 200)),
        ],
    )
    tag = ast.DefineShape(
        id=1,
        bounds=ast.Rect(x_min=0, x_max=size, y_min=0, y_max=size),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=[ast.LinearGradientFill(matrix=grad_matrix,
                                             gradient=gradient)],
                line=[],
            ),
            records=[
                ast.StyleChangeRecord(
                    right_fill=1, move_to=ast.Vector2D(x=0, y=0)),
                ast.EdgeRecord(delta=ast.Vector2D(x=size, y=0)),
                ast.EdgeRecord(delta=ast.Vector2D(x=0, y=size)),
                ast.EdgeRecord(delta=ast.Vector2D(x=-size, y=-size)),
            ],
        ),
    )
    w = h = 40
    stages = []
    for i in range(4):
        th = 2 * np.pi * i / 12
        a, b = np.cos(th), np.sin(th)
        cx = cy = 400.0
        m = ast.Matrix(
            scale_x=Sfixed16P16.from_value(a),
            scale_y=Sfixed16P16.from_value(a),
            rotate_skew0=Sfixed16P16.from_value(b),
            rotate_skew1=Sfixed16P16.from_value(-b),
            translate_x=int(round(cx - a * cx + b * cy)),
            translate_y=int(round(cy - b * cx - a * cy)),
        )
        stages.append(display.Stage(
            width=w, height=h,
            children=[display.ShapeInstance(definition=tag, matrix=m)]))

    r = TpuRenderer(w, h)
    got = r.render_batch(stages)
    assert r.last_stats.path == "transform-sweep"
    assert got.shape == (4, h, w, 4)

    for i, stage in enumerate(stages):
        want = TpuRenderer(w, h).render(stage)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())


def test_gradient_sweep_dynamic_stop_colors():
    """Per-frame stop-color overrides (the SMEM (F, L, K, 4) input that
    carries color-transform fades) match the oracle with per-frame
    substituted paints; ratios and matrices stay as in the static test."""
    height, width = 96, 120
    tables, paints = _scene()
    colors = [p.color if p.kind == style_ops.PAINT_SOLID else (0, 0, 0, 0)
              for p in paints]
    mats = _rotation_mats(5, 60.0, 48.0)

    k_max = max(len(p.stop_ratios) for p in paints
                if p.kind != style_ops.PAINT_SOLID)
    rng = np.random.default_rng(5)
    stop_colors = np.zeros((len(mats), len(paints), k_max, 4), np.float32)
    frame_paints = []
    for f in range(len(mats)):
        fade = 1.0 - 0.2 * f
        fp = []
        for li, p in enumerate(paints):
            if p.kind == style_ops.PAINT_SOLID:
                fp.append(p)
                continue
            sc = np.clip(p.stop_colors * fade
                         + rng.uniform(0, 0.05, p.stop_colors.shape),
                         0.0, 1.0).astype(np.float32)
            stop_colors[f, li, :len(p.stop_ratios)] = sc
            fp.append(dataclasses.replace(p, stop_colors=sc))
        frame_paints.append(fp)

    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    kpaints, grad_mats = sweep_paints(paints, mats)
    out = render_affine_sweep(
        jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
        jnp.asarray(colarr), height, width,
        paints=kpaints, grad_mats=jnp.asarray(grad_mats),
        stop_colors=jnp.asarray(stop_colors))
    got = morph_frames_to_u8(np.asarray(out), height, width)

    for i in range(len(mats)):
        want = _oracle_frame(tables, frame_paints[i], mats[i],
                             height, width)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())
        assert (diff > 1).mean() < 2e-3


def test_dynamic_stops_shape_validation():
    height, width = 32, 32
    tables, paints = _scene()
    colors = [(0, 0, 0, 0)] * len(paints)
    mats = _rotation_mats(3, 16.0, 16.0)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    kpaints, grad_mats = sweep_paints(paints, mats)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="stop_colors"):
        render_affine_sweep(
            jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr), height, width,
            paints=kpaints, grad_mats=jnp.asarray(grad_mats),
            stop_colors=jnp.zeros((2, len(paints), 3, 4), jnp.float32))
    with _pytest.raises(ValueError, match="requires gradient paints"):
        render_affine_sweep(
            jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr), height, width,
            stop_colors=jnp.zeros((3, len(paints), 3, 4), jnp.float32))


def test_render_batch_routes_fading_gradient_animation():
    """A gradient-filled shape moving AND fading (per-frame color
    transforms) rides the transform sweep: the cts fold into per-frame
    stop colors on device, matching per-frame renders (which compile the
    ct into the stops via scene._paint_for_fill)."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    size = 500
    grad_matrix = ast.Matrix(
        scale_x=Sfixed16P16.from_value(size / 32768.0),
        scale_y=Sfixed16P16.from_value(size / 32768.0),
        rotate_skew0=Sfixed16P16.from_value(0.0),
        rotate_skew1=Sfixed16P16.from_value(0.0),
        translate_x=size // 2, translate_y=size // 2,
    )
    gradient = ast.Gradient(
        spread=ast.GradientSpread.PAD,
        color_space=ast.ColorSpace.S_RGB,
        colors=[
            ast.GradientStop(ratio=0,
                             color=ast.StraightSRgba8(255, 40, 20, 255)),
            ast.GradientStop(ratio=255,
                             color=ast.StraightSRgba8(20, 40, 255, 200)),
        ],
    )
    tag = ast.DefineShape(
        id=1,
        bounds=ast.Rect(x_min=0, x_max=size, y_min=0, y_max=size),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=[ast.LinearGradientFill(matrix=grad_matrix,
                                             gradient=gradient)],
                line=[],
            ),
            records=[
                ast.StyleChangeRecord(
                    right_fill=1, move_to=ast.Vector2D(x=0, y=0)),
                ast.EdgeRecord(delta=ast.Vector2D(x=size, y=0)),
                ast.EdgeRecord(delta=ast.Vector2D(x=0, y=size)),
                ast.EdgeRecord(delta=ast.Vector2D(x=-size, y=-size)),
            ],
        ),
    )
    w = h = 40
    stages = []
    for i in range(4):
        th = 2 * np.pi * i / 12
        a, b = np.cos(th), np.sin(th)
        cx = cy = 400.0
        m = ast.Matrix(
            scale_x=Sfixed16P16.from_value(a),
            scale_y=Sfixed16P16.from_value(a),
            rotate_skew0=Sfixed16P16.from_value(b),
            rotate_skew1=Sfixed16P16.from_value(-b),
            translate_x=int(round(cx - a * cx + b * cy)),
            translate_y=int(round(cy - b * cx - a * cy)),
        )
        stages.append(display.Stage(
            width=w, height=h,
            children=[display.ShapeInstance(
                definition=tag, matrix=m,
                color_transform=display.ColorTransform(
                    mult=(1.0, 1.0 - 0.2 * i, 1.0, 1.0 - 0.25 * i),
                    add=(0.05 * i, 0.0, 0.0, 0.0)))]))

    r = TpuRenderer(w, h)
    got = r.render_batch(stages)
    assert r.last_stats.path == "transform-sweep"
    assert got.shape == (4, h, w, 4)

    for i, stage in enumerate(stages):
        want = TpuRenderer(w, h).render(stage)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())


def test_all_solid_paints_share_classic_path():
    """A pure-solid KernelPaint tuple collapses to paints=None, so the
    styled entry reuses the classic compiled kernel bit-for-bit."""
    from swf_renderer_tpu.ops.flatblock import KernelPaint

    height, width = 48, 60
    tables = [_star_edges(30.0, 24.0, 16.0, 7.0)]
    colors = [(0.2, 0.8, 0.4, 1.0)]
    mats = _rotation_mats(3, 30.0, 24.0)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    base = render_affine_sweep(
        jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
        jnp.asarray(colarr), height, width)
    styled = render_affine_sweep(
        jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
        jnp.asarray(colarr), height, width,
        paints=(KernelPaint.color(),))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(styled))
