"""On-device transform-animation sweep (ops/transform.py) vs the
per-frame host oracle (transform edges on host, classic coverage +
composite).  VERDICT r2 #1: moving-matrix animation with O(1) host work."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from swf_renderer_tpu.ops.composite import (
    composite_draws,
    premul_to_straight_u8,
)
from swf_renderer_tpu.ops.coverage import coverage_numpy
from swf_renderer_tpu.ops.morph import morph_frames_to_u8
from swf_renderer_tpu.ops.transform import affine_pieces, render_affine_sweep


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
        # Rotate about (cx, cy): translate so the pivot maps to itself.
        e = cx - a * cx + b * cy
        f = cy - b * cx - a * cy
        mats.append((a, b, -b, a, e, f))
    return np.asarray(mats, np.float32)


def _oracle_frame(edge_tables, colors, mat, height, width):
    covs = []
    for t in edge_tables:
        a, b, c, d, e, f = mat
        x0, y0, x1, y1 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
        xt = np.stack([a * x0 + c * y0 + e, b * x0 + d * y0 + f,
                       a * x1 + c * y1 + e, b * x1 + d * y1 + f],
                      1).astype(np.float32)
        covs.append(coverage_numpy(xt, height, width))
    fields = np.broadcast_to(
        np.asarray(colors, np.float32)[:, None, None, :],
        (len(covs), height, width, 4))
    pm = composite_draws(jnp.asarray(np.stack(covs), jnp.float32),
                         jnp.asarray(fields))
    return np.asarray(premul_to_straight_u8(pm))


def test_affine_sweep_matches_host_oracle():
    height, width = 96, 120
    tables = [_star_edges(60.0, 48.0, 40.0, 18.0),
              _star_edges(55.0, 50.0, 22.0, 9.0, points=5)]
    colors = [(0.9, 0.2, 0.1, 0.9), (0.1, 0.4, 0.95, 0.8)]
    mats = _rotation_mats(6, 60.0, 48.0)

    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    out = render_affine_sweep(
        jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
        jnp.asarray(colarr), height, width)
    got = morph_frames_to_u8(out, height, width)

    for i in range(len(mats)):
        want = _oracle_frame(tables, colors, mats[i], height, width)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        # Piece-split coverage accumulates in a different float order
        # than whole-edge coverage; premul-u8 un-multiply can amplify one
        # quantum at AA pixels.
        assert diff.max() <= 2, (i, diff.max())
        assert (diff > 1).mean() < 1e-3
        assert (diff > 0).mean() < 0.01


def test_affine_sweep_scaling_matrices():
    """Anisotropic scale + shear: the split bound must hold for the most
    dy-expanding matrix, not just rotations."""
    height, width = 64, 64
    tables = [_star_edges(32.0, 32.0, 12.0, 5.0)]
    colors = [(0.2, 0.8, 0.3, 1.0)]
    mats = np.asarray([
        (1.0, 0.0, 0.0, 1.0, 0.0, 0.0),
        (2.0, 0.5, -0.3, 1.7, 4.0, -2.0),   # scale+shear up
        (0.5, -0.2, 0.1, 0.4, 10.0, 12.0),  # scale down
    ], np.float32)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    # Bound check: |dy'| <= 1 for every matrix over every piece.
    x0, y0, x1, y1 = tab[0, 0, 0], tab[0, 1, 0], tab[0, 2, 0], tab[0, 3, 0]
    for a, b, c, d, e, f in mats:
        dyp = np.abs(b * (x1 - x0) + d * (y1 - y0))
        assert dyp.max() <= 1.0 + 1e-5

    out = render_affine_sweep(
        jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
        jnp.asarray(colarr), height, width)
    got = morph_frames_to_u8(out, height, width)
    for i in range(len(mats)):
        want = _oracle_frame(tables, colors, mats[i], height, width)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, (i, diff.max())


def test_affine_pieces_host_cost_is_frame_independent():
    """The host artifact depends on edge count, not frame count: 600
    frames produce the same piece tables as 6 (only the |dy'| bound sees
    the matrices)."""
    tables = [_star_edges(32.0, 32.0, 12.0, 5.0)]
    colors = [(1.0, 0.0, 0.0, 1.0)]
    m6 = _rotation_mats(6, 32.0, 32.0)
    m600 = _rotation_mats(600, 32.0, 32.0)
    t6 = affine_pieces(tables, colors, m6)
    t600 = affine_pieces(tables, colors, m600)
    # Rotations preserve lengths, so the bound (and the split) agree up to
    # the sampling of the max; shapes must match exactly here.
    assert t6[0].shape == t600[0].shape


def test_render_shape_animation_matches_per_frame_render(reference_tests):
    """The public animation API: a rotating triangle sweep matches
    per-frame TpuRenderer renders of the same instance matrices."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.models.ast_io import parse_define_shape
    from swf_renderer_tpu.runtime.renderer import (
        TpuRenderer, render_shape_animation,
    )
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    tag = parse_define_shape(
        (reference_tests / "flat-shapes" / "triangle" /
         "ast.json").read_text())
    w = h = 48
    mats = []
    for i in range(4):
        th = 2 * np.pi * i / 16
        # Rotate in twips space about the raster center (24 px = 480 tw).
        a, b = np.cos(th), np.sin(th)
        cx = cy = 480.0
        mats.append(ast.Matrix(
            scale_x=Sfixed16P16.from_value(a),
            scale_y=Sfixed16P16.from_value(a),
            rotate_skew0=Sfixed16P16.from_value(b),
            rotate_skew1=Sfixed16P16.from_value(-b),
            translate_x=int(round(cx - a * cx + b * cy)),
            translate_y=int(round(cy - b * cx - a * cy)),
        ))

    got = render_shape_animation(tag, mats, w, h)
    assert got.shape == (4, h, w, 4)

    for i, m in enumerate(mats):
        # Fresh renderer per frame: a reused one would upgrade to the
        # single-frame sweep itself (transform-sweep-1f) and stop being
        # an independent oracle.
        stage = display.Stage(
            width=w, height=h,
            children=[display.ShapeInstance(definition=tag, matrix=m)])
        want = TpuRenderer(w, h).render(stage)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())
        assert (diff > 1).mean() < 1e-3


def test_render_batch_auto_routes_transform_animation():
    """render_batch detects a moving-matrix animation (same definitions,
    only matrices differ) and routes it through the on-device transform
    sweep — O(1) host work per frame — matching per-frame renders."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    size = 500
    tag = ast.DefineShape(
        id=1,
        bounds=ast.Rect(x_min=0, x_max=size, y_min=0, y_max=size),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=[ast.SolidFill(
                    color=ast.StraightSRgba8(20, 200, 120, 255))],
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
    mats = []
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
        mats.append(m)
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

    # Identical frames do NOT take the sweep (fused batch handles them).
    r2 = TpuRenderer(w, h)
    r2.render_batch([stages[0], stages[0]])
    assert r2.last_stats.path == "batched-styled"


def test_render_batch_routes_morph_instance_under_moving_matrix(
        reference_tests):
    """A morph instance at CONSTANT ratio whose matrix changes per frame
    also rides the transform sweep."""
    import dataclasses

    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.models.ast_io import parse_define_morph_shape
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    d = reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((d / "ast.json").read_text())
    base = display.stage_for_morph_shape(tag, 0.5)
    child = base.children[0]
    w, h = base.width, base.height
    stages = []
    for i in range(3):
        m0 = child.matrix
        shifted = ast.Matrix(
            scale_x=m0.scale_x, scale_y=m0.scale_y,
            rotate_skew0=m0.rotate_skew0, rotate_skew1=m0.rotate_skew1,
            translate_x=m0.translate_x + i * 40,
            translate_y=m0.translate_y)
        stages.append(display.Stage(
            width=w, height=h,
            children=[dataclasses.replace(child, matrix=shifted)]))

    r = TpuRenderer(w, h)
    got = r.render_batch(stages)
    assert r.last_stats.path == "transform-sweep"
    for i, stage in enumerate(stages):
        want = TpuRenderer(w, h).render(stage)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())


def test_skip_empty_blocks_match_heavy_kernel():
    """Column blocks with no piece x-transition take the cheap broadcast
    path; output must match the always-heavy kernel and the oracle (a
    localized shape on a wide frame leaves most blocks transition-free,
    exercising both branches)."""
    height, width = 64, 600  # wblock 256 -> 3 column blocks
    tables = [_star_edges(70.0, 32.0, 28.0, 12.0)]
    colors = [(0.3, 0.7, 0.2, 0.85)]
    mats = _rotation_mats(5, 70.0, 32.0)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))

    fast = morph_frames_to_u8(
        np.asarray(render_affine_sweep(*args, height, width,
                                       skip_empty=True)), height, width)
    slow = morph_frames_to_u8(
        np.asarray(render_affine_sweep(*args, height, width,
                                       skip_empty=False)), height, width)
    # Same per-piece values; only f32 accumulation shape differs.
    diff = np.abs(fast.astype(np.int32) - slow.astype(np.int32))
    assert diff.max() <= 1, diff.max()

    for i in range(len(mats)):
        want = _oracle_frame(tables, colors, mats[i], height, width)
        d = np.abs(fast[i].astype(np.int32) - want.astype(np.int32))
        assert d.max() <= 2, (i, d.max())
    # The right-of-shape region (never covered) stays empty.
    assert fast[:, :, 300:, 3].max() == 0


def test_row_grid_matches_column_grid():
    """The row-grid kernel (H-block accumulator, per-chunk row skip +
    x-crossing skip with the tiny cheap side plane) agrees with the
    column-grid kernel across rotations, within one u8 quantum (f32
    accumulation order differs between the two nestings)."""
    height, width = 300, 520  # multiple 128-lane row blocks, odd sizes
    tables = [_star_edges(180.0, 150.0, 140.0, 60.0, points=9),
              _star_edges(350.0, 120.0, 90.0, 35.0, points=5)]
    colors = [(0.8, 0.3, 0.2, 0.9), (0.1, 0.6, 0.9, 0.7)]
    mats = _rotation_mats(5, 260.0, 150.0)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))
    from swf_renderer_tpu.ops.morph import morph_frames_to_u8
    outs = {}
    for rg in (True, False):
        out = render_affine_sweep(*args, height, width, row_grid=rg)
        outs[rg] = morph_frames_to_u8(np.asarray(out), height, width)
    diff = np.abs(outs[True].astype(np.int32) - outs[False].astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # and vs the host oracle: this scene's acute 9-point star vertices
    # produce a handful of row-association flips (f32 kernel vs f64-ish
    # numpy oracle pick adjacent rows for boundary-exact pieces), so the
    # gate is outlier-tolerant, like the fuzz suites.
    for i in range(len(mats)):
        want = _oracle_frame(tables, colors, mats[i], height, width)
        d = np.abs(outs[True][i].astype(np.int32) - want.astype(np.int32))
        assert (d > 2).mean() < 1e-4, (i, (d > 2).mean())
        assert (d > 1).mean() < 2e-3, (i, (d > 1).mean())


def test_row_grid_skip_matches_heavy():
    """Row-grid skip paths (row-miss chunk skip, x-crossing cheap plane)
    are within one u8 quantum of the always-heavy kernel."""
    height, width = 280, 600
    tables = [_star_edges(150.0, 140.0, 120.0, 50.0)]
    colors = [(0.2, 0.9, 0.4, 1.0)]
    mats = _rotation_mats(4, 300.0, 140.0)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))
    fast = np.asarray(render_affine_sweep(
        *args, height, width, row_grid=True, skip_empty=True))
    slow = np.asarray(render_affine_sweep(
        *args, height, width, row_grid=True, skip_empty=False))
    from swf_renderer_tpu.ops.morph import morph_frames_to_u8
    f = morph_frames_to_u8(fast, height, width)
    s = morph_frames_to_u8(slow, height, width)
    diff = np.abs(f.astype(np.int32) - s.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_prefix_cheap_matches_per_block_paths():
    """The per-frame prefix plane (all blocks' completed-ramp totals in
    one weighted matmul at wb==0, heavy path masking left pieces) must
    agree with the per-block cheap path and the always-heavy kernel.
    wblock=64 forces >= 4 blocks so the skip machinery is live."""
    height, width = 120, 360
    tables = [_star_edges(80.0, 60.0, 50.0, 22.0),
              _star_edges(260.0, 70.0, 45.0, 18.0, points=5)]
    colors = [(0.9, 0.3, 0.1, 0.85), (0.2, 0.5, 0.9, 0.8)]
    mats = _rotation_mats(5, 180.0, 60.0)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))
    from swf_renderer_tpu.ops.morph import morph_frames_to_u8
    outs = {}
    for label, kw in [
            ("prefix", dict(prefix_cheap=True)),
            ("sideplane", dict(prefix_cheap=False)),
            ("heavy", dict(skip_empty=False))]:
        out = render_affine_sweep(*args, height, width, wblock=64, **kw)
        outs[label] = morph_frames_to_u8(np.asarray(out), height, width)
    for label in ("sideplane", "heavy"):
        diff = np.abs(outs["prefix"].astype(np.int32)
                      - outs[label].astype(np.int32))
        assert diff.max() <= 1, (label, diff.max())


def test_morph_sweep_wide_frame_prefix_paths():
    """render_morph_affine_sweep on a frame WIDE enough to activate the
    skip/prefix/bps machinery (>= 4 column blocks): the prefix plane
    interacts with the per-frame ratio lerp there, which the hb29-sized
    morph tests never reach.  Gate: within one u8 quantum of the
    always-heavy kernel."""
    from swf_renderer_tpu.ops.transform import (
        morph_affine_pieces, render_morph_affine_sweep,
    )
    height, width = 100, 1200  # wblock 256 -> 5 blocks, skip live

    def star(cx, cy, r_out, r_in, points=7):
        return _star_edges(cx, cy, r_out, r_in, points)

    pairs = [
        (star(200.0, 50.0, 45.0, 20.0), star(900.0, 55.0, 40.0, 25.0),
         (0.9, 0.2, 0.1, 0.9), (0.1, 0.2, 0.9, 0.7)),
        (star(600.0, 45.0, 40.0, 18.0, points=5),
         star(400.0, 60.0, 30.0, 12.0, points=5),
         (0.2, 0.8, 0.3, 0.8), (0.8, 0.8, 0.1, 1.0)),
    ]
    mats = _rotation_mats(4, 600.0, 50.0)
    ratios = np.linspace(0.0, 1.0, 4).astype(np.float32)
    parts = morph_affine_pieces(pairs, mats)
    args = (jnp.asarray(mats), jnp.asarray(ratios),
            *(jnp.asarray(x) for x in parts))
    from swf_renderer_tpu.ops.morph import morph_frames_to_u8
    fast = morph_frames_to_u8(np.asarray(render_morph_affine_sweep(
        *args, height, width)), height, width)
    slow = morph_frames_to_u8(np.asarray(render_morph_affine_sweep(
        *args, height, width, skip_empty=False)), height, width)
    diff = np.abs(fast.astype(np.int32) - slow.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # Shapes genuinely render (max paint alpha is 0.9 -> ~230)
    assert fast[..., 3].max() > 200


def test_blocks_per_step_is_exact():
    """Processing several column blocks per grid step (amortizing the
    per-step fixed overhead) is pure regrouping — per-block math is
    untouched, so cropped output is bit-identical."""
    height, width = 100, 600
    tables = [_star_edges(150.0, 50.0, 45.0, 20.0),
              _star_edges(420.0, 55.0, 40.0, 18.0, points=5)]
    colors = [(0.9, 0.3, 0.1, 0.85), (0.2, 0.5, 0.9, 0.8)]
    mats = _rotation_mats(3, 300.0, 50.0)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))
    from swf_renderer_tpu.ops.morph import morph_frames_to_u8
    outs = {}
    for bps in (1, 2, 3):
        out = render_affine_sweep(*args, height, width, wblock=64,
                                  blocks_per_step=bps)
        outs[bps] = morph_frames_to_u8(np.asarray(out), height, width)
    np.testing.assert_array_equal(outs[1], outs[2])
    np.testing.assert_array_equal(outs[1], outs[3])


def test_layer_counts_trim_is_exact():
    """Static per-layer piece counts skip all-padding chunks (EP is the
    max over layers, so a skewed draw list otherwise pays the big
    layer's chunk count everywhere); trimming must not change output."""
    from swf_renderer_tpu.ops.transform import layer_piece_counts

    height, width = 96, 130
    # Layer 0 huge (forces a large EP), layer 1 tiny.
    tables = [_star_edges(60.0, 48.0, 42.0, 18.0, points=11),
              np.array([[90.0, 10.0, 110.0, 15.0],
                        [110.0, 15.0, 95.0, 30.0],
                        [95.0, 30.0, 90.0, 10.0]], np.float32)]
    colors = [(0.9, 0.2, 0.1, 0.9), (0.1, 0.9, 0.3, 0.8)]
    mats = _rotation_mats(4, 60.0, 48.0, scale=1.7)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    counts = layer_piece_counts(tab)
    assert counts[1] < counts[0]  # genuinely skewed
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))
    base = np.asarray(render_affine_sweep(*args, height, width))
    trim = np.asarray(render_affine_sweep(*args, height, width,
                                          layer_counts=counts))
    np.testing.assert_array_equal(base, trim)


def test_render_batch_routes_fading_moving_animation(reference_tests):
    """Per-frame COLOR TRANSFORMS fold into per-frame sweep colors: a
    moving + fading animation rides the transform sweep and matches
    per-frame renders."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.models.ast_io import parse_define_shape
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    tag = parse_define_shape(
        (reference_tests / "flat-shapes" / "triangle" /
         "ast.json").read_text())
    one = Sfixed16P16.from_value(1.0)
    zero = Sfixed16P16.from_value(0.0)
    w = h = 40
    stages = []
    for i in range(4):
        alpha = 1.0 - 0.25 * i
        stages.append(display.Stage(
            width=w, height=h,
            children=[display.ShapeInstance(
                definition=tag,
                matrix=ast.Matrix(
                    scale_x=one, scale_y=one, rotate_skew0=zero,
                    rotate_skew1=zero, translate_x=30 * i,
                    translate_y=10 * i),
                color_transform=display.ColorTransform(
                    mult=(1.0, 1.0, 1.0, alpha),
                    add=(0.0, 0.1 * i, 0.0, 0.0)))]))

    r = TpuRenderer(w, h)
    got = r.render_batch(stages)
    assert r.last_stats.path == "transform-sweep"
    for i, stage in enumerate(stages):
        want = TpuRenderer(w, h).render(stage)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())


def test_morph_affine_sweep_matches_host_oracle(reference_tests):
    """Combined morph + transform sweep: per-frame (ratio, matrix) pairs
    on the hb29 fill pairs vs the host oracle (lerp, transform, classic
    coverage + composite)."""
    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.models.ast_io import parse_define_morph_shape
    from swf_renderer_tpu.models.decode_morph_shape import (
        decode_morph_shape,
    )
    from swf_renderer_tpu.models.geometry import Affine, TWIPS_PER_PX
    from swf_renderer_tpu.models.morph_geometry import (
        morph_fill_edge_pairs,
    )
    from swf_renderer_tpu.ops.transform import (
        morph_affine_pieces, render_morph_affine_sweep,
    )

    d = reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((d / "ast.json").read_text())
    stage = display.stage_for_morph_shape(tag, 0.0)
    h, w = stage.height, stage.width
    # LOCAL-space pairs (scale only); the per-frame matrices carry the
    # instance translate + a drifting rotation.
    s_aff = Affine.scaling(1 / TWIPS_PER_PX, 1 / TWIPS_PER_PX)
    pairs = morph_fill_edge_pairs(decode_morph_shape(tag), s_aff)

    base = Affine.from_swf_matrix(stage.children[0].matrix)
    dev_base = s_aff.then(base).then(
        Affine.scaling(TWIPS_PER_PX, TWIPS_PER_PX))
    mats, ratios = [], []
    for i in range(5):
        th = 0.15 * i
        ca, sa = np.cos(th), np.sin(th)
        rot = Affine(ca, sa, -sa, ca,
                     w / 2 - ca * w / 2 + sa * h / 2,
                     h / 2 - sa * w / 2 - ca * h / 2)
        m = rot.then(dev_base)
        mats.append(m.as_tuple())
        ratios.append(i / 4.0)
    mats = np.asarray(mats, np.float32)
    ratios = np.asarray(ratios, np.float32)

    parts = morph_affine_pieces(pairs, mats)
    out = render_morph_affine_sweep(
        jnp.asarray(mats), jnp.asarray(ratios),
        *(jnp.asarray(x) for x in parts), h, w)
    got = morph_frames_to_u8(np.asarray(out), h, w)

    for i in range(len(mats)):
        r = float(ratios[i])
        a_, b_, c_, d_, e_, f_ = mats[i]
        covs, cols = [], []
        for es, ee, cs, ce in pairs:
            edges = np.asarray(es, np.float64) * (1 - r) + \
                np.asarray(ee, np.float64) * r
            x0, y0, x1, y1 = (edges[:, 0], edges[:, 1], edges[:, 2],
                              edges[:, 3])
            t2 = np.stack([a_ * x0 + c_ * y0 + e_, b_ * x0 + d_ * y0 + f_,
                           a_ * x1 + c_ * y1 + e_, b_ * x1 + d_ * y1 + f_],
                          1).astype(np.float32)
            covs.append(coverage_numpy(t2, h, w))
            cols.append(np.asarray(cs) * (1 - r) + np.asarray(ce) * r)
        fields = np.broadcast_to(
            np.asarray(cols, np.float32)[:, None, None, :],
            (len(covs), h, w, 4))
        want = np.asarray(premul_to_straight_u8(
            composite_draws(jnp.asarray(np.stack(covs), jnp.float32),
                            jnp.asarray(fields))))
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())
        assert (diff > 1).mean() < 2e-3


def test_render_batch_routes_morph_ratio_and_matrix(reference_tests):
    """A fills-only morph whose ratio AND matrix change per frame rides
    the combined morph+transform sweep, matching per-frame renders."""
    import dataclasses

    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.models.ast_io import parse_define_morph_shape
    from swf_renderer_tpu.models.decode_morph_shape import (
        decode_morph_shape,
    )
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    d = reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((d / "ast.json").read_text())
    if any(p.line is not None for p in decode_morph_shape(tag).paths):
        # hb29 has strokes: strip them by building a fills-only twin is
        # overkill here — instead assert the plan REFUSES (correctness
        # first) and the batch falls back to the fused path.
        base = display.stage_for_morph_shape(tag, 0.0)
        child = base.children[0]
        m0 = child.matrix
        stages = []
        for i in range(3):
            shifted = ast.Matrix(
                scale_x=m0.scale_x, scale_y=m0.scale_y,
                rotate_skew0=m0.rotate_skew0,
                rotate_skew1=m0.rotate_skew1,
                translate_x=m0.translate_x + i * 30,
                translate_y=m0.translate_y)
            stages.append(display.Stage(
                width=base.width, height=base.height,
                children=[dataclasses.replace(child, matrix=shifted,
                                              ratio=i / 2.0)]))
        r = TpuRenderer(base.width, base.height)
        got = r.render_batch(stages)
        assert r.last_stats.path != "transform-sweep"
        for i, stage in enumerate(stages):
            want = TpuRenderer(base.width, base.height).render(stage)
            np.testing.assert_array_equal(got[i], want)
        return
    pytest.skip("hb29 has no strokes in this checkout; positive routing is covered by test_render_batch_routes_fills_only_morph_timeline")


def test_render_batch_routes_fills_only_morph_timeline():
    """Synthetic fills-only morph: ratio + matrix animation rides the
    combined sweep and matches per-frame renders."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    size = 400

    def v(x, y):
        return ast.Vector2D(x=x, y=y)

    def edges(recs):
        return [ast.EdgeRecord(delta=v(*r)) for r in recs]

    tag = ast.DefineMorphShape(
        id=1,
        bounds=ast.Rect(x_min=0, x_max=size, y_min=0, y_max=size),
        morph_bounds=ast.Rect(x_min=0, x_max=size, y_min=0, y_max=size),
        shape=ast.MorphShapeBody(
            initial_styles=ast.MorphShapeStyles(
                fill=[ast.MorphSolidFill(
                    color=ast.StraightSRgba8(255, 0, 0, 255),
                    morph_color=ast.StraightSRgba8(0, 0, 255, 255))],
                line=[],
            ),
            records=[
                ast.MorphStyleChangeRecord(
                    right_fill=1, move_to=v(0, 0),
                    morph_move_to=v(100, 50)),
                ast.MorphEdgeRecord(delta=v(size, 0),
                                    morph_delta=v(200, 0)),
                ast.MorphEdgeRecord(delta=v(0, size),
                                    morph_delta=v(0, 300)),
                ast.MorphEdgeRecord(delta=v(-size, -size),
                                    morph_delta=v(-200, -300)),
            ],
        ),
    )
    one = Sfixed16P16.from_value(1.0)
    zero = Sfixed16P16.from_value(0.0)
    w = h = 40
    stages = []
    for i in range(4):
        stages.append(display.Stage(
            width=w, height=h,
            children=[display.MorphShapeInstance(
                definition=tag, ratio=i / 3.0,
                matrix=ast.Matrix(
                    scale_x=one, scale_y=one, rotate_skew0=zero,
                    rotate_skew1=zero, translate_x=60 * i,
                    translate_y=20 * i))]))
    r = TpuRenderer(w, h)
    got = r.render_batch(stages)
    assert r.last_stats.path == "transform-sweep"
    for i, stage in enumerate(stages):
        want = TpuRenderer(w, h).render(stage)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        # The sweep lerps LOCAL f32 pieces then transforms; the
        # per-frame path lerps twips commands in f64 then flattens
        # — same algebra, different float order: a few u8 steps at
        # AA edges.
        assert diff.max() <= 8, (i, diff.max())
        assert (diff > 2).mean() < 1e-3, i


def test_render_batch_routes_animated_container_hierarchy(
        reference_tests):
    """Animated sprite GROUPS: a container whose matrix changes per frame
    (with a static child shape inside) flattens to leaves and rides the
    transform sweep."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.models.ast_io import parse_define_shape
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    tag = parse_define_shape(
        (reference_tests / "flat-shapes" / "triangle" /
         "ast.json").read_text())
    one = Sfixed16P16.from_value(1.0)
    half = Sfixed16P16.from_value(0.5)
    zero = Sfixed16P16.from_value(0.0)
    w = h = 40
    inner = display.ShapeInstance(
        definition=tag,
        matrix=ast.Matrix(scale_x=half, scale_y=half, rotate_skew0=zero,
                          rotate_skew1=zero, translate_x=0,
                          translate_y=0))
    stages = []
    for i in range(3):
        group = display.Container(
            children=(inner,),
            matrix=ast.Matrix(scale_x=one, scale_y=one,
                              rotate_skew0=zero, rotate_skew1=zero,
                              translate_x=80 * i, translate_y=30 * i))
        stages.append(display.Stage(width=w, height=h, children=[group]))

    r = TpuRenderer(w, h)
    got = r.render_batch(stages)
    assert r.last_stats.path == "transform-sweep"
    for i, stage in enumerate(stages):
        want = TpuRenderer(w, h).render(stage)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())


def test_compact_sweep_matches_heavy():
    """The compacted sweep (plan_compact_sweep + _compact_pre gather +
    compact kernel) is within one u8 quantum of the always-heavy
    kernel, and the host capacity plan covers the device's exact mask
    (any dropped piece would show as a big diff)."""
    from swf_renderer_tpu.ops.transform import plan_compact_sweep
    height, width = 100, 1200  # 5 column blocks, bps 1
    tables = [_star_edges(200.0, 50.0, 45.0, 20.0),
              _star_edges(900.0, 55.0, 40.0, 18.0, points=5),
              _star_edges(600.0, 45.0, 38.0, 15.0, points=9)]
    colors = [(0.9, 0.2, 0.1, 0.9), (0.2, 0.8, 0.3, 0.8),
              (0.1, 0.3, 0.9, 1.0)]
    mats = _rotation_mats(5, 600.0, 50.0)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    plan = plan_compact_sweep(mats, tab, height, width)
    assert plan is not None
    assert all(c % 256 == 0 for c in plan["compact_counts"])
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))
    from swf_renderer_tpu.ops.morph import morph_frames_to_u8
    fast = morph_frames_to_u8(np.asarray(render_affine_sweep(
        *args, height, width, **plan)), height, width)
    slow = morph_frames_to_u8(np.asarray(render_affine_sweep(
        *args, height, width, skip_empty=False)), height, width)
    diff = np.abs(fast.astype(np.int32) - slow.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert fast[..., 3].max() > 200  # shapes genuinely render


def test_compact_sweep_blocks_per_step():
    """Compact mode with blocks-per-step > 1: the local block offset
    b_i must index the compacted tables correctly (a swap would paint
    blocks with each other's pieces)."""
    from swf_renderer_tpu.ops.transform import plan_compact_sweep
    height, width = 90, 1536  # 12 blocks of 128 -> bps 4 (round-4 policy)
    tables = [_star_edges(300.0, 45.0, 40.0, 16.0),
              _star_edges(1200.0, 50.0, 42.0, 20.0, points=5)]
    colors = [(0.8, 0.3, 0.2, 1.0), (0.2, 0.4, 0.9, 0.7)]
    mats = _rotation_mats(4, 768.0, 45.0)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    plan = plan_compact_sweep(mats, tab, height, width)
    # The b_i indexing property under test needs bps > 1; the exact
    # (wblock, bps) pair follows the production policy.
    assert plan is not None and plan["blocks_per_step"] > 1
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))
    from swf_renderer_tpu.ops.morph import morph_frames_to_u8
    fast = morph_frames_to_u8(np.asarray(render_affine_sweep(
        *args, height, width, **plan)), height, width)
    slow = morph_frames_to_u8(np.asarray(render_affine_sweep(
        *args, height, width, skip_empty=False)), height, width)
    diff = np.abs(fast.astype(np.int32) - slow.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_compact_sweep_gradients_and_per_layer_mats():
    """Compact mode composes with in-kernel gradient paints, per-frame
    stop colors, and per-layer matrix tracks."""
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.transform import (
        plan_compact_sweep, sweep_paints,
    )
    height, width = 100, 1200
    tables = [_star_edges(200.0, 50.0, 45.0, 20.0),
              _star_edges(900.0, 55.0, 40.0, 18.0, points=5)]
    frames = 4
    base = _rotation_mats(frames, 600.0, 50.0)
    still = np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32),
                    (frames, 1))
    mats = np.stack([base, still], axis=1)  # (F, L, 6) per-layer
    paints = [style_ops.solid_paint((0.9, 0.2, 0.1, 1.0)),
              style_ops.Paint(
                  kind=style_ops.PAINT_LINEAR,
                  inv_matrix=(2.0 * 16384.0 / width, 0.0, 0.0,
                              2.0 * 16384.0 / width, -16384.0,
                              -16384.0 * height / width),
                  stop_ratios=np.array([0.0, 1.0], np.float32),
                  stop_colors=np.array([[1, 0, 0, 1], [0, 0, 1, 1]],
                                       np.float32))]
    colors = [(0.9, 0.2, 0.1, 1.0), (0, 0, 0, 0)]
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    kpaints, grad_mats = sweep_paints(paints, mats)
    stop_colors = np.zeros((frames, 2, 2, 4), np.float32)
    stop_colors[:, 1] = np.array([[1, 0, 0, 1], [0, 0, 1, 1]],
                                 np.float32)
    stop_colors[:, 1, :, 3] *= np.linspace(1.0, 0.5, frames)[:, None]
    plan = plan_compact_sweep(mats, tab, height, width)
    assert plan is not None
    kw = dict(paints=kpaints, grad_mats=jnp.asarray(grad_mats),
              stop_colors=jnp.asarray(stop_colors))
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))
    from swf_renderer_tpu.ops.morph import morph_frames_to_u8
    fast = morph_frames_to_u8(np.asarray(render_affine_sweep(
        *args, height, width, **plan, **kw)), height, width)
    slow = morph_frames_to_u8(np.asarray(render_affine_sweep(
        *args, height, width, skip_empty=False, **kw)), height, width)
    diff = np.abs(fast.astype(np.int32) - slow.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert fast[..., 3].max() > 200


def test_plan_compact_declines_single_block():
    """One column block means nothing to compact: plan returns None.
    (64 px is one wblock-64 column block under the round-4 mid-width
    policy; 128 px would now be two.)"""
    from swf_renderer_tpu.ops.transform import plan_compact_sweep
    tables = [_star_edges(30.0, 48.0, 20.0, 9.0)]
    mats = _rotation_mats(3, 30.0, 48.0)
    tab, _, _ = affine_pieces(tables, [(1, 0, 0, 1)], mats)
    assert plan_compact_sweep(mats, tab, 96, 64) is None


def test_paint_field_traced_matches_paint_field():
    """paint_field_traced (the sweep's per-frame field bake) must equal
    paint_field for matrices where paint_field itself takes the traced
    (gather) path — any non-axis-aligned frame — and for gradients.

    Bitmap comparisons run EAGERLY on both sides: under jit, XLA's FMA
    contraction can floor a texel coordinate across a boundary at a
    handful of pixels (measured max 0.108 at 0.2% of pixels on a random
    13x11 checker) — that jitter applies equally to the per-frame styled
    path and the sweep bake (both jitted in production), and the
    end-to-end render_batch tests below gate the jitted pipeline at
    <=2/255."""
    import jax

    from swf_renderer_tpu.ops import style as style_ops

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (11, 13, 4)).astype(np.uint8)
    inv = (0.41, 0.13, -0.2, 0.37, 1.5, -2.0)  # rotated: non-separable
    for repeating, smoothed in ((False, True), (True, False)):
        p = style_ops.Paint(
            kind=style_ops.PAINT_BITMAP, image=img, inv_matrix=inv,
            repeating=repeating, smoothed=smoothed, supersample=2)
        # paint_field routes rotated small-texture bitmaps through the
        # MXU texfield kernel (split3 bf16 dot, round 4: ~6e-5 bound);
        # paint_field_traced stays on the gather path.
        a = np.asarray(style_ops.paint_field(p, 24, 40))
        b = np.asarray(style_ops.paint_field_traced(
            p, jnp.asarray(inv, jnp.float32), 24, 40))
        np.testing.assert_allclose(a, b, atol=2e-4)

    stops_r = np.asarray([0.0, 0.6, 1.0], np.float32)
    stops_c = np.asarray([[1, 0, 0, 1], [0, 1, 0, 0.5], [0, 0, 1, 1]],
                         np.float32)
    ginv = (1.0 / 60.0 * 32768.0, 0.002, -0.003,
            1.0 / 60.0 * 32768.0, -16384.0, 10.0)
    for kind, cs in ((style_ops.PAINT_LINEAR, "linear-rgb"),
                     (style_ops.PAINT_FOCAL, "s-rgb")):
        p = style_ops.Paint(
            kind=kind, inv_matrix=ginv, stop_ratios=stops_r,
            stop_colors=stops_c, focal_point=0.3,
            spread=style_ops.SPREAD_REFLECT, color_space=cs)
        a = np.asarray(style_ops.paint_field(p, 24, 40))
        b = np.asarray(jax.jit(
            lambda m: style_ops.paint_field_traced(p, m, 24, 40)
        )(jnp.asarray(ginv, jnp.float32)))
        np.testing.assert_allclose(a, b, atol=1e-6)
        # Per-frame stop-color override == replacing the stops.
        sc2 = stops_c.copy()
        sc2[:, 3] *= 0.5
        p2 = style_ops.Paint(
            kind=kind, inv_matrix=ginv, stop_ratios=stops_r,
            stop_colors=sc2, focal_point=0.3,
            spread=style_ops.SPREAD_REFLECT, color_space=cs)
        c = np.asarray(style_ops.paint_field(p2, 24, 40))
        d = np.asarray(jax.jit(
            lambda m, s: style_ops.paint_field_traced(
                p, m, 24, 40, stop_colors=s)
        )(jnp.asarray(ginv, jnp.float32), jnp.asarray(sc2)))
        np.testing.assert_allclose(c, d, atol=1e-6)


def _bitmap_rect_stage_frames(frames, w, h, repeating=False,
                              linear_rgb_overlay=False):
    """A rotating bitmap-filled rectangle (upscaled texels so the
    axis-aligned frame-0 oracle takes the bilinear path the bake
    reproduces exactly), optionally stacked with a linear-RGB gradient
    rect layer."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    def mat(scale, tx=0, ty=0):
        return ast.Matrix(
            scale_x=Sfixed16P16.from_value(scale),
            scale_y=Sfixed16P16.from_value(scale),
            rotate_skew0=Sfixed16P16.from_value(0),
            rotate_skew1=Sfixed16P16.from_value(0),
            translate_x=tx, translate_y=ty)

    fills = [ast.BitmapFill(bitmap_id=9, matrix=mat(120.0),
                            repeating=repeating, smoothed=True)]
    if linear_rgb_overlay:
        fills.append(ast.LinearGradientFill(
            matrix=mat(0.05),
            gradient=ast.Gradient(
                spread=ast.GradientSpread.PAD,
                color_space=ast.ColorSpace.LINEAR_RGB,
                colors=(
                    ast.GradientStop(
                        ratio=0, color=ast.StraightSRgba8(255, 0, 0, 200)),
                    ast.GradientStop(
                        ratio=255,
                        color=ast.StraightSRgba8(0, 0, 255, 120)),
                ))))
    size = 1400
    records = [
        ast.StyleChangeRecord(move_to=ast.Vector2D(120, 120), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(size, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, size)),
        ast.EdgeRecord(delta=ast.Vector2D(-size, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, -size)),
    ]
    if linear_rgb_overlay:
        records += [
            ast.StyleChangeRecord(
                move_to=ast.Vector2D(400, 400), left_fill=2),
            ast.EdgeRecord(delta=ast.Vector2D(700, 0)),
            ast.EdgeRecord(delta=ast.Vector2D(0, 700)),
            ast.EdgeRecord(delta=ast.Vector2D(-700, 0)),
            ast.EdgeRecord(delta=ast.Vector2D(0, -700)),
        ]
    tag = ast.DefineShape(
        id=1,
        bounds=ast.Rect(x_min=0, x_max=size + 200, y_min=0,
                        y_max=size + 200),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=tuple(fills), line=()),
            records=tuple(records)))

    from swf_renderer_tpu.utils.fixed import Sfixed16P16 as S

    stages = []
    for i in range(frames):
        th = 2 * np.pi * i / (3 * frames)
        a, b = np.cos(th), np.sin(th)
        cx = cy = float((size + 200) // 2)  # twips pivot
        m = ast.Matrix(
            scale_x=S.from_value(a), scale_y=S.from_value(a),
            rotate_skew0=S.from_value(b), rotate_skew1=S.from_value(-b),
            translate_x=int(round(cx - a * cx + b * cy)),
            translate_y=int(round(cy - b * cx - a * cy)))
        stages.append(display.Stage(
            width=w, height=h,
            children=[display.ShapeInstance(definition=tag, matrix=m)]))
    return tag, stages


def _checker_bitmap(n=12):
    img = np.zeros((n, n, 4), np.uint8)
    img[::2, ::2] = (230, 40, 30, 255)
    img[1::2, 1::2] = (20, 200, 90, 255)
    img[img[..., 3] == 0] = (30, 60, 220, 160)
    return img


def _premul_diff(a, b):
    """Max PREMULTIPLIED channel diff between two straight-u8 frames.

    Straight-space diffs amplify one premul quantum by 255/alpha at
    nearly-transparent pixels (the canvas-mode pattern fade-out), so
    bitmap tests gate where the oracles actually store their bytes —
    exactly the ratchet's premul metric (QUALITY.md)."""
    af, bf = a.astype(np.float64), b.astype(np.float64)
    apm = np.concatenate([af[..., :3] * af[..., 3:4] / 255.0,
                          af[..., 3:4]], -1)
    bpm = np.concatenate([bf[..., :3] * bf[..., 3:4] / 255.0,
                          bf[..., 3:4]], -1)
    return np.abs(apm - bpm).max()


def test_render_batch_routes_bitmap_fill_animation():
    """A moving-matrix animation over a BITMAP-filled shape rides the
    on-device transform sweep via per-frame baked field planes
    (bake_sweep_fields) and matches per-frame renders — the pattern-fill
    analog of the reference's matrix-at-draw-time replay
    (canvas-renderer.ts:179-184, 295-315)."""
    from swf_renderer_tpu.runtime.bitmap_service import Bitmap
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    w = h = 88
    img = _checker_bitmap()
    tag, stages = _bitmap_rect_stage_frames(4, w, h)

    def mk():
        r = TpuRenderer(w, h)
        r.bitmap_service._bitmaps[9] = Bitmap(
            width=img.shape[1], height=img.shape[0], rgba=img)
        return r

    r = mk()
    got = r.render_batch(stages)
    assert r.last_stats.path == "transform-sweep"
    for i, stage in enumerate(stages):
        want = mk().render(stage)
        assert _premul_diff(got[i], want) <= 2, i


def test_render_batch_routes_linear_rgb_gradient_animation():
    """linear-RGB gradients (field-baked — the in-kernel ramp is sRGB
    only) animate on the sweep, including a per-frame color-transform
    fade folded into the baked planes."""
    import dataclasses

    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.runtime.bitmap_service import Bitmap
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    w = h = 88
    img = _checker_bitmap()
    tag, stages = _bitmap_rect_stage_frames(4, w, h,
                                            linear_rgb_overlay=True)
    # Fade the child per frame: the linear-RGB layer's fade must fold
    # into its baked field planes (stop_tracks).
    faded = []
    for i, s in enumerate(stages):
        ct = display.ColorTransform(
            mult=(1.0, 1.0, 1.0, 1.0 - 0.12 * i), add=(0, 0, 0, 0))
        child = dataclasses.replace(s.children[0], color_transform=ct)
        faded.append(dataclasses.replace(s, children=[child]))

    def mk():
        r = TpuRenderer(w, h)
        r.bitmap_service._bitmaps[9] = Bitmap(
            width=img.shape[1], height=img.shape[0], rgba=img)
        return r

    r = mk()
    got = r.render_batch(faded)
    assert r.last_stats.path == "transform-sweep"
    for i, stage in enumerate(faded):
        want = mk().render(stage)
        assert _premul_diff(got[i], want) <= 2, i


def _rot_stage(tag, size_tw, w, h, th, scale=1.0, ct=None):
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.utils.fixed import Sfixed16P16 as S

    a, b = scale * np.cos(th), scale * np.sin(th)
    cx = cy = float(size_tw // 2)
    m = ast.Matrix(
        scale_x=S.from_value(a), scale_y=S.from_value(a),
        rotate_skew0=S.from_value(b), rotate_skew1=S.from_value(-b),
        translate_x=int(round(cx - a * cx + b * cy)),
        translate_y=int(round(cy - b * cx - a * cy)))
    child = display.ShapeInstance(definition=tag, matrix=m,
                                  color_transform=ct)
    return display.Stage(width=w, height=h, children=[child])


def test_single_frame_sweep_interactive_loop():
    """Repeated render() calls over the same definitions with moving
    matrices upgrade to the F=1 on-device sweep (frame 0 normal path,
    frames 1+ 'transform-sweep-1f') and match fresh per-frame renders."""
    from swf_renderer_tpu.runtime.bitmap_service import Bitmap
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    w = h = 88
    img = _checker_bitmap()
    tag, stages = _bitmap_rect_stage_frames(5, w, h,
                                            linear_rgb_overlay=True)

    def mk():
        r = TpuRenderer(w, h)
        r.bitmap_service._bitmaps[9] = Bitmap(
            width=img.shape[1], height=img.shape[0], rgba=img)
        return r

    r = mk()
    frames, paths = [], []
    for s in stages:
        frames.append(r.render(s).copy())
        paths.append(r.last_stats.path)
    assert paths[0] != "transform-sweep-1f"
    assert paths[1:] == ["transform-sweep-1f"] * 4
    for i, s in enumerate(stages):
        want = mk().render(s)
        assert _premul_diff(frames[i], want) <= 2, i


def test_single_frame_sweep_zoom_rebuilds_and_matches():
    """Zooming past the cached 1.5x split/tolerance headroom rebuilds
    the piece cache monotonically; results keep matching fresh
    renders."""
    from swf_renderer_tpu.models import ast
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    size = 700
    tag = ast.DefineShape(
        id=1, bounds=ast.Rect(0, size, 0, size),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=[ast.SolidFill(
                    color=ast.StraightSRgba8(200, 40, 90, 255))],
                line=[]),
            records=[
                ast.StyleChangeRecord(
                    right_fill=1, move_to=ast.Vector2D(x=60, y=80)),
                ast.EdgeRecord(delta=ast.Vector2D(x=500, y=40)),
                ast.EdgeRecord(delta=ast.Vector2D(x=-180, y=430)),
                ast.EdgeRecord(delta=ast.Vector2D(x=-320, y=-470)),
            ]))
    w = h = 64
    r = TpuRenderer(w, h)
    scales = [1.0, 1.1, 1.3, 2.4, 3.1]  # 2.4 exceeds 1.5 * 1.1-ish
    for i, sc in enumerate(scales):
        th = 0.15 * i
        got = r.render(_rot_stage(tag, size, w, h, th, scale=sc))
        want = TpuRenderer(w, h).render(
            _rot_stage(tag, size, w, h, th, scale=sc))
        assert _premul_diff(got, want) <= 2, (i, sc)
    assert r.last_stats.path == "transform-sweep-1f"


def test_single_frame_sweep_ct_fade():
    """Per-frame color transforms in the interactive loop fold into the
    dynamic inputs (no recompile; values match fresh renders)."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    size = 700
    tag = ast.DefineShape(
        id=1, bounds=ast.Rect(0, size, 0, size),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=[ast.SolidFill(
                    color=ast.StraightSRgba8(30, 160, 220, 255))],
                line=[]),
            records=[
                ast.StyleChangeRecord(
                    right_fill=1, move_to=ast.Vector2D(x=100, y=100)),
                ast.EdgeRecord(delta=ast.Vector2D(x=450, y=0)),
                ast.EdgeRecord(delta=ast.Vector2D(x=0, y=450)),
                ast.EdgeRecord(delta=ast.Vector2D(x=-450, y=-450)),
            ]))
    w = h = 64
    r = TpuRenderer(w, h)
    for i in range(4):
        ct = display.ColorTransform(
            mult=(1.0, 1.0, 1.0, 1.0 - 0.2 * i), add=(0, 0, 0, 0))
        stage = _rot_stage(tag, size, w, h, 0.2 * i, ct=ct)
        got = r.render(stage)
        want = TpuRenderer(w, h).render(stage)
        assert _premul_diff(got, want) <= 2, i
    assert r.last_stats.path == "transform-sweep-1f"


def test_prefilter_variant_matches_default():
    """The SMEM chunk-bounds prefilter (ablation knob, measured negative
    at 1080p — PERF.md) must stay bit-compatible with the default path
    within one u8 quantum."""
    height, width = 96, 520  # >= 4 column blocks so the skip is active
    tables = [_star_edges(60.0, 48.0, 40.0, 18.0),
              _star_edges(255.0, 50.0, 22.0, 9.0, points=5)]
    colors = [(0.9, 0.2, 0.1, 0.9), (0.1, 0.4, 0.95, 0.8)]
    mats = _rotation_mats(5, 60.0, 48.0)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))
    base = morph_frames_to_u8(np.asarray(render_affine_sweep(
        *args, height, width)), height, width)
    pf = morph_frames_to_u8(np.asarray(render_affine_sweep(
        *args, height, width, prefilter=True)), height, width)
    diff = np.abs(base.astype(np.int32) - pf.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert base[..., 3].max() > 200


def test_fields_without_field_paint_raises():
    """A stale fields array with an all-solid paint tuple must raise —
    even though all-solid tuples collapse paints to None internally."""
    tables = [_star_edges(30.0, 30.0, 15.0, 7.0)]
    mats = _rotation_mats(2, 30.0, 30.0)
    tab, subxy, colarr = affine_pieces(tables, [(1, 0, 0, 1)], mats)
    from swf_renderer_tpu.ops.flatblock import KernelPaint

    stale = jnp.zeros((1, 2, 64, 64, 4), jnp.float32)
    with pytest.raises(ValueError, match="without any FIELD paint"):
        render_affine_sweep(
            jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr), 64, 64,
            paints=(KernelPaint.color(),), fields=stale)


def test_deep_stage_loop_stays_on_normal_path():
    """A 20-layer animated stage must NOT upgrade to the F=1 sweep (its
    per-layer VMEM accumulators would exceed the scoped limit the
    flat-block multipass path is built to avoid) — and keeps rendering
    correctly through the normal path."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16 as S

    rng = np.random.default_rng(31)
    size = 900
    fills = [ast.SolidFill(color=ast.StraightSRgba8(
        *(rng.integers(30, 255, 3)), 255)) for _ in range(20)]
    records = []
    for li in range(20):
        x = 40 * li
        records += [
            ast.StyleChangeRecord(left_fill=li + 1,
                                  move_to=ast.Vector2D(x=x, y=0)),
            ast.EdgeRecord(delta=ast.Vector2D(x=120, y=0)),
            ast.EdgeRecord(delta=ast.Vector2D(x=0, y=size)),
            ast.EdgeRecord(delta=ast.Vector2D(x=-120, y=0)),
            ast.EdgeRecord(delta=ast.Vector2D(x=0, y=-size)),
        ]
    tag = ast.DefineShape(
        id=1, bounds=ast.Rect(0, size, 0, size),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=tuple(fills), line=()),
            records=tuple(records)))
    w = h = 48
    r = TpuRenderer(w, h)
    for i in range(3):
        th = 0.2 * i
        a, b = np.cos(th), np.sin(th)
        cx = cy = float(size // 2)
        m = ast.Matrix(
            scale_x=S.from_value(a), scale_y=S.from_value(a),
            rotate_skew0=S.from_value(b), rotate_skew1=S.from_value(-b),
            translate_x=int(round(cx - a * cx + b * cy)),
            translate_y=int(round(cy - b * cx - a * cy)))
        stage = display.Stage(width=w, height=h, children=[
            display.ShapeInstance(definition=tag, matrix=m)])
        got = r.render(stage)
        assert r.last_stats.path != "transform-sweep-1f"
        want = TpuRenderer(w, h).render(stage)
        np.testing.assert_array_equal(got, want)


def test_single_frame_sweep_spin_never_resplits():
    """The interactive state splits straight to the closed-form
    rotation bound at build (round 4): a full 360° spin at constant
    scale keeps ONE piece table — no mid-session re-split, hence no
    new sweep jit key (the 30-60 s remote recompile hitch)."""
    from swf_renderer_tpu.models import ast
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    size = 700
    tag = ast.DefineShape(
        id=1, bounds=ast.Rect(0, size, 0, size),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=[ast.SolidFill(
                    color=ast.StraightSRgba8(30, 200, 90, 255))],
                line=[]),
            records=[
                ast.StyleChangeRecord(
                    right_fill=1, move_to=ast.Vector2D(x=60, y=80)),
                ast.EdgeRecord(delta=ast.Vector2D(x=500, y=40)),
                ast.EdgeRecord(delta=ast.Vector2D(x=-180, y=430)),
                ast.EdgeRecord(delta=ast.Vector2D(x=-320, y=-470)),
            ]))
    w = h = 64
    r = TpuRenderer(w, h)
    tabs = set()
    for i in range(14):
        th = 2 * np.pi * i / 12
        got = r.render(_rot_stage(tag, size, w, h, th))
        if r.last_stats.path == "transform-sweep-1f":
            tabs.add(id(r._frame_sweep_state[1]["tab"]))
        want = TpuRenderer(w, h).render(
            _rot_stage(tag, size, w, h, th))
        assert _premul_diff(got, want) <= 2, i
    assert r.last_stats.path == "transform-sweep-1f"
    assert len(tabs) == 1, "piece table was re-split mid-spin"
