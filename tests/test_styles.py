"""Fill-style evaluation tests: gradients, spreads, color transforms,
placeholder bitmaps.  The reference implements only solid/bitmap/focal fills
(linear gradients throw, canvas-renderer.ts:332-333), so these paths have no
goldens — they are validated analytically."""

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, display
from swf_renderer_tpu.models.decode_shape import decode_shape
from swf_renderer_tpu.runtime.bitmap_service import Bitmap
from swf_renderer_tpu.runtime.renderer import TpuRenderer
from swf_renderer_tpu.utils.fixed import Sfixed16P16


def _rect_shape(fill: ast.FillStyle, w_twips=2000, h_twips=2000):
    """A rectangle DefineShape covering [0,w]x[0,h] twips with one fill."""
    records = [
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(w_twips, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, h_twips)),
        ast.EdgeRecord(delta=ast.Vector2D(-w_twips, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, -h_twips)),
    ]
    return ast.DefineShape(
        id=1,
        bounds=ast.Rect(0, w_twips, 0, h_twips),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=(fill,), line=()),
            records=tuple(records),
        ),
    )


def _gradient(stops, spread=ast.GradientSpread.PAD):
    return ast.Gradient(
        spread=spread,
        color_space=ast.ColorSpace.S_RGB,
        colors=tuple(
            ast.GradientStop(ratio=r, color=ast.StraightSRgba8(*c))
            for r, c in stops
        ),
    )


def _identity_matrix():
    return ast.Matrix(
        scale_x=Sfixed16P16.from_value(1),
        scale_y=Sfixed16P16.from_value(1),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=0,
        translate_y=0,
    )


def _render(tag, color_transform=None):
    stage = display.stage_for_shape(tag)
    if color_transform is not None:
        child = stage.children[0]
        import dataclasses

        stage = dataclasses.replace(
            stage,
            children=(dataclasses.replace(child, color_transform=color_transform),),
        )
    renderer = TpuRenderer(stage.width, stage.height, use_pallas=False)
    return renderer.render(stage)


def test_linear_gradient_ramp():
    # Gradient square spans x in [-16384, 16384] twips; center the ramp on
    # the rect (2000 twips wide) by scaling the gradient matrix.
    scale = 2000 / 32768
    matrix = ast.Matrix(
        scale_x=Sfixed16P16.from_value(scale),
        scale_y=Sfixed16P16.from_value(scale),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=1000,  # gradient x=0 at rect center
        translate_y=1000,
    )
    fill = ast.LinearGradientFill(
        matrix=matrix,
        gradient=_gradient([(0, (0, 0, 0, 255)), (255, (255, 255, 255, 255))]),
    )
    frame = _render(_rect_shape(fill))
    h, w = frame.shape[:2]  # 100x100 px
    row = frame[h // 2]
    assert row[1, 0] <= 8  # left edge ~ black
    assert row[w - 2, 0] >= 247  # right edge ~ white
    mid = row[w // 2, 0]
    assert abs(int(mid) - 128) <= 6  # linear midpoint
    # Monotone non-decreasing ramp
    interior = row[2 : w - 2, 0].astype(int)
    assert (np.diff(interior) >= -1).all()


def test_radial_gradient_center_and_rim():
    scale = 1000 / 16384  # radius 16384 -> 1000 twips = 50 px
    matrix = ast.Matrix(
        scale_x=Sfixed16P16.from_value(scale),
        scale_y=Sfixed16P16.from_value(scale),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=1000,
        translate_y=1000,
    )
    fill = ast.RadialGradientFill(  # decodes to FocalGradient(focal=0)
        matrix=matrix,
        gradient=_gradient([(0, (255, 0, 0, 255)), (255, (0, 0, 255, 255))]),
    )
    decoded = decode_shape(_rect_shape(fill))
    assert decoded.paths[0].fill.focal_point == 0
    frame = _render(_rect_shape(fill))
    h, w = frame.shape[:2]
    center = frame[h // 2, w // 2]
    assert center[0] >= 247 and center[2] <= 8  # red at center
    corner = frame[2, 2]
    assert corner[2] >= 247 and corner[0] <= 8  # blue past the rim (pad)


def test_focal_gradient_offsets_center():
    scale = 1000 / 16384
    matrix = ast.Matrix(
        scale_x=Sfixed16P16.from_value(scale),
        scale_y=Sfixed16P16.from_value(scale),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=1000,
        translate_y=1000,
    )
    fill = ast.FocalGradientFill(
        matrix=matrix,
        gradient=_gradient([(0, (255, 255, 255, 255)), (255, (0, 0, 0, 255))]),
        focal_point_epsilons=int(0.5 * 256),
    )
    frame = _render(_rect_shape(fill))
    h, w = frame.shape[:2]
    # The white focus sits at gradient x = 0.5 * 16384 -> +25 px from center.
    at_focus = int(frame[h // 2, w // 2 + 25, 0])
    at_center = int(frame[h // 2, w // 2, 0])
    assert at_focus > at_center >= 0
    assert at_focus >= 240


def test_gradient_spread_repeat_and_reflect():
    # Narrow gradient square (span 20 px) across a 100 px rect.
    scale = 400 / 32768
    matrix = ast.Matrix(
        scale_x=Sfixed16P16.from_value(scale),
        scale_y=Sfixed16P16.from_value(scale),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=1000,
        translate_y=1000,
    )
    stops = [(0, (0, 0, 0, 255)), (255, (255, 255, 255, 255))]
    frames = {}
    for spread in (ast.GradientSpread.REPEAT, ast.GradientSpread.REFLECT):
        fill = ast.LinearGradientFill(
            matrix=matrix, gradient=_gradient(stops, spread)
        )
        frames[spread] = _render(_rect_shape(fill))
    repeat_row = frames[ast.GradientSpread.REPEAT][50, :, 0].astype(int)
    reflect_row = frames[ast.GradientSpread.REFLECT][50, :, 0].astype(int)
    # Repeat has sharp resets (large negative jumps); reflect doesn't.
    assert np.diff(repeat_row[2:-2]).min() < -100
    assert np.diff(reflect_row[2:-2]).min() > -100
    # Both oscillate across the full range.
    for row in (repeat_row, reflect_row):
        assert row.max() >= 240 and row.min() <= 15


def test_color_transform_on_solid():
    fill = ast.SolidFill(color=ast.StraightSRgba8(100, 200, 50, 255))
    ct = display.ColorTransform(mult=(0.5, 0.5, 0.5, 1.0), add=(0.2, 0, 0, 0))
    frame = _render(_rect_shape(fill), color_transform=ct)
    h, w = frame.shape[:2]
    px = frame[h // 2, w // 2]
    want_r = round((100 / 255 * 0.5 + 0.2) * 255)
    want_g = round(200 / 255 * 0.5 * 255)
    assert abs(int(px[0]) - want_r) <= 1
    assert abs(int(px[1]) - want_g) <= 1


def test_color_transform_nesting_composes():
    # Flash composes color transforms down the tree: child first, then
    # parent — effective = parent(child(c)).
    import dataclasses

    fill = ast.SolidFill(color=ast.StraightSRgba8(100, 200, 50, 255))
    outer = display.ColorTransform(mult=(0.5, 1.0, 1.0, 1.0),
                                   add=(0.1, 0.0, 0.0, 0.0))
    inner = display.ColorTransform(mult=(0.8, 0.5, 1.0, 1.0),
                                   add=(0.2, 0.1, 0.0, 0.0))
    stage = display.stage_for_shape(_rect_shape(fill))
    child = dataclasses.replace(stage.children[0], color_transform=inner,
                                matrix=None)
    container = display.Container(children=(child,),
                                  matrix=stage.children[0].matrix,
                                  color_transform=outer)
    stage = dataclasses.replace(stage, children=(container,))
    renderer = TpuRenderer(stage.width, stage.height, use_pallas=False)
    frame = renderer.render(stage)
    h, w = frame.shape[:2]
    px = frame[h // 2, w // 2]
    want_r = round(((100 / 255 * 0.8 + 0.2) * 0.5 + 0.1) * 255)
    want_g = round((200 / 255 * 0.5 + 0.1) * 255)
    assert abs(int(px[0]) - want_r) <= 1
    assert abs(int(px[1]) - want_g) <= 1


def test_missing_bitmap_placeholder():
    # A bitmap fill whose bitmap is registered but not decoded renders the
    # reference's placeholder color rgba(0.2, 0.6, 0.8, 0.9)
    # (canvas-renderer.ts:295-304).
    fill = ast.BitmapFill(
        bitmap_id=7, matrix=_identity_matrix(), repeating=False, smoothed=True
    )
    tag = _rect_shape(fill)
    stage = display.stage_for_shape(tag)
    renderer = TpuRenderer(stage.width, stage.height, use_pallas=False)
    renderer.bitmap_service._bitmaps[7] = Bitmap(width=1, height=1, rgba=None)
    frame = renderer.render(stage)
    px = frame[50, 50]
    assert tuple(px) == (51, 153, 204, 230)  # 0.2,0.6,0.8,0.9 * 255

    # Unregistered bitmap raises (getById semantics).
    renderer2 = TpuRenderer(stage.width, stage.height, use_pallas=False)
    with pytest.raises(KeyError):
        renderer2.render(stage)


def test_bitmap_separable_matches_gather_path():
    """The axis-aligned separable bitmap fast path must reproduce the
    supersampled-gather reference sampling."""
    import numpy as np

    from swf_renderer_tpu.ops import style as style_ops

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (13, 17, 4)).astype(np.uint8)
    for repeating in (False, True):
        # Upscale (both axes |scale| < 1): separable bilinear must equal
        # the supersampled gather path exactly.
        scale, off = 0.37, -2.25
        fast = style_ops.Paint(
            kind=style_ops.PAINT_BITMAP, image=img,
            inv_matrix=(scale, 0.0, 0.0, scale * 0.7, off, -off),
            repeating=repeating, smoothed=True, supersample=4)
        # The reference is the TRACED supersampled gather (paint_field
        # itself routes small non-axis-aligned textures through the
        # split3 MXU kernel, whose ~1e-4 budget would mask a separable
        # regression).
        import jax
        import jax.numpy as jnp

        b = np.asarray(jax.jit(
            lambda iv: style_ops.paint_field_traced(fast, iv, 24, 40)
        )(jnp.asarray(fast.inv_matrix, jnp.float32)))
        a = np.asarray(style_ops.paint_field(fast, 24, 40))
        np.testing.assert_allclose(a, b, atol=2e-6)


def test_bitmap_box_downscale_weights():
    """Downscaled axes (|scale| >= 1) use the EXACT box filter: validate
    _box_weights against a brute-force area-overlap computation."""
    import numpy as np

    from swf_renderer_tpu.ops import style as style_ops

    n_out, n_img = 9, 17
    for repeating in (False, True):
        for edge_mode in ("flash", "canvas"):
            for scale, off in ((2.3, 1.25), (-1.7, 10.0)):
                w = np.asarray(style_ops._box_weights(
                    n_out, n_img, scale, off, repeating, edge_mode))
                ref = np.zeros((n_out, n_img))
                for i in range(n_out):
                    lo = min(scale * i + off, scale * (i + 1) + off)
                    hi = max(scale * i + off, scale * (i + 1) + off)
                    for j in range(n_img):
                        if repeating:
                            k0 = int(np.floor(lo / n_img)) - 1
                            k1 = int(np.floor(hi / n_img)) + 1
                            for k in range(k0, k1 + 1):
                                ref[i, j] += max(
                                    0.0, min(hi, j + k * n_img + 1)
                                    - max(lo, j + k * n_img))
                        else:
                            ref[i, j] += max(0.0,
                                             min(hi, j + 1) - max(lo, j))
                            if edge_mode != "canvas":
                                if j == 0:
                                    ref[i, j] += max(0.0, min(hi, 0) - lo)
                                if j == n_img - 1:
                                    ref[i, j] += max(0.0,
                                                     hi - max(lo, n_img))
                    ref[i] /= hi - lo
                np.testing.assert_allclose(w, ref, atol=1e-6)
                # Full weight conservation inside the pattern (flash
                # clamps everything onto edge texels).
                if edge_mode == "flash" or repeating:
                    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-6)


def test_bitmap_edge_mode_canvas_vs_flash():
    """Canvas no-repeat patterns are transparent outside the image; the
    Flash player clamps edge texels outward (canvas-renderer.ts:306-309
    vs the golden corpus)."""
    import numpy as np

    from swf_renderer_tpu.ops import style as style_ops

    img = np.full((4, 4, 4), 255, np.uint8)
    h = w = 8
    base = dict(kind=style_ops.PAINT_BITMAP,
                inv_matrix=(1.0, 0.0, 0.0, 1.0, 0.0, 0.0),
                image=img, repeating=False, smoothed=True, supersample=1)
    flash = np.asarray(style_ops.paint_field(
        style_ops.Paint(edge_mode="flash", **base), h, w))
    canvas = np.asarray(style_ops.paint_field(
        style_ops.Paint(edge_mode="canvas", **base), h, w))
    # Inside the image both are opaque white.
    assert (flash[:3, :3] == 1.0).all() and (canvas[:3, :3] == 1.0).all()
    # Past the image: flash clamps (still white), canvas goes transparent.
    assert (flash[6, 6] == 1.0).all()
    assert (canvas[6, 6] == 0.0).all()
    # The separable fast path agrees with the gather path in canvas mode.
    rot = dict(base, inv_matrix=(1.0, 1e-4, 0.0, 1.0, 0.0, 0.0))
    gather = np.asarray(style_ops.paint_field(
        style_ops.Paint(edge_mode="canvas", **rot), h, w))
    np.testing.assert_allclose(canvas, gather, atol=2e-3)


def test_linear_rgb_gradient_interpolation():
    """SWF colorSpace=linearRgb interpolates stops through the sRGB
    transfer function (the reference carries the flag but ignores it;
    honoring it is a framework extension)."""
    import numpy as np

    from swf_renderer_tpu.ops import style as style_ops

    stops_r = np.array([0.0, 1.0], np.float32)
    stops_c = np.array([[0, 0, 0, 1], [1, 1, 1, 1]], np.float32)
    base = dict(kind=style_ops.PAINT_LINEAR,
                inv_matrix=(2 * 16384.0 / 16, 0.0, 0.0, 1.0,
                            -16384.0, 0.0),
                stop_ratios=stops_r, stop_colors=stops_c)
    srgb = np.asarray(style_ops.paint_field(
        style_ops.Paint(**base), 1, 16))
    lin = np.asarray(style_ops.paint_field(
        style_ops.Paint(**base, color_space="linear-rgb"), 1, 16))
    # Midpoint: sRGB interp gives 0.5; linear interp of black->white gives
    # linear 0.5 -> sRGB ~0.735.
    t = (8 + 0.5) / 16
    assert srgb[0, 8, 0] == pytest.approx(t, abs=0.02)
    expect = 1.055 * (t ** (1 / 2.4)) - 0.055
    assert lin[0, 8, 0] == pytest.approx(expect, abs=0.02)
    # Alpha interpolates linearly in both spaces.
    np.testing.assert_allclose(lin[..., 3], srgb[..., 3], atol=1e-6)
    # Linear-RGB interpolation is uniformly brighter for black->white.
    assert (lin[0, 1:-1, 0] >= srgb[0, 1:-1, 0]).all()


def test_linear_rgb_gradient_rides_fused_path_as_field():
    """kernel_paints_for streams linear-rgb gradients as field planes so
    the fused kernel output matches paint_field exactly."""
    import numpy as np

    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.pipeline import kernel_paints_for

    stops_r = np.array([0.0, 1.0], np.float32)
    stops_c = np.array([[1, 0, 0, 1], [0, 0, 1, 1]], np.float32)
    p = style_ops.Paint(
        kind=style_ops.PAINT_FOCAL,
        inv_matrix=(64.0, 0.0, 0.0, 64.0, -16384.0, -16384.0),
        stop_ratios=stops_r, stop_colors=stops_c, focal_point=0.3,
        color_space="linear-rgb")
    kpaints, fields, colors = kernel_paints_for([p], 16, 128)
    from swf_renderer_tpu.ops.flatblock import KPAINT_FIELD
    assert kpaints[0][0] == KPAINT_FIELD
    assert len(fields) == 1


def test_focal_gradient_parameter_exact():
    """The focal root solve must match a brute-force circle solve (a sign
    bug here survives weak monotonicity checks: at focal=0 the linear
    coefficient vanishes and both signs agree)."""
    import numpy as np

    from swf_renderer_tpu.ops.style import GRAD_RADIUS, _focal_gradient_t

    rng = np.random.default_rng(5)
    for f in (0.5, -0.7, 0.9, 0.0):
        fx = f * GRAD_RADIUS
        pts = rng.uniform(-1.2, 1.2, (24, 2)) * GRAD_RADIUS
        got = np.asarray(_focal_gradient_t(
            pts[:, 0][None, :], pts[:, 1][None, :], f))[0]
        # Brute force: largest w in (0, 4] with |p - c(w)| = w*R,
        # c(w) = (1-w)*(fx, 0).
        w = np.linspace(1e-4, 4.0, 200001)
        for (px, py), g in zip(pts, got):
            lhs = np.hypot(px - (1 - w) * fx, py)
            sign = np.sign(lhs - w * GRAD_RADIUS)
            roots = w[1:][sign[1:] != sign[:-1]]
            want = roots.max() if len(roots) else 0.0
            assert g == pytest.approx(want, abs=2e-3), (f, px, py)
    # Rim identity: p = (R, 0) at f = 0.5 must give exactly t = 1.
    t = float(np.asarray(_focal_gradient_t(
        np.array([[GRAD_RADIUS]]), np.array([[0.0]]), 0.5))[0, 0])
    assert t == pytest.approx(1.0, abs=1e-5)
