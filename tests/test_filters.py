"""Bitmap filter math (ops/filters.py) against numpy oracles, and the
group-level filter compositing semantics."""

import math

import numpy as np
import pytest

from swf_renderer_tpu.ops.filters import (
    BlurFilter,
    ColorMatrixFilter,
    DropShadowFilter,
    GlowFilter,
    apply_filter,
    box_blur,
)


def _np_box_blur_axis(img, radius, axis):
    """Brute-force fractional box blur, zero padding."""
    n = img.shape[axis]
    r_int = int(math.floor(radius))
    frac = radius - r_int
    width = 2 * radius + 1
    out = np.zeros_like(img)
    img_m = np.moveaxis(img, axis, 0)
    out_m = np.moveaxis(out, axis, 0)
    for i in range(n):
        lo, hi = i - r_int, i + r_int
        acc = img_m[max(lo, 0):min(hi + 1, n)].sum(axis=0)
        if frac:
            if lo - 1 >= 0:
                acc = acc + frac * img_m[lo - 1]
            if hi + 1 < n:
                acc = acc + frac * img_m[hi + 1]
        out_m[i] = acc / width
    return out


@pytest.mark.parametrize("blur", [3.0, 4.5, 9.0, 1.0])
def test_box_blur_matches_bruteforce(blur):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (12, 17, 4)).astype(np.float32)
    got = np.asarray(box_blur(img, blur, blur, passes=1))
    want = img
    if blur > 1:
        r = (blur - 1) / 2
        want = _np_box_blur_axis(want, r, axis=1)
        want = _np_box_blur_axis(want, r, axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_blur_passes_iterate():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (10, 10, 4)).astype(np.float32)
    once = np.asarray(box_blur(img, 5, 5, passes=1))
    thrice = np.asarray(box_blur(img, 5, 5, passes=3))
    manual = np.asarray(box_blur(box_blur(box_blur(
        img, 5, 5), 5, 5), 5, 5))
    np.testing.assert_allclose(thrice, manual, atol=1e-5)
    assert not np.allclose(once, thrice)


def test_blur_conserves_mass_interior():
    """A centered dot's blurred mass stays 1 while the box fits."""
    img = np.zeros((21, 21, 4), np.float32)
    img[10, 10] = 1.0
    out = np.asarray(box_blur(img, 7.0, 7.0))
    np.testing.assert_allclose(out.sum(axis=(0, 1)), [1, 1, 1, 1],
                               atol=1e-4)


def test_drop_shadow_offsets_colored_alpha():
    img = np.zeros((16, 16, 4), np.float32)
    img[4:8, 4:8] = (1.0, 0.0, 0.0, 1.0)  # opaque red premul
    f = DropShadowFilter(color=(0.0, 0.0, 0.0, 1.0), blur_x=0.0,
                         blur_y=0.0, angle=0.0, distance=4.0,
                         strength=1.0)
    out = np.asarray(apply_filter(img, f))
    # Object pixels unchanged (object over shadow).
    np.testing.assert_allclose(out[4:8, 4:8], img[4:8, 4:8], atol=1e-6)
    # Shadow appears 4 px to the right, outside the object.
    np.testing.assert_allclose(out[4:8, 8:12, 3], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[4:8, 8:12, :3], 0.0, atol=1e-6)
    # Nothing above/left.
    assert out[4:8, :4].max() == 0


def test_glow_knockout_keeps_only_halo():
    img = np.zeros((16, 16, 4), np.float32)
    img[6:10, 6:10] = (0.0, 0.5, 0.0, 1.0)
    f = GlowFilter(color=(1.0, 0.0, 1.0, 1.0), blur_x=5.0, blur_y=5.0,
                   strength=1.0, knockout=True)
    out = np.asarray(apply_filter(img, f))
    # The object interior is knocked out except the glow leaking is
    # masked by (1 - alpha) = 0 there.
    assert out[7, 7].max() == 0
    assert out[6, 11, 3] > 0.05  # halo to the right
    assert out[6, 11, 0] > 0     # magenta


def test_color_matrix_identity_and_channel_swap():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (8, 8, 4)).astype(np.float32)
    img[..., :3] *= img[..., 3:4]  # premul
    ident = ColorMatrixFilter(matrix=(
        1, 0, 0, 0, 0,
        0, 1, 0, 0, 0,
        0, 0, 1, 0, 0,
        0, 0, 0, 1, 0))
    np.testing.assert_allclose(np.asarray(apply_filter(img, ident)), img,
                               atol=1e-5)
    swap = ColorMatrixFilter(matrix=(
        0, 1, 0, 0, 0,
        1, 0, 0, 0, 0,
        0, 0, 1, 0, 0,
        0, 0, 0, 1, 0))
    out = np.asarray(apply_filter(img, swap))
    np.testing.assert_allclose(out[..., 0], img[..., 1], atol=1e-5)
    np.testing.assert_allclose(out[..., 1], img[..., 0], atol=1e-5)


def test_subpixel_shadow_shift_bilinear():
    img = np.zeros((8, 8, 4), np.float32)
    img[2, 2] = (0, 0, 0, 1.0)
    f = DropShadowFilter(color=(0, 0, 0, 1.0), blur_x=0, blur_y=0,
                         angle=0.0, distance=2.5, strength=1.0,
                         knockout=True)
    out = np.asarray(apply_filter(img, f))
    # Half the dot's alpha lands at x=4.5 -> split between 4 and 5.
    assert abs(out[2, 4, 3] - 0.5) < 1e-5
    assert abs(out[2, 5, 3] - 0.5) < 1e-5


# ---------------------------------------------------------------------------
# Group-level filtering through the renderer + the PlaceObject3 wire
# ---------------------------------------------------------------------------


def test_filtered_scene_blurs_on_the_fused_path():
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from tests.test_masks import _rect_shape, _stage, _tl

    dot = _rect_shape(1, 200, 200, ast.StraightSRgba8(255, 0, 0, 255))
    stage = _stage([display.ShapeInstance(
        definition=dot, matrix=_tl(300, 200),
        filters=(BlurFilter(blur_x=7.0, blur_y=7.0, passes=3),))])
    r = TpuRenderer(stage.width, stage.height)
    got = r.render(stage)
    assert r._exec_path == "flatblock"  # filters ride the fused program
    plain = TpuRenderer(stage.width, stage.height).render(
        _stage([display.ShapeInstance(definition=dot,
                                      matrix=_tl(300, 200))]))
    # Blur spreads alpha beyond the crisp square and softens its core.
    assert (got[..., 3] > 0).sum() > (plain[..., 3] > 0).sum()
    assert got[..., 3].max() < plain[..., 3].max()
    # Mass is conserved away from the frame edge (PREMUL red channel —
    # straight red is 255 wherever any alpha spread).
    got_pm = (got[..., 0].astype(np.float64)
              * got[..., 3].astype(np.float64)).sum()
    plain_pm = (plain[..., 0].astype(np.float64)
                * plain[..., 3].astype(np.float64)).sum()
    np.testing.assert_allclose(got_pm, plain_pm, rtol=0.02)


def test_drop_shadow_scene_matches_manual_composite():
    """The renderer's group filtering equals hand-applying the filter
    to the isolated object's premul image and compositing over."""
    import jax.numpy as jnp

    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.ops.composite import premul_to_straight_u8
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from tests.test_masks import _rect_shape, _stage, _tl

    back = _rect_shape(1, 800, 600, ast.StraightSRgba8(40, 90, 200, 255))
    dot = _rect_shape(2, 160, 160, ast.StraightSRgba8(255, 255, 0, 255))
    f = DropShadowFilter(color=(0, 0, 0, 0.8), blur_x=4.0, blur_y=4.0,
                         angle=math.pi / 4, distance=3.0, strength=1.0,
                         passes=2)
    stage = _stage([
        display.ShapeInstance(definition=back),
        display.ShapeInstance(definition=dot, matrix=_tl(250, 150),
                              filters=(f,)),
    ])
    got = TpuRenderer(stage.width, stage.height,
                      backend="scanline").render(stage)

    iso = TpuRenderer(stage.width, stage.height, backend="scanline")
    obj = iso.render(_stage([display.ShapeInstance(
        definition=dot, matrix=_tl(250, 150))])).astype(np.float64)
    backdrop = TpuRenderer(stage.width, stage.height,
                           backend="scanline").render(
        _stage([display.ShapeInstance(definition=back)])
    ).astype(np.float64)
    # Straight u8 -> premul float, filter, composite, re-quantize.
    obj_pm = np.concatenate([obj[..., :3] * obj[..., 3:4] / 255.0,
                             obj[..., 3:4]], axis=-1) / 255.0
    back_pm = np.concatenate(
        [backdrop[..., :3] * backdrop[..., 3:4] / 255.0,
         backdrop[..., 3:4]], axis=-1) / 255.0
    filt = np.asarray(apply_filter(jnp.asarray(obj_pm, jnp.float32), f))
    comb = filt + back_pm * (1.0 - filt[..., 3:4])
    want = np.asarray(premul_to_straight_u8(jnp.asarray(comb)))
    diff = np.abs(got.astype(int) - want.astype(int))
    # One quantum: the manual path re-quantizes the isolated object.
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_filter_wire_roundtrip_and_movie_render():
    from swf_renderer_tpu.models import ast, display, swf_binary
    from swf_renderer_tpu.runtime.movie import load_movie_timeline
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from tests.test_masks import _rect_shape, _stage, _tl

    P = swf_binary.Placement
    filters = (
        DropShadowFilter(color=(0.0, 0.0, 0.0, 1.0), blur_x=5.0,
                         blur_y=3.0, angle=0.5, distance=2.0,
                         strength=1.25, passes=2),
        BlurFilter(blur_x=6.0, blur_y=6.0, passes=3),
        GlowFilter(color=(1.0, 0.0, 0.0, 0.5), blur_x=4.0, blur_y=4.0,
                   strength=2.0, knockout=True, passes=1),
        ColorMatrixFilter(matrix=(0, 1, 0, 0, 0,  1, 0, 0, 0, 0,
                                  0, 0, 1, 0, 0,  0, 0, 0, 1, 0)),
    )
    shape = _rect_shape(1, 300, 300,
                        ast.StraightSRgba8(20, 200, 90, 255))
    movie_bytes = swf_binary.emit_movie_timeline(
        [[P(depth=1, character_id=1, matrix=_tl(200, 150),
            filters=filters)]],
        shapes=[shape], stage_rect=ast.Rect(0, 800, 0, 600))
    movie = swf_binary.parse_movie(movie_bytes)
    got_filters = movie.frames[0][0].filters
    assert len(got_filters) == 4
    assert isinstance(got_filters[0], DropShadowFilter)
    assert abs(got_filters[0].strength - 1.25) < 1e-6
    assert got_filters[1] == filters[1]
    assert got_filters[3] == filters[3]

    stages, _ = load_movie_timeline(movie_bytes)
    assert stages[0].children[0].filters == got_filters
    got = TpuRenderer(stages[0].width, stages[0].height).render(
        stages[0])
    twin = display.Stage(
        width=40, height=30,
        background_color=ast.StraightSRgba8(255, 255, 255, 255),
        children=(display.ShapeInstance(
            definition=shape, matrix=_tl(200, 150),
            filters=got_filters),),
        exact_width=40.0, exact_height=30.0)
    want = TpuRenderer(40, 30).render(twin)
    np.testing.assert_array_equal(got, want)


def test_unsupported_filters_skip_with_warning(caplog):
    import struct

    from swf_renderer_tpu.models import swf_binary

    # count=2: a bevel (skipped) then a blur (kept).
    body = bytes([2, 3]) + b"\x00" * 27 + bytes([1]) + (
        struct.pack("<ii", 4 << 16, 4 << 16) + bytes([1 << 3]))
    filters, pos = swf_binary._parse_filter_list(body, 0)
    assert len(filters) == 1 and isinstance(filters[0], BlurFilter)
    assert pos == len(body)


def test_fused_filters_match_layered_compositor():
    """The fused program's plane<->image conversion around filter nodes
    reproduces the layered compositor bit-for-bit (coverage is pinned
    identical across paths and the filter math is the same jnp ops)."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from tests.test_masks import _rect_shape, _stage, _tl

    back = _rect_shape(1, 800, 600, ast.StraightSRgba8(40, 90, 200, 255))
    dot = _rect_shape(2, 200, 200, ast.StraightSRgba8(255, 230, 0, 230))
    f = (DropShadowFilter(color=(0, 0, 0, 0.8), blur_x=4.0, blur_y=4.0,
                          angle=math.pi / 5, distance=3.0, strength=1.2,
                          passes=2),
         ColorMatrixFilter(matrix=(0, 1, 0, 0, 0,  1, 0, 0, 0, 0,
                                   0, 0, 1, 0, 10,  0, 0, 0, 1, 0)))
    stage = _stage([
        display.ShapeInstance(definition=back),
        display.MaskedGroup(
            mask=display.ShapeInstance(definition=_rect_shape(
                3, 600, 600, ast.StraightSRgba8(0, 200, 0, 255))),
            children=(display.ShapeInstance(
                definition=dot, matrix=_tl(250, 150), filters=f),)),
    ])
    fused = TpuRenderer(stage.width, stage.height,
                        backend="auto")
    got = fused.render(stage)
    assert fused._exec_path == "flatblock"
    layered = TpuRenderer(stage.width, stage.height,
                          backend="scanline").render(stage)
    np.testing.assert_array_equal(got, layered)
