"""Bitmap filter math (ops/filters.py) against numpy oracles, and the
group-level filter compositing semantics."""

import dataclasses
import math

import jax.numpy as jnp
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


def test_all_spec_filter_kinds_parse():
    """All eight SURFACEFILTERLIST kinds parse: a zeroed bevel body is
    a real (degenerate) BevelFilter now, not a skip."""
    import struct

    from swf_renderer_tpu.models import swf_binary
    from swf_renderer_tpu.ops.filters import BevelFilter

    body = bytes([2, 3]) + b"\x00" * 27 + bytes([1]) + (
        struct.pack("<ii", 4 << 16, 4 << 16) + bytes([1 << 3]))
    filters, pos = swf_binary._parse_filter_list(body, 0)
    assert len(filters) == 2
    assert isinstance(filters[0], BevelFilter)
    assert isinstance(filters[1], BlurFilter)
    assert pos == len(body)
    with pytest.raises(ValueError):
        swf_binary._parse_filter_list(bytes([1, 9]), 0)


def test_extended_filter_wire_roundtrip():
    """Bevel / gradient glow / gradient bevel / convolution emit ->
    parse to equal dataclasses (fixed-point fields within quantum)."""
    from swf_renderer_tpu.models import swf_binary
    from swf_renderer_tpu.ops.filters import (
        BevelFilter, ConvolutionFilter, GradientBevelFilter,
        GradientGlowFilter,
    )

    filters = (
        BevelFilter(shadow_color=(0.0, 0.0, 0.0, 1.0),
                    highlight_color=(1.0, 1.0, 1.0, 1.0),
                    blur_x=4.0, blur_y=4.0, angle=0.25, distance=3.0,
                    strength=1.5, inner=True, passes=2),
        GradientGlowFilter(
            colors=((1.0, 0.0, 0.0, 0.0), (1.0, 1.0, 0.0, 1.0)),
            ratios=(0.0, 1.0), blur_x=6.0, blur_y=2.0, angle=0.5,
            distance=1.0, strength=2.0, knockout=True, passes=3),
        GradientBevelFilter(
            colors=((0.0, 0.0, 1.0, 1.0), (0.0, 0.0, 0.0, 0.0),
                    (1.0, 0.0, 0.0, 1.0)),
            ratios=(0.0, 0.5, 1.0), blur_x=3.0, blur_y=3.0,
            angle=0.75, distance=2.0, strength=1.0, on_top=True,
            passes=1),
        ConvolutionFilter(
            matrix_x=3, matrix_y=2,
            matrix=(0.0, 1.0, 0.0, 1.0, 2.0, 1.0), divisor=5.0,
            bias=8.0, default_color=(0.0, 1.0, 0.0, 1.0),
            clamp=False, preserve_alpha=True),
    )
    blob = swf_binary._emit_filter_list(filters)
    got, pos = swf_binary._parse_filter_list(blob, 0)
    assert pos == len(blob)
    assert len(got) == len(filters)
    for g, w in zip(got, filters):
        assert type(g) is type(w)
        for field in dataclasses.fields(w):
            gv, wv = getattr(g, field.name), getattr(w, field.name)
            if isinstance(wv, (int, bool, str)):
                assert gv == wv, (type(w).__name__, field.name)
            else:
                np.testing.assert_allclose(
                    np.asarray(gv, np.float64),
                    np.asarray(wv, np.float64), atol=1 / 128.0,
                    err_msg=f"{type(w).__name__}.{field.name}")


def test_bevel_highlight_and_shadow_sides():
    """angle=0 casts the shadow toward +x: the lit (-x) flank gets the
    highlight color, the +x flank the shadow color; outer placement
    keeps the object pixels untouched."""
    from swf_renderer_tpu.ops.filters import BevelFilter

    img = np.zeros((1, 40, 40, 4), np.float32)
    img[:, 8:32, 12:28, :] = [0.5, 0.5, 0.5, 1.0]  # premul gray
    f = BevelFilter(shadow_color=(0.0, 0.0, 1.0, 1.0),
                    highlight_color=(1.0, 0.0, 0.0, 1.0),
                    blur_x=4.0, blur_y=4.0, angle=0.0, distance=2.0,
                    strength=2.0)
    out = np.asarray(apply_filter(jnp.asarray(img), f))
    left = out[0, 20, 9]    # just outside the lit flank
    right = out[0, 20, 30]  # just outside the shadow flank
    assert left[0] > 0.2 and left[2] < 0.05, left    # red highlight
    assert right[2] > 0.2 and right[0] < 0.05, right  # blue shadow
    # Outer bevel leaves the object itself untouched.
    np.testing.assert_array_equal(out[0, 20, 20], img[0, 20, 20])
    # Inner bevel shades INSIDE and leaves the outside transparent.
    fi = dataclasses.replace(f, inner=True)
    out_i = np.asarray(apply_filter(jnp.asarray(img), fi))
    assert out_i[0, 20, 9, 3] == 0.0
    assert out_i[0, 20, 13, 0] > img[0, 20, 13, 0]  # lit inner flank


def test_gradient_glow_maps_blur_through_lut():
    from swf_renderer_tpu.ops.filters import (
        GlowFilter, GradientGlowFilter,
    )

    img = np.zeros((1, 32, 32, 4), np.float32)
    img[:, 10:22, 10:22, :] = [0.0, 0.0, 0.0, 1.0]
    # A two-stop gradient from transparent red to opaque red is the
    # solid glow with a linear alpha ramp — compare against GlowFilter
    # with strength 1 (same blur, no shift).
    gg = GradientGlowFilter(
        colors=((1.0, 0.0, 0.0, 0.0), (1.0, 0.0, 0.0, 1.0)),
        ratios=(0.0, 1.0), blur_x=5.0, blur_y=5.0, strength=1.0)
    sg = GlowFilter(color=(1.0, 0.0, 0.0, 1.0), blur_x=5.0, blur_y=5.0,
                    strength=1.0)
    got = np.asarray(apply_filter(jnp.asarray(img), gg))
    want = np.asarray(apply_filter(jnp.asarray(img), sg))
    # LUT quantization (256 entries) bounds the difference.
    assert np.abs(got - want).max() < 1 / 64.0


def test_gradient_bevel_neutral_midpoint():
    """Flat regions (no directional difference) sample the gradient's
    midpoint; a transparent mid stop keeps them untouched."""
    from swf_renderer_tpu.ops.filters import GradientBevelFilter

    img = np.zeros((1, 40, 40, 4), np.float32)
    img[:, 8:32, 8:32, :] = [0.3, 0.3, 0.3, 1.0]
    f = GradientBevelFilter(
        colors=((0.0, 0.0, 1.0, 1.0), (0.0, 0.0, 0.0, 0.0),
                (1.0, 0.0, 0.0, 1.0)),
        ratios=(0.0, 0.5, 1.0), blur_x=3.0, blur_y=3.0, angle=0.0,
        distance=2.0, strength=1.0, inner=True)
    out = np.asarray(apply_filter(jnp.asarray(img), f))
    # Deep interior: g == f == 1 -> index 0.5 -> transparent stop.
    np.testing.assert_allclose(out[0, 20, 20], img[0, 20, 20],
                               atol=1 / 100.0)
    # The lit inner flank picks up the high-ratio (red) side.
    assert out[0, 20, 9, 0] > out[0, 20, 9, 2]
    # The shadow inner flank picks up the low-ratio (blue) side.
    assert out[0, 20, 30, 2] > out[0, 20, 30, 0]


def test_convolution_matches_numpy_oracle():
    from swf_renderer_tpu.ops.filters import ConvolutionFilter

    rng = np.random.default_rng(7)
    straight = rng.uniform(0.0, 1.0, (6, 9, 4)).astype(np.float32)
    img = straight.copy()
    img[..., :3] *= img[..., 3:4]  # premultiply
    kern = np.asarray([[0.0, 1.0, 0.0],
                       [1.0, 2.0, 1.0],
                       [0.5, 1.0, 0.5]], np.float32)

    for clamp, preserve in ((True, True), (False, False)):
        f = ConvolutionFilter(
            matrix_x=3, matrix_y=3, matrix=tuple(kern.ravel()),
            divisor=8.0, bias=4.0,
            default_color=(0.2, 0.4, 0.6, 0.8), clamp=clamp,
            preserve_alpha=preserve)
        got = np.asarray(apply_filter(jnp.asarray(img), f))

        if clamp:
            pad = np.pad(straight, ((1, 1), (1, 1), (0, 0)),
                         mode="edge")
        else:
            pad = np.pad(straight, ((1, 1), (1, 1), (0, 0)))
            dc = np.asarray(f.default_color, np.float32)
            mask = np.pad(np.ones((6, 9, 1), np.float32),
                          ((1, 1), (1, 1), (0, 0)))
            pad = pad + (1.0 - mask) * dc
        acc = np.zeros_like(straight)
        for j in range(3):
            for i in range(3):
                acc += kern[j, i] * pad[j:j + 6, i:i + 9]
        want = np.clip(acc / 8.0 + 4.0 / 255.0, 0.0, 1.0)
        if preserve:
            want[..., 3] = straight[..., 3]
        want_pm = want.copy()
        want_pm[..., :3] *= want_pm[..., 3:4]
        np.testing.assert_allclose(got, want_pm, atol=1e-5,
                                   err_msg=f"clamp={clamp}")


def test_fused_filters_match_layered_compositor():
    """The fused program's plane<->image conversion around filter nodes
    reproduces the layered compositor bit-for-bit (coverage is pinned
    identical across paths and the filter math is the same jnp ops)."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from tests.test_masks import _rect_shape, _stage, _tl

    back = _rect_shape(1, 800, 600, ast.StraightSRgba8(40, 90, 200, 255))
    dot = _rect_shape(2, 200, 200, ast.StraightSRgba8(255, 230, 0, 230))
    from swf_renderer_tpu.ops.filters import (
        BevelFilter, ConvolutionFilter, GradientGlowFilter,
    )

    f = (DropShadowFilter(color=(0, 0, 0, 0.8), blur_x=4.0, blur_y=4.0,
                          angle=math.pi / 5, distance=3.0, strength=1.2,
                          passes=2),
         BevelFilter(shadow_color=(0.1, 0.1, 0.3, 0.9),
                     highlight_color=(1.0, 1.0, 0.9, 0.9), blur_x=3.0,
                     blur_y=3.0, angle=math.pi / 4, distance=2.0,
                     strength=1.5, inner=True),
         GradientGlowFilter(
             colors=((1.0, 0.2, 0.0, 0.0), (1.0, 0.9, 0.0, 0.8)),
             ratios=(0.0, 1.0), blur_x=5.0, blur_y=5.0, strength=1.0),
         ConvolutionFilter(
             matrix_x=3, matrix_y=3,
             matrix=(0, 1, 0, 1, 4, 1, 0, 1, 0), divisor=8.0,
             bias=0.0, clamp=True, preserve_alpha=False),
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


def test_fused_filters_padded_plane_rows():
    """Frame sizes whose plane rows carry tail padding beyond the last
    full strips-per-plane slot (e.g. width 521 -> 5 chunks, 256 plane
    rows = 6 slots * 40 + 16 pad) reshape correctly through the
    plane<->image converters (regression: the forward converter used
    to require plane_rows % (n_chunks*8) == 0)."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from tests.test_masks import _rect_shape, _tl

    dot = _rect_shape(1, 2000, 2000, ast.StraightSRgba8(250, 40, 40, 255))
    stage = display.Stage(
        width=521, height=358,
        background_color=ast.StraightSRgba8(255, 255, 255, 255),
        children=(display.ShapeInstance(
            definition=dot, matrix=_tl(3000, 2000),
            filters=(BlurFilter(blur_x=5.0, blur_y=5.0, passes=2),)),),
        exact_width=521.0, exact_height=358.0)
    fused = TpuRenderer(stage.width, stage.height)
    got = fused.render(stage)
    assert fused._exec_path == "flatblock"
    lay = TpuRenderer(stage.width, stage.height,
                      backend="scanline").render(stage)
    np.testing.assert_array_equal(got, lay)
