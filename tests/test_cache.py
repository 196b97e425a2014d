"""Compiled-scene cache: save/load round trip renders identically."""

import numpy as np

from swf_renderer_tpu.models import display
from swf_renderer_tpu.models.ast_io import parse_define_bitmap, parse_define_shape
from swf_renderer_tpu.runtime.cache import load_draws, save_draws
from swf_renderer_tpu.runtime.renderer import TpuRenderer
from swf_renderer_tpu.runtime.scene import SceneCompiler


def test_cache_roundtrip_render(reference_tests, tmp_path):
    tag = parse_define_shape(
        (reference_tests / "textured-shapes" / "homestuck-beta-4" /
         "ast.json").read_text()
    )
    bmp = parse_define_bitmap(
        (reference_tests / "bitmap" / "homestuck-beta-3.ast.json").read_text()
    )
    stage = display.stage_for_shape(tag)
    renderer = TpuRenderer(stage.width, stage.height, use_pallas=False)
    renderer.add_bitmap(bmp)

    compiler = SceneCompiler(
        renderer.bitmap_service, renderer._shape_cache, renderer._morph_cache
    )
    draws = compiler.compile_stage(stage)
    want = renderer.execute(draws)

    path = tmp_path / "scene.npz"
    save_draws(path, draws)
    loaded = load_draws(path)
    assert len(loaded) == len(draws)
    got = renderer.execute(loaded)
    np.testing.assert_array_equal(got, want)


def test_draw_list_cache_steady_state(reference_tests):
    """A second render() of an unchanged stage does ZERO geometry work
    (VERDICT r2 #7): the compiled draw list replays from the cache and the
    packed-scene cache hits via the identity-memoized edge digests."""
    from swf_renderer_tpu.models.ast_io import parse_define_shape

    tag = parse_define_shape(
        (reference_tests / "flat-shapes" / "homestuck-beta-1" /
         "ast.json").read_text())
    stage = display.stage_for_shape(tag)
    r = TpuRenderer(stage.width, stage.height)
    first = r.render(stage).copy()
    misses_after_first = r._draws_cache.misses
    assert misses_after_first > 0
    packed_hits = r._packed_cache.hits

    second = r.render(stage)
    assert r._draws_cache.misses == misses_after_first  # all hits
    assert r._draws_cache.hits >= misses_after_first
    assert r._packed_cache.hits == packed_hits + 1  # no re-pack either
    np.testing.assert_array_equal(second, first)


def test_draw_list_cache_distinguishes_ctm(reference_tests):
    """A changed instance matrix must MISS (different device geometry)."""
    from swf_renderer_tpu.models import ast
    from swf_renderer_tpu.models.ast_io import parse_define_shape

    tag = parse_define_shape(
        (reference_tests / "flat-shapes" / "triangle" /
         "ast.json").read_text())
    base = display.stage_for_shape(tag)
    child = base.children[0]
    m = child.matrix
    moved = display.Stage(
        width=base.width, height=base.height,
        children=[display.ShapeInstance(
            definition=tag,
            matrix=ast.Matrix(scale_x=m.scale_x, scale_y=m.scale_y,
                              rotate_skew0=m.rotate_skew0,
                              rotate_skew1=m.rotate_skew1,
                              translate_x=m.translate_x + 40,
                              translate_y=m.translate_y))],
        exact_width=base.exact_width, exact_height=base.exact_height)
    r = TpuRenderer(base.width, base.height)
    a = r.render(base).copy()
    b = r.render(moved)
    assert r._draws_cache.misses >= 2  # second stage recompiled
    assert not np.array_equal(a, b)


def test_digest_memo_safe_under_in_place_mutation():
    """Caller-owned (writeable) edge tables are re-hashed every call: an
    in-place mutation between renders must produce fresh output, not a
    stale packed-cache replay."""
    from swf_renderer_tpu.ops.pipeline import render_batch_flatblock
    from swf_renderer_tpu.runtime.cache import PackedSceneCache

    t = np.array([[2.0, 2.0, 20.0, 2.0], [20.0, 2.0, 20.0, 20.0],
                  [20.0, 20.0, 2.0, 2.0]], np.float32)
    colors = np.array([[[1.0, 0.0, 0.0, 1.0]]], np.float32)
    cache = PackedSceneCache()
    first = render_batch_flatblock([[t]], colors, 24, 150, cache=cache)
    t[:, 1] += 1.5  # in-place mutation, same array identity
    t[:, 3] += 1.5
    second = render_batch_flatblock([[t]], colors, 24, 150, cache=cache)
    assert not np.array_equal(first, second)


def test_plan_respects_backend_and_validate(reference_tests):
    """The transform-sweep auto-route must honor explicit backend /
    validate / pointaa overrides like every other fast path."""
    from swf_renderer_tpu.models import ast
    from swf_renderer_tpu.models.ast_io import parse_define_shape
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    tag = parse_define_shape(
        (reference_tests / "flat-shapes" / "triangle" /
         "ast.json").read_text())
    one = Sfixed16P16.from_value(1.0)
    zero = Sfixed16P16.from_value(0.0)
    stages = [
        display.Stage(width=32, height=32, children=[
            display.ShapeInstance(definition=tag, matrix=ast.Matrix(
                scale_x=one, scale_y=one, rotate_skew0=zero,
                rotate_skew1=zero, translate_x=i * 20, translate_y=0))])
        for i in range(2)
    ]
    for kwargs in ({"backend": "scanline"}, {"validate": True},
                   {"quality": "flash-pointaa"}):
        r = TpuRenderer(32, 32, **kwargs)
        assert r._transform_animation_plan(stages) is None, kwargs
    r = TpuRenderer(32, 32)
    assert r._transform_animation_plan(stages) is not None
