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
