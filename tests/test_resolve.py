"""Fused resolve kernel (MXU cumsum + fill rule + composite) correctness."""

import numpy as np
import jax.numpy as jnp

from swf_renderer_tpu.ops import coverage as cov
from swf_renderer_tpu.ops import resolve as rs
from swf_renderer_tpu.ops import scanline as sl
from swf_renderer_tpu.ops.composite import composite_to_u8, premul_to_straight_u8
from tests.test_coverage import STAR, TRIANGLE, closed_polygon_edges


def _planes(edges, l_height, stride, height, width):
    rows, cols, area, cover = sl.edges_to_cells(edges, height, width)
    ap = np.zeros((l_height, stride), np.float32)
    cp = np.zeros((l_height, stride), np.float32)
    np.add.at(ap, (rows, cols), area.astype(np.float32))
    np.add.at(cp, (rows, cols + 1), cover.astype(np.float32))
    return ap, cp


def test_resolve_frame_matches_reference():
    height, width, stride = 16, 40, 128
    shapes = [TRIANGLE * 1.1, STAR * 1.3]
    colors = np.array([[1, 0, 0, 1], [0, 0, 1, 0.5]], np.float32)

    area = np.zeros((2, height, stride), np.float32)
    coverp = np.zeros((2, height, stride), np.float32)
    for i, s in enumerate(shapes):
        area[i], coverp[i] = _planes(s, height, stride, height, width)

    frame_pm = np.asarray(
        rs.resolve_frame(jnp.asarray(area), jnp.asarray(coverp),
                         jnp.asarray(colors), interpret=True)
    )
    got = np.asarray(
        premul_to_straight_u8(jnp.moveaxis(jnp.asarray(frame_pm), 0, -1))
    )[:height, :width]

    covs = np.stack([cov.coverage_numpy(s, height, width) for s in shapes])
    color_fields = np.broadcast_to(
        colors[:, None, None, :], (2, height, width, 4)
    )
    want = composite_to_u8(
        jnp.asarray(covs, jnp.float32), jnp.asarray(color_fields)
    )
    np.testing.assert_allclose(got.astype(int), want.astype(int), atol=1)


def test_render_scanline_fused_matches_batch():
    height, width = 24, 48
    rng = np.random.default_rng(3)
    f_frames, layers = 3, 2
    rows = np.zeros((f_frames, layers, 256), np.int32)
    cols = np.zeros((f_frames, layers, 256), np.int32)
    area = np.zeros((f_frames, layers, 256), np.float32)
    coverv = np.zeros((f_frames, layers, 256), np.float32)
    colors = rng.uniform(0.2, 1, (f_frames, layers, 4)).astype(np.float32)
    for i in range(f_frames):
        for j in range(layers):
            pts = rng.uniform(0, (width, height), (6, 2)).astype(np.float32)
            edges = closed_polygon_edges(pts)
            r, c, a, v = sl.edges_to_cells(edges, height, width)
            # render_scanline_fused requires row-major-sorted cells
            # (pack_cells' contract).
            order = np.lexsort((c, r))
            r, c, a, v = r[order], c[order], a[order], v[order]
            k = len(r)
            rows[i, j, :k] = r
            cols[i, j, :k] = c
            area[i, j, :k] = a
            coverv[i, j, :k] = v

    got = np.asarray(
        rs.render_scanline_fused(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(area),
            jnp.asarray(coverv), jnp.asarray(colors), height, width,
            interpret=True,
        )
    )
    want = np.asarray(
        sl.render_scanline_batch(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(area),
            jnp.asarray(coverv), jnp.asarray(colors), height, width,
        )
    )
    np.testing.assert_allclose(got.astype(int), want.astype(int), atol=1)


def test_render_scanline_updates_matches_cells(reference_tests):
    """The delta-update pipeline (native coalesced updates) matches the
    cell-based fused pipeline on a real fixture."""
    import pytest

    native = pytest.importorskip("swf_renderer_tpu.native.bindings")
    if not native.native_available():
        pytest.skip("native library unavailable")

    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.models.ast_io import parse_define_shape
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.runtime.scene import SceneCompiler
    from swf_renderer_tpu.utils.imagediff import pixelmatch
    from swf_renderer_tpu.utils.png import read_png

    tag = parse_define_shape(
        (reference_tests / "flat-shapes" / "squares" / "ast.json").read_text()
    )
    stage = display.stage_for_shape(tag)
    rd = TpuRenderer(stage.width, stage.height, use_pallas=False)
    draws = SceneCompiler(rd.bitmap_service, {}, {}).compile_stage(stage)

    updates = [
        native.cells_split_delta_native(d.edges, stage.height, stage.width)
        for d in draws
    ]
    r, c, v = rs.pack_updates(updates)
    colors = np.asarray([d.paint.color for d in draws], np.float32)
    frames = np.asarray(
        rs.render_scanline_updates(
            jnp.asarray(r)[None], jnp.asarray(c)[None], jnp.asarray(v)[None],
            jnp.asarray(colors)[None], stage.height, stage.width,
            interpret=True,
        )
    )
    golden = read_png(reference_tests / "flat-shapes" / "squares" / "shape.png")
    assert pixelmatch(frames[0], golden, threshold=0.05).diff_ratio <= 1e-4
