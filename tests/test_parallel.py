"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swf_renderer_tpu.ops.pipeline import render_solid_batch
from swf_renderer_tpu.parallel.mesh import (
    make_mesh,
    render_batch_dp,
    render_frame_tile_sharded,
)


def _demo_batch(b=8, p=2, e=128, h=64, w=256):
    rng = np.random.default_rng(42)
    edges_t = np.zeros((b, p, 4, e), np.float32)
    colors = np.zeros((b, p, 4), np.float32)
    for i in range(b):
        for j in range(p):
            pts = rng.uniform(0, (w, h), size=(5, 2)).astype(np.float32)
            closed = np.concatenate([pts, pts[:1]])
            seg = np.concatenate([closed[:-1], closed[1:]], axis=1)  # (5,4)
            edges_t[i, j, :, : len(seg)] = seg.T
            colors[i, j] = rng.uniform(0.2, 1.0, size=4)
    return edges_t, colors, h, w


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_render_batch_dp_matches_single_device():
    edges_t, colors, h, w = _demo_batch()
    want = np.asarray(
        render_solid_batch(jnp.asarray(edges_t), jnp.asarray(colors), h, w,
                           use_pallas=False)
    )
    mesh = make_mesh(axis_names=("dp", "tp"), tp=1)
    got = np.asarray(
        render_batch_dp(mesh, edges_t, colors, h, w, use_pallas=False)
    )
    np.testing.assert_array_equal(got, want)


def test_render_frame_tile_sharded_matches_single_device():
    edges_t, colors, h, w = _demo_batch(b=1)
    want = np.asarray(
        render_solid_batch(jnp.asarray(edges_t), jnp.asarray(colors), h, w,
                           use_pallas=False)
    )[0]
    mesh = make_mesh()
    got = np.asarray(
        render_frame_tile_sharded(mesh, edges_t[0], colors[0], h, w)
    )
    np.testing.assert_allclose(got.astype(int), want.astype(int), atol=1)


def test_scanline_dp_tp_matches_single_device():
    """The flagship scanline pipeline sharded dp x tp is exact."""
    from swf_renderer_tpu.ops import scanline as sl
    from swf_renderer_tpu.parallel.mesh import (
        partition_cells_by_column,
        render_scanline_dp_tp,
    )

    rng = np.random.default_rng(9)
    b, l, h, w = 4, 2, 32, 256
    cell_lists = []
    rows = np.zeros((b, l, 1024), np.int32)
    cols = np.zeros((b, l, 1024), np.int32)
    area = np.zeros((b, l, 1024), np.float32)
    cover = np.zeros((b, l, 1024), np.float32)
    colors = rng.uniform(0.2, 1, (b, l, 4)).astype(np.float32)
    for i in range(b):
        per_frame = []
        for j in range(l):
            pts = rng.uniform(-10, (w + 10, h + 10), (7, 2)).astype(np.float32)
            closed = np.concatenate([pts, pts[:1]])
            edges = np.concatenate([closed[:-1], closed[1:]], axis=1)
            cells = sl.edges_to_cells(edges, h, w)
            per_frame.append(cells)
            r, c, a, v = cells
            k = len(r)
            rows[i, j, :k] = r
            cols[i, j, :k] = c
            area[i, j, :k] = a
            cover[i, j, :k] = v
        cell_lists.append(per_frame)

    want = np.asarray(
        sl.render_scanline_batch(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(area),
            jnp.asarray(cover), jnp.asarray(colors), h, w,
        )
    )

    mesh = make_mesh(axis_names=("dp", "tp"), tp=4)
    sr, sc, sd = partition_cells_by_column(cell_lists, w, tp=4)
    got = np.asarray(
        render_scanline_dp_tp(mesh, sr, sc, sd, colors, h, w)
    )
    np.testing.assert_allclose(got.astype(int), want.astype(int), atol=1)


def test_render_fused_dp_matches_single_device():
    import numpy as np

    from swf_renderer_tpu.ops.flatblock import frames_u32_to_u8
    from swf_renderer_tpu.ops.pipeline import render_batch_flatblock
    from swf_renderer_tpu.parallel.mesh import make_mesh, render_fused_dp

    rng = np.random.default_rng(13)
    frames, layers, height, width = 8, 2, 32, 200
    tables = []
    colors = np.zeros((frames, layers, 4), np.float32)
    for i in range(frames):
        per = []
        for j in range(layers):
            pts = rng.uniform(0, (width, height), size=(6, 2)).astype(
                np.float32)
            closed = np.concatenate([pts, pts[:1]])
            per.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
            colors[i, j] = rng.uniform(0.2, 1.0, size=4)
        tables.append(per)

    want = render_batch_flatblock(tables, colors, height, width)

    from swf_renderer_tpu.ops import scanline as sl

    def lower(table):
        r, c, a, v = sl.edges_to_cells(table, height, width)
        rows = np.concatenate([r, r])
        cols = np.concatenate([c, c + 1])
        vals = np.concatenate([a, v - a]).astype(np.float32)
        key = rows.astype(np.int64) * (width + 2) + cols
        order = np.argsort(key, kind="stable")
        uniq, inv = np.unique(key[order], return_inverse=True)
        acc = np.zeros(len(uniq), np.float32)
        np.add.at(acc, inv, vals[order])
        return ((uniq // (width + 2)).astype(np.int32),
                (uniq % (width + 2)).astype(np.int32), acc)

    update_lists = [[lower(t) for t in per] for per in tables]
    mesh = make_mesh(n_devices=8, tp=1)
    out32 = np.asarray(render_fused_dp(mesh, update_lists, colors,
                                       height, width))
    got = frames_u32_to_u8(out32, height, width)
    np.testing.assert_array_equal(got, want)
