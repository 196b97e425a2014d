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


def test_morph_sweep_dp_matches_single_device(reference_tests):
    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.models.ast_io import parse_define_morph_shape
    from swf_renderer_tpu.models.decode_morph_shape import decode_morph_shape
    from swf_renderer_tpu.models.geometry import Affine, TWIPS_PER_PX
    from swf_renderer_tpu.models.morph_geometry import morph_fill_edge_pairs
    from swf_renderer_tpu.ops.morph import morph_pieces, render_morph_sweep
    from swf_renderer_tpu.parallel.mesh import render_morph_sweep_dp

    d = reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((d / "ast.json").read_text())
    stage = display.stage_for_morph_shape(tag, 0.0)
    ctm = Affine.scaling(1 / TWIPS_PER_PX, 1 / TWIPS_PER_PX).then(
        Affine.from_swf_matrix(stage.children[0].matrix))
    parts = morph_pieces(morph_fill_edge_pairs(decode_morph_shape(tag), ctm))
    ratios = np.linspace(0, 1, 16, dtype=np.float32)

    want = np.asarray(render_morph_sweep(
        jnp.asarray(ratios), *(jnp.asarray(x) for x in parts),
        stage.height, stage.width))
    mesh = make_mesh(axis_names=("dp", "tp"), tp=2)
    got = np.asarray(render_morph_sweep_dp(
        mesh, ratios, parts, stage.height, stage.width))
    np.testing.assert_array_equal(got, want)


def test_styled_dp_matches_single_device():
    from swf_renderer_tpu.native.bindings import (
        native_available, pack_grouped_native,
    )
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.flatblock import (
        plane_geometry, render_fused_styled,
    )
    from swf_renderer_tpu.ops.pipeline import kernel_paints_for
    from swf_renderer_tpu.ops.scanline import edges_to_cells
    from swf_renderer_tpu.parallel.mesh import render_styled_dp

    rng = np.random.default_rng(31)
    frames, h, w = 4, 32, 200
    dp = 4
    stops_r = np.array([0.0, 1.0], np.float32)
    stops_c = np.array([[1, 0, 0, 1], [0, 0, 1, 1]], np.float32)
    paints_s = [
        style_ops.solid_paint((0.9, 0.4, 0.1, 0.9)),
        style_ops.Paint(kind=style_ops.PAINT_LINEAR,
                        inv_matrix=(200.0, 0.0, 0.0, 200.0,
                                    -16384.0, -3000.0),
                        stop_ratios=stops_r, stop_colors=stops_c),
    ]
    layers = len(paints_s)

    def scene(n_frames, seed):
        r2 = np.random.default_rng(seed)
        tabs = []
        for _ in range(n_frames):
            per = []
            for _ in range(layers):
                pts = r2.uniform(0, (w, h), (6, 2)).astype(np.float32)
                closed = np.concatenate([pts, pts[:1]])
                per.append(np.concatenate([closed[:-1], closed[1:]], 1))
            tabs.append(per)
        return tabs

    tables = scene(frames, 5)

    def lower(t):
        r, c, a, v = edges_to_cells(t, h, w)
        rows = np.concatenate([r, r])
        cols = np.concatenate([c, c + 1])
        vals = np.concatenate([a, v - a]).astype(np.float32)
        key = rows.astype(np.int64) * (w + 2) + cols
        order = np.argsort(key, kind="stable")
        uniq, inv = np.unique(key[order], return_inverse=True)
        acc = np.zeros(len(uniq), np.float32)
        np.add.at(acc, inv, vals[order])
        keep = acc != 0
        return ((uniq[keep] // (w + 2)).astype(np.int32),
                (uniq[keep] % (w + 2)).astype(np.int32), acc[keep])

    if not native_available():
        pytest.skip("native library unavailable")

    kpaints, fields, base_colors = kernel_paints_for(paints_s, h, w)
    colors = np.broadcast_to(base_colors, (frames, layers, 4)).copy()
    update_lists = [[lower(t) for t in per] for per in tables]

    # Single device: all frames in one pack.
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        update_lists, h, w, group=4, group_pad_multiple=4)
    want = np.asarray(render_fused_styled(
        jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
        jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
        jnp.asarray(colors), tuple(jnp.asarray(f) for f in fields),
        frames, layers, ns, nc, kpaints, group=4))

    # dp shards: pack each shard's frames separately, pad rectangular.
    per = frames // dp
    shards = [pack_grouped_native(update_lists[d * per:(d + 1) * per],
                                  h, w, group=4, group_pad_multiple=4)
              for d in range(dp)]
    ng = max(s[0].shape[0] for s in shards)

    def pad(x, fill=0):
        out = np.full((ng,) + x.shape[1:], fill, x.dtype)
        out[: x.shape[0]] = x
        return out

    # gla is (group, NG): pad along axis 1.
    sgsi = np.stack([pad(s[0], ns) for s in shards])
    sgfl = np.stack([pad(s[1]) for s in shards])
    sgla = np.stack([np.pad(s[2], ((0, 0), (0, ng - s[2].shape[1])))
                     for s in shards])
    sgrc = np.stack([pad(s[3]) for s in shards])
    sgcm = np.stack([pad(s[4]) for s in shards])
    sgvv = np.stack([pad(s[5]) for s in shards])
    scolors = colors.reshape(dp, per, layers, 4)

    mesh = make_mesh(n_devices=dp, axis_names=("dp", "tp"), tp=1)
    from swf_renderer_tpu.ops.flatblock import LANE

    got = np.asarray(render_styled_dp(
        mesh, sgsi, sgfl, sgla, sgrc, sgcm, sgvv, scolors, fields,
        frames, layers, ns, nc, kpaints, group=4))
    want2 = np.asarray(want)
    np.testing.assert_array_equal(got, want2)


def test_styled_dp_wide_plane_with_bitmaps():
    """4K-class styled sharding: the grown 256-sublane plane (wide frame)
    with BITMAP field planes, dp-sharded — exact vs single device.  Field
    planes replicate per shard by design (streamed per-strip through VMEM;
    one HBM copy per chip, no hot-path collectives)."""
    from swf_renderer_tpu.native.bindings import (
        native_available, pack_grouped_native,
    )
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.flatblock import (
        plane_rows_for, render_fused_styled,
    )
    from swf_renderer_tpu.ops.pipeline import (
        kernel_paints_for, lower_update_lists,
    )
    from swf_renderer_tpu.parallel.mesh import render_styled_dp

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(41)
    frames, h, w = 4, 24, 3800  # stride 3968 -> nc=31, plane_rows 256
    dp = 4
    img = rng.integers(0, 256, (17, 23, 4)).astype(np.uint8)
    paints = [
        style_ops.Paint(kind=style_ops.PAINT_BITMAP,
                        inv_matrix=(0.1, 0.0, 0.0, 0.1, 0.0, 0.0),
                        image=img, repeating=True, smoothed=True,
                        supersample=1),
        style_ops.solid_paint((0.1, 0.9, 0.5, 0.8)),
    ]
    layers = len(paints)
    tables = []
    for _ in range(frames):
        per = []
        for _ in range(layers):
            pts = rng.uniform(0, (w, h), (6, 2)).astype(np.float32)
            closed = np.concatenate([pts, pts[:1]])
            per.append(np.concatenate([closed[:-1], closed[1:]], 1))
        tables.append(per)
    update_lists = lower_update_lists(tables, h, w, drop_zeros=True)
    assert plane_rows_for(31) == 256

    kpaints, fields, base_colors = kernel_paints_for(paints, h, w)
    colors = np.broadcast_to(base_colors, (frames, layers, 4)).copy()

    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        update_lists, h, w, group=4, group_pad_multiple=4)
    want = np.asarray(render_fused_styled(
        jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
        jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
        jnp.asarray(colors), tuple(jnp.asarray(f) for f in fields),
        frames, layers, ns, nc, kpaints, group=4))

    per = frames // dp
    shards = [pack_grouped_native(update_lists[d * per:(d + 1) * per],
                                  h, w, group=4, group_pad_multiple=4)
              for d in range(dp)]
    ng = max(s[0].shape[0] for s in shards)

    def pad(x, fill=0):
        out = np.full((ng,) + x.shape[1:], fill, x.dtype)
        out[: x.shape[0]] = x
        return out

    sgsi = np.stack([pad(s[0], ns) for s in shards])
    sgfl = np.stack([pad(s[1]) for s in shards])
    sgla = np.stack([np.pad(s[2], ((0, 0), (0, ng - s[2].shape[1])))
                     for s in shards])
    sgrc = np.stack([pad(s[3]) for s in shards])
    sgcm = np.stack([pad(s[4]) for s in shards])
    sgvv = np.stack([pad(s[5]) for s in shards])

    mesh = make_mesh(n_devices=dp, axis_names=("dp", "tp"), tp=1)
    got = np.asarray(render_styled_dp(
        mesh, sgsi, sgfl, sgla, sgrc, sgcm, sgvv,
        colors.reshape(dp, per, layers, 4), fields,
        frames, layers, ns, nc, kpaints, group=4))
    np.testing.assert_array_equal(got, np.asarray(want))


def test_affine_sweep_dp_matches_single_device():
    """Transform-animation sweep sharded over the whole mesh: exact vs
    the single-device kernel."""
    from swf_renderer_tpu.ops.transform import (
        affine_pieces, render_affine_sweep,
    )
    from swf_renderer_tpu.parallel.mesh import render_affine_sweep_dp

    rng = np.random.default_rng(59)
    h = w = 40
    pts = rng.uniform(5, 35, (6, 2)).astype(np.float32)
    closed = np.concatenate([pts, pts[:1]])
    tables = [np.concatenate([closed[:-1], closed[1:]], axis=1)]
    colors = [(0.8, 0.3, 0.2, 0.9)]
    mats = []
    for i in range(8):
        th = 2 * np.pi * i / 8
        a, b = np.cos(th), np.sin(th)
        mats.append((a, b, -b, a, 20 - a * 20 + b * 20,
                     20 - b * 20 - a * 20))
    mats = np.asarray(mats, np.float32)
    parts = affine_pieces(tables, colors, mats)

    want = np.asarray(render_affine_sweep(
        jnp.asarray(mats), *(jnp.asarray(x) for x in parts), h, w))

    mesh = make_mesh(n_devices=8, axis_names=("dp", "tp"), tp=2)
    got = np.asarray(render_affine_sweep_dp(mesh, mats, parts, h, w))
    np.testing.assert_array_equal(got, want)


def test_styled_affine_sweep_dp_matches_single_device():
    """Gradient-styled transform sweep sharded over the mesh (grad_mats'
    frame axis shards with the matrices): exact vs single device."""
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.transform import (
        affine_pieces, render_affine_sweep, sweep_paints,
    )
    from swf_renderer_tpu.parallel.mesh import render_affine_sweep_dp

    rng = np.random.default_rng(61)
    h = w = 40
    pts = rng.uniform(5, 35, (6, 2)).astype(np.float32)
    closed = np.concatenate([pts, pts[:1]])
    tables = [np.concatenate([closed[:-1], closed[1:]], axis=1)]
    paints = [style_ops.Paint(
        kind=style_ops.PAINT_LINEAR,
        inv_matrix=(900.0, 40.0, -40.0, 900.0, -16384.0, -17000.0),
        stop_ratios=np.array([0.0, 0.5, 1.0], np.float32),
        stop_colors=np.array([[1, 0, 0, 1], [0, 1, 0, 0.7], [0, 0, 1, 1]],
                             np.float32))]
    mats = []
    for i in range(8):
        th = 2 * np.pi * i / 8
        a, b = np.cos(th), np.sin(th)
        mats.append((a, b, -b, a, 20 - a * 20 + b * 20,
                     20 - b * 20 - a * 20))
    mats = np.asarray(mats, np.float32)
    parts = affine_pieces(tables, [(0, 0, 0, 0)], mats)
    kpaints, grad_mats = sweep_paints(paints, mats)

    want = np.asarray(render_affine_sweep(
        jnp.asarray(mats), *(jnp.asarray(x) for x in parts), h, w,
        paints=kpaints, grad_mats=jnp.asarray(grad_mats)))

    mesh = make_mesh(n_devices=8, axis_names=("dp", "tp"), tp=2)
    got = np.asarray(render_affine_sweep_dp(
        mesh, mats, parts, h, w, paints=kpaints, grad_mats=grad_mats))
    np.testing.assert_array_equal(got, want)


def test_morph_affine_sweep_dp_matches_single_device():
    """Combined morph+transform sweep sharded over the mesh: exact vs the
    single-device kernel."""
    from swf_renderer_tpu.ops.transform import (
        morph_affine_pieces, render_morph_affine_sweep,
    )
    from swf_renderer_tpu.parallel.mesh import render_morph_affine_sweep_dp

    es = np.array([[4.0, 4.0, 28.0, 8.0], [28.0, 8.0, 16.0, 28.0],
                   [16.0, 28.0, 4.0, 4.0]], np.float32)
    ee = es + np.array([[2, 1, -3, 2], [0, 2, 1, -1], [1, 0, 0, 1]],
                       np.float32)
    pairs = [(es, ee, (1, 0, 0, 1), (0, 0, 1, 1))]
    mats, ratios = [], []
    for i in range(8):
        th = 0.2 * i
        ca, sa = np.cos(th), np.sin(th)
        mats.append((ca, sa, -sa, ca, 16 - ca * 16 + sa * 16,
                     16 - sa * 16 - ca * 16))
        ratios.append(i / 7.0)
    mats = np.asarray(mats, np.float32)
    ratios = np.asarray(ratios, np.float32)
    parts = morph_affine_pieces(pairs, mats)

    want = np.asarray(render_morph_affine_sweep(
        jnp.asarray(mats), jnp.asarray(ratios),
        *(jnp.asarray(x) for x in parts), 32, 32))
    mesh = make_mesh(n_devices=8, axis_names=("dp", "tp"), tp=2)
    got = np.asarray(render_morph_affine_sweep_dp(
        mesh, mats, ratios, parts, 32, 32))
    np.testing.assert_array_equal(got, want)


def test_field_affine_sweep_dp_matches_single_device():
    """Bitmap-paint transform sweep sharded over the mesh: the baked
    field planes' FRAME axis (axis 1) shards with the matrices — each
    device holds only its own frames' planes — exact vs single device."""
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.transform import (
        affine_pieces, bake_sweep_fields, render_affine_sweep,
        sweep_paints,
    )
    from swf_renderer_tpu.parallel.mesh import render_affine_sweep_dp

    rng = np.random.default_rng(67)
    h = w = 40
    pts = rng.uniform(5, 35, (6, 2)).astype(np.float32)
    closed = np.concatenate([pts, pts[:1]])
    tables = [np.concatenate([closed[:-1], closed[1:]], axis=1)]
    img = rng.integers(0, 256, (8, 8, 4)).astype(np.uint8)
    paints = [style_ops.Paint(
        kind=style_ops.PAINT_BITMAP,
        inv_matrix=(0.25, 0.02, -0.02, 0.25, 1.0, 0.5),
        image=img, repeating=True, smoothed=True, supersample=2)]
    mats = []
    for i in range(8):
        th = 2 * np.pi * i / 8
        a, b = np.cos(th), np.sin(th)
        mats.append((a, b, -b, a, 20 - a * 20 + b * 20,
                     20 - b * 20 - a * 20))
    mats = np.asarray(mats, np.float32)
    parts = affine_pieces(tables, [(0, 0, 0, 0)], mats)
    kpaints, grad_mats, specs = sweep_paints(paints, mats,
                                             allow_fields=True)
    assert grad_mats is None and len(specs) == 1
    fields = bake_sweep_fields(specs, h, w)

    want = np.asarray(render_affine_sweep(
        jnp.asarray(mats), *(jnp.asarray(x) for x in parts), h, w,
        paints=kpaints, fields=fields))

    mesh = make_mesh(n_devices=8, axis_names=("dp", "tp"), tp=2)
    got = np.asarray(render_affine_sweep_dp(
        mesh, mats, parts, h, w, paints=kpaints, fields=fields))
    np.testing.assert_array_equal(got, want)


def test_tile_sharded_affine_sweep_matches_single_device():
    """Width-sharded transform sweep: each device rasterizes its column
    span for every frame.  Round 4: the shard origin rides the kernel's
    x_shift scalar (subtracted AFTER the transform) instead of folding
    into the translates, so the sharded output matches the
    single-device sweep EXACTLY on this corpus (the fold's re-rounding
    used to cost one u8 quantum)."""
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.transform import (
        affine_pieces, bake_sweep_fields, render_affine_sweep,
        sweep_paints,
    )
    from swf_renderer_tpu.parallel.mesh import (
        render_affine_sweep_tile_sharded,
    )

    rng = np.random.default_rng(71)
    h, w = 48, 512  # 64 columns per device on the 8-device mesh
    tables, paints = [], []
    for li in range(3):
        pts = rng.uniform((10, 5), (500, 43), (6, 2)).astype(np.float32)
        closed = np.concatenate([pts, pts[:1]])
        tables.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
    img = rng.integers(0, 256, (8, 8, 4)).astype(np.uint8)
    paints = [
        style_ops.solid_paint((0.8, 0.3, 0.2, 0.9)),
        style_ops.Paint(
            kind=style_ops.PAINT_LINEAR,
            inv_matrix=(120.0, 10.0, -10.0, 120.0, -16384.0, -2000.0),
            stop_ratios=np.array([0.0, 1.0], np.float32),
            stop_colors=np.array([[1, 0, 0, 1], [0, 0, 1, 1]],
                                 np.float32)),
        style_ops.Paint(
            kind=style_ops.PAINT_BITMAP,
            inv_matrix=(0.1, 0.02, -0.02, 0.1, 0.0, 0.0),
            image=img, repeating=True, smoothed=True, supersample=2),
    ]
    mats = []
    for i in range(4):
        th = 2 * np.pi * i / 16
        a, b = np.cos(th), np.sin(th)
        cx, cy = 250.0, 24.0
        mats.append((a, b, -b, a, cx - a * cx + b * cy,
                     cy - b * cx - a * cy))
    mats = np.asarray(mats, np.float32)
    parts = affine_pieces(tables, [(0, 0, 0, 0)] * 3, mats)
    kpaints, grad_mats, specs = sweep_paints(paints, mats,
                                             allow_fields=True)
    fields = bake_sweep_fields(specs, h, w)

    want = np.asarray(render_affine_sweep(
        jnp.asarray(mats), *(jnp.asarray(x) for x in parts), h, w,
        paints=kpaints, grad_mats=jnp.asarray(grad_mats),
        fields=fields))[:, :w]

    mesh = make_mesh(n_devices=8, axis_names=("dp", "tp"), tp=2)
    got = np.asarray(render_affine_sweep_tile_sharded(
        mesh, mats, parts, h, w, paints=kpaints, grad_mats=grad_mats,
        fields=fields))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    gu = got.view(np.uint8).reshape(*got.shape, 4)
    assert gu[..., 3].max() > 100  # content actually rendered


def test_tile_sharded_morph_sweeps_match_single_device():
    """Width-sharded morph sweep and combined morph+transform sweep:
    round 4 moved both to the kernels' x_shift scalar (subtracted AFTER
    the ratio lerp / the transform), so sharded outputs match single
    device EXACTLY on this corpus (the old piece/matrix-fold shifts
    re-rounded by one quantum)."""
    from swf_renderer_tpu.ops.morph import morph_pieces, render_morph_sweep
    from swf_renderer_tpu.ops.transform import (
        morph_affine_pieces, render_morph_affine_sweep,
    )
    from swf_renderer_tpu.parallel.mesh import (
        render_morph_affine_sweep_tile_sharded,
        render_morph_sweep_tile_sharded,
    )

    rng = np.random.default_rng(73)
    # 512 wide: 64-col shards align to the full-width 64-px column
    # block, so _tile_shard_layout mirrors the partition and the
    # combined sweep concatenates bit-exactly (32-col shards of a
    # 256-px frame cannot align and fall back to quantum-level).
    h, w = 40, 512
    es = rng.uniform((5, 5), (250, 35), (5, 2)).astype(np.float32)
    closed_s = np.concatenate([es, es[:1]])
    tbl_s = np.concatenate([closed_s[:-1], closed_s[1:]], axis=1)
    tbl_e = tbl_s + rng.uniform(-6, 6, tbl_s.shape).astype(np.float32)
    pairs = [(tbl_s, tbl_e, (1, 0, 0, 1), (0, 0.4, 1, 1))]
    mesh = make_mesh(n_devices=8, axis_names=("dp", "tp"), tp=2)

    def u8(pk):
        a = np.ascontiguousarray(np.asarray(pk))
        return a.view(np.uint8).reshape(*a.shape, 4)

    # Plain morph ratio sweep (device-space pieces, x_shift scalar).
    parts = morph_pieces(pairs)
    ratios = np.linspace(0, 1, 6, dtype=np.float32)
    want = np.asarray(render_morph_sweep(
        jnp.asarray(ratios), *(jnp.asarray(x) for x in parts),
        h, w))[:, :w]
    got = np.asarray(render_morph_sweep_tile_sharded(
        mesh, ratios, parts, h, w))
    np.testing.assert_array_equal(got, want)
    assert u8(got)[..., 3].max() > 100

    # Combined morph + transform sweep (local pieces + matrix fold).
    mats = []
    for i in range(6):
        th = 2 * np.pi * i / 24
        a, b = np.cos(th), np.sin(th)
        cx, cy = 128.0, 20.0
        mats.append((a, b, -b, a, cx - a * cx + b * cy,
                     cy - b * cx - a * cy))
    mats = np.asarray(mats, np.float32)
    mparts = morph_affine_pieces(pairs, mats)
    want2 = np.asarray(render_morph_affine_sweep(
        jnp.asarray(mats), jnp.asarray(ratios),
        *(jnp.asarray(x) for x in mparts), h, w))[:, :w]
    got2 = np.asarray(render_morph_affine_sweep_tile_sharded(
        mesh, mats, ratios, mparts, h, w))
    np.testing.assert_array_equal(got2, want2)
    assert u8(got2)[..., 3].max() > 100


def test_deep_passes_sharded_matches_multipass():
    """PASS-axis sharding (SURVEY §2.4's last axis): a 40-layer solid
    scene's <=16-layer passes render on separate devices and fold with
    the associative premul over.  Matches the single-device multipass
    chain within one u8 quantum (the fold applies each pass's keep
    product once instead of per layer — float rounding only)."""
    from swf_renderer_tpu.native.bindings import native_available
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.pipeline import render_batch_styled
    from swf_renderer_tpu.parallel.mesh import (
        make_mesh, render_deep_passes_sharded,
    )

    if not native_available():
        pytest.skip("native packer required")
    rng = np.random.default_rng(17)
    h, w = 48, 200
    n_layers, frames = 40, 2
    colors = rng.uniform(0.1, 1.0, (frames, n_layers, 4)).astype(
        np.float32)
    tables = []
    for f in range(frames):
        per = []
        for _ in range(n_layers):
            pts = rng.uniform(0, (w, h), (5, 2)).astype(np.float32)
            closed = np.concatenate([pts, pts[:1]])
            per.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
        tables.append(per)

    paints = [style_ops.solid_paint((1, 1, 1, 1))] * n_layers
    want = render_batch_styled(tables, paints, h, w, colors=colors)

    mesh = make_mesh(n_devices=8, tp=1)
    got = render_deep_passes_sharded(mesh, tables, colors, h, w)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    # The passes really were sharded: 40 layers over 8 devices = 5 each.
    assert mesh.shape["dp"] == 8


@pytest.mark.parametrize("seed", [3, 17, 45])
def test_tile_sharded_affine_sweep_exactness_fuzz(seed):
    """Randomized scenes through the x_shift tile sharding: with the
    full-width layout mirrored and aligned shard spans, the sharded
    output must be EXACTLY the single-device kernel's columns — the
    global-pixel-grid design makes this an invariant, not luck (the
    round-4 double-shift chunk-list bug was caught by exactly this
    assertion)."""
    from swf_renderer_tpu.ops.transform import (
        affine_pieces, render_affine_sweep,
    )
    from swf_renderer_tpu.parallel.mesh import (
        _tile_shard_layout, render_affine_sweep_tile_sharded,
    )

    rng = np.random.default_rng(seed)
    h = int(rng.integers(24, 72))
    w = int(rng.choice([512, 1024]))
    layers = int(rng.integers(1, 4))
    tables, colors = [], []
    for _ in range(layers):
        pts = rng.uniform((2, 2), (w - 2.0, h - 2.0),
                          (int(rng.integers(4, 9)), 2)).astype(np.float32)
        closed = np.concatenate([pts, pts[:1]])
        tables.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
        colors.append(tuple(rng.uniform(0.1, 1.0, 4)))
    f = int(rng.integers(2, 6))
    mats = []
    for i in range(f):
        th = rng.uniform(0, 2 * np.pi)
        s = rng.uniform(0.6, 1.4)
        a, b = s * np.cos(th), s * np.sin(th)
        cx, cy = w / 2.0, h / 2.0
        mats.append((a, b, -b, a, cx - a * cx + b * cy,
                     cy - b * cx - a * cy))
    mats = np.asarray(mats, np.float32)
    parts = affine_pieces(tables, colors, mats)
    ws = w // 8
    assert _tile_shard_layout(h, w, ws), "fuzz widths must align"
    want = np.asarray(render_affine_sweep(
        jnp.asarray(mats), *(jnp.asarray(x) for x in parts),
        h, w))[:, :w]
    mesh = make_mesh(n_devices=8, axis_names=("dp", "tp"), tp=2)
    got = np.asarray(render_affine_sweep_tile_sharded(
        mesh, mats, parts, h, w))
    np.testing.assert_array_equal(got, want)


def test_tile_sharded_affine_sweep_unaligned_fallback():
    """When shard spans don't align to the full-width column block
    (1920/8 = 240 vs wblock 128), _tile_shard_layout returns no
    overrides and the shard keeps its own layout: the x_shift global
    grid still holds every coordinate bit-identical, so the only
    residual is prefix/heavy partial-sum regrouping — within one
    premul-u8 quantum of single device."""
    from swf_renderer_tpu.ops.transform import (
        affine_pieces, render_affine_sweep,
    )
    from swf_renderer_tpu.parallel.mesh import (
        _tile_shard_layout, render_affine_sweep_tile_sharded,
    )

    rng = np.random.default_rng(19)
    h, w = 24, 1920
    assert not _tile_shard_layout(h, w, w // 8)
    pts = rng.uniform((4, 2), (1900.0, 22.0), (7, 2)).astype(np.float32)
    closed = np.concatenate([pts, pts[:1]])
    tables = [np.concatenate([closed[:-1], closed[1:]], axis=1)]
    mats = []
    for i in range(3):
        th = 2 * np.pi * i / 12
        a, b = np.cos(th), np.sin(th)
        cx, cy = 960.0, 12.0
        mats.append((a, b, -b, a, cx - a * cx + b * cy,
                     cy - b * cx - a * cy))
    mats = np.asarray(mats, np.float32)
    parts = affine_pieces(tables, [(0.9, 0.2, 0.1, 0.8)], mats)
    want = np.asarray(render_affine_sweep(
        jnp.asarray(mats), *(jnp.asarray(x) for x in parts),
        h, w))[:, :w]
    mesh = make_mesh(n_devices=8, axis_names=("dp", "tp"), tp=2)
    got = np.asarray(render_affine_sweep_tile_sharded(
        mesh, mats, parts, h, w))
    gu = got.view(np.uint8).reshape(*got.shape, 4).astype(np.int32)
    wu = want.view(np.uint8).reshape(*want.shape, 4).astype(np.int32)
    assert np.abs(gu - wu).max() <= 1
    assert gu[..., 3].max() > 100


def test_render_masked_dp_matches_single_device():
    """The dp-sharded group-composite program (masks + blends) is
    bit-identical to the single-device fused masked path — packing is
    frame-local, so sharding the frame axis changes nothing."""
    from swf_renderer_tpu.ops.pipeline import render_batch_styled
    from swf_renderer_tpu.ops.style import solid_paint
    from swf_renderer_tpu.parallel.mesh import render_masked_dp

    rng = np.random.default_rng(11)
    f, h, w = 8, 48, 160
    mask_rect = np.array(
        [[10, 0, 100, 0], [100, 0, 100, h], [100, h, 10, h],
         [10, h, 10, 0]], np.float32)

    def blob():
        pts = rng.uniform(0, (w, h), size=(6, 2)).astype(np.float32)
        closed = np.concatenate([pts, pts[:1]])
        return np.concatenate([closed[:-1], closed[1:]], axis=1)

    edge_tables = [[blob(), mask_rect, blob(), blob()] for _ in range(f)]
    paints = [solid_paint((0.9, 0.2, 0.2, 1.0)),
              solid_paint((1.0, 1.0, 1.0, 1.0)),
              solid_paint((0.2, 0.4, 0.9, 0.7)),
              solid_paint((0.1, 0.8, 0.3, 0.5))]
    colors = np.stack([np.stack([p.color for p in paints])
                       for _ in range(f)]).astype(np.float32)
    from swf_renderer_tpu.ops.filters import BlurFilter

    tree = [("draw", 0),
            ("mask", [1], [("draw", 2),
                           ("blend", "multiply", [("draw", 3)])]),
            ("filter", (BlurFilter(blur_x=4.0, blur_y=3.0, passes=2),),
             [("draw", 0)])]

    want = render_batch_styled(edge_tables, paints, h, w, colors=colors,
                               mask_tree=tree)
    mesh = make_mesh(n_devices=8, axis_names=("dp", "tp"), tp=1)
    got = render_masked_dp(mesh, edge_tables, paints, h, w, colors, tree)
    np.testing.assert_array_equal(got, want)


def test_render_masked_dp_fused_pass_matches_single_device():
    """Plain-draw mask content routes through the FUSED mask-group
    kernel pass on BOTH the single-device executor and the dp shards
    (round 5) — the sharded program must stay bit-identical."""
    from swf_renderer_tpu.ops.pipeline import render_batch_styled
    from swf_renderer_tpu.ops.style import solid_paint
    from swf_renderer_tpu.parallel.mesh import render_masked_dp

    rng = np.random.default_rng(13)
    f, h, w = 8, 48, 160
    mask_rect = np.array(
        [[10, 0, 100, 0], [100, 0, 100, h], [100, h, 10, h],
         [10, h, 10, 0]], np.float32)

    def blob():
        pts = rng.uniform(0, (w, h), size=(6, 2)).astype(np.float32)
        closed = np.concatenate([pts, pts[:1]])
        return np.concatenate([closed[:-1], closed[1:]], axis=1)

    edge_tables = [[blob(), mask_rect, blob(), blob()] for _ in range(f)]
    paints = [solid_paint((0.9, 0.2, 0.2, 1.0)),
              solid_paint((1.0, 1.0, 1.0, 1.0)),
              solid_paint((0.2, 0.4, 0.9, 0.7)),
              solid_paint((0.1, 0.8, 0.3, 0.5))]
    colors = np.stack([np.stack([p.color for p in paints])
                       for _ in range(f)]).astype(np.float32)
    # Plain draws inside the mask: the fusible shape.
    tree = [("draw", 0),
            ("mask", [1], [("draw", 2), ("draw", 3)])]

    want = render_batch_styled(edge_tables, paints, h, w, colors=colors,
                               mask_tree=tree)
    mesh = make_mesh(n_devices=8, axis_names=("dp", "tp"), tp=1)
    got = render_masked_dp(mesh, edge_tables, paints, h, w, colors, tree)
    np.testing.assert_array_equal(got, want)
