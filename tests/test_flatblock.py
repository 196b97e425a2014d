"""Flat-block pipeline correctness vs the scatter pipeline + numpy oracle.

Placement (K1) must reproduce the scatter's delta planes BIT-EXACTLY
(one-hot factors and split values are exact in bf16).  The resolve (K2)
sums the prefix in a different (still deterministic) order, so frames are
compared bit-exactly on dyadic-valued planes and within 1 u8 step on
arbitrary float data.
"""

import numpy as np
import pytest

from swf_renderer_tpu.ops import scanline as sl
from swf_renderer_tpu.ops.flatblock import (
    BLK, LANE, STRIP_H, frames_u32_to_u8, pack_flat_blocks, place_blocks,
    plane_geometry, render_flat_blocks, resolve_planes_u32,
)
from swf_renderer_tpu.ops.resolve import pack_updates, render_scanline_updates


def random_scene(frames, layers, height, width, seed=0, n_pts=8):
    rng = np.random.default_rng(seed)
    update_lists = []
    colors = np.zeros((frames, layers, 4), np.float32)
    for i in range(frames):
        per = []
        for j in range(layers):
            pts = rng.uniform(0, (width, height), size=(n_pts, 2)).astype(
                np.float32)
            closed = np.concatenate([pts, pts[:1]])
            edges = np.concatenate([closed[:-1], closed[1:]], axis=1)
            r, c, a, v = sl.edges_to_cells(edges, height, width)
            rows = np.concatenate([r, r])
            cols = np.concatenate([c, c + 1])
            vals = np.concatenate([a, v - a]).astype(np.float32)
            # Coalesce duplicates (the native splitter's delta output is
            # coalesced; emulate in numpy).
            key = rows.astype(np.int64) * (width + 2) + cols
            order = np.argsort(key, kind="stable")
            key, rows, cols, vals = (key[order], rows[order], cols[order],
                                     vals[order])
            uniq, inv = np.unique(key, return_inverse=True)
            acc = np.zeros(len(uniq), np.float32)
            np.add.at(acc, inv, vals)
            rows = (uniq // (width + 2)).astype(np.int32)
            cols = (uniq % (width + 2)).astype(np.int32)
            per.append((rows, cols, acc))
            colors[i, j] = rng.uniform(0.1, 1.0, size=4)
        update_lists.append(per)
    return update_lists, colors


def scatter_oracle(update_lists, height, width):
    stride, n_chunks, n_strips = plane_geometry(height, width)
    f, l = len(update_lists), len(update_lists[0])
    planes = np.zeros((f, l, n_strips * STRIP_H, stride), np.float32)
    for i in range(f):
        for j in range(l):
            rows, cols, vals = update_lists[i][j]
            m = cols < stride  # production packers drop right-of-frame
            np.add.at(planes[i, j], (rows[m], cols[m]), vals[m])
    return planes


def chunkmajor_to_rows(planes_cm, n_chunks):
    """(F, L, NS+1, 128, 128) -> (F, L, NS*8, stride)."""
    f, l, ns1, _, _ = planes_cm.shape
    ns = ns1 - 1
    x = planes_cm[:, :, :ns, : n_chunks * STRIP_H].reshape(
        f, l, ns, n_chunks, STRIP_H, LANE)
    x = np.moveaxis(x, 3, 4)  # (f, l, ns, 8, n_chunks, 128)
    return x.reshape(f, l, ns * STRIP_H, n_chunks * LANE)


def test_placement_bit_exact():
    frames, layers, height, width = 2, 3, 32, 200
    update_lists, _ = random_scene(frames, layers, height, width, seed=1)
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
        update_lists, height, width, block_pad_multiple=8)
    planes_cm = np.asarray(place_blocks(
        sidx, keep, urc, ucm, uval, frames, layers, ns, step=False))
    got = chunkmajor_to_rows(planes_cm, nc)
    want = scatter_oracle(update_lists, height, width)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_placement_step_prefix():
    # step=True planes = scatter planes cumsummed WITHIN each 128-col chunk.
    frames, layers, height, width = 1, 2, 24, 300
    update_lists, _ = random_scene(frames, layers, height, width, seed=4)
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
        update_lists, height, width, block_pad_multiple=8)
    planes_cm = np.asarray(place_blocks(
        sidx, keep, urc, ucm, uval, frames, layers, ns, step=True))
    got = chunkmajor_to_rows(planes_cm, nc)
    raw = scatter_oracle(update_lists, height, width)
    want = np.concatenate(
        [np.cumsum(c, axis=-1, dtype=np.float32)
         for c in np.split(raw, nc, axis=-1)], axis=-1)
    # Summation order within a chunk (MXU accumulation) can differ from
    # sequential cumsum in the last bit; require <= 1 ulp-scale agreement.
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-6)


def test_full_pipeline_matches_scatter_pipeline():
    frames, layers, height, width = 2, 3, 40, 300
    update_lists, colors = random_scene(frames, layers, height, width,
                                        seed=2)
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
        update_lists, height, width)
    out32 = np.asarray(render_flat_blocks(
        sidx, keep, urc, ucm, uval, colors, height, width,
        frames, layers, ns, nc))
    got = frames_u32_to_u8(out32, height, width)

    flat = [update_lists[i][j] for i in range(frames) for j in range(layers)]
    rows, cols, vals = pack_updates(flat)
    rows = rows.reshape(frames, layers, -1)
    cols = cols.reshape(frames, layers, -1)
    vals = vals.reshape(frames, layers, -1)
    want = np.asarray(render_scanline_updates(
        rows, cols, vals, colors, height, width))
    assert got.shape == want.shape
    # Prefix-sum association differs; u8 results may differ by 1 on
    # knife-edge values only.
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_resolve_u32_bit_exact_on_dyadic():
    # Dyadic plane values (multiples of 1/64 in [-2, 2]) make every prefix
    # summation order exact in f32 -> the packed u32 frames must match the
    # existing resolve kernel + u8 conversion BITWISE.
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.composite import premul_to_straight_u8
    from swf_renderer_tpu.ops.resolve import resolve_frames

    rng = np.random.default_rng(3)
    f, l, ns, nc = 2, 2, 3, 2
    planes = np.zeros((f, l, ns + 1, LANE, LANE), np.float32)
    planes[:, :, :ns] = (
        rng.integers(-128, 129, size=(f, l, ns, LANE, LANE)) / 64.0
    )
    colors = rng.uniform(0.2, 1.0, size=(f, l, 4)).astype(np.float32)
    colors = (np.round(colors * 255) / 255).astype(np.float32)

    out = np.asarray(resolve_planes_u32(
        jnp.asarray(planes), jnp.asarray(colors), nc, prefixed=False))
    got = frames_u32_to_u8(out, ns * STRIP_H, nc * LANE)

    rowplanes = chunkmajor_to_rows(planes, nc)
    pm = resolve_frames(jnp.asarray(rowplanes), jnp.asarray(colors))
    want = np.asarray(premul_to_straight_u8(jnp.moveaxis(pm, 1, -1)))
    np.testing.assert_array_equal(got, want)


def test_native_packer_matches_python_oracle():
    from swf_renderer_tpu.native.bindings import (
        native_available, pack_blocks_native,
    )

    if not native_available():
        pytest.skip("native library unavailable")
    update_lists, _ = random_scene(3, 4, 64, 500, seed=9)
    a = pack_flat_blocks(update_lists, 64, 500, block_pad_multiple=16)
    b = pack_blocks_native(update_lists, 64, 500, block_pad_multiple=16)
    for x, y in zip(a, b):
        if isinstance(x, np.ndarray):
            assert x.dtype == y.dtype and x.shape == y.shape
            np.testing.assert_array_equal(x, y)
        else:
            assert x == y


def test_pack_rejects_wide_framebuffers():
    # Hard cap is 64 chunks (width 8191); 4K packs fine on the grown plane.
    with pytest.raises(ValueError):
        pack_flat_blocks([[(np.zeros(0, np.int32),) * 3]], 8, 9000)


def test_empty_groups_zeroed():
    # A scene with zero updates everywhere still produces fully
    # transparent frames (empty groups emit explicit zero blocks).
    frames, layers, height, width = 1, 2, 16, 100
    empty = [[(np.zeros(0, np.int32), np.zeros(0, np.int32),
               np.zeros(0, np.float32)) for _ in range(layers)]]
    colors = np.full((frames, layers, 4), 0.7, np.float32)
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
        empty, height, width, block_pad_multiple=4)
    out = np.asarray(render_flat_blocks(
        sidx, keep, urc, ucm, uval, colors, height, width,
        frames, layers, ns, nc))
    assert (out == 0).all()


def test_render_batch_flatblock_api():
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.pipeline import render_batch_flatblock
    from swf_renderer_tpu.ops.resolve import (
        pack_updates, render_scanline_updates,
    )

    rng = np.random.default_rng(11)
    frames, layers, height, width = 2, 2, 48, 260
    tables = []
    colors = np.zeros((frames, layers, 4), np.float32)
    for i in range(frames):
        per = []
        for j in range(layers):
            pts = rng.uniform(0, (width, height), size=(7, 2)).astype(
                np.float32)
            closed = np.concatenate([pts, pts[:1]])
            per.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
            colors[i, j] = rng.uniform(0.2, 1.0, size=4)
        tables.append(per)

    got = render_batch_flatblock(tables, colors, height, width)
    assert got.shape == (frames, height, width, 4)
    assert got.dtype == np.uint8

    update_lists, _ = random_scene(frames, layers, height, width)  # shape only
    # Reference: scatter pipeline over the same lowered updates.
    from swf_renderer_tpu.ops import scanline as sl
    flat = []
    for i in range(frames):
        for j in range(layers):
            r, c, a, v = sl.edges_to_cells(tables[i][j], height, width)
            rows = np.concatenate([r, r])
            cols = np.concatenate([c, c + 1])
            vals = np.concatenate([a, v - a]).astype(np.float32)
            key = rows.astype(np.int64) * (width + 2) + cols
            order = np.argsort(key, kind="stable")
            key, rows, cols, vals = (key[order], rows[order], cols[order],
                                     vals[order])
            uniq, inv = np.unique(key, return_inverse=True)
            acc = np.zeros(len(uniq), np.float32)
            np.add.at(acc, inv, vals)
            flat.append(((uniq // (width + 2)).astype(np.int32),
                         (uniq % (width + 2)).astype(np.int32), acc))
    rows, cols, vals = pack_updates(flat)
    want = np.asarray(render_scanline_updates(
        jnp.asarray(rows.reshape(frames, layers, -1)),
        jnp.asarray(cols.reshape(frames, layers, -1)),
        jnp.asarray(vals.reshape(frames, layers, -1)),
        jnp.asarray(colors), height, width))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1


def test_resolve_dma_matches_grid_resolve():
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.flatblock import resolve_planes_u32_dma

    frames, layers, height, width = 2, 3, 40, 300
    update_lists, colors = random_scene(frames, layers, height, width,
                                        seed=5)
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
        update_lists, height, width)
    planes = place_blocks(sidx, keep, urc, ucm, uval, frames, layers, ns,
                          step=True)
    want = np.asarray(resolve_planes_u32(planes, jnp.asarray(colors), nc))
    got = np.asarray(resolve_planes_u32_dma(planes, jnp.asarray(colors), nc))
    np.testing.assert_array_equal(got, want)


def test_fused_kernel_matches_two_kernel_pipeline():
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.flatblock import (
        render_fused_blocks, sort_blocks_fused,
    )

    frames, layers, height, width = 2, 3, 40, 300
    update_lists, colors = random_scene(frames, layers, height, width,
                                        seed=6)
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
        update_lists, height, width, block_pad_multiple=8)
    want32 = np.asarray(render_flat_blocks(
        sidx, keep, urc, ucm, uval, colors, height, width,
        frames, layers, ns, nc))
    want = frames_u32_to_u8(want32, height, width)

    si, ke, la, rc, cm, uv = sort_blocks_fused(sidx, keep, urc, ucm, uval,
                                               layers, ns)
    out = np.asarray(render_fused_blocks(
        jnp.asarray(si), jnp.asarray(ke), jnp.asarray(la),
        jnp.asarray(rc), jnp.asarray(cm), jnp.asarray(uv),
        jnp.asarray(colors), frames, layers, ns, nc))
    got32 = out[:, :ns].reshape(frames, ns * 8, nc * LANE)
    got = frames_u32_to_u8(got32, height, width)
    # The fused kernel composites in suffix-product form (different float
    # association than the sequential over chain): off-by-one u8 allowed
    # on knife-edge values only.
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_fusedn_groups_match_fused():
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.flatblock import (
        group_blocks_fused, render_fused_blocks, render_fused_blocksn,
        sort_blocks_fused,
    )

    frames, layers, height, width = 2, 3, 40, 300
    update_lists, colors = random_scene(frames, layers, height, width,
                                        seed=8)
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
        update_lists, height, width, block_pad_multiple=8)
    si, ke, la, rc, cm, uv = sort_blocks_fused(sidx, keep, urc, ucm, uval,
                                               layers, ns,
                                               block_pad_multiple=8)
    want = np.asarray(render_fused_blocks(
        jnp.asarray(si), jnp.asarray(ke), jnp.asarray(la),
        jnp.asarray(rc), jnp.asarray(cm), jnp.asarray(uv),
        jnp.asarray(colors), frames, layers, ns, nc))[:, :ns]

    for group in (2, 4):
        gsi, gfl, gla, grc, gcm, gvv = group_blocks_fused(
            si, ke, la, rc, cm, uv, layers, ns, group=group,
            group_pad_multiple=4)
        got = np.asarray(render_fused_blocksn(
            jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
            jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
            jnp.asarray(colors), frames, layers, ns, nc,
            group=group))[:, :ns]
        np.testing.assert_array_equal(got, want)


def test_render_batch_flatblock_blank_scene():
    from swf_renderer_tpu.ops.pipeline import render_batch_flatblock

    # Degenerate zero-length edges -> no coverage anywhere.
    t = np.zeros((4, 4), np.float32)
    colors = np.full((1, 2, 4), 0.5, np.float32)
    out = render_batch_flatblock([[t, t]], colors, 24, 150)
    assert out.shape == (1, 24, 150, 4)
    assert (out == 0).all()


def test_pack_grouped_native_matches_python_chain():
    import jax.numpy as jnp

    from swf_renderer_tpu.native.bindings import (
        native_available, pack_grouped_native,
    )
    from swf_renderer_tpu.ops.flatblock import (
        group_blocks_fused, render_fused_blocksn, sort_blocks_fused,
    )

    if not native_available():
        pytest.skip("native library unavailable")
    frames, layers, height, width = 2, 3, 40, 300
    for seed in (1, 8):
        ul, colors = random_scene(frames, layers, height, width, seed=seed)
        sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
            ul, height, width, block_pad_multiple=1)
        blocks = sort_blocks_fused(sidx, keep, urc, ucm, uval, layers, ns,
                                   block_pad_multiple=1)
        for group in (2, 8):
            a = group_blocks_fused(*blocks, layers, ns, group=group,
                                   group_pad_multiple=4)
            gsi, gfl, gla, grc, gcm, gvv, nsb, ncb = pack_grouped_native(
                ul, height, width, group=group, group_pad_multiple=4)
            assert (nsb, ncb) == (ns, nc)
            ns1 = ns + 1
            # gsi layer encoding may differ; the kernel reads only (f, s).
            np.testing.assert_array_equal(a[0] // (layers * ns1),
                                          gsi // (layers * ns1))
            np.testing.assert_array_equal(a[0] % ns1, gsi % ns1)
            np.testing.assert_array_equal(a[1], gfl)
            np.testing.assert_array_equal(a[2], gla)
            np.testing.assert_array_equal(a[3], grc.reshape(a[3].shape))
            np.testing.assert_array_equal(a[4], gcm.reshape(a[4].shape))
            np.testing.assert_array_equal(a[5], gvv.reshape(a[5].shape))
            want = np.asarray(render_fused_blocksn(
                *(jnp.asarray(x) for x in a), jnp.asarray(colors),
                frames, layers, ns, nc, group=group))
            got = np.asarray(render_fused_blocksn(
                jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
                jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
                jnp.asarray(colors), frames, layers, ns, nc, group=group))
            np.testing.assert_array_equal(got, want)


def test_packed_scene_cache_roundtrip(tmp_path):
    from swf_renderer_tpu.ops.pipeline import render_batch_flatblock
    from swf_renderer_tpu.runtime.cache import PackedSceneCache

    rng = np.random.default_rng(21)
    frames, layers, height, width = 2, 2, 32, 200
    tables = []
    colors = rng.uniform(0.2, 1.0, (frames, layers, 4)).astype(np.float32)
    for _ in range(frames):
        per = []
        for _ in range(layers):
            pts = rng.uniform(0, (width, height), (6, 2)).astype(np.float32)
            closed = np.concatenate([pts, pts[:1]])
            per.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
        tables.append(per)

    cache = PackedSceneCache(directory=tmp_path)
    miss = render_batch_flatblock(tables, colors, height, width, cache=cache)
    assert cache.misses == 1 and cache.hits == 0
    hit = render_batch_flatblock(tables, colors, height, width, cache=cache)
    assert cache.hits == 1
    np.testing.assert_array_equal(miss, hit)
    # Disk round trip: a fresh cache instance reloads the persisted entry.
    cold = PackedSceneCache(directory=tmp_path)
    from_disk = render_batch_flatblock(tables, colors, height, width,
                                       cache=cold)
    assert cold.hits == 1 and cold.misses == 0
    np.testing.assert_array_equal(miss, from_disk)


def test_wide_frame_fusedn_matches_scatter():
    """Width > 2047 runs the flagship kernel on a grown (256, 128) plane
    (one extra carry-ladder step) instead of falling back to the scatter
    pipeline; output matches the scatter oracle within u8 rounding."""
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.flatblock import (
        group_blocks_fused, plane_rows_for, render_fused_blocksn,
        sort_blocks_fused,
    )

    frames, layers, height, width = 1, 2, 24, 3000
    update_lists, colors = random_scene(frames, layers, height, width,
                                        seed=17)
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
        update_lists, height, width, block_pad_multiple=1)
    assert plane_rows_for(nc) == 256
    blocks = sort_blocks_fused(sidx, keep, urc, ucm, uval, layers, ns,
                               block_pad_multiple=1)
    gsi, gfl, gla, grc, gcm, gvv = group_blocks_fused(
        *blocks, layers, ns, group=4, group_pad_multiple=4)
    out = np.asarray(render_fused_blocksn(
        jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
        jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
        jnp.asarray(colors), frames, layers, ns, nc, group=4))
    got = frames_u32_to_u8(
        out[:, :ns].reshape(frames, ns * 8, nc * LANE), height, width)

    flat = [update_lists[i][j] for i in range(frames)
            for j in range(layers)]
    rows, cols, vals = pack_updates(flat)
    want = np.asarray(render_scanline_updates(
        rows.reshape(frames, layers, -1), cols.reshape(frames, layers, -1),
        vals.reshape(frames, layers, -1), colors, height, width))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1


def test_multi_strip_planes_match_single():
    """Narrow frames pack several strips per plane (strips_per_plane);
    output is bit-identical to the one-strip layout."""
    import jax.numpy as jnp

    from swf_renderer_tpu.native.bindings import (
        native_available, pack_grouped_native,
    )
    from swf_renderer_tpu.ops.flatblock import (
        render_fused_blocksn, strips_per_plane,
    )

    if not native_available():
        pytest.skip("native library unavailable")
    frames, layers, height, width = 2, 2, 48, 250
    update_lists, colors = random_scene(frames, layers, height, width,
                                        seed=23)
    _, nc, ns = plane_geometry(height, width)
    spp = strips_per_plane(nc, ns)
    assert spp > 1  # 250 px wide -> 3 chunks -> 5 strips per plane

    g1 = pack_grouped_native(update_lists, height, width, group=4,
                             group_pad_multiple=4, spp=1)
    base = np.asarray(render_fused_blocksn(
        *(jnp.asarray(x) for x in g1[:6]), jnp.asarray(colors),
        frames, layers, g1[6], g1[7], group=4))
    want = frames_u32_to_u8(
        base[:, :g1[6]].reshape(frames, g1[6] * 8, nc * LANE),
        height, width)

    gs = pack_grouped_native(update_lists, height, width, group=4,
                             group_pad_multiple=4, spp=spp)
    nsb = gs[6]
    assert nsb == -(-ns // spp)
    out = np.asarray(render_fused_blocksn(
        *(jnp.asarray(x) for x in gs[:6]), jnp.asarray(colors),
        frames, layers, nsb, gs[7], group=4, spp=spp))
    got = frames_u32_to_u8(
        out[:, :nsb].reshape(frames, nsb * spp * 8, nc * LANE),
        height, width)
    np.testing.assert_array_equal(got, want)


def test_render_batch_flatblock_narrow_uses_spp():
    from swf_renderer_tpu.ops.pipeline import render_batch_flatblock

    rng = np.random.default_rng(29)
    frames, layers, height, width = 3, 2, 40, 200
    tables = []
    colors = rng.uniform(0.2, 1.0, (frames, layers, 4)).astype(np.float32)
    for _ in range(frames):
        per = []
        for _ in range(layers):
            pts = rng.uniform(0, (width, height), (6, 2)).astype(np.float32)
            closed = np.concatenate([pts, pts[:1]])
            per.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
        tables.append(per)
    got = render_batch_flatblock(tables, colors, height, width)
    assert got.shape == (frames, height, width, 4)

    flat = [(r, c, v) for per in tables for (r, c, v) in ()]
    # Oracle: the scatter pipeline over the same lowered updates.
    from swf_renderer_tpu.ops import scanline as sl
    from swf_renderer_tpu.ops.resolve import (
        pack_updates, render_scanline_updates,
    )
    flat = []
    for per in tables:
        for t in per:
            r, c, a, v = sl.edges_to_cells(t, height, width)
            rows = np.concatenate([r, r])
            cols = np.concatenate([c, c + 1])
            vals = np.concatenate([a, v - a]).astype(np.float32)
            key = rows.astype(np.int64) * (width + 2) + cols
            order = np.argsort(key, kind="stable")
            uniq, inv = np.unique(key[order], return_inverse=True)
            acc = np.zeros(len(uniq), np.float32)
            np.add.at(acc, inv, vals[order])
            flat.append(((uniq // (width + 2)).astype(np.int32),
                         (uniq % (width + 2)).astype(np.int32), acc))
    rows, cols, vals = pack_updates(flat)
    want = np.asarray(render_scanline_updates(
        rows.reshape(frames, layers, -1), cols.reshape(frames, layers, -1),
        vals.reshape(frames, layers, -1), colors, height, width))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1


def test_parallel_pack_and_split_bit_identical():
    """The thread-pooled host lowering (forced multi-worker) must produce
    byte-identical arrays to the sequential path — frames write at exact
    count offsets (swf_pack_grouped_count), no ordering effects."""
    from swf_renderer_tpu.native.bindings import (
        native_available, pack_grouped_native,
    )
    from swf_renderer_tpu.ops.flatblock import strips_per_plane
    from swf_renderer_tpu.ops.pipeline import lower_update_lists

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    height, width = 96, 320
    tables = []
    for _ in range(5):
        per = []
        for _ in range(3):
            pts = rng.uniform(0, (width, height), (7, 2)).astype(np.float32)
            closed = np.concatenate([pts, pts[:1]])
            per.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
        tables.append(per)

    seq = lower_update_lists(tables, height, width, max_workers=1)
    par = lower_update_lists(tables, height, width, max_workers=4)
    for a, b in zip([u for f in seq for u in f],
                    [u for f in par for u in f]):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)

    _, nc, ns = plane_geometry(height, width)
    for spp in (1, strips_per_plane(nc, ns)):
        a = pack_grouped_native(seq, height, width, group=6, spp=spp,
                                max_workers=1)
        b = pack_grouped_native(seq, height, width, group=6, spp=spp,
                                max_workers=4)
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_wide_two_strip_planes_match_single():
    """Wide frames (64 < nc8 <= 128, e.g. 1080p's 120) pack TWO strips
    into a 256-row plane (round 4): output is bit-identical to the
    one-strip layout."""
    import jax.numpy as jnp

    from swf_renderer_tpu.native.bindings import (
        native_available, pack_grouped_native,
    )
    from swf_renderer_tpu.ops.flatblock import (
        render_fused_blocksn, strips_per_plane,
    )

    if not native_available():
        pytest.skip("native library unavailable")
    frames, layers, height, width = 2, 2, 56, 1100
    update_lists, colors = random_scene(frames, layers, height, width,
                                        seed=31)
    _, nc, ns = plane_geometry(height, width)
    spp = strips_per_plane(nc, ns)
    assert spp == 2  # 1100 px -> 9 chunks -> nc8 = 72 -> two strips

    g1 = pack_grouped_native(update_lists, height, width, group=4,
                             group_pad_multiple=4, spp=1)
    base = np.asarray(render_fused_blocksn(
        *(jnp.asarray(x) for x in g1[:6]), jnp.asarray(colors),
        frames, layers, g1[6], g1[7], group=4))
    want = frames_u32_to_u8(
        base[:, :g1[6]].reshape(frames, g1[6] * 8, nc * LANE),
        height, width)

    gs = pack_grouped_native(update_lists, height, width, group=4,
                             group_pad_multiple=4, spp=spp)
    nsb = gs[6]
    assert nsb == -(-ns // spp)
    out = np.asarray(render_fused_blocksn(
        *(jnp.asarray(x) for x in gs[:6]), jnp.asarray(colors),
        frames, layers, nsb, gs[7], group=4, spp=spp))
    got = frames_u32_to_u8(
        out[:, :nsb].reshape(frames, nsb * spp * 8, nc * LANE),
        height, width)
    np.testing.assert_array_equal(got, want)


def test_lane_multiple_width_drops_overflow_cols():
    """Widths that are exact LANE multiples shrink the plane by one whole
    chunk (round 4: stride rounds width, not width+1): col == width
    updates are pure right-of-frame cancellations and the packers drop
    them.  Pin (a) the geometry, (b) exactness vs the scanline-scatter
    pipeline on full-bleed geometry that emits col-width updates, and
    (c) native packer == python oracle after the drop."""
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.pipeline import (
        lower_update_lists, render_batch_flatblock,
    )

    height, width = 256, 256
    stride, nc, ns = plane_geometry(height, width)
    assert (stride, nc) == (256, 2)
    # The shrink is spp-gated: at 1080p it buys nothing (spp 2 either
    # way) and measured -14%, so the old width+1 rounding is kept there.
    assert plane_geometry(1080, 1920)[1] == 16
    assert plane_geometry(40, 256)[1] == 3  # spp capped by 5 strips

    frames, layers = 2, 2
    tables = []
    rng = np.random.default_rng(5)
    for _ in range(frames):
        per = []
        for lyr in range(layers):
            tris = []
            for _ in range(3):
                p = rng.uniform([-20, -20], [width + 20, height + 20],
                                (3, 2)).astype(np.float32)
                tris += [[*p[0], *p[1]], [*p[1], *p[2]], [*p[2], *p[0]]]
            if lyr == 0:  # full-bleed rect: right edge exactly at x=width
                tris += [[0, 0, width, 0], [width, 0, width, height],
                         [width, height, 0, height], [0, height, 0, 0]]
            per.append(np.array(tris, np.float32))
        tables.append(per)
    colors = rng.uniform(0.1, 1.0, (frames, layers, 4)).astype(np.float32)

    update_lists = lower_update_lists(tables, height, width)
    assert max(int(np.max(u[1])) for pf in update_lists for u in pf
               if len(u[1])) == width  # the col == width updates exist

    got = render_batch_flatblock(tables, colors, height, width)
    rows, cols, vals = pack_updates(
        [u for pf in update_lists for u in pf])
    want = np.asarray(render_scanline_updates(
        jnp.asarray(rows.reshape(frames, layers, -1)),
        jnp.asarray(cols.reshape(frames, layers, -1)),
        jnp.asarray(vals.reshape(frames, layers, -1)),
        jnp.asarray(colors), height, width))
    np.testing.assert_array_equal(got, want)

    from swf_renderer_tpu.native.bindings import (
        native_available, pack_grouped_native,
    )
    from swf_renderer_tpu.ops.flatblock import (
        group_blocks_fused, sort_blocks_fused,
    )

    if native_available():
        g = pack_grouped_native(update_lists, height, width, group=4,
                                group_pad_multiple=4)
        sidx, keep, urc, ucm, uval, ns2, nc2 = pack_flat_blocks(
            update_lists, height, width, block_pad_multiple=1)
        blocks = sort_blocks_fused(sidx, keep, urc, ucm, uval, layers, ns2,
                                   block_pad_multiple=1)
        py = group_blocks_fused(*blocks, layers, ns2, group=4,
                                group_pad_multiple=4)
        for a, b in zip(g[:6], py):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
