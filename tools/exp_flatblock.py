"""Measure the flat-block pipeline vs the scatter pipeline at bench scale."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_scene_edges, _enable_compile_cache
from swf_renderer_tpu.native.bindings import cells_split_delta_native
from swf_renderer_tpu.ops.flatblock import (
    frames_u32_to_u8, pack_flat_blocks, place_blocks, resolve_planes_u32,
    render_flat_blocks,
)
from swf_renderer_tpu.ops.resolve import pack_updates, render_scanline_updates

_enable_compile_cache()

FRAMES, LAYERS, H, W = 60, 4, 1088, 1920


def main():
    t0 = time.time()
    tables, colors = build_scene_edges(FRAMES, LAYERS, H, W)
    ups = [[cells_split_delta_native(tables[i][j], H, W)
            for j in range(LAYERS)] for i in range(FRAMES)]
    print(f"host geometry+split: {time.time()-t0:.2f}s")

    t0 = time.time()
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(ups, H, W)
    print(f"host pack_flat_blocks: {time.time()-t0:.2f}s, "
          f"NB={len(sidx)} blocks ({len(sidx)*128} slots)")

    colors_j = jnp.asarray(colors)
    args = tuple(map(jnp.asarray, (sidx, keep, urc, ucm, uval)))

    which = set(sys.argv[1:]) or {"new", "k1", "k2"}

    if "new" in which:
        def run_new():
            out = render_flat_blocks(*args, colors_j, H, W,
                                     FRAMES, LAYERS, ns, nc)
            return float(jnp.sum(out.astype(jnp.float32) % 255))
        cs = run_new()  # compile
        ts = []
        for _ in range(4):
            t0 = time.time()
            cs = run_new()
            ts.append(time.time() - t0)
        t = min(ts)
        px = FRAMES * H * W
        print(f"[new] flat-block pipeline: {t*1e3:.1f} ms  "
              f"{px/t/1e9:.2f} Gpx/s  csum={cs:.3e}")

    if "k1" in which:
        def run_k1():
            p = place_blocks(*args, FRAMES, LAYERS, ns)
            return float(jnp.sum(p[0, 0, 0]))
        run_k1()
        ts = []
        for _ in range(4):
            t0 = time.time()
            run_k1()
            ts.append(time.time() - t0)
        print(f"[k1] placement alone: {min(ts)*1e3:.1f} ms "
              f"({min(ts)/len(sidx)*1e9:.0f} ns/block)")

    if "k2" in which:
        planes = place_blocks(*args, FRAMES, LAYERS, ns)
        planes.block_until_ready()

        def run_k2():
            out = resolve_planes_u32(planes, colors_j, nc)
            return float(jnp.sum(out.astype(jnp.float32) % 255))
        run_k2()
        ts = []
        for _ in range(4):
            t0 = time.time()
            run_k2()
            ts.append(time.time() - t0)
        t = min(ts)
        px = FRAMES * H * W
        print(f"[k2] resolve alone: {t*1e3:.1f} ms ({px/t/1e9:.2f} Gpx/s)")

    if "old" in which:
        flat = [ups[i][j] for i in range(FRAMES) for j in range(LAYERS)]
        rows, cols, vals = pack_updates(flat)
        rows = jnp.asarray(rows.reshape(FRAMES, LAYERS, -1))
        cols = jnp.asarray(cols.reshape(FRAMES, LAYERS, -1))
        vals = jnp.asarray(vals.reshape(FRAMES, LAYERS, -1))

        def run_old():
            out = render_scanline_updates(rows, cols, vals, colors_j, H, W)
            return float(jnp.sum(out.astype(jnp.float32) % 255))
        run_old()
        ts = []
        for _ in range(4):
            t0 = time.time()
            run_old()
            ts.append(time.time() - t0)
        t = min(ts)
        px = FRAMES * H * W
        print(f"[old] scatter pipeline: {t*1e3:.1f} ms "
              f"({px/t/1e9:.2f} Gpx/s)")

    if "check" in which:
        out32 = np.asarray(render_flat_blocks(*args, colors_j, H, W,
                                              FRAMES, LAYERS, ns, nc))
        got = frames_u32_to_u8(out32, H, W)
        flat = [ups[i][j] for i in range(FRAMES) for j in range(LAYERS)]
        rows, cols, vals = pack_updates(flat)
        want = np.asarray(render_scanline_updates(
            jnp.asarray(rows.reshape(FRAMES, LAYERS, -1)),
            jnp.asarray(cols.reshape(FRAMES, LAYERS, -1)),
            jnp.asarray(vals.reshape(FRAMES, LAYERS, -1)),
            colors_j, H, W))
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        print(f"[check] on-chip u8 diff: max={diff.max()} "
              f"frac>0={(diff > 0).mean():.2e}")


if __name__ == "__main__":
    main()
