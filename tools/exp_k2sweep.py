"""Sweep K2 strips_per_step; also time K1+K2 chained (sustained, no tunnel
latency floor): t_sustained = (t(K2reps) - t(K1rep)) / (K2reps - K1rep)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_scene_edges, _enable_compile_cache
from swf_renderer_tpu.native.bindings import cells_split_delta_native
from swf_renderer_tpu.ops.flatblock import (
    pack_flat_blocks, place_blocks, resolve_planes_u32,
)

_enable_compile_cache()

FRAMES, LAYERS, H, W = 60, 4, 1088, 1920


def chained(fn, args, ks=(1, 3)):
    """fn(args, prev_scalar) -> scalar; chain inside one jit."""
    times = {}
    for k in ks:
        @jax.jit
        def run(a, k=k):
            def body(i, acc):
                return fn(a, acc)
            return jax.lax.fori_loop(0, k, body, 0.0)
        float(run(args))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(run(args))
            ts.append(time.time() - t0)
        times[k] = min(ts)
    k0, k1 = ks
    return (times[k1] - times[k0]) / (k1 - k0), times


def main():
    tables, colors = build_scene_edges(FRAMES, LAYERS, H, W)
    ups = [[cells_split_delta_native(tables[i][j], H, W)
            for j in range(LAYERS)] for i in range(FRAMES)]
    sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(ups, H, W)
    colors_j = jnp.asarray(colors)
    a = tuple(map(jnp.asarray, (sidx, keep, urc, ucm, uval)))
    px = FRAMES * H * W

    planes = place_blocks(*a, FRAMES, LAYERS, ns)
    planes.block_until_ready()

    for g in (1, 2, 4, 8):
        def k2(args, prev, g=g):
            p, c = args
            out = resolve_planes_u32(p + prev * 1e-30, c, nc,
                                     strips_per_step=g)
            return jnp.sum(out[0, :8, :].astype(jnp.float32)) * 1e-12
        per, times = chained(k2, (planes, colors_j))
        print(f"[k2 g={g}] sustained {per*1e3:.1f} ms "
              f"({px/per/1e9:.2f} Gpx/s) raw={ {k: round(v*1e3) for k, v in times.items()} }")

    def k1(args, prev):
        si, ke, rc, cm, uv = args
        p = place_blocks(si, ke, rc, cm, uv + prev * 1e-30,
                         FRAMES, LAYERS, ns)
        return jnp.sum(p[0, 0, 0]) * 1e-12
    per, times = chained(k1, a)
    print(f"[k1] sustained {per*1e3:.1f} ms ({per/len(sidx)*1e9:.0f} ns/block)")

    def full(args, prev):
        si, ke, rc, cm, uv, c = args
        p = place_blocks(si, ke, rc, cm, uv + prev * 1e-30,
                         FRAMES, LAYERS, ns)
        out = resolve_planes_u32(p, c, nc, strips_per_step=4)
        return jnp.sum(out[0, :8, :].astype(jnp.float32)) * 1e-12
    per, times = chained(full, a + (colors_j,))
    print(f"[full] sustained {per*1e3:.1f} ms ({px/per/1e9:.2f} Gpx/s)")


if __name__ == "__main__":
    main()
