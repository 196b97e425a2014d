"""Experiment: placement sub-block size (blk) x group-size sweep.

Mean block occupancy on the headline scene is ~82/128 updates, and the
marginal cost per slot is dominated by the per-slot accumulator RMW
(128 KB VMEM), not the MXU product — so fewer, fatter slots (blk=256)
should win even though each slot's matmul doubles.

Usage: python tools/exp_blk.py   (runs on the attached TPU)
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import build_scene_edges
from swf_renderer_tpu.native.bindings import (
    cells_split_delta_native, pack_grouped_native,
)
from swf_renderer_tpu.ops.flatblock import render_fused_blocksn


def main():
    frames, layers, height, width = 60, 4, 1088, 1920
    tables, colors = build_scene_edges(frames, layers, height, width)
    ul = [[cells_split_delta_native(t, height, width) for t in ft]
          for ft in tables]
    colors_j = jnp.asarray(colors)
    px = frames * height * width

    base = None
    for blk, group in ((128, 6), (256, 3), (256, 4), (256, 2), (384, 2)):
        gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
            ul, height, width, group=group, blk=blk)
        args = tuple(jnp.asarray(x)
                     for x in (gsi, gfl, gla, grc, gcm, gvv))

        def one(uv, prev):
            out = render_fused_blocksn(
                args[0], args[1], args[2], args[3], args[4],
                uv + prev * 1e-30, colors_j, frames, layers, ns, nc,
                group=group, blk=blk)
            return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

        def timed(k):
            @jax.jit
            def run(uv):
                return jax.lax.fori_loop(0, k,
                                         lambda i, a: one(uv, a), 0.0)
            float(run(args[5]))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(args[5]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        out = np.asarray(render_fused_blocksn(
            *args, colors_j, frames, layers, ns, nc, group=group, blk=blk))
        if base is None:
            base = out
            same = True
        else:
            same = bool(np.array_equal(out, base))
        dt = (timed(3) - timed(1)) / 2
        print(json.dumps({"blk": blk, "group": group,
                          "groups": int(len(gsi)),
                          "ms": round(dt * 1e3, 2),
                          "gpx_s": round(px / dt / 1e9, 3),
                          "matches_base": same}))


if __name__ == "__main__":
    main()
