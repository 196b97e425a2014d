"""Experiment: predicated padded slots (flags>>2 used-count) x group sweep.

With slot predication the padding waste of large groups disappears from
compute (only their DMA remains), so the group knob becomes a pure
steps-vs-VMEM tradeoff: group=10 reaches the one-step-per-supergroup floor
on the headline scene (supergroup max = 10 blocks).

Usage: python tools/exp_pred.py   (runs on the attached TPU)
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
    for group, pred in ((6, False), (6, True), (8, True), (10, True),
                        (12, True)):
        gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
            ul, height, width, group=group)
        if not pred:
            gfl = (gfl & 3).astype(np.int32)  # strip counts: legacy path
        args = tuple(jnp.asarray(x)
                     for x in (gsi, gfl, gla, grc, gcm, gvv))

        def one(uv, prev):
            out = render_fused_blocksn(
                args[0], args[1], args[2], args[3], args[4],
                uv + prev * 1e-30, colors_j, frames, layers, ns, nc,
                group=group)
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

        # Compare REAL strips only: the sentinel strip (index ns) holds
        # whatever stale VMEM the final flush carried and is never consumed.
        out = np.asarray(render_fused_blocksn(
            *args, colors_j, frames, layers, ns, nc, group=group))[:, :ns]
        if base is None:
            base = out
            same = True
        else:
            same = bool(np.array_equal(out, base))
        dt = (timed(9) - timed(1)) / 8
        print(json.dumps({"group": group, "pred": pred,
                          "groups": int(len(gsi)),
                          "ms": round(dt * 1e3, 2),
                          "gpx_s": round(px / dt / 1e9, 3),
                          "matches_base": same}))


if __name__ == "__main__":
    main()
