"""Experiment: fold value parts into the (BLK, LANE) step matrix.

Production _place_delta scales the (plane_rows, BLK) one-hot by each
bf16 value part (3 big elementwise mul+casts per slot).  The vfold
variant scales the (BLK, LANE) step matrix instead — bit-identical MXU
products in the same contraction order — and on spp>=2 planes
(plane_rows 256 > BLK 128) it halves the per-pass elementwise traffic.
PERF.md round 2 pinned the slot cost on "one-hot select/cast VPU work",
so this targets the headline's dominant per-slot term directly.

RESULT (round 4, two clean epochs): NEGATIVE twice over — headline
21.87->27.71 / 21.98->27.65 ms (-21%), and the on-chip vfold branch
MISCOMPILES (byte_dmax 221 vs the interpret-mode bit-identity; the
excess-precision-folding family).  vfold stays permanently off.

Usage: python tools/exp_vfold.py [--config headline|flat256|gradients]
Runs both variants within one epoch (chained-repetition two-point fit,
bench_flatblock methodology) and asserts bitwise-equal output first.
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import build_scene_edges, _enable_compile_cache
from swf_renderer_tpu.native.bindings import pack_grouped_native
from swf_renderer_tpu.ops.flatblock import (
    plane_geometry, plane_rows_for, render_fused_blocksn,
    strips_per_plane,
)
from swf_renderer_tpu.ops.pipeline import lower_update_lists

CONFIGS = {
    "headline": (60, 4, 1088, 1920),
    "flat256": (60, 4, 256, 256),
    "gradients": (60, 4, 512, 512),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="headline", choices=CONFIGS)
    ap.add_argument("--group", type=int, default=6)
    args_cli = ap.parse_args()
    _enable_compile_cache()

    frames, layers, height, width = CONFIGS[args_cli.config]
    group = args_cli.group
    _, nc_geo, ns_geo = plane_geometry(height, width)
    spp = strips_per_plane(nc_geo, ns_geo)
    tables, colors = build_scene_edges(frames, layers, height, width)
    ul = lower_update_lists(tables, height, width)
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        ul, height, width, group=group, spp=spp)
    args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))
    colors_j = jnp.asarray(colors)
    px = frames * height * width
    print(json.dumps({"config": args_cli.config, "spp": spp,
                      "plane_rows": plane_rows_for(nc, spp),
                      "groups": int(len(gsi))}), file=sys.stderr)

    base = None
    for vfold in (False, True):
        out = np.asarray(render_fused_blocksn(
            *args, colors_j, frames, layers, ns, nc, group=group,
            spp=spp, vfold=vfold))
        if base is None:
            base = out
            same = True
            dmax = 0
        else:
            same = bool(np.array_equal(out, base))
            bb = base.view(np.uint8).astype(np.int32)
            ob = out.view(np.uint8).astype(np.int32)
            dmax = int(np.abs(bb - ob).max())

        def one_rep(uv, prev, vfold=vfold):
            o = render_fused_blocksn(
                args[0], args[1], args[2], args[3], args[4],
                uv + prev * 1e-30, colors_j, frames, layers, ns, nc,
                group=group, spp=spp, vfold=vfold)
            return jnp.sum(o[0, 0].astype(jnp.float32)) * 1e-12

        def timed(k):
            @jax.jit
            def run(uv):
                return jax.lax.fori_loop(
                    0, k, lambda i, a: one_rep(uv, a), 0.0)
            float(run(args[5]))
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(run(args[5]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = (timed(9) - timed(1)) / 8
        print(json.dumps({"vfold": vfold, "ms": round(dt * 1e3, 2),
                          "gpx_s": round(px / dt / 1e9, 3),
                          "matches": same, "byte_dmax": dmax}))


if __name__ == "__main__":
    main()
