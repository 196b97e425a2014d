"""Gradient styled-path ablation: in-kernel evaluation vs prebaked field.

The styled fused kernel evaluates gradients per resolve step from baked
stop tables (VPU ops, zero HBM); bitmap paints instead stream prebaked
chunk-major field planes (HBM traffic, no VPU eval).  The textured config
(fields) measures faster than gradients (in-kernel), so this experiment
times the SAME gradients workload both ways on the chip.

Usage: python tools/exp_gradfield.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

sys.argv = ["x"]
from bench import _enable_compile_cache, build_scene_edges

_enable_compile_cache()

import jax
import jax.numpy as jnp

from swf_renderer_tpu.native.bindings import pack_grouped_native
from swf_renderer_tpu.ops import style as style_ops
from swf_renderer_tpu.ops.flatblock import (
    KernelPaint, field_to_chunkmajor, plane_geometry, render_fused_styled,
    strips_per_plane,
)
from swf_renderer_tpu.ops.pipeline import lower_update_lists


def main():
    h = w = 512
    batch = 64
    stops_r = np.array([0.0, 1.0], np.float32)
    stops_c = np.array([[1, 0, 0, 1], [0, 0, 1, 1]], np.float32)
    paints = [
        style_ops.Paint(kind=style_ops.PAINT_LINEAR,
                        inv_matrix=(64.0, 0.0, 0.0, 64.0,
                                    -16384.0, -16384.0),
                        stop_ratios=stops_r, stop_colors=stops_c),
        style_ops.Paint(kind=style_ops.PAINT_FOCAL,
                        inv_matrix=(64.0, 0.0, 0.0, 64.0,
                                    -16384.0, -16384.0),
                        stop_ratios=stops_r, stop_colors=stops_c,
                        focal_point=0.4),
    ]
    layers = len(paints)
    GROUP = 6
    _, nc_geo, ns_geo = plane_geometry(h, w)
    spp = strips_per_plane(nc_geo, ns_geo)
    tables, _ = build_scene_edges(batch, layers, h, w, seed=11)
    update_lists = lower_update_lists(tables, h, w)
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        update_lists, h, w, group=GROUP, spp=spp)
    args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))

    # Variant A: in-kernel gradients, built EXPLICITLY (the production
    # kernel_paints_for now promotes gradients to fields by default —
    # this experiment's finding — so going through it would compare
    # prebaked vs prebaked).
    from swf_renderer_tpu.ops.flatblock import KPAINT_FOCAL, KPAINT_LINEAR

    kp_a = tuple(
        KernelPaint.gradient(
            KPAINT_LINEAR if p.kind == style_ops.PAINT_LINEAR
            else KPAINT_FOCAL,
            p.inv_matrix, p.stop_ratios, p.stop_colors,
            focal=p.focal_point, spread=p.spread)
        for p in paints)
    fields_a = ()
    base_colors = np.zeros((layers, 4), np.float32)
    # Variant B: both gradients as prebaked field planes.
    fields_b = tuple(
        field_to_chunkmajor(style_ops.paint_field(p, h, w), ns, nc,
                            spp=spp)
        for p in paints)
    kp_b = (KernelPaint.field(0), KernelPaint.field(1))
    colors_j = jnp.asarray(np.broadcast_to(base_colors,
                                           (batch, layers, 4)))

    def timed(kp, fields, label):
        def one_rep(uv, prev):
            out = render_fused_styled(
                args[0], args[1], args[2], args[3], args[4],
                uv + prev * 1e-30, colors_j, fields, batch, layers,
                ns, nc, kp, group=GROUP, spp=spp)
            return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

        def run_k(k):
            @jax.jit
            def run(uv):
                return jax.lax.fori_loop(
                    0, k, lambda i, acc: one_rep(uv, acc), 0.0)
            float(run(args[5]))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(args[5]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = (run_k(5) - run_k(1)) / 4
        print(json.dumps({
            "variant": label,
            "mpx_s": round(batch * h * w / dt / 1e6, 1),
            "ms": round(dt * 1e3, 2)}))
        return dt

    timed(kp_a, fields_a, "in-kernel gradients")
    timed(kp_b, tuple(jnp.asarray(f) for f in fields_b),
          "prebaked field planes")


if __name__ == "__main__":
    main()
