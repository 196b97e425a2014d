"""Round-4 group-size sweep on the SMALL-frame styled configs.

The round-2 group ablation (group 6 -> 8 plateau) ran on the 1080p
headline, where steps carry ~17K px each.  gradients (512^2) and
flat256 run 5-11K px/step — per-step infra is a 2-3x larger fraction,
so a bigger group (fewer, fatter steps at the same slot count) may pay
there even though it plateaued at 1080p.  Slot utilization measured
0.77 / 0.74 on these configs (padding rises with group; this sweep
measures the net).

Run: python tools/exp_groupsweep.py [gradients|flat256] ... (needs TPU)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def run_config(kind: str, groups=(6, 8, 12)):
    from bench import build_scene_edges

    import jax
    import jax.numpy as jnp

    from swf_renderer_tpu.native.bindings import pack_grouped_native
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.flatblock import (
        plane_geometry, render_fused_styled, strips_per_plane,
    )
    from swf_renderer_tpu.ops.pipeline import (
        kernel_paints_for, lower_update_lists,
    )

    if kind == "gradients":
        h = w = 512
        batch = 64
        seed = 11
        stops_r = np.array([0.0, 1.0], np.float32)
        stops_c = np.array([[1, 0, 0, 1], [0, 0, 1, 1]], np.float32)
        paints = [
            style_ops.Paint(
                kind=style_ops.PAINT_LINEAR,
                inv_matrix=(64.0, 0.0, 0.0, 64.0, -16384.0, -16384.0),
                stop_ratios=stops_r, stop_colors=stops_c,
            ),
            style_ops.Paint(
                kind=style_ops.PAINT_FOCAL,
                inv_matrix=(64.0, 0.0, 0.0, 64.0, -16384.0, -16384.0),
                stop_ratios=stops_r, stop_colors=stops_c, focal_point=0.4,
            ),
        ]
    else:  # flat256 — the bench config: 256 frames, 8 shapes/layer,
        # solid colors through render_fused_blocksn (unstyled).
        h = w = 256
        batch = 256
        seed = 7
        paints = None
    layers = 2
    _, nc_geo, ns_geo = plane_geometry(h, w)
    spp = strips_per_plane(nc_geo, ns_geo)
    if paints is None:
        tables, colors = build_scene_edges(batch, layers, h, w,
                                           shapes_per_layer=8)
        colors_j = jnp.asarray(colors)
        kpaints = fields = None
    else:
        tables, _ = build_scene_edges(batch, layers, h, w, seed=seed)
        kpaints, fields, base_colors = kernel_paints_for(
            paints, h, w, spp=spp)
        colors_j = jnp.asarray(
            np.broadcast_to(base_colors, (batch, layers, 4)))
    update_lists = lower_update_lists(tables, h, w)

    results = {}
    for g in groups:
        gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
            update_lists, h, w, group=g, spp=spp)
        steps = len(np.asarray(gsi))
        args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))

        def one_rep(uv, prev):
            if kpaints is None:
                from swf_renderer_tpu.ops.flatblock import (
                    render_fused_blocksn,
                )
                out = render_fused_blocksn(
                    args[0], args[1], args[2], args[3], args[4],
                    uv + prev * 1e-30, colors_j, batch, layers, ns, nc,
                    group=g, spp=spp)
            else:
                out = render_fused_styled(
                    args[0], args[1], args[2], args[3], args[4],
                    uv + prev * 1e-30, colors_j, fields, batch, layers,
                    ns, nc, kpaints, group=g, spp=spp)
            return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

        def timed(k):
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

        dt = (timed(5) - timed(1)) / 4
        gpxs = batch * h * w / dt / 1e9
        results[g] = gpxs
        print(json.dumps({
            "config": kind, "group": g, "steps": steps,
            "steps_per_frame": round(steps / batch, 1),
            "gpx_s": round(gpxs, 3)}), flush=True)
    return results


if __name__ == "__main__":
    from bench import _enable_compile_cache

    _enable_compile_cache()
    kinds = sys.argv[1:] or ["gradients", "flat256"]
    for kind in kinds:
        run_config(kind)
