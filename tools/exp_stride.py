"""Round-4 within-epoch A/B: width-rounded plane stride vs the old
width+1 rounding (plane_geometry).

For bench widths that are exact multiples of 128 the old formula paid a
whole extra 128-lane chunk for the col==width cancellation updates
(flat256: 3 chunks for 257 live lanes; 1080p: 16 for 1921).  The new
geometry drops cols >= stride (right-of-frame, never rendered) and
shrinks the plane: flat256 2 chunks -> spp 8 (100% plane occupancy),
gradients 4 chunks -> spp 8, 1080p 15 chunks -> spp 2 at 240/256 rows.

Run: python tools/exp_stride.py [flat256|gradients|headline] ... (TPU)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _old_plane_geometry(height, width):
    from swf_renderer_tpu.ops.flatblock import LANE, STRIP_H

    stride = ((width + 1 + LANE - 1) // LANE) * LANE
    return stride, stride // LANE, -(-height // STRIP_H)


def run_config(kind: str):
    import jax
    import jax.numpy as jnp

    from bench import build_scene_edges
    from swf_renderer_tpu.native.bindings import pack_grouped_native
    from swf_renderer_tpu.ops import flatblock as fb
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.pipeline import (
        kernel_paints_for, lower_update_lists,
    )

    if kind == "gradients":
        h = w = 512
        batch = 64
        layers = 2
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
        tables, _ = build_scene_edges(batch, layers, h, w, seed=11)
    elif kind == "flat256":
        h = w = 256
        batch = 256
        layers = 2
        paints = None
        tables, colors = build_scene_edges(batch, layers, h, w,
                                           shapes_per_layer=8)
    else:  # headline 1080p
        h, w = 1080, 1920
        batch = 60
        layers = 4
        paints = None
        tables, colors = build_scene_edges(batch, layers, h, w)

    update_lists = lower_update_lists(tables, h, w)
    GROUP = 6
    results = {}
    for variant in ("old", "new"):
        orig = fb.plane_geometry
        if variant == "old":
            fb.plane_geometry = _old_plane_geometry
        try:
            _, nc_geo, ns_geo = fb.plane_geometry(h, w)
            spp = fb.strips_per_plane(nc_geo, ns_geo)
            gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
                update_lists, h, w, group=GROUP, spp=spp)
            if paints is not None:
                kpaints, fields, base_colors = kernel_paints_for(
                    paints, h, w, spp=spp)
                colors_j = jnp.asarray(
                    np.broadcast_to(base_colors, (batch, layers, 4)))
            else:
                kpaints = fields = None
                colors_j = jnp.asarray(colors)
        finally:
            fb.plane_geometry = orig
        steps = len(np.asarray(gsi))
        args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))

        def one_rep(uv, prev):
            if kpaints is None:
                out = fb.render_fused_blocksn(
                    args[0], args[1], args[2], args[3], args[4],
                    uv + prev * 1e-30, colors_j, batch, layers, ns, nc,
                    group=GROUP, spp=spp)
            else:
                out = fb.render_fused_styled(
                    args[0], args[1], args[2], args[3], args[4],
                    uv + prev * 1e-30, colors_j, fields, batch, layers,
                    ns, nc, kpaints, group=GROUP, spp=spp)
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
        results[variant] = gpxs
        print(json.dumps({
            "config": kind, "variant": variant, "nc": nc, "spp": spp,
            "steps": steps, "gpx_s": round(gpxs, 3)}), flush=True)
    print(json.dumps({"config": kind,
                      "speedup": round(results["new"] / results["old"], 3)}),
          flush=True)


if __name__ == "__main__":
    from bench import _enable_compile_cache

    _enable_compile_cache()
    for kind in sys.argv[1:] or ["flat256", "gradients", "headline"]:
        run_config(kind)
