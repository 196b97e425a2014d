"""Per-stage profiling breakdown + roofline accounting for the flagship.

``jax.profiler`` hangs over the axon tunnel (PERF.md), so this is the
profiling story: each pipeline stage is timed with the checksum-forced
two-point methodology bench.py uses, and the kernel's arithmetic/byte
volumes are computed analytically from the packed-scene shape to place the
sustained number against the chip's rooflines.

Usage: python tools/profile_breakdown.py [--smoke]
Prints one JSON line per stage.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# v5e peaks (public figures): 197 TFLOP/s bf16 MXU, ~819 GB/s HBM.
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import build_scene_edges
    from swf_renderer_tpu.native.bindings import (
        cells_split_delta_native, pack_grouped_native,
    )
    from swf_renderer_tpu.ops.flatblock import (
        BLK, LANE, STRIP_H, plane_rows_for, render_fused_blocksn,
    )

    smoke = "--smoke" in sys.argv
    if smoke:
        frames, layers, height, width = 4, 2, 128, 512
    else:
        frames, layers, height, width = 60, 4, 1088, 1920
    group = 6

    tables, colors = build_scene_edges(frames, layers, height, width)

    t0 = time.perf_counter()
    update_lists = [
        [cells_split_delta_native(t, height, width) for t in ft]
        for ft in tables
    ]
    t_split = time.perf_counter() - t0
    n_updates = sum(len(u[0]) for per in update_lists for u in per)
    print(json.dumps({"stage": "host_edge_split", "seconds": round(t_split, 3),
                      "updates": n_updates,
                      "ns_per_update": round(t_split / max(n_updates, 1)
                                             * 1e9, 1)}))

    t0 = time.perf_counter()
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        update_lists, height, width, group=group)
    t_pack = time.perf_counter() - t0
    groups = len(gsi)
    print(json.dumps({"stage": "host_pack_grouped",
                      "seconds": round(t_pack, 3), "groups": groups}))

    args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))
    colors_j = jnp.asarray(colors)

    def one_rep(uv, prev):
        out = render_fused_blocksn(
            args[0], args[1], args[2], args[3], args[4],
            uv + prev * 1e-30, colors_j, frames, layers, ns, nc,
            group=group)
        return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

    def timed(k):
        @jax.jit
        def run(uv):
            return jax.lax.fori_loop(0, k, lambda i, a: one_rep(uv, a), 0.0)
        float(run(args[5]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(args[5]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (timed(3) - timed(1)) / 2

    # Roofline accounting for the fused kernel.
    plane_rows = plane_rows_for(nc)
    stride = nc * LANE
    # MXU: per sub-block 3 bf16 passes of (plane_rows, BLK) @ (BLK, LANE).
    mxu_flops = groups * group * 3 * 2 * plane_rows * BLK * LANE
    # HBM: block payloads in (3 f32 arrays of group*BLK) + packed u32 out.
    bytes_in = groups * (3 * group * BLK * 4)
    bytes_out = frames * (ns + 1) * STRIP_H * stride * 4
    pixels = frames * height * width
    print(json.dumps({
        "stage": "fused_kernel_sustained",
        "seconds": round(dt, 4),
        "gpx_per_s": round(pixels / dt / 1e9, 3),
        "us_per_grid_step": round(dt / groups * 1e6, 3),
        "mxu_tflops": round(mxu_flops / dt / 1e12, 2),
        "mxu_pct_peak": round(mxu_flops / dt / 1e12
                              / PEAK_BF16_TFLOPS * 100, 1),
        "hbm_gb_per_s": round((bytes_in + bytes_out) / dt / 1e9, 1),
        "hbm_pct_peak": round((bytes_in + bytes_out) / dt / 1e9
                              / PEAK_HBM_GBS * 100, 1),
        "note": "per-grid-step pipeline overhead dominates (PERF.md); "
                "neither roofline is near saturation at this workload",
    }))


if __name__ == "__main__":
    main()
