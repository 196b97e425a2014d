"""Capture a jax.profiler trace of the flagship pipeline (CPU backend).

``jax.profiler`` hangs over the axon TPU tunnel (PERF.md methodology), so
the committed trace artifact documents the KERNEL STRUCTURE — pallas call
boundaries, grid steps, XLA ops around them — from a CPU interpret-mode
run, where the structure (not the timing) is identical.  On-TPU timing
comes from the ablation tools (tools/exp_split.py, profile_breakdown.py).

Usage:
    python tools/capture_trace.py [outdir]   # default tools/traces/cpu

Read the result in chrome://tracing (load the .json.gz under
plugins/.../*.trace.json.gz) or perfetto.dev; see tools/traces/README.md.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override

import numpy as np


def main():
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                       else pathlib.Path(__file__).parent / "traces" / "cpu")
    out.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp

    from bench import build_scene_edges
    from swf_renderer_tpu.ops.flatblock import (
        group_blocks_fused, pack_flat_blocks, render_fused_blocksn,
        sort_blocks_fused, strips_per_plane, plane_geometry,
    )

    frames, layers, h, w = 4, 3, 128, 384
    tables, colors = build_scene_edges(frames, layers, h, w,
                                       shapes_per_layer=4)
    from swf_renderer_tpu.ops.pipeline import lower_update_lists

    update_lists = lower_update_lists(tables, h, w)
    _, nc_geo, ns_geo = plane_geometry(h, w)
    spp = strips_per_plane(nc_geo, ns_geo)
    try:
        from swf_renderer_tpu.native.bindings import pack_grouped_native

        gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
            update_lists, h, w, group=6, spp=spp)
    except Exception:
        spp = 1
        packed = pack_flat_blocks(update_lists, h, w, block_pad_multiple=1)
        blocks = sort_blocks_fused(*packed[:5], layers, packed[5],
                                   block_pad_multiple=1)
        gsi, gfl, gla, grc, gcm, gvv = group_blocks_fused(
            *blocks, layers, packed[5], group=6)
        ns, nc = packed[5], packed[6]

    args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))
    colors_j = jnp.asarray(colors)

    def run():
        return render_fused_blocksn(
            *args, colors_j, frames, layers, ns, nc, group=6, spp=spp)

    run().block_until_ready()  # compile outside the trace window
    with jax.profiler.trace(str(out)):
        run().block_until_ready()
        run().block_until_ready()
    print(f"trace written under {out}")


if __name__ == "__main__":
    main()
