"""Ablation: transform-sweep (e_chunk, wblock) granularity on the anim
scenes.

The sweep's heavy (WP, EC) ramp work runs per (column block, piece
chunk) pair that any piece's x-transition crosses; the transition-free
skip (PERF.md round 3) replaces non-crossing pairs with three tiny
broadcast matmuls.  Finer chunks/blocks raise the skippable fraction
(pieces are path-ordered, hence spatially coherent) but shrink each MXU
matmul (WP, EC) @ (EC, HP).  This measures the trade on the REAL bench
scenes (bench.anim_scene) at 1080p and 512^2.

Timing: tiled two-point fit over the frame axis (same methodology as
bench.bench_anim — a sub-track delta sits below the ~5 ms tunnel
jitter; a wrapping fori_loop stack-allocates the output in scoped VMEM).

Usage: python tools/exp_sweepcost.py [--config anim1080|anim512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import (  # noqa: E402
    _enable_compile_cache, anim_scene, tiled_frame_fit,
)
from swf_renderer_tpu.ops.transform import (  # noqa: E402
    affine_pieces, plan_compact_sweep, render_affine_sweep,
)


def measure(h, w, frames, e_chunk, wblock, skip_empty=True,
            row_grid=False, wchunk=256, x_split=True,
            prefix_cheap=None, blocks_per_step=1, compact=False,
            prefilter=None, chunk_list=None):
    tables, colors, mats = anim_scene(h, w, frames)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    fargs = tuple(jnp.asarray(x) for x in (tab, subxy, colarr))
    ckw = {}
    if compact:
        plan = plan_compact_sweep(
            mats, tab, h, w, e_chunk=e_chunk, wblock=wblock,
            blocks_per_step=(blocks_per_step
                             if blocks_per_step != 1 else None))
        if plan is None:
            return float("nan")
        print(json.dumps({"note": "compact plan", **{
            k: v for k, v in plan.items()}}), file=sys.stderr)
        ckw = plan
        wblock = None
        blocks_per_step = None

    def timed(tracks):
        mm = jnp.asarray(tracks[0])
        ts = []
        for i in range(4):
            varied = mm + np.float32(i) * 1e-12
            t0 = time.perf_counter()
            out = render_affine_sweep(
                varied, *fargs, h, w, e_chunk=e_chunk,
                skip_empty=skip_empty, row_grid=row_grid, wchunk=wchunk,
                x_split=x_split, prefix_cheap=prefix_cheap,
                prefilter=prefilter, chunk_list=chunk_list,
                **(ckw or dict(wblock=wblock,
                               blocks_per_step=blocks_per_step)))
            int(jnp.sum(out[:, ::64, ::64].astype(jnp.uint32)))
            ts.append(time.perf_counter() - t0)
        return min(ts[1:])

    return tiled_frame_fit(timed, (mats,), frames, w * h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="anim1080",
                    choices=["anim1080", "anim512"])
    ap.add_argument("--pin", action="store_true",
                    help="cross-round policy pin: static chunk loop "
                         "(round-3 behavior) vs production chunk-index "
                         "lists, same e_chunk/bps — used by perf_pin.py")
    args = ap.parse_args()
    _enable_compile_cache()
    h, w = (1088, 1920) if args.config == "anim1080" else (512, 512)
    frames = 60

    # (label, kwargs) — diagnose where the row-grid kernel's fixed cost
    # lives: branch overhead (x_split off), skip effectiveness (skip
    # off), vs the column-grid baselines.
    # Grid-step-overhead hypothesis: ~1.2 ms/frame at 1080p is
    # insensitive to ALL piece-work structure -> suspect per-step fixed
    # cost (900 steps/frame at wblock 128).  wblock 256 halves steps
    # (e_chunk 256 keeps ramp temporaries inside scoped VMEM).
    # Grid-step fixed-overhead test via blocks-per-step (wblock stays
    # 128, so block-sized resolve temporaries don't grow the scoped-VMEM
    # footprint the way wblock=256 did — that blew the 16 MB limit).
    # bps4 + ec256 blew scoped VMEM by 0.96 MB; try slimmer chunks.
    # Compacted-sweep A/B: per-(frame, block) piece gather (the
    # per-(block, chunk, layer) fixed cost was ~0.7 of 1.07 ms/frame —
    # PERF.md decomposition; compaction shrinks the pair count ~B-fold).
    grid = [
        # prefilter=None resolves to OFF (the measured-negative
        # default); the A/B arm must force it ON explicitly.
        ("prefilter-on", dict(e_chunk=256, blocks_per_step=None,
                              prefilter=True)),
        ("production (no prefilter)", dict(e_chunk=256,
                                           blocks_per_step=None)),
    ]
    if args.pin:
        # Both arms pin EXPLICIT layouts: the round-3 baseline is
        # wblock 128 / ec256 / static loop (leaving wblock/e_chunk to
        # the auto defaults would silently measure the RETUNED layouts
        # — wblock 64 + ec128 — under the round-3 label, drifting the
        # PERFPIN baseline), and "production" uses the live defaults.
        grid = [
            ("r3-static-loop", dict(e_chunk=256, wblock=128,
                                    blocks_per_step=None,
                                    chunk_list=False)),
            ("production", dict(e_chunk=None, blocks_per_step=None)),
        ]
    for label, kw in grid:
        e_chunk = kw.pop("e_chunk", 512)
        wblock = kw.pop("wblock", None)
        dt = measure(h, w, frames, e_chunk, wblock, **kw)
        print(json.dumps({
            "config": args.config, "variant": label,
            "ms_per_frame": round(dt * 1e3, 4),
            "gpx_s": round(w * h / dt / 1e9, 3)}), flush=True)


if __name__ == "__main__":
    main()
