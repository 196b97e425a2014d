"""Experiment: merge the rc + val per-step inputs into ONE VMEM block.

The fused kernel's per-step infrastructure (~6.5 ms of the headline's
~21.6 ms) is input-DMA latency-bound (PERF.md round 2 split); each grid
step issues three tiny input DMAs (urc (1,1,G*BLK), ucm (1,G*BLK,1),
uval (1,1,G*BLK)).  urc and uval share lane orientation, so they can
ride one (1, 2, G*BLK) block — one fewer DMA issue per step, the same
bytes, bit-identical math (the kernel slices the two sublanes apart).
ucm stays separate: it is consumed sublane-oriented and an in-kernel
transpose would cost a relayout.

Usage: python tools/exp_dmamerge.py [--config headline|flat256|gradients]
Both variants run within one epoch (chained-repetition two-point fit,
bench_flatblock methodology); bitwise-equal output asserted first.
"""

import argparse
import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if "--cpu" in sys.argv:
    # JAX_PLATFORMS=cpu is OVERRIDDEN by the axon sitecustomize; pin
    # before backend init (CLAUDE.md) so validation runs never touch
    # the chip (concurrent TPU jobs contaminate measurements).
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_scene_edges, _enable_compile_cache
from swf_renderer_tpu.native.bindings import pack_grouped_native
from swf_renderer_tpu.ops.flatblock import (
    BLK, STRIP_H, _iotas, _on_tpu, _place_delta, _resolve_acc_to_u32,
    plane_geometry, plane_rows_for, render_fused_blocksn,
    strips_per_plane,
)
from swf_renderer_tpu.ops.pipeline import lower_update_lists

LANE = 128

CONFIGS = {
    "headline": (60, 4, 1088, 1920),
    "flat256": (60, 4, 256, 256),
    "gradients": (60, 4, 512, 512),
    "tiny": (2, 2, 64, 96),  # CPU interpret-mode correctness check
}


def _rv_kernel(sidx_ref, flags_ref, *rest, layers: int, ns1: int,
               n_chunks: int, fill_rule: int, group: int,
               plane_rows: int, spp: int):
    """_fusedn_kernel with urc+uval merged into one (1, 2, G*BLK) block
    (sublane 0 = rc, sublane 1 = val)."""
    lay_refs = rest[:group]
    colors_ref = rest[group]
    urv_ref, ucm_ref, out_ref, acc_ref = rest[group + 1:]
    i = pl.program_id(0)
    packed = sidx_ref[i]
    flags = flags_ref[i]
    lane, sub = _iotas(plane_rows)

    @pl.when(jnp.bitwise_and(flags, 1) == 1)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nblk = jax.lax.shift_right_logical(flags, 2)
    run_all = nblk == 0
    for g in range(group):
        @pl.when(jnp.logical_or(run_all, g < nblk))
        def _place(g=g):
            delta = _place_delta(
                urv_ref[0, 0:1, g * BLK:(g + 1) * BLK],
                ucm_ref[0, g * BLK:(g + 1) * BLK, :],
                urv_ref[0, 1:2, g * BLK:(g + 1) * BLK],
                lane, sub)
            layer = lay_refs[g][i]
            acc_ref[layer] = acc_ref[layer] + delta

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        _resolve_acc_to_u32(acc_ref, colors_ref, out_ref, packed,
                            layers, ns1, n_chunks, fill_rule,
                            plane_rows=plane_rows, spp=spp)


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group", "fill_rule",
    "spp"))
def render_rv(sidx, flags, lays, urv, ucm, colors, frames, layers,
              n_strips, n_chunks, group=6, fill_rule=0, spp=1):
    ng = urv.shape[0]
    ns1 = n_strips + 1
    stride = n_chunks * LANE
    plane_rows = plane_rows_for(n_chunks, spp)
    nsp = 2 + group + 1

    def out_index(i, *refs):
        packed = refs[0][i]
        return (packed // (layers * ns1), packed % ns1, 0, 0)

    def in_index(i, *refs):
        return (i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, 2, group * BLK), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * BLK, 1), in_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, spp * STRIP_H, stride), out_index,
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((layers, plane_rows, LANE),
                                   jnp.float32)],
    )
    kernel = functools.partial(
        _rv_kernel, layers=layers, ns1=ns1, n_chunks=n_chunks,
        fill_rule=fill_rule, group=group, plane_rows=plane_rows,
        spp=spp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, spp * STRIP_H, stride), jnp.uint32),
        interpret=not _on_tpu(),
    )(sidx, flags, *(lays[g] for g in range(group)), colors, urv, ucm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="headline", choices=CONFIGS)
    ap.add_argument("--group", type=int, default=6)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (interpret-mode check)")
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
    urv = np.concatenate([grc, gvv], axis=1)  # (NG, 2, G*BLK)
    base_args = tuple(jnp.asarray(x)
                      for x in (gsi, gfl, gla, grc, gcm, gvv))
    rv_args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, urv, gcm))
    colors_j = jnp.asarray(colors)
    px = frames * height * width
    print(json.dumps({"config": args_cli.config, "spp": spp,
                      "groups": int(len(gsi))}), file=sys.stderr)

    out_base = np.asarray(render_fused_blocksn(
        *base_args, colors_j, frames, layers, ns, nc, group=group,
        spp=spp))
    out_rv = np.asarray(render_rv(
        rv_args[0], rv_args[1], rv_args[2], rv_args[3], rv_args[4],
        colors_j, frames, layers, ns, nc, group=group, spp=spp))
    same = bool(np.array_equal(out_base, out_rv))
    bdm = int(np.abs(out_base.view(np.uint8).astype(np.int32)
                     - out_rv.view(np.uint8).astype(np.int32)).max())

    def timed(run, k):
        @jax.jit
        def loop(uv):
            return jax.lax.fori_loop(0, k, lambda i, a: run(uv, a), 0.0)
        float(loop(jnp.asarray(0.0)))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(loop(jnp.asarray(0.0)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def rep_base(_uv, prev):
        o = render_fused_blocksn(
            base_args[0], base_args[1], base_args[2], base_args[3],
            base_args[4], base_args[5] + prev * 1e-30, colors_j,
            frames, layers, ns, nc, group=group, spp=spp)
        return jnp.sum(o[0, 0].astype(jnp.float32)) * 1e-12

    def rep_rv(_uv, prev):
        o = render_rv(
            rv_args[0], rv_args[1], rv_args[2],
            rv_args[3] + prev * 1e-30, rv_args[4], colors_j,
            frames, layers, ns, nc, group=group, spp=spp)
        return jnp.sum(o[0, 0].astype(jnp.float32)) * 1e-12

    for name, rep in (("base", rep_base), ("rv-merged", rep_rv)):
        dt = (timed(rep, 9) - timed(rep, 1)) / 8
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2),
                          "gpx_s": round(px / dt / 1e9, 3),
                          "matches": same, "byte_dmax": bdm}))


if __name__ == "__main__":
    main()
