"""Experiment: layer-masked group matmul vs per-sub-block dynamic updates.

The fused kernel's marginal cost per block slot (~0.25 us) is NOT the MXU
product (3 passes of 128^3 ~ 0.03 us) — it's the dynamic-layer accumulator
read-modify-write (128 KB of VMEM traffic per slot) plus per-slot VPU prep.
This variant replaces `group` dynamic-indexed updates with L STATIC
per-layer updates: mask each layer's values over the whole group's slots
and run ONE (plane_rows, group*BLK) @ (group*BLK, LANE) matmul per layer
per pass.  More MXU MACs (L/group ratio) but static accumulator indices
and fewer, larger products.

Usage: python tools/exp_lmask.py   (runs on the attached TPU)
"""

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swf_renderer_tpu.ops.coverage import FILL_RULE_NONZERO
from swf_renderer_tpu.ops.flatblock import (
    BLK, LANE, _iotas, _resolve_acc_to_u32,
)


def _lmask_kernel(sidx_ref, flags_ref, *rest, layers, ns1, n_chunks,
                  fill_rule, group):
    lay_refs = rest[:group]
    colors_ref = rest[group]
    urc_ref, ucm_ref, uval_ref, out_ref, acc_ref = rest[group + 1:]
    i = pl.program_id(0)
    packed = sidx_ref[i]
    flags = flags_ref[i]
    lane, sub = _iotas()

    @pl.when(jnp.bitwise_and(flags, 1) == 1)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    rc = urc_ref[0, :, :]        # (1, G*BLK)
    v = uval_ref[0, :, :]        # (1, G*BLK)
    cm = ucm_ref[0, :, :]        # (G*BLK, 1)
    w = (cm <= lane).astype(jnp.bfloat16)      # (G*BLK, LANE) shared
    onehot = (sub == rc).astype(jnp.float32)   # (plane_rows, G*BLK) shared

    # Per-slot layer id broadcast over the slot's BLK lanes.
    slot_lane = jax.lax.broadcasted_iota(jnp.int32, (1, group * BLK), 1)
    slot = slot_lane // BLK
    lay = lay_refs[0][i] * 0
    for g in range(group):
        lay = jnp.where(slot == g, lay_refs[g][i], lay)

    for lyr in range(layers):
        vm = jnp.where(lay == lyr, v, 0.0)     # (1, G*BLK)
        hi = vm.astype(jnp.bfloat16)
        hi32 = hi.astype(jnp.float32)
        mid = (vm - hi32).astype(jnp.bfloat16)
        mid32 = mid.astype(jnp.float32)
        lo = (vm - hi32 - mid32).astype(jnp.bfloat16)
        delta = jnp.zeros((LANE, LANE), jnp.float32)
        for part in (hi, mid, lo):
            u = (onehot * part.astype(jnp.float32)).astype(jnp.bfloat16)
            delta = delta + jnp.dot(u, w, preferred_element_type=jnp.float32)
        acc_ref[lyr] = acc_ref[lyr] + delta    # STATIC index

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        _resolve_acc_to_u32(acc_ref, colors_ref, out_ref, packed,
                            layers, ns1, n_chunks, fill_rule)


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group", "fill_rule"))
def render_lmask(sidx, flags, lays, urc, ucm, uval, colors, frames, layers,
                 n_strips, n_chunks, group=6,
                 fill_rule=FILL_RULE_NONZERO):
    ng = urc.shape[0]
    ns1 = n_strips + 1
    stride = n_chunks * LANE
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
            pl.BlockSpec((1, 1, group * BLK), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * BLK, 1), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, group * BLK), in_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, stride), out_index, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((layers, LANE, LANE), jnp.float32)],
    )
    kernel = functools.partial(
        _lmask_kernel, layers=layers, ns1=ns1, n_chunks=n_chunks,
        fill_rule=fill_rule, group=group)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((frames, ns1, 8, stride),
                                       jnp.uint32),
        interpret=False,
    )(sidx, flags, *(lays[g] for g in range(group)), colors,
      urc, ucm, uval)


def main():
    from bench import build_scene_edges
    from swf_renderer_tpu.native.bindings import (
        cells_split_delta_native, pack_grouped_native,
    )
    from swf_renderer_tpu.ops.flatblock import render_fused_blocksn

    frames, layers, height, width = 60, 4, 1088, 1920
    group = 6
    tables, colors = build_scene_edges(frames, layers, height, width)
    ul = [[cells_split_delta_native(t, height, width) for t in ft]
          for ft in tables]
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        ul, height, width, group=group)
    args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))
    colors_j = jnp.asarray(colors)

    def timed(render, k):
        def one(uv, prev):
            out = render(args[0], args[1], args[2], args[3], args[4],
                         uv + prev * 1e-30, colors_j, frames, layers,
                         ns, nc, group=group)
            return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

        @jax.jit
        def run(uv):
            return jax.lax.fori_loop(0, k, lambda i, a: one(uv, a), 0.0)
        float(run(args[5]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(args[5]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # Correctness first.
    base = np.asarray(render_fused_blocksn(*args, colors_j, frames, layers,
                                           ns, nc, group=group))
    got = np.asarray(render_lmask(*args, colors_j, frames, layers, ns, nc,
                                  group=group))
    print(json.dumps({"bit_identical": bool(np.array_equal(got, base))}))

    for name, render in (("fusedn", render_fused_blocksn),
                         ("lmask", render_lmask)):
        dt = (timed(render, 3) - timed(render, 1)) / 2
        px = frames * height * width
        print(json.dumps({"kernel": name, "ms": round(dt * 1e3, 2),
                          "gpx_s": round(px / dt / 1e9, 3)}))


if __name__ == "__main__":
    main()
