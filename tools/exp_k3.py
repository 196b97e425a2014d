"""Experiment: 3-pass placement -> one K-concatenated matmul per slot.

Instead of three (plane_rows, BLK) @ (BLK, LANE) bf16 passes (hi/mid/lo),
build u3 = onehot3 * parts3 as (plane_rows, 3*BLK) and one step matrix
w3 (3*BLK, LANE): same MXU FLOPs, one matmul issue, one accumulator add.

Usage: python tools/exp_k3.py  (runs on the attached TPU)
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

from bench import build_scene_edges, _enable_compile_cache
from swf_renderer_tpu.native.bindings import (
    cells_split_delta_native, pack_grouped_native,
)
from swf_renderer_tpu.ops.flatblock import (
    BLK, LANE, STRIP_H, FILL_RULE_NONZERO, _iotas, _place_delta,
    _resolve_acc_to_u32, plane_rows_for,
)


def _place_delta_k3(rc, cm, v, lane, sub):
    """One placement block as ONE (plane_rows, 3*BLK) @ (3*BLK, LANE)."""
    w1 = (cm <= lane).astype(jnp.bfloat16)          # (BLK, LANE)
    w3 = jnp.concatenate([w1, w1, w1], axis=0)      # (3BLK, LANE)
    onehot = (sub == rc).astype(jnp.float32)        # (plane_rows, BLK)
    hi = v.astype(jnp.bfloat16)
    hi32 = hi.astype(jnp.float32)
    mid = (v - hi32).astype(jnp.bfloat16)
    mid32 = mid.astype(jnp.float32)
    lo = (v - hi32 - mid32).astype(jnp.bfloat16)
    parts3 = jnp.concatenate(
        [hi.astype(jnp.float32), mid.astype(jnp.float32),
         lo.astype(jnp.float32)], axis=1)           # (1, 3BLK)
    onehot3 = jnp.concatenate([onehot, onehot, onehot], axis=1)
    u3 = (onehot3 * parts3).astype(jnp.bfloat16)
    return jnp.dot(u3, w3, preferred_element_type=jnp.float32)


def _kernel(sidx_ref, flags_ref, *rest, layers, ns1, n_chunks, group,
            plane_rows, k3):
    lay_refs = rest[:group]
    colors_ref = rest[group]
    urc_ref, ucm_ref, uval_ref, out_ref, acc_ref = rest[group + 1:]
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
            args = (urc_ref[0, :, g * BLK:(g + 1) * BLK],
                    ucm_ref[0, g * BLK:(g + 1) * BLK, :],
                    uval_ref[0, :, g * BLK:(g + 1) * BLK], lane, sub)
            delta = _place_delta_k3(*args) if k3 else _place_delta(*args)
            layer = lay_refs[g][i]
            acc_ref[layer] = acc_ref[layer] + delta

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        _resolve_acc_to_u32(acc_ref, colors_ref, out_ref, packed,
                            layers, ns1, n_chunks, FILL_RULE_NONZERO,
                            plane_rows=plane_rows)


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group", "k3"))
def run_variant(sidx, flags, lays, urc, ucm, uval, colors,
                frames, layers, n_strips, n_chunks, group, k3):
    ng = urc.shape[0]
    ns1 = n_strips + 1
    stride = n_chunks * LANE
    plane_rows = plane_rows_for(n_chunks)
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
            (1, 1, STRIP_H, stride), out_index, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((layers, plane_rows, LANE),
                                   jnp.float32)],
    )
    kernel = functools.partial(
        _kernel, layers=layers, ns1=ns1, n_chunks=n_chunks, group=group,
        plane_rows=plane_rows, k3=k3)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, STRIP_H, stride), jnp.uint32),
    )(sidx, flags, *(lays[g] for g in range(group)), colors, urc, ucm,
      uval)


def main():
    _enable_compile_cache()
    frames, layers, height, width = 60, 4, 1088, 1920
    tables, colors = build_scene_edges(frames, layers, height, width)
    ul = [[cells_split_delta_native(t, height, width) for t in ft]
          for ft in tables]
    colors_j = jnp.asarray(colors)
    px = frames * height * width
    group = 6
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        ul, height, width, group=group)
    args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))

    base = None
    for k3 in (False, True):
        def one(uv, prev):
            out = run_variant(
                args[0], args[1], args[2], args[3], args[4],
                uv + prev * 1e-30, colors_j, frames, layers, ns, nc,
                group, k3)
            return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

        def timed(k):
            @jax.jit
            def run(uv):
                return jax.lax.fori_loop(0, k,
                                         lambda i, a: one(uv, a), 0.0)
            float(run(args[5]))
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(run(args[5]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        out = np.asarray(run_variant(
            *args, colors_j, frames, layers, ns, nc, group, k3))[:, :ns]
        if base is None:
            base = out
            same = True
        else:
            same = bool(np.array_equal(out, base))
        dt = (timed(9) - timed(1)) / 8
        print(json.dumps({"k3": k3, "ms": round(dt * 1e3, 2),
                          "gpx_s": round(px / dt / 1e9, 3),
                          "matches": same}))


if __name__ == "__main__":
    main()
