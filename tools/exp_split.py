"""Experiment: where does fused-kernel time go? placement vs resolve.

Builds ablated variants of render_fused_blocksn (placement-only /
resolve-only / empty) on the headline scene and times each; the difference
attributes per-step time to the MXU placement slots vs the VPU resolve.
Outputs are garbage for the ablated variants — timing only.

Usage: python tools/exp_split.py   (runs on the attached TPU)
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

from bench import build_scene_edges
from swf_renderer_tpu.native.bindings import (
    cells_split_delta_native, pack_grouped_native,
)
from swf_renderer_tpu.ops.flatblock import (
    BLK, LANE, STRIP_H, FILL_RULE_NONZERO, _iotas, _place_delta,
    _resolve_acc_to_u32, plane_rows_for,
)


def _kernel(sidx_ref, flags_ref, *rest, layers, ns1, n_chunks, group,
            plane_rows, mode):
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

    if mode in ("full", "place"):
        nblk = jax.lax.shift_right_logical(flags, 2)
        run_all = nblk == 0
        for g in range(group):
            @pl.when(jnp.logical_or(run_all, g < nblk))
            def _place(g=g):
                delta = _place_delta(urc_ref[0, :, g * BLK:(g + 1) * BLK],
                                     ucm_ref[0, g * BLK:(g + 1) * BLK, :],
                                     uval_ref[0, :, g * BLK:(g + 1) * BLK],
                                     lane, sub)
                layer = lay_refs[g][i]
                acc_ref[layer] = acc_ref[layer] + delta

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        if mode in ("full", "resolve"):
            _resolve_acc_to_u32(acc_ref, colors_ref, out_ref, packed,
                                layers, ns1, n_chunks, FILL_RULE_NONZERO,
                                plane_rows=plane_rows)
        else:
            out_ref[...] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group", "mode"))
def run_variant(sidx, flags, lays, urc, ucm, uval, colors,
                frames, layers, n_strips, n_chunks, group, mode):
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
        plane_rows=plane_rows, mode=mode)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, STRIP_H, stride), jnp.uint32),
    )(sidx, flags, *(lays[g] for g in range(group)), colors, urc, ucm,
      uval)


def main():
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

    for mode in ("full", "place", "resolve", "none"):
        def one(uv, prev):
            out = run_variant(
                args[0], args[1], args[2], args[3], args[4],
                uv + prev * 1e-30, colors_j, frames, layers, ns, nc,
                group, mode)
            return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

        def timed(k):
            @jax.jit
            def run(uv):
                return jax.lax.fori_loop(0, k,
                                         lambda i, a: one(uv, a), 0.0)
            float(run(args[5]))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(args[5]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = (timed(9) - timed(1)) / 8
        print(json.dumps({"mode": mode, "ms": round(dt * 1e3, 2),
                          "gpx_s": round(px / dt / 1e9, 3)}))


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def _kernel0(sidx_ref, flags_ref, *rest, layers, ns1, n_chunks,
             plane_rows):
    colors_ref = rest[0]
    out_ref, acc_ref = rest[1:]
    i = pl.program_id(0)
    flags = flags_ref[i]

    @pl.when(jnp.bitwise_and(flags, 1) == 1)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        out_ref[...] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks"))
def run_none0(sidx, flags, colors, frames, layers, n_strips, n_chunks):
    """Grid + scalar prefetch + out flush + acc zeroing, NO array inputs:
    isolates the input-DMA share of the per-step infrastructure."""
    ng = sidx.shape[0]
    ns1 = n_strips + 1
    stride = n_chunks * LANE
    plane_rows = plane_rows_for(n_chunks)

    def out_index(i, *refs):
        packed = refs[0][i]
        return (packed // (layers * ns1), packed % ns1, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ng,),
        in_specs=[],
        out_specs=pl.BlockSpec(
            (1, 1, STRIP_H, stride), out_index, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((layers, plane_rows, LANE),
                                   jnp.float32)],
    )
    kernel = functools.partial(
        _kernel0, layers=layers, ns1=ns1, n_chunks=n_chunks,
        plane_rows=plane_rows)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, STRIP_H, stride), jnp.uint32),
    )(sidx, flags, colors)


def main_none0():
    frames, layers, height, width = 60, 4, 1088, 1920
    tables, colors = build_scene_edges(frames, layers, height, width)
    ul = [[cells_split_delta_native(t, height, width) for t in ft]
          for ft in tables]
    colors_j = jnp.asarray(colors)
    px = frames * height * width
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        ul, height, width, group=6)
    si, fl = jnp.asarray(gsi), jnp.asarray(gfl)

    def one(uv, prev):
        out = run_none0(si, fl, colors_j + prev * 1e-30, frames, layers,
                        ns, nc)
        return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12 + uv * 0

    def timed(k):
        @jax.jit
        def run(uv):
            return jax.lax.fori_loop(0, k, lambda i, a: one(uv, a), 0.0)
        float(run(jnp.float32(0)))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(run(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (timed(9) - timed(1)) / 8
    print(json.dumps({"mode": "none0-inputs", "ms": round(dt * 1e3, 2),
                      "gpx_s": round(px / dt / 1e9, 3)}))


if __name__ == "__main__" and "--none0" in sys.argv:
    main_none0()


def _kernel_b(sidx_ref, flags_ref, *rest, layers, ns1, n_chunks, group,
              plane_rows, kk):
    lay_refs = rest[:group]
    colors_ref = rest[group]
    urc_ref, ucm_ref, uval_ref, out_ref, acc_ref = rest[group + 1:]
    i = pl.program_id(0)
    packed = sidx_ref[i]
    flags = flags_ref[i]
    sub_i = jax.lax.rem(i, kk)
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
                urc_ref[0, sub_i, :, g * BLK:(g + 1) * BLK],
                ucm_ref[0, sub_i, g * BLK:(g + 1) * BLK, :],
                uval_ref[0, sub_i, :, g * BLK:(g + 1) * BLK],
                lane, sub)
            layer = lay_refs[g][i]
            acc_ref[layer] = acc_ref[layer] + delta

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        _resolve_acc_to_u32(acc_ref, colors_ref, out_ref, packed,
                            layers, ns1, n_chunks, FILL_RULE_NONZERO,
                            plane_rows=plane_rows)


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group", "kk"))
def run_batched_in(sidx, flags, lays, urc, ucm, uval, colors,
                   frames, layers, n_strips, n_chunks, group, kk):
    """Same grid, but K consecutive steps' inputs ride ONE revisited
    block each (index map i // K): K x fewer input DMA transfers."""
    ng = urc.shape[0]
    assert ng % kk == 0
    ns1 = n_strips + 1
    stride = n_chunks * LANE
    plane_rows = plane_rows_for(n_chunks)
    nsp = 2 + group + 1

    def out_index(i, *refs):
        packed = refs[0][i]
        return (packed // (layers * ns1), packed % ns1, 0, 0)

    def in_index(i, *refs):
        return (i // kk, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, kk, 1, group * BLK), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk, group * BLK, 1), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk, 1, group * BLK), in_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, STRIP_H, stride), out_index, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((layers, plane_rows, LANE),
                                   jnp.float32)],
    )
    kernel = functools.partial(
        _kernel_b, layers=layers, ns1=ns1, n_chunks=n_chunks, group=group,
        plane_rows=plane_rows, kk=kk)
    gb = group * BLK
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, STRIP_H, stride), jnp.uint32),
    )(sidx, flags, *(lays[g] for g in range(group)), colors,
      urc.reshape(ng // kk, kk, 1, gb), ucm.reshape(ng // kk, kk, gb, 1),
      uval.reshape(ng // kk, kk, 1, gb))


def main_batched():
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

    from swf_renderer_tpu.ops.flatblock import render_fused_blocksn
    ref = np.asarray(render_fused_blocksn(
        *args, colors_j, frames, layers, ns, nc, group=group))[:, :ns]

    for kk in (4, 8, 16):
        def one(uv, prev):
            out = run_batched_in(
                args[0], args[1], args[2], args[3], args[4],
                uv + prev * 1e-30, colors_j, frames, layers, ns, nc,
                group, kk)
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

        out = np.asarray(run_batched_in(
            *args, colors_j, frames, layers, ns, nc, group, kk))[:, :ns]
        same = bool(np.array_equal(out, ref))
        dt = (timed(9) - timed(1)) / 8
        print(json.dumps({"kk": kk, "ms": round(dt * 1e3, 2),
                          "gpx_s": round(px / dt / 1e9, 3),
                          "matches": same}))


if __name__ == "__main__" and "--batched" in sys.argv:
    main_batched()


def _kernel_m(sidx_ref, flags_ref, *rest, layers, ns1, n_chunks, group,
              plane_rows):
    lay_refs = rest[:group]
    colors_ref = rest[group]
    urcval_ref, ucm_ref, out_ref, acc_ref = rest[group + 1:]
    i = pl.program_id(0)
    packed = sidx_ref[i]
    flags = flags_ref[i]
    lane, sub = _iotas(plane_rows)
    gb = group * BLK

    @pl.when(jnp.bitwise_and(flags, 1) == 1)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nblk = jax.lax.shift_right_logical(flags, 2)
    run_all = nblk == 0
    for g in range(group):
        @pl.when(jnp.logical_or(run_all, g < nblk))
        def _place(g=g):
            delta = _place_delta(
                urcval_ref[0, :, g * BLK:(g + 1) * BLK],
                ucm_ref[0, g * BLK:(g + 1) * BLK, :],
                urcval_ref[0, :, gb + g * BLK:gb + (g + 1) * BLK],
                lane, sub)
            layer = lay_refs[g][i]
            acc_ref[layer] = acc_ref[layer] + delta

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        _resolve_acc_to_u32(acc_ref, colors_ref, out_ref, packed,
                            layers, ns1, n_chunks, FILL_RULE_NONZERO,
                            plane_rows=plane_rows)


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group"))
def run_merged(sidx, flags, lays, urcval, ucm, colors,
               frames, layers, n_strips, n_chunks, group):
    """urc and uval concatenated along lanes: 2 input DMAs per step."""
    ng = urcval.shape[0]
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
            pl.BlockSpec((1, 1, 2 * group * BLK), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * BLK, 1), in_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, STRIP_H, stride), out_index, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((layers, plane_rows, LANE),
                                   jnp.float32)],
    )
    kernel = functools.partial(
        _kernel_m, layers=layers, ns1=ns1, n_chunks=n_chunks, group=group,
        plane_rows=plane_rows)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, STRIP_H, stride), jnp.uint32),
    )(sidx, flags, *(lays[g] for g in range(group)), colors, urcval, ucm)


def main_merged():
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

    from swf_renderer_tpu.ops.flatblock import render_fused_blocksn
    ref = np.asarray(render_fused_blocksn(
        *args, colors_j, frames, layers, ns, nc, group=group))[:, :ns]

    urcval = jnp.asarray(np.concatenate([grc, gvv], axis=2))

    def one(uv, prev):
        out = run_merged(
            args[0], args[1], args[2], uv + prev * 1e-30, args[4],
            colors_j, frames, layers, ns, nc, group)
        return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

    def timed(k):
        @jax.jit
        def run(uv):
            return jax.lax.fori_loop(0, k, lambda i, a: one(uv, a), 0.0)
        float(run(urcval))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(run(urcval))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    out = np.asarray(run_merged(
        args[0], args[1], args[2], urcval, args[4], colors_j,
        frames, layers, ns, nc, group))[:, :ns]
    same = bool(np.array_equal(out, ref))
    dt = (timed(9) - timed(1)) / 8
    print(json.dumps({"mode": "merged-urc-uval", "ms": round(dt * 1e3, 2),
                      "gpx_s": round(px / dt / 1e9, 3), "matches": same}))


if __name__ == "__main__" and "--merged" in sys.argv:
    main_merged()
