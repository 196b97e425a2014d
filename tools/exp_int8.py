"""Experiment: int8-limb placement (3 x i8 matmuls at 2x MXU throughput).

Values quantize host-side to fixed point q = round(v * 2^S) (S=20, range
+-4, quantum ~1e-6 — far below the u8 output quantum), split into three
signed base-256 digits.  The kernel runs three int8 x int8 -> int32
matmuls per slot and combines them into ONE int32 accumulator
(acc += m0 + (m1<<8) + (m2<<16)); the resolve converts winding back to
f32 with a single scale.  Integer accumulation is EXACT for the quantized
values (no rounding anywhere until the final u8 quantize).

Usage: python tools/exp_int8.py  (runs on the attached TPU)
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
    BLK, LANE, STRIP_H, FILL_RULE_NONZERO, _iotas,
    _resolve_strip_packed, plane_rows_for, render_fused_blocksn,
)

S = 20  # fixed-point exponent


def limbs_of(vals: np.ndarray):
    q = np.round(vals.astype(np.float64) * (1 << S)).astype(np.int64)
    q = np.clip(q, -(1 << 23) + 1, (1 << 23) - 1)
    l0 = ((q + 128) & 255) - 128
    q1 = (q - l0) >> 8
    l1 = ((q1 + 128) & 255) - 128
    l2 = (q1 - l1) >> 8
    assert np.abs(l2).max() < 127
    return (l0.astype(np.int8), l1.astype(np.int8), l2.astype(np.int8),
            (l0 + 256.0 * l1 + 65536.0 * l2) / (1 << S))


def _kernel(sidx_ref, flags_ref, *rest, layers, ns1, n_chunks, group,
            plane_rows):
    lay_refs = rest[:group]
    colors_ref = rest[group]
    urc_ref, ucm_ref, l0_ref, l1_ref, l2_ref, out_ref, acc_ref = \
        rest[group + 1:]
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
            sl_ = slice(g * BLK, (g + 1) * BLK)
            rc = urc_ref[0, :, sl_]
            cm = ucm_ref[0, sl_, :]
            # Comparisons produce i1 vectors whose relayout to the packed
            # i8 tiling Mosaic rejects; round-trip through native i32.
            w = (cm <= lane).astype(jnp.int32).astype(jnp.int8)
            oh = (sub == rc)                           # (pr, BLK) bool
            acc = jnp.zeros((plane_rows, LANE), jnp.int32)
            for limb_ref, shift in ((l0_ref, 0), (l1_ref, 8),
                                    (l2_ref, 16)):
                limb = limb_ref[0, :, sl_].astype(jnp.int32)  # (1, BLK)
                u = jnp.where(oh, limb, 0).astype(jnp.int8)
                m = jax.lax.dot_general(
                    u, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = acc + (m if shift == 0
                             else jax.lax.shift_left(m, shift))
            layer = lay_refs[g][i]
            acc_ref[layer] = acc_ref[layer] + acc

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        f = packed // (layers * ns1)
        pk = _resolve_strip_packed(
            lambda lyr: acc_ref[lyr].astype(jnp.float32) * (1.0 / (1 << S)),
            lambda lyr, c: colors_ref[f, lyr, c],
            layers=layers, fill_rule=FILL_RULE_NONZERO,
            prefixed=True, chain=False, plane_rows=plane_rows)
        for j in range(n_chunks):
            out_ref[0, 0, :, j * LANE:(j + 1) * LANE] = (
                pk[j * STRIP_H:(j + 1) * STRIP_H, :])


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group"))
def run_int8(sidx, flags, lays, urc, ucm, l0, l1, l2, colors,
             frames, layers, n_strips, n_chunks, group):
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
            pl.BlockSpec((1, 1, group * BLK), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, group * BLK), in_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, STRIP_H, stride), out_index, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((layers, plane_rows, LANE),
                                   jnp.int32)],
    )
    kernel = functools.partial(
        _kernel, layers=layers, ns1=ns1, n_chunks=n_chunks, group=group,
        plane_rows=plane_rows)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, STRIP_H, stride), jnp.uint32),
    )(sidx, flags, *(lays[g] for g in range(group)), colors, urc, ucm,
      l0, l1, l2)


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
    l0, l1, l2, vq = limbs_of(gvv)
    args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm))
    limb_args = tuple(jnp.asarray(x) for x in (l0, l1, l2))

    # f32 reference on the QUANTIZED values (same numbers, same math
    # domain question aside) + the production f32 kernel for quality diff.
    ref = np.asarray(render_fused_blocksn(
        *tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv)),
        colors_j, frames, layers, ns, nc, group=group))[:, :ns]

    def one(prev):
        # Data-depend successive repetitions through colors (denormal-scale
        # perturbation; does not change the u8 output).
        out = run_int8(args[0], args[1], args[2], args[3], args[4],
                       limb_args[0], limb_args[1], limb_args[2],
                       colors_j + prev * 1e-30, frames, layers, ns, nc,
                       group)
        return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

    def timed(k):
        @jax.jit
        def run(uv):
            return jax.lax.fori_loop(0, k, lambda i, a: one(a) + uv * 0,
                                     0.0)
        float(run(jnp.float32(0)))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(run(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    out = np.asarray(run_int8(
        *args, *limb_args, colors_j, frames, layers, ns, nc,
        group))[:, :ns]
    # Quality: u8 channel diff vs the f32 production kernel.
    a8 = out.view(np.uint8)
    b8 = ref.view(np.uint8)
    dmax = int(np.abs(a8.astype(np.int16) - b8.astype(np.int16)).max())
    dt = (timed(9) - timed(1)) / 8
    print(json.dumps({"kind": "int8", "ms": round(dt * 1e3, 2),
                      "gpx_s": round(px / dt / 1e9, 3),
                      "max_u8_diff_vs_f32": dmax}))


if __name__ == "__main__":
    main()
