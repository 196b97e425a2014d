"""Experiment: decompose the flagship pipeline + measure design primitives.

Run on the real chip:  PYTHONPATH="/root/repo:$PYTHONPATH" python tools/exp_scatter.py A B C ...

Experiments:
  A  segment_sum scatter alone at bench scale (current flags)
  B  segment_sum with unique_indices=True as well
  C  resolve_frames alone at bench scale
  D  pallas grid-step overhead: trivial kernel, many steps
  E  one-hot placement matmul throughput (8,K)@(128,K)^T at HIGHEST vs bf16x3
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_scene_edges, _enable_compile_cache
from swf_renderer_tpu.native.bindings import cells_split_delta_native
from swf_renderer_tpu.ops.resolve import (
    LANE, STRIP_H, pack_updates, resolve_frames,
)

_enable_compile_cache()

FRAMES, LAYERS, H, W = 60, 4, 1088, 1920
STRIDE = ((W + 1 + LANE - 1) // LANE) * LANE
HP = H + (-H % STRIP_H)
PLANE = HP * STRIDE


def scene_updates():
    tables, colors = build_scene_edges(FRAMES, LAYERS, H, W)
    flat = [tables[i][j] for i in range(FRAMES) for j in range(LAYERS)]
    ups = [cells_split_delta_native(t, H, W) for t in flat]
    rows, cols, vals = pack_updates(ups)
    rows = rows.reshape(FRAMES, LAYERS, -1)
    cols = cols.reshape(FRAMES, LAYERS, -1)
    vals = vals.reshape(FRAMES, LAYERS, -1)
    return rows, cols, vals, colors


def timeit(fn, *args, reps=3):
    out = fn(*args)
    csum = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        csum = float(
            jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
        )
        ts.append(time.time() - t0)
    return min(ts), csum


def exp_A_B(unique):
    rows, cols, vals, _ = scene_updates()
    n = rows.shape[-1]
    cf = 4

    @jax.jit
    def scatter_all(r, c, v):
        def one_chunk(_, inp):
            fr, fc, fv = inp
            fb = jnp.arange(cf, dtype=jnp.int32)[:, None, None] * (
                LAYERS * PLANE
            )
            lb = jnp.arange(LAYERS, dtype=jnp.int32)[None, :, None] * PLANE
            idx = fb + lb + fr * STRIDE + fc
            planes = jax.ops.segment_sum(
                fv.reshape(-1), idx.reshape(-1),
                num_segments=cf * LAYERS * PLANE,
                indices_are_sorted=True, unique_indices=unique,
            )
            return None, jnp.sum(planes * planes)
        chunked = tuple(
            x.reshape((FRAMES // cf, cf) + x.shape[1:])
            for x in (r, c, v)
        )
        _, s = jax.lax.scan(one_chunk, None, chunked)
        return jnp.sum(s)

    t, cs = timeit(scatter_all, rows, cols, vals)
    nup = FRAMES * LAYERS * n
    print(f"[{'B' if unique else 'A'}] scatter {'unique' if unique else 'sorted'}: "
          f"{t*1e3:.1f} ms total, {t/nup*1e9:.1f} ns/update ({nup} updates) "
          f"csum={cs:.3e}")


def exp_C():
    rows, cols, vals, colors = scene_updates()
    cf = 4
    key = jax.random.PRNGKey(0)
    planes = jax.random.normal(key, (cf, LAYERS, HP, STRIDE), jnp.float32)
    col = jnp.asarray(colors[:cf])

    @jax.jit
    def run(p, c):
        def body(i, acc):
            out = resolve_frames(p + acc * 1e-9, c)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, FRAMES // cf, body, 0.0)

    t, cs = timeit(run, planes, col)
    px = FRAMES * H * W
    print(f"[C] resolve alone: {t*1e3:.1f} ms for {FRAMES} frames "
          f"({px/t/1e9:.2f} Gpx/s) csum={cs:.3e}")


def exp_D():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for steps in (16384, 131072):
        def kernel(x_ref, o_ref):
            o_ref[0, :, :] = x_ref[0, :, :] + 1.0

        x = jnp.zeros((steps, 8, 128), jnp.float32)

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((steps, 8, 128), jnp.float32),
                grid=(steps,),
                in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(x)

        t, cs = timeit(run, x)
        print(f"[D] {steps} grid steps: {t*1e3:.2f} ms, "
              f"{t/steps*1e9:.0f} ns/step csum={cs:.3e}")


def exp_E():
    # Placement matmul throughput: per bin (8,Kc)@(128,Kc)^T.
    # Compare HIGHEST vs manual bf16x3 split, batched over many bins.
    bins, kc = 8192, 32
    key = jax.random.PRNGKey(1)
    a = jax.random.normal(key, (bins, 8, kc), jnp.float32)
    p = (jax.random.uniform(key, (bins, 128, kc)) < 0.05).astype(jnp.float32)

    def dot_h(a1, p1):
        return jax.lax.dot_general(
            a1, p1, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def dot_3(a1, p1):
        hi = a1.astype(jnp.bfloat16)
        mid = (a1 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        lo = (a1 - hi.astype(jnp.float32) - mid.astype(jnp.float32)).astype(
            jnp.bfloat16)
        pb = p1.astype(jnp.bfloat16)
        def d(x):
            return jax.lax.dot_general(
                x, pb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        return d(hi) + d(mid) + d(lo)

    for name, f in (("HIGHEST", dot_h), ("bf16x3", dot_3)):
        @jax.jit
        def run(a, p, f=f):
            def body(i, acc):
                return acc + jnp.sum(f(a + acc * 1e-12, p))
            return jax.lax.fori_loop(0, 20, body, 0.0)
        t, cs = timeit(run, a, p)
        per_bin = t / (20 * bins)
        print(f"[E] {name}: {per_bin*1e9:.0f} ns/bin "
              f"({bins} bins x 20 reps = {t*1e3:.1f} ms) csum={cs:.3e}")
    # Exactness check of bf16x3 vs fp64 on CPU-representative data:
    da = np.asarray(dot_h(a[:64], p[:64]))
    d3 = np.asarray(dot_3(a[:64], p[:64]))
    print(f"[E] max |HIGHEST - bf16x3| = {np.abs(da - d3).max():.3e}")


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"A", "B", "C", "D", "E"}
    print("devices:", jax.devices())
    if "A" in which:
        exp_A_B(False)
    if "B" in which:
        exp_A_B(True)
    if "C" in which:
        exp_C()
    if "D" in which:
        exp_D()
    if "E" in which:
        exp_E()
