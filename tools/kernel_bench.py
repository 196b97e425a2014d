#!/usr/bin/env python3
"""Definitive kernel benchmarks with chained-K timing (run exclusively).

Each workload repeats K times inside one jitted fori_loop, with the input
perturbed per iteration from the loop counter so XLA cannot collapse
repetitions; per-iteration time = (t(K2) - t(K1)) / (K2 - K1), which cancels
the ~26 ms tunnel round-trip floor.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(step, args, k_values=(1, 9), reps=3):
    timings = {}
    for k in k_values:
        @jax.jit
        def run(a):
            def body(i, carry):
                return step(carry, i)
            out = jax.lax.fori_loop(0, k, body, a)
            return jax.tree_util.tree_reduce(
                lambda acc, leaf: acc + jnp.sum(leaf.astype(jnp.float32)),
                out, jnp.float32(0),
            )
        float(run(args))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(run(args))
            ts.append(time.time() - t0)
        timings[k] = min(ts)
    ks = sorted(timings)
    per = (timings[ks[-1]] - timings[ks[0]]) / (ks[-1] - ks[0])
    return per, timings


def main():
    from swf_renderer_tpu.ops import coverage as cov
    from swf_renderer_tpu.models.geometry import split_edges_y

    H, W = 720, 1280
    rng = np.random.default_rng(1)
    segs = []
    for _ in range(64):
        cx, cy = rng.uniform(100, 1100), rng.uniform(100, 600)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
        r = rng.uniform(20, 50, 8)
        pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1)
        cl = np.concatenate([pts, pts[:1]]).astype(np.float32)
        segs.append(np.concatenate([cl[:-1], cl[1:]], 1))
    local = split_edges_y(np.concatenate(segs))
    e_local = np.zeros((1, 4, ((len(local) + 127) // 128) * 128), np.float32)
    e_local[0, :, : len(local)] = local.T

    tri = np.array([[10, 10, 500, 30], [500, 30, 250, 700],
                    [250, 700, 10, 10]], np.float32)
    e_tri = np.zeros((1, 4, 128), np.float32)
    e_tri[0, :, :3] = tri.T

    cases = [
        ("direct streaming, triangle E=128", cov.coverage_pallas, e_tri),
        ("direct streaming, 64 shapes E=%d" % e_local.shape[2],
         cov.coverage_pallas, e_local),
        ("grouped, triangle E=128", cov.coverage_grouped, e_tri),
        ("banded, triangle E=128", cov.coverage_banded, e_tri),
        ("banded, 64 shapes", cov.coverage_banded, e_local),
    ]
    for label, fn, edges in cases:
        edges_j = jnp.asarray(edges)

        def step(carry, i, fn=fn, edges_j=edges_j):
            # Perturb the input from the carry so iterations chain.
            e = edges_j + carry * 1e-12
            out = fn(e, H, W)
            return jnp.float32(jnp.sum(out) * 1e-9)

        try:
            per, timings = chain_time(step, jnp.float32(0))
            gpx = H * W / per / 1e9
            print(f"{label}: {per*1e3:.3f} ms/iter = {gpx:.2f} Gpx/s "
                  f"(raw {dict((k, round(v*1e3,1)) for k,v in timings.items())})",
                  flush=True)
        except Exception as ex:
            print(f"{label}: FAILED {type(ex).__name__}: {str(ex)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
