"""HBM streaming probes: XLA copy vs pallas passthrough vs layout."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _enable_compile_cache

_enable_compile_cache()

F, L, NS, LANE = 60, 4, 137, 128
GB = F * L * NS * LANE * LANE * 4 / 1e9


def chained(fn, args, ks=(1, 3)):
    times = {}
    for k in ks:
        @jax.jit
        def run(a, k=k):
            return jax.lax.fori_loop(0, k, lambda i, acc: fn(a, acc), 0.0)
        float(run(args))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(run(args))
            ts.append(time.time() - t0)
        times[k] = min(ts)
    k0, k1 = ks
    return (times[k1] - times[k0]) / (k1 - k0)


def main():
    key = jax.random.PRNGKey(0)
    planes = jax.random.normal(key, (F, L, NS, LANE, LANE), jnp.float32)
    planes_t = jnp.moveaxis(planes, 1, 2)  # (F, NS, L, 128, 128)
    planes_t = planes_t + 0.0  # materialize

    def p1(a, prev):
        return jnp.sum(jnp.copy(a + prev * 1e-30)[0, 0, 0, :1, :1])
    per = chained(p1, planes)
    print(f"[P1 xla copy] {per*1e3:.1f} ms  {2*GB/per:.0f} GB/s (r+w)")

    def passthrough(layout):
        if layout == "lns":
            in_spec = pl.BlockSpec((1, L, 1, LANE, LANE),
                                   lambda f, s: (f, 0, s, 0, 0))
            out_spec = pl.BlockSpec((1, L, 1, LANE, LANE),
                                    lambda f, s: (f, 0, s, 0, 0))
            shape = (F, L, NS, LANE, LANE)
        else:
            in_spec = pl.BlockSpec((1, 1, L, LANE, LANE),
                                   lambda f, s: (f, s, 0, 0, 0))
            out_spec = pl.BlockSpec((1, 1, L, LANE, LANE),
                                    lambda f, s: (f, s, 0, 0, 0))
            shape = (F, NS, L, LANE, LANE)

        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1.0

        def run(a, prev):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                grid=(F, NS),
                in_specs=[in_spec],
                out_specs=out_spec,
            )(a + prev * 1e-30)
            return jnp.sum(out[0, 0, 0, :1, :1])
        return run

    per = chained(passthrough("lns"), planes)
    print(f"[P2 pallas (F,L,NS)] {per*1e3:.1f} ms  {2*GB/per:.0f} GB/s")

    per = chained(passthrough("nsl"), planes_t)
    print(f"[P3 pallas (F,NS,L)] {per*1e3:.1f} ms  {2*GB/per:.0f} GB/s")

    # P4: read-only (tiny out) — isolates read stream.
    def kernel4(x_ref, o_ref):
        o_ref[0, 0, :, :] = jnp.sum(x_ref[...], axis=(0, 1, 2))

    def p4(a, prev):
        out = pl.pallas_call(
            kernel4,
            out_shape=jax.ShapeDtypeStruct((F, NS, LANE, LANE), jnp.float32),
            grid=(F, NS),
            in_specs=[pl.BlockSpec((1, 1, L, LANE, LANE),
                                   lambda f, s: (f, s, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, LANE, LANE),
                                   lambda f, s: (f, s, 0, 0)),
        )(a + prev * 1e-30)
        return jnp.sum(out[0, 0, :1, :1])
    per = chained(p4, planes_t)
    print(f"[P4 pallas read+sum] {per*1e3:.1f} ms  {GB/per:.0f} GB/s (read)")


if __name__ == "__main__":
    main()
