"""Trusted TPU timing over the axon tunnel.

Every synchronous host<->device round trip costs ~26 ms regardless of work
(measured latency floor), and ``block_until_ready`` may return early.  The
only reliable throughput methodology:

1. chain K repetitions of the workload inside ONE jitted call (each
   repetition's input derived from the previous output so XLA cannot
   collapse them),
2. force a scalar checksum to Python,
3. run with two different K and fit: t(K) = fixed + K * t_work.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def chained_timer(make_step, k_values=(2, 10), reps=3):
    """make_step() -> (fn, args) where fn(args, i) -> args (one workload
    repetition).  Returns estimated per-repetition seconds."""
    timings = {}
    for k in k_values:
        fn, args = make_step()

        @jax.jit
        def run_k(a):
            def body(i, acc):
                return fn(acc, i)

            out = jax.lax.fori_loop(0, k, body, a)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves)

        float(run_k(args))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(run_k(args))
            ts.append(time.time() - t0)
        timings[k] = min(ts)
    ks = sorted(timings)
    k0, k1 = ks[0], ks[-1]
    per_rep = (timings[k1] - timings[k0]) / (k1 - k0)
    fixed = timings[k0] - k0 * per_rep
    return per_rep, fixed, timings
