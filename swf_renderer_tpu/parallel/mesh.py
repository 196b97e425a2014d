"""Device-mesh parallelism for the rasterization grid.

The reference has no distributed backend at all (SURVEY.md §2.4); scaling is
a new design obligation.  The natural axes for a rasterizer:

* **frame data-parallelism** (``dp``): frames/ratio-steps are embarrassingly
  parallel — shard the batch dimension, no collectives on the hot path.
* **tile parallelism** (``tp``): for one huge frame, shard tile columns
  across chips; edge tables are small (KBs) and are replicated to every
  chip (the XLA partitioner materializes the broadcast over ICI), while the
  framebuffer — the big tensor — stays fully sharded.

Both are expressed as shardings over a ``jax.sharding.Mesh`` and compiled by
``jit``; XLA inserts any needed collectives.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pipeline import render_solid_batch


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp", "tp"),
              tp: int = 1) -> Mesh:
    """Build an (dp, tp) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    grid = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(grid, axis_names=tuple(axis_names))


def render_batch_dp(
    mesh: Mesh,
    edges_t,  # (B, P, 4, E) — B must divide by mesh dp size
    colors,  # (B, P, 4)
    height: int,
    width: int,
    use_pallas: bool = True,
):
    """Frame-sharded batched render: batch dim split over ``dp``; per-frame
    work is local, so the only communication is the initial scatter."""
    edges_sharding = NamedSharding(mesh, P("dp", None, None, None))
    colors_sharding = NamedSharding(mesh, P("dp", None, None))
    edges_t = jax.device_put(jnp.asarray(edges_t), edges_sharding)
    colors = jax.device_put(jnp.asarray(colors), colors_sharding)
    out_sharding = NamedSharding(mesh, P("dp", None, None, None))
    fn = jax.jit(
        functools.partial(
            render_solid_batch,
            height=height,
            width=width,
            use_pallas=use_pallas,
        ),
        out_shardings=out_sharding,
    )
    return fn(edges_t, colors)


def render_batch_dp_tp(
    mesh: Mesh,
    edges_t,  # (B, P, 4, E); B divisible by dp size
    colors,  # (B, P, 4)
    height: int,
    width: int,  # divisible by tp size
    use_pallas: bool = False,
):
    """Full 2D-sharded render step: frames split over ``dp``, tile columns
    split over ``tp``.  Edge tables are replicated along ``tp`` (small);
    the framebuffer — the large tensor — is sharded on both batch and width.
    """
    dp = mesh.shape["dp"]
    tp = mesh.shape["tp"]
    assert width % tp == 0, (width, tp)
    shard_w = width // tp

    def local_render(edges_local, colors_local):
        tp_idx = jax.lax.axis_index("tp")
        x_off = (tp_idx * shard_w).astype(jnp.float32)
        shifted = edges_local.at[:, :, 0, :].add(-x_off)
        shifted = shifted.at[:, :, 2, :].add(-x_off)
        return render_solid_batch(
            shifted, colors_local, height, shard_w, use_pallas=use_pallas
        )

    fn = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P("dp", None, "tp", None),
        check_vma=False,
    )
    return jax.jit(fn)(jnp.asarray(edges_t), jnp.asarray(colors))


def render_frame_tile_sharded(
    mesh: Mesh,
    edges_t,  # (P, 4, E) one frame
    colors,  # (P, 4)
    height: int,
    width: int,
    use_pallas: bool = False,
):
    """One large frame sharded by tile columns across the whole mesh.

    Edge tables are replicated (small); the framebuffer is sharded on its
    width axis across every device.  Each device rasterizes only its column
    span — the coverage math is position-independent, so we pass shifted
    pixel coordinates via a per-shard x-offset.
    """
    n = mesh.devices.size
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("x",))
    assert width % n == 0, f"width {width} must divide across {n} devices"
    shard_w = width // n

    def local_render(edges_local, colors_local):
        # Shift edges left by this shard's x offset, rasterize the local span.
        idx = jax.lax.axis_index("x")
        x_off = (idx * shard_w).astype(jnp.float32)
        shifted = edges_local.at[:, 0, :].add(-x_off)
        shifted = shifted.at[:, 2, :].add(-x_off)
        return render_solid_batch(
            shifted[None], colors_local[None], height, shard_w,
            use_pallas=use_pallas,
        )[0]

    fn = jax.shard_map(
        local_render,
        mesh=flat_mesh,
        in_specs=(P(), P()),
        out_specs=P(None, "x", None),
        # Per-shard pixel offsets make values axis-varying by construction;
        # no collectives run inside, so skip the varying-axes check.
        check_vma=False,
    )
    return jax.jit(fn)(jnp.asarray(edges_t), jnp.asarray(colors))
