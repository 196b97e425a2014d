"""Fused, fully-jittable batched render pipeline.

The reference rasterizes one shape at a time through stateful Canvas2D calls
(reference canvas-renderer.ts:114-129); its Rust backend draws a single
display item per frame (rs/src/headless_renderer.rs:402-404).  Here the whole
workload is batched into dense arrays — (frames, draws, edges) — so one jit
compilation covers a 60-frame multi-layer scene and XLA/Pallas keep the chip
busy.  This is the "training step" analog used by the benchmark and the
multi-chip entry point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .composite import premul_to_straight_u8
from .coverage import (
    FILL_RULE_NONZERO,
    SMEM_EDGE_CAP,
    coverage_banded,
    coverage_pallas,
    coverage_xla,
    _on_tpu,
)


@functools.partial(jax.jit, static_argnames=("height", "width", "fill_rule",
                                             "use_pallas"))
def render_solid_batch(
    edges_t: jax.Array,
    colors: jax.Array,
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    use_pallas: bool = True,
) -> jax.Array:
    """Render a batch of frames made of solid-fill draws.

    edges_t: (B, P, 4, E) f32 — B frames, P draws per frame (padded; all-zero
        draws are no-ops), edge tables in device pixels.  For best TPU
        performance pre-split edges to bounded y-extent
        (geometry.split_edges_y) so the banded kernel's windows are tight.
    colors: (B, P, 4) f32 straight RGBA per draw.
    Returns (B, H, W, 4) uint8 frames (straight alpha).
    """
    b, p, four, e = edges_t.shape
    flat = edges_t.reshape(b * p, four, e)
    if use_pallas and _on_tpu():
        if e <= SMEM_EDGE_CAP:
            cov = coverage_banded(flat, height, width, fill_rule)
        else:
            cov = coverage_pallas(flat, height, width, fill_rule)
    else:
        cov = coverage_xla(flat, height, width, fill_rule)
    cov = cov.reshape(b, p, height, width)

    from .composite import composite_solid_layers

    frames_pm = jax.vmap(composite_solid_layers)(cov, colors)
    return premul_to_straight_u8(frames_pm)


@functools.partial(jax.jit, static_argnames=("height", "width", "fill_rule",
                                             "use_pallas"))
def render_morph_batch(
    edges_start: jax.Array,
    edges_end: jax.Array,
    colors_start: jax.Array,
    colors_end: jax.Array,
    ratios: jax.Array,
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    use_pallas: bool = True,
) -> jax.Array:
    """Rasterize a morph shape at a whole batch of ratio steps on device.

    edges_start/edges_end: (P, 4, E) paired draw tables (same topology; see
        models.morph_geometry).  colors_*: (P, 4).  ratios: (R,).
    Returns (R, H, W, 4) uint8 frames.

    The lerp happens on device — one upload of two edge tables serves every
    ratio step, replacing the reference's per-ratio CPU command interpolation
    (reference canvas-renderer.ts:207-266).
    """
    r = ratios.shape[0]
    rr = ratios[:, None, None, None].astype(jnp.float32)
    edges = edges_start[None] * (1.0 - rr) + edges_end[None] * rr  # (R,P,4,E)
    rc = ratios[:, None, None].astype(jnp.float32)
    colors = colors_start[None] * (1.0 - rc) + colors_end[None] * rc  # (R,P,4)
    return render_solid_batch(
        edges, colors, height, width, fill_rule=fill_rule,
        use_pallas=use_pallas,
    )
