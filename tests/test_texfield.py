"""MXU bitmap-field kernel (ops/texfield.py) vs the gather oracle
(style.paint_field_traced): same sampling semantics, gather-free.

Weights are built identically; only summation order differs, so the
kernel must agree to float rounding (~1e-6) across every fetch mode —
repeat/clamp/canvas x bilinear/nearest x supersample counts."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from swf_renderer_tpu.ops import style as style_ops
from swf_renderer_tpu.ops.texfield import bitmap_field_planes


def _invs(n, scale=0.2):
    out = []
    for t in np.linspace(0.0, 1.1, n):
        a, b = scale * np.cos(t), scale * np.sin(t)
        out.append((a, b, -b, a, -1.0 + t, 2.0 - t))
    return np.asarray(out, np.float32)


@pytest.mark.parametrize(
    "repeating,smoothed,edge_mode,supersample",
    [
        (True, True, "flash", 2),
        (False, True, "flash", 2),
        (False, True, "canvas", 4),
        (True, False, "flash", 1),
        (False, False, "canvas", 2),
        (False, False, "flash", 2),
        (True, True, "flash", 1),
    ])
def test_texfield_matches_gather_oracle(repeating, smoothed, edge_mode,
                                        supersample):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (11, 13, 4)).astype(np.uint8)
    invs = _invs(3)
    p = style_ops.Paint(
        kind=style_ops.PAINT_BITMAP, image=img,
        inv_matrix=tuple(invs[0]), repeating=repeating,
        smoothed=smoothed, edge_mode=edge_mode, supersample=supersample)
    want = np.stack([
        np.asarray(style_ops.paint_field_traced(p, jnp.asarray(iv),
                                                30, 44))
        for iv in invs])
    got = np.asarray(bitmap_field_planes(
        img, invs, 30, 44, supersample=supersample, repeating=repeating,
        smoothed=smoothed, edge_mode=edge_mode))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_texfield_extreme_zoom_and_offsets():
    """Far-outside coordinates (big translations, strong downscale)
    exercise clamp and wrap arithmetic away from the texture."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (7, 9, 4)).astype(np.uint8)
    invs = np.asarray([
        (3.0, 0.5, -0.5, 3.0, -40.0, 25.0),
        (0.01, 0.0, 0.0, 0.01, 4.0, 4.0),
    ], np.float32)
    for repeating in (False, True):
        p = style_ops.Paint(
            kind=style_ops.PAINT_BITMAP, image=img,
            inv_matrix=tuple(invs[0]), repeating=repeating,
            smoothed=True, edge_mode="flash", supersample=2)
        want = np.stack([
            np.asarray(style_ops.paint_field_traced(
                p, jnp.asarray(iv), 16, 24))
            for iv in invs])
        got = np.asarray(bitmap_field_planes(
            img, invs, 16, 24, supersample=2, repeating=repeating,
            smoothed=True, edge_mode="flash"))
        np.testing.assert_allclose(got, want, atol=5e-6)


def test_bake_sweep_fields_routes_bitmaps_through_kernel():
    """bake_sweep_fields takes the MXU kernel for small bitmap textures
    and the paint_field_traced map for gradients — outputs agree with
    the all-gather-path bake either way."""
    from swf_renderer_tpu.ops.transform import (
        bake_sweep_fields, sweep_paints,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 8, 4)).astype(np.uint8)
    bp = style_ops.Paint(
        kind=style_ops.PAINT_BITMAP,
        inv_matrix=(0.25, 0.05, -0.05, 0.25, 0.5, -0.5), image=img,
        repeating=True, smoothed=True, supersample=2)
    gp = style_ops.Paint(
        kind=style_ops.PAINT_LINEAR,
        inv_matrix=(900.0, 40.0, -40.0, 900.0, -16384.0, 0.0),
        stop_ratios=np.array([0.0, 1.0], np.float32),
        stop_colors=np.array([[1, 0, 0, 1], [0, 0, 1, 1]], np.float32),
        color_space="linear-rgb")
    mats = np.stack([
        np.array([np.cos(t), np.sin(t), -np.sin(t), np.cos(t), 0, 0],
                 np.float32) for t in np.linspace(0, 1, 5)])
    kps, gm, specs = sweep_paints([bp, gp], mats, allow_fields=True)
    got = np.asarray(bake_sweep_fields(specs, 20, 24))

    import jax

    want = []
    for spec in specs:
        want.append(np.stack([
            np.asarray(style_ops.paint_field_traced(
                spec.paint, jnp.asarray(iv), 20, 24))
            for iv in spec.invs]))
    np.testing.assert_allclose(got, np.stack(want), atol=2e-6)
