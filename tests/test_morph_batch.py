"""Device-batched morph rendering: one edge-pair upload, many ratio steps.

Checks the batched on-device lerp path produces the same frames as the
host-interpolated reference path on the morph golden fixture.
"""

import numpy as np
import jax.numpy as jnp

from swf_renderer_tpu.models import display
from swf_renderer_tpu.models.ast_io import parse_define_morph_shape
from swf_renderer_tpu.models.decode_morph_shape import decode_morph_shape
from swf_renderer_tpu.models.geometry import Affine, TWIPS_PER_PX
from swf_renderer_tpu.models.morph_geometry import morph_fill_edge_pairs
from swf_renderer_tpu.ops.pipeline import render_morph_batch
from swf_renderer_tpu.runtime.renderer import render_morph_shape


def test_morph_batch_matches_host_path(reference_tests):
    sample_dir = reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((sample_dir / "ast.json").read_text())
    stage = display.stage_for_morph_shape(tag, 0.0)
    ctm = Affine.scaling(1 / TWIPS_PER_PX, 1 / TWIPS_PER_PX).then(
        Affine.from_swf_matrix(stage.children[0].matrix)
    )

    morph = decode_morph_shape(tag)
    pairs = morph_fill_edge_pairs(morph, ctm)
    assert pairs, "fixture should have filled morph paths"

    e_max = max(es.shape[0] for es, _, _, _ in pairs)
    e_pad = max(128, ((e_max + 127) // 128) * 128)
    p = len(pairs)
    edges_s = np.zeros((p, 4, e_pad), np.float32)
    edges_e = np.zeros((p, 4, e_pad), np.float32)
    colors_s = np.zeros((p, 4), np.float32)
    colors_e = np.zeros((p, 4), np.float32)
    for i, (es, ee, cs, ce) in enumerate(pairs):
        edges_s[i, :, : es.shape[0]] = es.T
        edges_e[i, :, : ee.shape[0]] = ee.T
        colors_s[i] = cs
        colors_e[i] = ce

    ratios = np.array([0.0, 0.25, 0.5, 0.75, 1.0], np.float32)
    frames = np.asarray(
        render_morph_batch(
            jnp.asarray(edges_s), jnp.asarray(edges_e),
            jnp.asarray(colors_s), jnp.asarray(colors_e),
            jnp.asarray(ratios), stage.height, stage.width,
            use_pallas=False,
        )
    )
    assert frames.shape == (5, stage.height, stage.width, 4)

    from swf_renderer_tpu.utils.imagediff import pixelmatch
    from swf_renderer_tpu.utils.png import read_png

    for idx, ratio in [(0, 0.0), (2, 0.5), (4, 1.0)]:
        # Gate 1: same acceptance as the reference render tests, against the
        # Flash-captured goldens (the fixture's stroke is invisible: width 0,
        # alpha 0, so the fills-only batched path covers the whole image).
        golden = read_png(sample_dir / f"{int(ratio * (1 << 16))}.png")
        r = pixelmatch(frames[idx], golden, threshold=0.05)
        assert r.diff_ratio <= 1e-4, (ratio, r.diff_count, r.diff_ratio)

        # Gate 2: agreement with the host-interpolated path everywhere except
        # curve-flattening AA pixels (shared-t-grid vs adaptive flattening).
        want = render_morph_shape(tag, ratio, use_pallas=False)
        diff = np.abs(frames[idx].astype(int) - want.astype(int)).max(axis=-1)
        assert (diff > 8).mean() < 0.01, (ratio, (diff > 8).mean())
