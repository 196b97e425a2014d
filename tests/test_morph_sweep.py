"""On-device morph sweep (ops/morph.py) vs the per-ratio host oracle."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from swf_renderer_tpu.models import display
from swf_renderer_tpu.models.ast_io import parse_define_morph_shape
from swf_renderer_tpu.models.decode_morph_shape import decode_morph_shape
from swf_renderer_tpu.models.geometry import Affine, TWIPS_PER_PX
from swf_renderer_tpu.models.morph_geometry import morph_fill_edge_pairs
from swf_renderer_tpu.ops.composite import premul_to_straight_u8
from swf_renderer_tpu.ops.coverage import coverage_numpy
from swf_renderer_tpu.ops.morph import (
    morph_frames_to_u8,
    morph_pieces,
    render_morph_sweep,
)


def _oracle_frame(pairs, ratio, height, width):
    from swf_renderer_tpu.ops.composite import composite_draws

    covs, colors = [], []
    for es, ee, cs, ce in pairs:
        edges = es * (1.0 - ratio) + ee * ratio
        covs.append(coverage_numpy(edges, height, width))
        colors.append(np.asarray(cs) * (1 - ratio) + np.asarray(ce) * ratio)
    fields = np.broadcast_to(
        np.asarray(colors, np.float32)[:, None, None, :],
        (len(covs), height, width, 4))
    pm = composite_draws(jnp.asarray(np.stack(covs), jnp.float32),
                         jnp.asarray(fields))
    return np.asarray(premul_to_straight_u8(pm))


def test_morph_sweep_matches_host_oracle(reference_tests):
    d = reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((d / "ast.json").read_text())
    stage = display.stage_for_morph_shape(tag, 0.0)
    ctm = Affine.scaling(1 / TWIPS_PER_PX, 1 / TWIPS_PER_PX).then(
        Affine.from_swf_matrix(stage.children[0].matrix))
    pairs = morph_fill_edge_pairs(decode_morph_shape(tag), ctm)

    parts = morph_pieces(pairs)
    ratios = np.array([0.0, 0.25, 0.5, 1.0], np.float32)
    out = render_morph_sweep(
        jnp.asarray(ratios), *(jnp.asarray(x) for x in parts),
        stage.height, stage.width)
    got = morph_frames_to_u8(out, stage.height, stage.width)

    for i, r in enumerate(ratios):
        want = _oracle_frame(pairs, float(r), stage.height, stage.width)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, (r, diff.max())
        assert (diff > 0).mean() < 0.01


def test_morph_pieces_split_bound():
    # A steep edge pair splits so |dy| <= 1 for BOTH endpoint tables.
    es = np.array([[0.0, 0.0, 3.0, 7.2]], np.float32)
    ee = np.array([[1.0, 2.0, 1.0, 4.5]], np.float32)
    tab_s, tab_e, suby_s, suby_e, cs, ce = morph_pieces(
        [(es, ee, (1, 0, 0, 1), (0, 1, 0, 1))], e_multiple=8)
    for tab in (tab_s, tab_e):
        dy = np.abs(tab[0, 3, 0] - tab[0, 1, 0])
        assert dy.max() <= 1.0 + 1e-6
    # Pieces chain continuously and reconstruct the original endpoints.
    k = 8  # ceil(7.2) pieces
    assert np.allclose(tab_s[0, 2, 0, k - 1], 3.0)
    assert np.allclose(tab_s[0, 3, 0, k - 1], 7.2)
    assert np.allclose(tab_e[0, 3, 0, k - 1], 4.5)
