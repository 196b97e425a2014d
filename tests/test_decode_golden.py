"""Decoder golden tests: byte-exact parity with the reference TS decoder.

Mirrors reference ts/src/test/decode-shape.spec.ts (exact string equality vs
``shape.ts.json``) and decode-morph-shape.spec.ts, over the same sample list.
"""

import pathlib

import pytest

from swf_renderer_tpu import decode_morph_shape, decode_shape
from swf_renderer_tpu.models.ast_io import (
    parse_define_morph_shape,
    parse_define_shape,
)
from swf_renderer_tpu.utils import jsjson

SHAPE_SAMPLES = [
    "flat-shapes/homestuck-beta-1",
    "flat-shapes/squares",
    "flat-shapes/triangle",
    "textured-shapes/homestuck-beta-4",
]

MORPH_SAMPLES = [
    "flat-morph-shapes/homestuck-beta-29",
]


@pytest.mark.parametrize("sample", SHAPE_SAMPLES)
def test_decode_shape_golden(sample: str, reference_tests: pathlib.Path, artifacts_dir):
    sample_dir = reference_tests / sample
    tag = parse_define_shape((sample_dir / "ast.json").read_text())
    shape = decode_shape(tag)
    actual = jsjson.stringify(shape.to_golden()) + "\n"
    out = artifacts_dir / sample.replace("/", "_")
    out.mkdir(parents=True, exist_ok=True)
    (out / "tmp-shape.ts.json").write_text(actual)
    expected = (sample_dir / "shape.ts.json").read_text()
    assert actual == expected


@pytest.mark.parametrize("sample", MORPH_SAMPLES)
def test_decode_morph_shape_golden(
    sample: str, reference_tests: pathlib.Path, artifacts_dir
):
    sample_dir = reference_tests / sample
    tag = parse_define_morph_shape((sample_dir / "ast.json").read_text())
    shape = decode_morph_shape(tag)
    actual = jsjson.stringify(shape.to_golden()) + "\n"
    out = artifacts_dir / sample.replace("/", "_")
    out.mkdir(parents=True, exist_ok=True)
    (out / "tmp-shape.ts.json").write_text(actual)
    expected = (sample_dir / "shape.ts.json").read_text()
    assert actual == expected
