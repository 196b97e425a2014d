"""Native (C++) geometry compiler golden tests.

Mirrors the reference Rust in-crate tests (reference rs/src/lib.rs:38-70):
decode every flat-shapes sample and compare the Debug-format log byte-exactly
against ``shape.rs.log``.
"""

import pathlib

import pytest

from swf_renderer_tpu.models.ast_io import parse_define_shape

native = pytest.importorskip("swf_renderer_tpu.native.bindings")

if not native.native_available():
    pytest.skip("native library unavailable (no C++ toolchain?)",
                allow_module_level=True)

SAMPLES = ["triangle", "squares", "homestuck-beta-1"]


@pytest.mark.parametrize("sample", SAMPLES)
def test_native_decode_matches_rs_golden(sample, reference_tests, artifacts_dir):
    sample_dir = reference_tests / "flat-shapes" / sample
    tag = parse_define_shape((sample_dir / "ast.json").read_text())
    actual = native.format_rs_log(tag) + "\n"
    out = artifacts_dir / f"flat-shapes_{sample}"
    out.mkdir(parents=True, exist_ok=True)
    (out / "tmp-shape.rs.log").write_text(actual)
    expected = (sample_dir / "shape.rs.log").read_text()
    assert actual == expected


def test_native_paths_structure(reference_tests):
    tag = parse_define_shape(
        (reference_tests / "flat-shapes" / "triangle" / "ast.json").read_text()
    )
    paths = native.decode_shape_native(tag)
    assert len(paths) == 1
    assert paths[0].style_kind == 0  # fill
    assert paths[0].style_index == 4  # fill id 5
    assert paths[0].verbs[0] == 0 and all(v == 1 for v in paths[0].verbs[1:])
    assert paths[0].points[0] == (380.0, 6839.0)
