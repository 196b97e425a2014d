#!/usr/bin/env python3
"""Assemble an uncompressed .swf movie from corpus ast.json shapes.

The analog of the reference's tests/build.js:12-21 (which uses the external
swf-emitter package): feeds ground-truth capture (tools/capture_server.py)
by producing a movie the real Flash player can load.

Usage:
    python tools/build_movie.py out.swf path/to/ast.json [more ast.json ...]
    python tools/build_movie.py out.swf --corpus flat-shapes/triangle ...
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from swf_renderer_tpu.models import ast, swf_binary  # noqa: E402
from swf_renderer_tpu.models.ast_io import parse_define_shape  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output", type=pathlib.Path)
    p.add_argument("asts", nargs="*", type=pathlib.Path,
                   help="ast.json files (DefineShape)")
    p.add_argument("--corpus", action="append", default=[],
                   help="corpus case relative to the reference tests dir, "
                        "e.g. flat-shapes/triangle")
    p.add_argument("--reference-tests", type=pathlib.Path,
                   default=pathlib.Path("/root/reference/tests"))
    p.add_argument("--background", default="ffffff",
                   help="background color rrggbb hex")
    p.add_argument("--shape4", action="store_true",
                   help="emit DefineShape4 tags (LINESTYLE2: caps/joins/"
                        "miter preserved)")
    args = p.parse_args(argv)

    paths = list(args.asts)
    for case in args.corpus:
        paths.append(args.reference_tests / case / "ast.json")
    if not paths:
        p.error("no shapes given")

    shapes = []
    for i, path in enumerate(paths):
        tag = parse_define_shape(json.loads(path.read_text()))
        # Re-number so ids are unique within the movie.
        shapes.append(
            ast.DefineShape(id=i + 1, bounds=tag.bounds, shape=tag.shape)
        )

    bg = int(args.background, 16)
    movie = swf_binary.emit_movie(
        shapes,
        background=ast.StraightSRgba8(
            (bg >> 16) & 0xFF, (bg >> 8) & 0xFF, bg & 0xFF, 255
        ),
        shape4=args.shape4,
    )
    args.output.write_bytes(movie)
    print(f"wrote {args.output} ({len(movie)} bytes, {len(shapes)} shapes)")


if __name__ == "__main__":
    main()
