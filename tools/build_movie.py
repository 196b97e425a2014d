#!/usr/bin/env python3
"""Assemble an uncompressed .swf movie from corpus ast.json tags.

The analog of the reference's tests/build.js:12-21 (which uses the external
swf-emitter package): feeds ground-truth capture (tools/capture_server.py)
by producing a movie the real Flash player can load.  Tags route by their
``type``: define-shape, define-morph-shape (placed at --ratio), and
define-bitmap (DefineBitsLossless) are all supported.

Usage:
    python tools/build_movie.py out.swf path/to/ast.json [more ast.json ...]
    python tools/build_movie.py out.swf --corpus flat-shapes/triangle ...
    python tools/build_movie.py out.swf --corpus flat-morph-shapes/homestuck-beta-29 --ratio 0.5
"""

import argparse
import dataclasses
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from swf_renderer_tpu.models import ast, swf_binary  # noqa: E402
from swf_renderer_tpu.models.ast_io import parse_tag  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output", type=pathlib.Path)
    p.add_argument("asts", nargs="*", type=pathlib.Path,
                   help="ast.json files (any supported define tag)")
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
    p.add_argument("--morph2", action="store_true",
                   help="emit DefineMorphShape2 tags (MORPHLINESTYLE2 "
                        "caps/joins + stroke-scaling flags preserved)")
    p.add_argument("--ratio", type=float, default=0.0,
                   help="morph placement ratio in [0, 1] (the golden "
                        "captures use 0 / 0.5 / 1)")
    args = p.parse_args(argv)

    paths = list(args.asts)
    for case in args.corpus:
        case_dir = args.reference_tests / case
        path = case_dir / "ast.json"
        if not path.exists() and case_dir.suffix == "":
            # bitmap fixtures live as <name>.ast.json files
            path = case_dir.parent / (case_dir.name + ".ast.json")
        paths.append(path)
    if not paths:
        p.error("no tags given")

    shapes, morphs, bitmaps = [], [], []
    for path in paths:
        tag = parse_tag(json.loads(path.read_text()))
        if isinstance(tag, ast.DefineShape):
            shapes.append(tag)
        elif isinstance(tag, ast.DefineMorphShape):
            morphs.append((tag, args.ratio))
        else:
            bitmaps.append(tag)

    # Bitmap fills reference bitmaps by character id, so ids are
    # preserved; colliding SHAPE ids (corpus samples all start at 1)
    # renumber onto the next id unused by ANY tag so far — allocating
    # only past bitmap/morph ids could hand out an id an earlier kept
    # shape already holds (duplicate characters: last define wins and a
    # shape silently vanishes from the movie).
    used = {t.id for t in bitmaps} | {m.id for m, _ in morphs}
    next_id = 1
    renumbered = []
    for tag in shapes:
        if tag.id in used:
            while next_id in used:
                next_id += 1
            tag = dataclasses.replace(tag, id=next_id)
        used.add(tag.id)
        renumbered.append(tag)

    bg = int(args.background, 16)
    movie = swf_binary.emit_movie(
        renumbered,
        background=ast.StraightSRgba8(
            (bg >> 16) & 0xFF, (bg >> 8) & 0xFF, bg & 0xFF, 255
        ),
        shape4=args.shape4,
        morphs=morphs,
        morph2=args.morph2,
        bitmaps=bitmaps,
    )
    args.output.write_bytes(movie)
    print(f"wrote {args.output} ({len(movie)} bytes, "
          f"{len(renumbered)} shapes, {len(morphs)} morphs, "
          f"{len(bitmaps)} bitmaps)")


if __name__ == "__main__":
    main()
