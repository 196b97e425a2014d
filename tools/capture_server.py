#!/usr/bin/env python3
"""Ground-truth capture server.

Python port of the reference's golden-capture tool
(reference tests/capture/server/index.js): a Flash movie (or any client)
POSTs its raw ARGB framebuffer to ``/<name>?width=W&height=H``; the server
converts ARGB -> RGBA and writes ``<name>.pam`` next to the server.  Serves
``/crossdomain.xml`` so the Flash player will allow the POST.

Usage: python tools/capture_server.py [--port 3000] [--out DIR]
"""

from __future__ import annotations

import argparse
import pathlib
import re
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

CROSSDOMAIN = (
    '<?xml version="1.0"?>\n'
    '<!DOCTYPE cross-domain-policy SYSTEM '
    '"http://www.adobe.com/xml/dtds/cross-domain-policy.dtd">\n'
    "<cross-domain-policy>\n"
    '  <allow-access-from domain="*" to-ports="*"/>\n'
    "</cross-domain-policy>\n"
)

NAME_RE = re.compile(r"^[A-Za-z0-9._-]+$")


def argb_to_rgba(data: bytes) -> bytes:
    out = bytearray(len(data))
    for i in range(0, len(data), 4):
        a, r, g, b = data[i : i + 4]
        out[i : i + 4] = bytes((r, g, b, a))
    return bytes(out)


def to_pam(width: int, height: int, rgba: bytes) -> bytes:
    header = (
        f"P7\nWIDTH {width}\nHEIGHT {height}\nDEPTH 4\nMAXVAL 255\n"
        "TUPLTYPE RGB_ALPHA\nENDHDR\n"
    ).encode("ascii")
    return header + rgba


def make_handler(out_dir: pathlib.Path):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if urlparse(self.path).path == "/crossdomain.xml":
                body = CROSSDOMAIN.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/x-cross-domain-policy")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            t0 = time.time()
            parsed = urlparse(self.path)
            name = parsed.path.lstrip("/")
            query = parse_qs(parsed.query)
            try:
                width = int(query["width"][0])
                height = int(query["height"][0])
            except (KeyError, ValueError):
                self.send_error(400, "width and height query params required")
                return
            if not NAME_RE.match(name):
                self.send_error(400, "invalid capture name")
                return
            length = int(self.headers.get("Content-Length", "0"))
            data = self.rfile.read(length)
            if len(data) != width * height * 4:
                self.send_error(
                    400,
                    f"expected {width * height * 4} ARGB bytes, got {len(data)}",
                )
                return
            pam = to_pam(width, height, argb_to_rgba(data))
            out_path = out_dir / f"{name}.pam"
            out_path.write_bytes(pam)
            body = f"wrote {out_path} ({time.time() - t0:.3f}s)\n".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # request-latency log line
            print(f"[capture] {self.address_string()} {fmt % args}")

    return Handler


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=3000)
    parser.add_argument("--out", default=".")
    args = parser.parse_args()
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    server = HTTPServer(("127.0.0.1", args.port), make_handler(out_dir))
    print(f"capture server on http://127.0.0.1:{args.port} -> {out_dir}")
    server.serve_forever()


if __name__ == "__main__":
    main()
