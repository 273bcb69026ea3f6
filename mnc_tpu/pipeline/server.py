"""HTTP serving front-end for the MNC pipeline.

The reference family had no serving story (single-shot scripts only —
SURVEY.md §1 note).  ``tools/serve.py`` provides the batch CLI; this module
adds the network-shaped entry point: a stdlib ``ThreadingHTTPServer`` with

- ``POST /detect`` — request body is an encoded image (jpg/png, decoded via
  cv2) or a raw ``.npy`` array (HWC uint8 BGR; magic-sniffed), response is
  the per-image detection JSON;
- ``GET /healthz`` — liveness probe.

Inference is serialized with a lock: one TPU pipeline, requests queue (the
device is the bottleneck, not the accept loop — threads only overlap I/O).
No external dependencies; the detect function is injected, so the server is
unit-testable without compiling a model.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

import numpy as np

_NPY_MAGIC = b"\x93NUMPY"


def decode_image(data: bytes) -> np.ndarray | None:
    """Encoded request body → BGR uint8 HWC array (None if undecodable)."""
    if data[: len(_NPY_MAGIC)] == _NPY_MAGIC:
        arr = np.load(io.BytesIO(data), allow_pickle=False)
        if arr.ndim == 3 and arr.shape[2] == 3:
            return arr.astype(np.uint8)
        return None
    try:
        import cv2

        return cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    except ImportError:
        return None


def make_http_server(detect_fn: Callable[[np.ndarray], dict],
                     host: str = "0.0.0.0",
                     port: int = 8080) -> ThreadingHTTPServer:
    """Build (not start) the server.  ``detect_fn``: BGR image → JSON dict.

    Start with ``server.serve_forever()``; ``server.server_address[1]``
    gives the bound port (pass ``port=0`` for an ephemeral one).
    """
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default; errors go to JSON
            pass

        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/health"):
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/detect":
                self._reply(404, {"error": "not found"})
                return
            n = int(self.headers.get("Content-Length") or 0)
            img = decode_image(self.rfile.read(n)) if n else None
            if img is None:
                self._reply(400, {"error": "undecodable image (send jpg/png "
                                           "or a HWC uint8 .npy)"})
                return
            try:
                with lock:
                    out = detect_fn(img)
            except Exception as e:  # surface, don't kill the server
                self._reply(500, {"error": repr(e)})
                return
            self._reply(200, out)

    return ThreadingHTTPServer((host, port), Handler)
