#!/usr/bin/env python
"""Minimal HTTP inference server (`docker/serve` torchserve analogue).

POST /predict with a JPEG/PNG body -> JSON detections
    {"detections": [{"bbox": [x1, y1, x2, y2], "score": s, "label": c}, ...]}
GET /ping -> health check.

Stdlib http.server only — the model is jit-compiled once at startup and
every request reuses the cached executable (fixed input shape via the
test pipeline's resize+pad).
"""

import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--score-thr", type=float, default=0.3)
    args = ap.parse_args()

    import cv2
    import numpy as np
    from panoswintransformerobjectdetection_tpu.apis.inference import (
        init_detector, inference_detector)

    det, variables = init_detector(args.config, args.checkpoint)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/ping":
                body = b'{"status": "healthy"}'
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            buf = np.frombuffer(self.rfile.read(n), np.uint8)
            img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            if img is None:
                self.send_error(400, "not an image")
                return
            per_class = inference_detector(det, variables, img)
            dets = []
            for c, arr in enumerate(per_class):
                for row in arr:
                    if row[4] >= args.score_thr:
                        dets.append({"bbox": [float(v) for v in row[:4]],
                                     "score": float(row[4]), "label": c})
            body = json.dumps({"detections": dets}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):
            pass

    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port} (POST /predict, GET /ping)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
