#!/usr/bin/env python
"""Production HTTP serving for the detector — a deployment surface the
reference never had (its entry points are a gradio UI, yolo_seg/app.py:205-325,
and batch CLIs).  Stdlib-only (http.server), so it runs in any image.

Design (TPU-first):
  * ONE compiled program per (input geometry, retina flag, padded batch size):
    requests are dynamically batched by a collector thread, padded to the next
    power of two (≤ --max_batch) so XLA sees a small, fixed set of shapes.
  * The collector groups by (frame shape, conf, retina) — one device call per
    group, results scattered back to the waiting requests.
  * All device work stays on the single batcher thread; HTTP threads only
    decode JPEG/PNG bytes and wait on an event (no JAX re-entrancy).

Endpoints:
  GET  /healthz            → {"status": "ok", "platform": ...}
  GET  /stats              → request/batch counters
  POST /predict?conf=0.9&retina=1&max_polygon=0
       body: JPEG/PNG bytes → {"boxes": [[x1,y1,x2,y2],…], "conf": […],
       "cls": […], "polygons": [[[x,y],…],…], "batch": N}
       max_polygon: -1 (default) = all polygons, 0 = suppress, N = first N
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Request:
    __slots__ = ("frame", "conf", "retina", "max_polygon", "event", "result", "error")

    def __init__(self, frame, conf, retina, max_polygon=-1):
        self.frame = frame
        self.conf = conf
        self.retina = retina
        self.max_polygon = max_polygon  # -1 = all, 0 = none, N = first N
        self.event = threading.Event()
        self.result = None
        self.error = None


def _pad_pow2(n: int, cap: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return min(p, cap)


class Batcher(threading.Thread):
    """Collect requests for up to ``window_ms``, run them as padded device
    batches grouped by (shape, conf, retina)."""

    def __init__(self, model, imgsz: int = 640, max_batch: int = 16, window_ms: float = 5.0):
        super().__init__(daemon=True)
        self.model = model
        self.imgsz = imgsz
        self.max_batch = max_batch
        self.window_ms = window_ms
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "batched_frames": 0}
        self._stop = threading.Event()

    def submit(self, req: _Request) -> None:
        self.q.put(req)

    def stop(self) -> None:
        self._stop.set()
        self.q.put(None)  # wake the collector

    def _collect(self):
        first = self.q.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.window_ms / 1e3
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self.q.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:
                break
            batch.append(item)
        return batch

    def run(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            groups = {}
            for r in batch:
                groups.setdefault((r.frame.shape, r.conf, r.retina), []).append(r)
            for (shape, conf, retina), reqs in groups.items():
                try:
                    self._run_group(reqs, conf, retina)
                except Exception as e:  # report, don't kill the server
                    for r in reqs:
                        if r.event.is_set():
                            continue  # already answered successfully
                        r.error = f"{type(e).__name__}: {e}"
                        r.event.set()
        # shutdown: fail whatever is still queued so handler threads don't
        # block for the full request timeout
        while True:
            try:
                r = self.q.get_nowait()
            except queue.Empty:
                break
            if r is not None and not r.event.is_set():
                r.error = "server shutting down"
                r.event.set()

    def _run_group(self, reqs, conf, retina):
        n = len(reqs)
        padded = _pad_pow2(n, self.max_batch)
        frames = [r.frame for r in reqs] + [reqs[-1].frame] * (padded - n)
        results = self.model.predict(
            source=frames, conf=conf, retina_masks=retina, imgsz=self.imgsz
        )
        self.stats["requests"] += n
        self.stats["batches"] += 1
        self.stats["batched_frames"] += padded
        for r, res in zip(reqs, results[:n]):
            boxes = res.boxes
            out = {
                "boxes": np.asarray(boxes.xyxy).round(2).tolist(),
                "conf": np.asarray(boxes.conf).round(4).tolist(),
                "cls": np.asarray(boxes.cls).astype(int).tolist(),
                "batch": n,
            }
            if res.masks is not None and r.max_polygon != 0:
                xy = res.masks.xy
                if r.max_polygon > 0:
                    xy = xy[: r.max_polygon]
                out["polygons"] = [np.asarray(p).round(2).tolist() for p in xy]
            else:
                out["polygons"] = []
            r.result = out
            r.event.set()


def make_handler(batcher: Batcher, timeout_s: float = 60.0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            if os.environ.get("SERVE_VERBOSE"):
                super().log_message(fmt, *args)

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                import jax

                self._json(200, {"status": "ok", "platform": jax.default_backend()})
            elif path == "/stats":
                s = dict(batcher.stats)
                s["mean_batch"] = round(
                    s["batched_frames"] / max(s["batches"], 1), 2
                )
                self._json(200, s)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/predict":
                self._json(404, {"error": "unknown path"})
                return
            qs = parse_qs(parsed.query)
            try:
                conf = float(qs.get("conf", ["0.25"])[0])
            except ValueError:
                self._json(400, {"error": "conf must be a float"})
                return
            retina = qs.get("retina", ["0"])[0] not in ("0", "false", "")
            try:
                max_polygon = int(qs.get("max_polygon", ["-1"])[0])
            except ValueError:
                self._json(400, {"error": "max_polygon must be an int"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._json(400, {"error": "empty body (send JPEG/PNG bytes)"})
                return
            data = self.rfile.read(length)
            import cv2

            frame = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
            if frame is None:
                self._json(400, {"error": "could not decode image"})
                return
            req = _Request(frame, conf, retina, max_polygon)
            batcher.submit(req)
            if not req.event.wait(timeout_s):
                self._json(504, {"error": "inference timeout"})
                return
            if req.error is not None:
                self._json(500, {"error": req.error})
                return
            self._json(200, req.result)

    return Handler


class Server:
    """Owns the HTTP server + batcher; usable programmatically (tests) or via
    the CLI below."""

    def __init__(self, model=None, host="127.0.0.1", port=0, imgsz=640,
                 max_batch=16, window_ms=5.0, timeout_s=300.0):
        if model is None:
            from yolo_puncture_tpu.predict import YOLO

            model = YOLO("yolo10s-seg", nc=1)
        self.batcher = Batcher(model, imgsz=imgsz, max_batch=max_batch,
                               window_ms=window_ms)
        # generous default timeout: the FIRST request per (geometry, batch)
        # pays the XLA compile; steady state is milliseconds
        self.httpd = ThreadingHTTPServer(
            (host, port), make_handler(self.batcher, timeout_s=timeout_s)
        )
        self.port = self.httpd.server_address[1]
        self._thread = None

    def start(self):
        self.batcher.start()
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.stop()


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU detector serving")
    p.add_argument("--weights", default="yolo10s-seg")
    p.add_argument("--nc", type=int, default=1)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--window_ms", type=float, default=5.0)
    p.add_argument("--int8", action="store_true", help="int8 conv serving path")
    p.add_argument("--calib_dir", default=None,
                   help="directory of representative frames: calibrate static "
                        "int8 activation scales (PTQ) before serving")
    args = p.parse_args(argv)

    from yolo_puncture_tpu.predict import YOLO

    model = YOLO(args.weights, nc=args.nc, int8_serving=args.int8)
    if args.int8 and args.calib_dir:
        scales = model.calibrate_int8(args.calib_dir, imgsz=args.imgsz)
        print(f"int8 calibration: {len(scales)} conv scales frozen "
              f"from {args.calib_dir}")
    server = Server(model, host=args.host, port=args.port, imgsz=args.imgsz,
                    max_batch=args.max_batch, window_ms=args.window_ms)
    server.start()
    print(f"serving {args.weights} on {args.host}:{server.port} "
          f"(imgsz={args.imgsz}, max_batch={args.max_batch})")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
