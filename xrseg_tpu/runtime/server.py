"""HTTP inference server: the network-facing serving surface (stdlib-only).

The reference's "serving" is an interactive Unity loop; a production TPU
deployment serves over the network. This module wraps a CompiledPipeline
in a threaded HTTP server with the operational endpoints a deployment
needs — no dependencies beyond the standard library:

  POST /infer    image bytes (JPEG/PNG — any PIL format — or a raw .npy
                 [H,W,3] uint8 array) -> JSON detections:
                 {"detections": [{"label", "class_name", "score",
                  "box_xywh" (frame px)}...], "count", "latency_ms"}
  GET  /healthz  {"ok": true, ...model/geometry facts...}
  GET  /stats    per-stage latency percentiles + request counters
                 (runtime.tracing.Tracer — the observability the
                 reference lacks, SURVEY §5)

Design: one device pipeline guarded by a lock (a TPU executes one program
at a time — concurrency belongs in the batch axis, not in racing
dispatches); request decode/resize runs host-side per connection thread.

CLI: python -m xrseg_tpu.runtime.server --port 8000 \
        [--weights w.{sentis,onnx,npz}] [--scale n] [--frame-hw 480 640]
"""
from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

from xrseg_tpu.config import ExecutorConfig
from xrseg_tpu.runtime.tracing import Tracer
from xrseg_tpu.viz.labels import COCO_LABELS


class InferenceServer:
    """Compile once, serve many. start() runs in a daemon thread (tests);
    serve_forever() blocks (CLI)."""

    def __init__(self, cfg: ExecutorConfig, params=None,
                 frame_hw: Optional[Tuple[int, int]] = None,
                 host: str = "127.0.0.1", port: int = 8000,
                 labels=None, seed: int = 0):
        from xrseg_tpu.compile import load_model

        self.cfg = cfg
        self.frame_hw = tuple(frame_hw or cfg.model.input_size)
        self.labels = list(labels) if labels is not None else list(COCO_LABELS)
        self.tracer = Tracer()
        with self.tracer.section("load_model"):
            self.pipeline = load_model(cfg, params=params, seed=seed,
                                       frame_hw=self.frame_hw, batch=1)
        self._lock = threading.Lock()
        self._requests = 0
        self._errors = 0
        self._t_start = time.time()

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *a):   # quiet; tracer has the data
                pass

            def _reply(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, server.health())
                elif self.path == "/stats":
                    self._reply(200, server.stats())
                else:
                    self._reply(404, {"error": "unknown path"})

            def do_POST(self):
                if self.path != "/infer":
                    self._reply(404, {"error": "unknown path"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                try:
                    self._reply(200, server.infer_bytes(data))
                except Exception as e:   # bad image, wrong shape, ...
                    server._errors += 1
                    self._reply(400, {"error": str(e)})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------------

    def _decode(self, data: bytes) -> np.ndarray:
        """Image bytes -> [H,W,3] uint8 at the server's frame geometry."""
        if data[:6] == b"\x93NUMPY":
            arr = np.load(io.BytesIO(data))
            if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
                raise ValueError(f"npy must be [H,W,3] uint8, got "
                                 f"{arr.dtype} {arr.shape}")
        else:
            from PIL import Image
            arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"),
                             np.uint8)
        if arr.shape[:2] != self.frame_hw:
            from PIL import Image
            arr = np.asarray(Image.fromarray(arr).resize(
                (self.frame_hw[1], self.frame_hw[0]), Image.BILINEAR),
                np.uint8)
        return arr

    def infer_bytes(self, data: bytes) -> dict:
        with self.tracer.section("decode"):
            frame = self._decode(data)
        t0 = time.perf_counter()
        with self._lock, self.tracer.section("infer"):
            det = self.pipeline(frame[None])
            from xrseg_tpu.compile import unpack_slate
            host = unpack_slate(np.asarray(det["slate"][0]),
                                self.cfg.post.max_detections)
        latency_ms = (time.perf_counter() - t0) * 1e3
        self._requests += 1
        n = int(host["count"])
        from xrseg_tpu.ops.preprocess import boxes_to_frame_space
        boxes = boxes_to_frame_space(host["boxes_xywh"][:n], self.frame_hw,
                                     self.cfg.model.input_size, "stretch")
        dets = []
        for i in range(n):
            lab = int(host["labels"][i])
            dets.append({
                "label": lab,
                "class_name": (self.labels[lab]
                               if 0 <= lab < len(self.labels) else str(lab)),
                "score": round(float(host["scores"][i]), 4),
                "box_xywh": [round(float(v), 2) for v in boxes[i]],
            })
        return {"detections": dets, "count": n,
                "latency_ms": round(latency_ms, 2)}

    def health(self) -> dict:
        return {"ok": True, "scale": self.cfg.model.scale,
                "task": self.cfg.model.task,
                "frame_hw": list(self.frame_hw),
                "input_size": list(self.cfg.model.input_size)}

    def stats(self) -> dict:
        return {"requests": self._requests, "errors": self._errors,
                "uptime_s": round(time.time() - self._t_start, 1),
                "stages": self.tracer.summary()}

    # ------------------------------------------------------------------

    def start(self) -> "InferenceServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def close(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def _main() -> int:
    import argparse

    from xrseg_tpu.config import ModelConfig

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--weights", help=".sentis/.onnx/.npz/orbax weights")
    ap.add_argument("--scale", default="n", choices=list("nsmlx"))
    ap.add_argument("--task", default="segment",
                    choices=["segment", "detect"])
    ap.add_argument("--frame-hw", type=int, nargs=2, default=None)
    ap.add_argument("--iou", type=float, default=0.6)
    ap.add_argument("--score", type=float, default=0.23)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import xrseg_tpu
    xrseg_tpu.enable_compile_cache()

    mcfg = ModelConfig(scale=args.scale, task=args.task)
    params = None
    if args.weights:
        from xrseg_tpu.io.weights import load_params_auto
        params, mcfg = load_params_auto(args.weights, mcfg)
    cfg = ExecutorConfig(model=mcfg)
    cfg = dataclasses.replace(cfg, post=dataclasses.replace(
        cfg.post, iou_threshold=args.iou, score_threshold=args.score))
    srv = InferenceServer(cfg, params=params, frame_hw=args.frame_hw,
                          host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{srv.port}  "
          f"(POST /infer, GET /healthz, GET /stats)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
