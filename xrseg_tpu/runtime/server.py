"""HTTP inference server: the network-facing serving surface (stdlib-only).

The reference's "serving" is an interactive Unity loop; a production TPU
deployment serves over the network. This module wraps a CompiledPipeline
in a threaded HTTP server with the operational endpoints a deployment
needs — no dependencies beyond the standard library:

  POST /infer    image bytes (JPEG/PNG — any PIL format — or a raw .npy
                 [H,W,3] uint8 array) -> JSON detections:
                 {"detections": [{"label", "class_name", "score",
                  "box_xywh" (frame px), "mask_rle"? (COCO RLE at proto
                  resolution, when --serve-masks)}...], "count",
                  "latency_ms"}
  GET  /healthz  {"ok": true, ...model/geometry facts...}
  GET  /stats    per-stage latency percentiles + request counters
                 (runtime.tracing.Tracer — the observability the
                 reference lacks, SURVEY §5)
  GET  /metrics  the same counters in Prometheus text exposition format
  POST /reload   {"path": "<weights>"}: zero-downtime weight hot-swap —
                 params are jit arguments, so no recompile; all batch
                 buckets swap atomically under the dispatch lock

Design: one device pipeline guarded by a lock (a TPU executes one program
at a time — concurrency belongs in the batch axis, not in racing
dispatches); request decode/resize runs host-side per connection thread.

Dynamic micro-batching (micro_batch > 1): concurrent requests are
collected for up to `batch_window_ms` and dispatched as ONE batched
device program — the TPU-shaped answer to concurrency (the MXU wants a
batch axis, not interleaved batch-1 programs). Batch sizes are bucketed
to powers of two so each bucket compiles once (fixed shapes); requests
pad the bucket and padding rows are discarded.

Multi-chip serving (--mesh data=N[,model=M]): the pipeline is built over
a jax.sharding.Mesh via parallel/batch.build_serving_pipeline — the batch
axis shards over `data` (requests pad/bucket to multiples of it), wide
convs optionally shard over `model` (TP, for the x-scale); XLA inserts
the ICI collectives. Combine with --micro-batch so concurrent requests
coalesce into the sharded batch axis.

CLI: python -m xrseg_tpu.runtime.server --port 8000 \
        [--weights w.{sentis,onnx,npz}] [--scale n] [--frame-hw 480 640] \
        [--micro-batch 8 --batch-window-ms 3] [--mesh data=4]
"""
from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple

import numpy as np

from xrseg_tpu.config import ExecutorConfig
from xrseg_tpu.runtime.tracing import Tracer
from xrseg_tpu.viz.labels import COCO_LABELS


def rle_encode(mask: np.ndarray) -> dict:
    """Binary mask -> COCO uncompressed RLE ({counts, size}).

    Fortran (column-major) scan order, counts alternating runs starting
    with the zero run — the standard pycocotools convention, so clients
    can decode with any COCO tooling."""
    flat = np.asarray(mask, bool).flatten(order="F")
    # run-length: indices where the value changes
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    runs = np.diff(np.concatenate([[0], change, [flat.size]]))
    counts = runs.tolist()
    if flat.size and flat[0]:      # counts must start with the 0-run
        counts = [0] + counts
    return {"counts": counts, "size": [int(mask.shape[0]),
                                       int(mask.shape[1])]}


def rle_decode(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in rle["counts"]:
        flat[pos:pos + c] = val
        pos += c
        val = not val
    return flat.reshape((h, w), order="F")


class ServerOverloaded(RuntimeError):
    """Raised when the server sheds a request instead of queueing it.

    Overload posture: bound the pending work and fail FAST (503 +
    Retry-After) rather than letting a flood of handler threads camp on
    the batch queue until the 300 s wait times out — the serving-side
    analogue of the reference's error-state-and-continue defensive
    stance (IEExecutor.cs:428,453: never wedge the loop on a bad step).
    """


class InferenceServer:
    """Compile once, serve many. start() runs in a daemon thread (tests);
    serve_forever() blocks (CLI)."""

    def __init__(self, cfg: ExecutorConfig, params=None,
                 frame_hw: Optional[Tuple[int, int]] = None,
                 host: str = "127.0.0.1", port: int = 8000,
                 labels=None, seed: int = 0,
                 micro_batch: int = 1, batch_window_ms: float = 3.0,
                 params_dtype: Optional[str] = None,
                 serve_masks: bool = False,
                 mask_res: str = "proto",
                 mesh_shape: Optional[Dict[str, int]] = None,
                 tp_min_channels: int = 100000,
                 max_request_mb: float = 64.0,
                 max_pending: Optional[int] = None):
        from xrseg_tpu.compile import load_model

        self.cfg = cfg
        self.frame_hw = tuple(frame_hw or cfg.model.input_size)
        self.labels = list(labels) if labels is not None else list(COCO_LABELS)
        self.tracer = Tracer()
        # task-shaped responses: detect/segment (boxes [+RLE masks]),
        # pose (+ per-detection keypoints), obb (rotated model-space
        # boxes — anisotropic frame scaling would distort angles, so obb
        # serves input(640)-space xywhr), classify (probs + top-1)
        self._task = cfg.model.task
        self._box_dim = 5 if self._task == "obb" else 4

        # -- multi-chip serving (BASELINE configs 2-3 as a product):
        # batch axis sharded over the mesh's data axis; XLA rides ICI.
        # Requests pad/bucket to multiples of the data axis.
        self.mesh = None
        self._data_axis = 1
        self.tp_min_channels = int(tp_min_channels)
        if mesh_shape:
            import jax

            from xrseg_tpu.parallel import mesh as mesh_lib
            d = int(mesh_shape.get("data", 1))
            m = int(mesh_shape.get("model", 1))
            if d < 1 or (d & (d - 1)):
                raise ValueError(
                    f"mesh data axis {d} must be a power of two (batch "
                    "buckets are powers of two and must stay divisible)")
            if d * m > len(jax.devices()):
                raise ValueError(f"mesh {d}x{m} needs {d * m} devices, "
                                 f"have {len(jax.devices())}")
            self.mesh = mesh_lib.make_mesh((d, m),
                                           devices=jax.devices()[:d * m])
            self._data_axis = d

        # serve_masks resolution: "proto" = input/4 (the reference's mask
        # contract); "display" = the server's frame geometry, upsampled
        # bilinearly INSIDE the device program (mask_display_hw — the
        # analogue of IEMasker's bilinear-filtered display texture,
        # IEMasker.cs:316-323)
        if mask_res not in ("proto", "display"):
            raise ValueError(f"mask_res {mask_res!r}: 'proto'|'display'")
        self.mask_res = mask_res
        self._mask_display_hw = (self.frame_hw if serve_masks
                                 and mask_res == "display" else None)

        with self.tracer.section("load_model"):
            # params_dtype="bfloat16": weight-storage cast once at build
            # (~7% faster at batch=1 on v5e; see io/weights.cast_params)
            if self.mesh is not None:
                import jax

                from xrseg_tpu.parallel.batch import build_serving_pipeline
                if params is None:
                    from xrseg_tpu.models import yolo11
                    params = yolo11.init_params(jax.random.key(seed),
                                                cfg.model)
                if params_dtype is not None:
                    from xrseg_tpu.io.weights import cast_params
                    params = cast_params(params, params_dtype)
                self.pipeline = build_serving_pipeline(
                    cfg, params, self.mesh, batch=self._data_axis,
                    frame_hw=self.frame_hw,
                    tp_min_channels=self.tp_min_channels,
                    mask_display_hw=self._mask_display_hw).warmup()
            else:
                self.pipeline = load_model(
                    cfg, params=params, seed=seed,
                    frame_hw=self.frame_hw, batch=1,
                    params_dtype=params_dtype,
                    mask_display_hw=self._mask_display_hw)
        self._lock = threading.Lock()
        # reject absurd uploads before buffering them (a malformed or
        # malicious Content-Length must not OOM the serving host)
        self.max_request_bytes = int(max_request_mb * 1e6)
        # counters are bumped from concurrent handler threads; += is not
        # atomic in CPython, so guard with a dedicated lock (cheap: two
        # increments per request)
        self._counter_lock = threading.Lock()
        self._requests = 0
        self._errors = 0
        self._t_start = time.time()
        # serve_masks: each detection's full-image sigmoid mask (proto
        # resolution, uncropped — cropping to the box is display-layer
        # semantics, IEMasker.cs:232-247) thresholded at 0.5 and returned
        # as COCO uncompressed RLE
        self.serve_masks = bool(serve_masks
                                and cfg.model.task == "segment")

        # -- dynamic micro-batching --
        # Buckets are powers of two (each bucket = one compiled program);
        # round the cap DOWN to a power of two so a full collection never
        # rounds up past the configured ceiling (micro_batch=6 must not
        # dispatch a batch-8 program).
        mb = max(1, int(micro_batch))
        self.micro_batch = max(1 << (mb.bit_length() - 1), self._data_axis)
        self.batch_window_ms = float(batch_window_ms)
        self._pipelines: Dict[int, object] = {self._data_axis: self.pipeline}
        self._pipelines_lock = threading.Lock()
        self._batch_hist: Dict[int, int] = {}
        self._closing = False
        # Overload shedding: cap pending work; excess requests get an
        # immediate 503 + Retry-After instead of waiting out the queue
        # timeout. Default: 8 full micro-batches of headroom.
        self.max_pending = (int(max_pending) if max_pending
                            else max(8, self.micro_batch * 8))
        self._shed = 0
        self._inflight = 0
        self._q: "queue.Queue" = queue.Queue(maxsize=self.max_pending)
        self._dispatcher: Optional[threading.Thread] = None
        if self.micro_batch > 1:
            self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                                daemon=True)
            self._dispatcher.start()

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *a):   # quiet; tracer has the data
                pass

            def _reply(self, code: int, obj,
                       content_type: str = "application/json",
                       extra_headers: Optional[Dict[str, str]] = None
                       ) -> None:
                body = (obj.encode() if isinstance(obj, str)
                        else json.dumps(obj).encode())
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                for k, v in (extra_headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, server.health())
                elif self.path == "/stats":
                    self._reply(200, server.stats())
                elif self.path == "/metrics":
                    self._reply(200, server.metrics_text(),
                                content_type="text/plain; version=0.0.4")
                else:
                    self._reply(404, {"error": "unknown path"})

            # drop wedged/slow-loris connections instead of pinning a
            # handler thread forever
            timeout = 120

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                if n > server.max_request_bytes:
                    with server._counter_lock:
                        server._errors += 1
                    self._reply(413, {"error":
                                      f"request body {n} bytes exceeds "
                                      f"cap {server.max_request_bytes}"})
                    self.close_connection = True
                    return
                data = self.rfile.read(n)
                if self.path == "/infer":
                    try:
                        self._reply(200, server.infer_bytes(data))
                    except ServerOverloaded as e:   # shed, don't queue
                        self._reply(503, {"error": str(e)},
                                    extra_headers={"Retry-After": "1"})
                        self.close_connection = True
                    except Exception as e:   # bad image, wrong shape, ...
                        with server._counter_lock:
                            server._errors += 1
                        self._reply(400, {"error": str(e)})
                elif self.path == "/reload":
                    try:
                        self._reply(200, server.reload_weights(
                            json.loads(data or b"{}")))
                    except Exception as e:
                        self._reply(400, {"error": str(e)})
                else:
                    self._reply(404, {"error": "unknown path"})

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
        if self.micro_batch > 1:
            host = self._infer_batched(frame)
        else:
            # same shedding bound on the unbatched path: cap threads
            # stacked up behind the device lock
            with self._counter_lock:
                if self._inflight >= self.max_pending:
                    self._shed += 1
                    raise ServerOverloaded(
                        f"{self._inflight} requests already waiting on "
                        f"the device (cap {self.max_pending})")
                self._inflight += 1
            try:
                with self._lock, self.tracer.section("infer"):
                    frames = frame[None]
                    if self._data_axis > 1:   # pad to the mesh's data axis
                        frames = np.concatenate(
                            [frames, np.zeros((self._data_axis - 1,)
                                              + frame.shape, np.uint8)])
                    det = self.pipeline(frames)
                    host = self._host_result(det, 0)
            finally:
                with self._counter_lock:
                    self._inflight -= 1
        latency_ms = (time.perf_counter() - t0) * 1e3
        with self._counter_lock:
            self._requests += 1
        return self._format(host, latency_ms)

    def _host_result(self, det: dict, j: int) -> dict:
        """One image's device outputs -> host dict for _format."""
        from xrseg_tpu.compile import unpack_slate
        if self._task == "classify":
            return {"probs": np.asarray(det["slate"][j], np.float32)}
        host = unpack_slate(np.asarray(det["slate"][j]),
                            self.cfg.post.max_detections,
                            box_dim=self._box_dim)
        n = int(host["count"])
        if self.serve_masks and "masks" in det:
            host["masks"] = np.asarray(det["masks"][j, :n], np.float32)
        if self._task == "pose":
            host["kpts"] = np.asarray(det["kpts"][j, :n], np.float32)
        return host

    def _format(self, host: dict, latency_ms: float) -> dict:
        if self._task == "classify":
            probs = host["probs"]
            lab = int(probs.argmax())
            return {"probs": [round(float(p), 5) for p in probs],
                    "label": lab,
                    "class_name": (self.labels[lab]
                                   if 0 <= lab < len(self.labels)
                                   else str(lab)),
                    "latency_ms": round(latency_ms, 2)}
        n = int(host["count"])
        from xrseg_tpu.ops.preprocess import boxes_to_frame_space
        if self._task == "obb":
            boxes = np.asarray(host["boxes_xywhr"][:n])  # model space
        else:
            boxes = boxes_to_frame_space(host["boxes_xywh"][:n],
                                         self.frame_hw,
                                         self.cfg.model.input_size,
                                         "stretch")
        # keypoints scale exactly under the stretch (pointwise)
        ky = self.frame_hw[0] / self.cfg.model.input_size[0]
        kx = self.frame_hw[1] / self.cfg.model.input_size[1]
        dets = []
        for i in range(n):
            lab = int(host["labels"][i])
            d = {
                "label": lab,
                "class_name": (self.labels[lab]
                               if 0 <= lab < len(self.labels) else str(lab)),
                "score": round(float(host["scores"][i]), 4),
            }
            if self._task == "obb":
                d["box_xywhr"] = [round(float(v), 4) for v in boxes[i]]
            else:
                d["box_xywh"] = [round(float(v), 2) for v in boxes[i]]
            if "masks" in host and i < len(host["masks"]):
                d["mask_rle"] = rle_encode(host["masks"][i] > 0.5)
            if "kpts" in host and i < len(host["kpts"]):
                k = host["kpts"][i].copy()
                k[:, 0] *= kx
                k[:, 1] *= ky
                d["kpts"] = [[round(float(x), 2), round(float(y), 2),
                              round(float(v), 3)] for x, y, v in k]
            dets.append(d)
        return {"detections": dets, "count": n,
                "latency_ms": round(latency_ms, 2)}

    # -- micro-batching -------------------------------------------------

    class _Pending:
        __slots__ = ("frame", "event", "result", "error")

        def __init__(self, frame):
            self.frame = frame
            self.event = threading.Event()
            self.result = None
            self.error: Optional[Exception] = None

    def _infer_batched(self, frame: np.ndarray) -> dict:
        item = self._Pending(frame)
        try:
            self._q.put_nowait(item)
        except queue.Full:
            with self._counter_lock:
                self._shed += 1
            raise ServerOverloaded(
                f"batch queue full ({self.max_pending} pending)")
        if not item.event.wait(timeout=300.0):
            raise RuntimeError("inference timed out in the batch queue")
        if item.error is not None:
            raise item.error
        return item.result

    def _pipeline_for(self, b: int):
        """Bucketed pipeline, compiled lazily once per batch size."""
        with self._pipelines_lock:
            if b not in self._pipelines:
                with self.tracer.section(f"compile_b{b}"):
                    if self.mesh is not None:
                        from xrseg_tpu.parallel.batch import \
                            build_serving_pipeline
                        self._pipelines[b] = build_serving_pipeline(
                            self.cfg, self.pipeline.params, self.mesh,
                            batch=b, frame_hw=self.frame_hw,
                            tp_min_channels=self.tp_min_channels,
                            mask_display_hw=self._mask_display_hw).warmup()
                    else:
                        from xrseg_tpu.compile import build_pipeline
                        self._pipelines[b] = build_pipeline(
                            self.cfg, self.pipeline.params,
                            frame_hw=self.frame_hw, batch=b,
                            mask_display_hw=self._mask_display_hw
                            ).warmup()
            return self._pipelines[b]

    def _dispatch_loop(self) -> None:
        """Collect requests for up to batch_window_ms, run ONE batched
        device program, fan results back out."""
        while not self._closing:
            try:
                items = [self._q.get(timeout=0.1)]
            except queue.Empty:
                continue
            deadline = time.perf_counter() + self.batch_window_ms / 1e3
            while len(items) < self.micro_batch:
                rem = deadline - time.perf_counter()
                if rem <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=rem))
                except queue.Empty:
                    break
            b = self._data_axis       # buckets stay data-axis divisible
            while b < len(items):
                b *= 2
            try:
                frames = np.stack(
                    [it.frame for it in items]
                    + [np.zeros_like(items[0].frame)] * (b - len(items)))
                with self._lock, self.tracer.section("infer"):
                    det = self._pipeline_for(b)(frames)
                    results = [self._host_result(det, j)
                               for j in range(len(items))]
                self._batch_hist[len(items)] = (
                    self._batch_hist.get(len(items), 0) + 1)
                for it, host in zip(items, results):
                    it.result = host
                    it.event.set()
            except Exception as e:       # surface to every waiting request
                for it in items:
                    it.error = e
                    it.event.set()

    def reload_weights(self, req: dict) -> dict:
        """Zero-downtime weight hot-swap: POST /reload {"path": "..."} .

        Params are a jit ARGUMENT of the compiled pipelines (not baked
        constants), so swapping them needs no recompile — the new pytree
        just has to match shapes/dtypes. All batch-bucket pipelines swap
        atomically under the dispatch lock; in-flight requests finish on
        the old weights."""
        import dataclasses as _dc

        import jax

        from xrseg_tpu.io.weights import cast_params, load_params_auto
        path = req.get("path")
        if not path:
            raise ValueError('body must be {"path": "<weights>"}')
        from xrseg_tpu.models.yolo11 import count_params
        new_params, _ = load_params_auto(path, self.cfg.model)
        # validate the full tree STRUCTURE (not just leaf count/shapes —
        # a structurally different checkpoint with coincidentally matching
        # leaves must not hot-swap into misassigned weights), then shapes
        if (jax.tree.structure(new_params)
                != jax.tree.structure(self.pipeline.params)):
            raise ValueError("weight tree structure does not match the "
                             f"serving model ({self.cfg.model.scale}/"
                             f"{self.cfg.model.task})")
        ref_leaves = jax.tree.leaves(self.pipeline.params)
        new_leaves = jax.tree.leaves(new_params)
        if any(a.shape != b.shape for a, b in zip(ref_leaves, new_leaves)):
            raise ValueError("weights do not match the serving model "
                             f"({self.cfg.model.scale}/"
                             f"{self.cfg.model.task})")
        new_params = cast_params(new_params, ref_leaves[0].dtype)
        if self.mesh is not None:   # re-apply TP/replication placement
            new_params = self.pipeline.reshard(new_params)
        with self._lock, self._pipelines_lock:
            for b, pipe in list(self._pipelines.items()):
                self._pipelines[b] = _dc.replace(pipe, params=new_params)
            self.pipeline = self._pipelines[self._data_axis]
        return {"ok": True, "path": path,
                "n_params": count_params(new_params)}

    def metrics_text(self) -> str:
        """Prometheus text exposition of the /stats counters."""
        s = self.stats()
        lines = [
            "# TYPE xrseg_requests_total counter",
            f"xrseg_requests_total {s['requests']}",
            "# TYPE xrseg_errors_total counter",
            f"xrseg_errors_total {s['errors']}",
            "# TYPE xrseg_shed_total counter",
            f"xrseg_shed_total {s['shed']}",
            "# TYPE xrseg_queue_depth gauge",
            f"xrseg_queue_depth {s['queue_depth']}",
            "# TYPE xrseg_uptime_seconds gauge",
            f"xrseg_uptime_seconds {s['uptime_s']}",
        ]
        for stage, v in s.get("stages", {}).items():
            for q in ("p50_ms", "p95_ms"):
                if q in v:
                    lines.append(
                        f'xrseg_stage_latency_ms{{stage="{stage}",'
                        f'quantile="{q[:-3]}"}} {v[q]}')
        for k, v in s.get("batch_hist", {}).items():
            lines.append(f'xrseg_batches_total{{size="{k}"}} {v}')
        return "\n".join(lines) + "\n"

    def health(self) -> dict:
        out = {"ok": True, "scale": self.cfg.model.scale,
               "task": self.cfg.model.task,
               "frame_hw": list(self.frame_hw),
               "input_size": list(self.cfg.model.input_size)}
        if self.mesh is not None:
            out["mesh"] = dict(self.mesh.shape)
        return out

    def stats(self) -> dict:
        out = {"requests": self._requests, "errors": self._errors,
               "shed": self._shed, "max_pending": self.max_pending,
               "queue_depth": (self._q.qsize() if self.micro_batch > 1
                               else self._inflight),
               "uptime_s": round(time.time() - self._t_start, 1),
               "stages": self.tracer.summary()}
        if self.micro_batch > 1:
            out["micro_batch"] = self.micro_batch
            out["batch_hist"] = {str(k): v for k, v
                                 in sorted(self._batch_hist.items())}
        return out

    # ------------------------------------------------------------------

    def start(self) -> "InferenceServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def close(self) -> None:
        self._closing = True
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self._dispatcher is not None:
            self._dispatcher.join(timeout=5)
            # fail queued requests fast instead of letting their handler
            # threads sit in event.wait() until the 300 s timeout
            while True:
                try:
                    it = self._q.get_nowait()
                except queue.Empty:
                    break
                it.error = RuntimeError("server closing")
                it.event.set()


def _main() -> int:
    import argparse

    from xrseg_tpu.config import ModelConfig

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--weights", help=".sentis/.onnx/.npz/orbax weights")
    ap.add_argument("--scale", default="n", choices=list("nsmlx"))
    ap.add_argument("--arch", default="yolo11",
                    choices=["yolo11", "yolov8"])
    ap.add_argument("--task", default="segment",
                    choices=["segment", "detect", "pose", "obb",
                             "classify"])
    ap.add_argument("--frame-hw", type=int, nargs=2, default=None)
    ap.add_argument("--iou", type=float, default=0.6)
    ap.add_argument("--score", type=float, default=0.23)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--micro-batch", type=int, default=1,
                    help="max dynamic batch size (1 = off); rounded DOWN "
                         "to a power of two (buckets compile per size)")
    ap.add_argument("--batch-window-ms", type=float, default=3.0,
                    help="how long to wait collecting a batch")
    ap.add_argument("--params-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="weight storage precision (bfloat16: ~7% faster "
                         "at batch=1, halves weight HBM)")
    ap.add_argument("--serve-masks", action="store_true",
                    help="include per-detection COCO-RLE masks in /infer "
                         "responses")
    ap.add_argument("--mask-res", default="proto",
                    choices=["proto", "display"],
                    help="served mask resolution: 'proto' (input/4, the "
                         "reference contract) or 'display' (frame "
                         "geometry, bilinear-upsampled on device)")
    ap.add_argument("--max-request-mb", type=float, default=64.0,
                    help="reject request bodies larger than this (413)")
    ap.add_argument("--mesh", default=None,
                    help="multi-chip serving mesh, e.g. 'data=4' or "
                         "'data=4,model=2' (data must be a power of two)")
    ap.add_argument("--tp-min-channels", type=int, default=100000,
                    help="shard conv output channels >= this over the "
                         "mesh model axis (TP; default effectively off)")
    ap.add_argument("--max-pending", type=int, default=None,
                    help="overload shedding: max requests pending before "
                         "503 + Retry-After (default 8*micro_batch)")
    args = ap.parse_args()

    mesh_shape = None
    if args.mesh:
        mesh_shape = {}
        for part in args.mesh.split(","):
            k, _, v = part.partition("=")
            if k.strip() not in ("data", "model") or not v.strip().isdigit():
                raise SystemExit(f"--mesh: bad spec {part!r} "
                                 "(want data=N[,model=M])")
            mesh_shape[k.strip()] = int(v)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import xrseg_tpu
    xrseg_tpu.enable_compile_cache()

    mcfg = ModelConfig(arch=args.arch, scale=args.scale, task=args.task)
    params = None
    if args.weights:
        from xrseg_tpu.io.weights import load_params_auto
        params, mcfg = load_params_auto(args.weights, mcfg)
    cfg = ExecutorConfig(model=mcfg)
    cfg = dataclasses.replace(cfg, post=dataclasses.replace(
        cfg.post, iou_threshold=args.iou, score_threshold=args.score))
    srv = InferenceServer(cfg, params=params, frame_hw=args.frame_hw,
                          host=args.host, port=args.port,
                          micro_batch=args.micro_batch,
                          batch_window_ms=args.batch_window_ms,
                          params_dtype=args.params_dtype,
                          serve_masks=args.serve_masks,
                          mask_res=args.mask_res,
                          mesh_shape=mesh_shape,
                          tp_min_channels=args.tp_min_channels,
                          max_request_mb=args.max_request_mb,
                          max_pending=args.max_pending)
    mesh_note = f"  mesh={mesh_shape}" if mesh_shape else ""
    print(f"serving on http://{args.host}:{srv.port}  "
          f"(POST /infer, GET /healthz, GET /stats){mesh_note}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
