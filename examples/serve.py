"""Batch/stream serving CLI: image paths in, JSON detections out.

The production-serving surface of the framework: reads newline-separated
image paths (stdin or --list), streams them through a pipelined
StreamingRunner, and emits one JSON object per image on stdout:

  {"path": ..., "detections": [{"label", "class_name", "score",
   "box_xywh" (frame pixels)}, ...], "latency_ms": ...}

Usage:
  ls imgs/*.jpg | python examples/serve.py --sentis model.sentis
  python examples/serve.py --list paths.txt --scale n --batch 1
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", default=None, help="file of image paths")
    ap.add_argument("--sentis", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--scale", default="n")
    ap.add_argument("--arch", default="yolo11",
                    choices=["yolo11", "yolov8"])
    ap.add_argument("--iou", type=float, default=0.6)
    ap.add_argument("--score", type=float, default=0.23)
    ap.add_argument("--depth", type=int, default=4, help="pipeline depth")
    ap.add_argument("--frame-hw", type=int, nargs=2, default=None,
                    help="normalize all images to this size (h w); default: "
                         "size of the first image")
    args = ap.parse_args()

    from PIL import Image

    import xrseg_tpu
    xrseg_tpu.enable_compile_cache()
    from xrseg_tpu.compile import build_pipeline
    from xrseg_tpu.config import ExecutorConfig, ModelConfig, PostprocessConfig
    from xrseg_tpu.eval.metrics import detections_from_slate
    from xrseg_tpu.runtime.streaming import StreamingRunner
    from xrseg_tpu.viz.labels import COCO_LABELS

    if args.list:
        paths = [ln.strip() for ln in open(args.list) if ln.strip()]
    else:
        paths = [ln.strip() for ln in sys.stdin if ln.strip()]
    if not paths:
        print("no input paths", file=sys.stderr)
        return 2

    params = None
    mcfg = ModelConfig(arch=args.arch, scale=args.scale)
    if args.sentis:
        from xrseg_tpu.io.sentis import load_yolo11_params
        params, mcfg = load_yolo11_params(args.sentis, mcfg)
    elif args.ckpt:
        from xrseg_tpu.io.weights import load_npz
        params = load_npz(args.ckpt)
    else:
        import jax
        from xrseg_tpu.models import yolo11
        params = yolo11.init_params(jax.random.key(0), mcfg)

    def load(path):
        img = Image.open(path).convert("RGB")
        if args.frame_hw:
            img = img.resize((args.frame_hw[1], args.frame_hw[0]))
        return np.asarray(img, np.uint8)

    first = load(paths[0])
    fh, fw = first.rgb.shape[:2] if hasattr(first, "rgb") else first.shape[:2]
    if args.frame_hw is None:
        args.frame_hw = (fh, fw)

    cfg = ExecutorConfig(model=mcfg, post=PostprocessConfig(
        iou_threshold=args.iou, score_threshold=args.score))
    pipe = build_pipeline(cfg, params, frame_hw=(fh, fw), batch=1).warmup()
    runner = StreamingRunner(pipe, depth=args.depth)

    def frames():
        yield first[None]
        for p in paths[1:]:
            img = load(p)
            if img.shape[:2] != (fh, fw):
                img = np.asarray(Image.fromarray(img).resize((fw, fh)),
                                 np.uint8)
            yield img[None]

    for path, res in zip(paths, runner.run(frames())):
        dets = detections_from_slate(
            {"boxes_xywh": [res.slate["boxes_xywh"]],
             "labels": [res.slate["labels"]],
             "scores": [res.slate["scores"]],
             "count": [res.slate["count"]]},
            frame_hw=(fh, fw))
        print(json.dumps({
            "path": path,
            "latency_ms": round(res.latency_s * 1e3, 1),
            "detections": [{
                "label": d.label,
                "class_name": COCO_LABELS[d.label] if d.label < 80 else "?",
                "score": round(d.score, 3),
                "box_xywh": [round(float(v), 1) for v in d.box_xywh],
            } for d in dets],
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
