"""Task-family end-to-end parity report (the ACCURACY.md task section).

Mirrors tools/accuracy_report.py's 25-scene protocol for the extended
task family: the reference's 5 bundled COCO images (when /root/reference
is mounted; deterministic synthetic frames otherwise) + 4 deterministic
augmentations each, at the deployed 640x640 geometry, run through the
compiled pose/obb/classify pipelines AND the independent torch/numpy
oracle pipelines with the SAME weights, scored with the task's native
metric (OKS-AP / rotated probIoU-AP / top-1 agreement).

Weights: detection-guaranteeing fixture weights (xrseg_tpu.testing) for
pose/obb — no pretrained task checkpoints exist in this zero-egress
environment (docs/ROADMAP.md) — with the task heads (keypoints, angles)
left at random init so their numerics are genuinely exercised; classify
uses plain random init (no detection gate to pass).

Usage: python tools/task_accuracy_report.py [--size 640] [--out report.json]
"""
import argparse
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..")))

import numpy as np  # noqa: E402

REF_IMAGES = "/root/reference/Assets/Resources/Images"


def load_images(size):
    from xrseg_tpu.eval.parity import augment_images
    base = []
    if os.path.isdir(REF_IMAGES):
        from PIL import Image
        for name in sorted(os.listdir(REF_IMAGES)):
            if name.lower().endswith((".jpg", ".png", ".jpeg")):
                im = Image.open(os.path.join(REF_IMAGES, name))
                base.append(np.asarray(
                    im.convert("RGB").resize((size, size)), np.uint8))
    if not base:
        rng = np.random.default_rng(7)
        base = [rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
                for _ in range(5)]
    return augment_images(base), bool(os.path.isdir(REF_IMAGES))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--out", default=None)
    ap.add_argument("--task", default=None,
                    choices=["pose", "obb", "classify"],
                    help="run one task only (each 640^2 task takes "
                         "several minutes on the 1-core CPU; run them "
                         "as separate commands)")
    args = ap.parse_args()

    import xrseg_tpu
    xrseg_tpu.enable_compile_cache()
    from xrseg_tpu.config import ModelConfig, PostprocessConfig
    from xrseg_tpu.eval.task_parity import task_parity_report
    from xrseg_tpu.models import yolo11
    from xrseg_tpu.testing import detection_params

    images, real = load_images(args.size)
    print(f"{len(images)} scenes at {args.size}^2 "
          f"({'reference images' if real else 'synthetic'})", flush=True)
    pcfg = PostprocessConfig(iou_threshold=0.43, score_threshold=0.301,
                             max_detections=50)   # deployed XR preset
    results = {}
    specs = [("pose", dict(kpt_shape=(17, 3)), True),
             ("obb", {}, True),
             ("classify", dict(num_classes=80), False)]
    if args.task:
        specs = [s for s in specs if s[0] == args.task]
    for task, kw, fixture in specs:
        mcfg = ModelConfig(scale="n", input_size=(args.size, args.size),
                           dtype="float32", task=task, **kw)
        params = (detection_params(jax.random.key(0), mcfg) if fixture
                  else yolo11.init_params(jax.random.key(0), mcfg))
        r = task_parity_report(task, images, params, mcfg, pcfg)
        results[task] = r
        print(json.dumps({"task": task, **{k: (round(v, 4)
              if isinstance(v, float) else v) for k, v in r.items()}}),
              flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
