"""Pseudo-label an unlabeled image directory into COCO instances JSON.

Runs the deployed pipeline (any weights format) over every image and
writes standard COCO annotations — boxes + polygonized instance masks —
so the output trains directly via `examples/train.py --data DIR --ann
pseudo.json` (or any external COCO consumer). The self-training
complement of response distillation (train/distill.py): masks transfer.

  python tools/pseudo_label.py --images frames/ \
      --weights yolo11n-seg-sentis.sentis --out frames/pseudo.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..")))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="unlabeled image dir")
    ap.add_argument("--weights", required=True,
                    help="teacher weights (.sentis/.onnx/.pt/.npz/orbax)")
    ap.add_argument("--out", required=True, help="COCO JSON to write")
    ap.add_argument("--score-gate", type=float, default=0.5,
                    help="min teacher confidence for a pseudo label")
    ap.add_argument("--arch", default="yolo11",
                    choices=["yolo11", "yolov8"])
    ap.add_argument("--scale", default="n", choices=list("nsmlx"))
    ap.add_argument("--size", type=int, default=640, help="model input")
    ap.add_argument("--classes", type=int, default=80)
    ap.add_argument("--poly-step", type=int, default=2,
                    help="polygon row subsampling (bigger = smaller JSON)")
    ap.add_argument("--max-images", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from PIL import Image

    import xrseg_tpu
    xrseg_tpu.enable_compile_cache()
    from xrseg_tpu.config import ExecutorConfig, ModelConfig
    from xrseg_tpu.io.weights import load_params_auto
    from xrseg_tpu.train.pseudo import (coco_from_samples,
                                        generate_pseudo_samples)

    cfg = ExecutorConfig(model=ModelConfig(
        arch=args.arch, scale=args.scale, num_classes=args.classes,
        input_size=(args.size, args.size)))
    params, got = load_params_auto(args.weights, cfg.model)
    if got is not None and got.num_classes != args.classes:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(got,
                                           input_size=cfg.model.input_size))

    exts = (".png", ".jpg", ".jpeg", ".bmp")
    files = sorted(f for f in os.listdir(args.images)
                   if f.lower().endswith(exts))
    if args.max_images:
        files = files[:args.max_images]
    if not files:
        print(f"no images in {args.images}", file=sys.stderr)
        return 2

    def frames():
        for f in files:
            yield np.asarray(
                Image.open(os.path.join(args.images, f)).convert("RGB"),
                np.uint8)

    samples = generate_pseudo_samples(cfg, params, frames(),
                                      score_gate=args.score_gate,
                                      poly_step=args.poly_step)
    if cfg.model.num_classes == 80:
        from xrseg_tpu.viz.labels import COCO_LABELS as names
    else:
        names = [str(i) for i in range(cfg.model.num_classes)]
    coco = coco_from_samples(samples, files, names)
    with open(args.out, "w") as f:
        json.dump(coco, f)
    n_ann = len(coco["annotations"])
    n_seg = sum(1 for a in coco["annotations"] if "segmentation" in a)
    print(json.dumps({"images": len(files), "annotations": n_ann,
                      "with_masks": n_seg, "out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
