"""Active-learning frame selection: rank an unlabeled image directory by
model uncertainty and print the top-K frames to label.

The label-efficiency loop (TRAINING.md): pseudo-label what the deployed
model already knows (`tools/pseudo_label.py`), send the frames it is
UNSURE about to a human — this tool picks them.

  python tools/select_frames.py --images frames/ \
      --weights yolo11n-seg-sentis.sentis --k 20 --strategy flip
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..")))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--strategy", default="margin",
                    choices=["margin", "flip"])
    ap.add_argument("--score-gate", type=float, default=0.05)
    ap.add_argument("--arch", default="yolo11",
                    choices=["yolo11", "yolov8"])
    ap.add_argument("--scale", default="n", choices=list("nsmlx"))
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--classes", type=int, default=80)
    ap.add_argument("--out", default=None, help="also write JSON here")
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
    from xrseg_tpu.train.active import rank_frames

    cfg = ExecutorConfig(model=ModelConfig(
        arch=args.arch, scale=args.scale, num_classes=args.classes,
        input_size=(args.size, args.size)))
    params, got = load_params_auto(args.weights, cfg.model)
    if got is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(got,
                                           input_size=cfg.model.input_size))

    exts = (".png", ".jpg", ".jpeg", ".bmp")
    files = sorted(f for f in os.listdir(args.images)
                   if f.lower().endswith(exts))
    if not files:
        print(f"no images in {args.images}", file=sys.stderr)
        return 2

    def frames():
        for f in files:
            yield np.asarray(
                Image.open(os.path.join(args.images, f)).convert("RGB"),
                np.uint8)

    ranked = rank_frames(cfg, params, frames(), strategy=args.strategy,
                         score_gate=args.score_gate)
    rows = [{"file": files[i], "uncertainty": round(u, 4)}
            for i, u in ranked[:args.k]]
    for r in rows:
        print(f"{r['uncertainty']:8.4f}  {r['file']}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    print(json.dumps({"strategy": args.strategy, "scored": len(files),
                      "selected": len(rows)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
