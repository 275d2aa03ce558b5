"""Distill a teacher model into a smaller / different-generation student.

The teacher's responses are the supervision, so UNLABELED frames work —
the natural fit for the reference's XR capture setting (camera frames
are plentiful, boxes are not; the deployed model is the teacher:
Assets/Resources/Model/yolo11n-seg-sentis.sentis).

  # pure-response distillation on an unlabeled image directory:
  python examples/distill.py --teacher yolo11n-seg-sentis.sentis \
      --images frames/ --arch yolov8 --scale n --steps 500 --out /tmp/stu

  # synthetic-shapes dataset (exact GT): mix ground truth in:
  python examples/distill.py --teacher ckpt.npz --synthetic \
      --det-weight 1.0 --steps 200 --out /tmp/stu

The student checkpoint lands at <out>/student.npz (standard npz — every
CLI accepts it via --weights, and `python -m xrseg_tpu.compile` exports
it to ONNX/.sentis form for redeploy).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--teacher", required=True,
                    help="teacher weights (.sentis/.onnx/.pt/.npz/orbax)")
    ap.add_argument("--images", help="UNLABELED image dir (pure-response "
                                     "distillation)")
    ap.add_argument("--synthetic", action="store_true",
                    help="synthetic-shapes dataset (has GT; enables "
                         "--det-weight mixing)")
    ap.add_argument("--arch", default="yolo11",
                    choices=["yolo11", "yolov8"], help="student arch")
    ap.add_argument("--scale", default="n", choices=list("nsmlx"),
                    help="student scale")
    ap.add_argument("--task", default=None,
                    help="student task (default: teacher's task)")
    ap.add_argument("--classes", type=int, default=None,
                    help="student classes (default: teacher's)")
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--temp", type=float, default=2.0)
    ap.add_argument("--cls-weight", type=float, default=1.0)
    ap.add_argument("--box-weight", type=float, default=1.0)
    ap.add_argument("--fg-power", type=float, default=1.0)
    ap.add_argument("--det-weight", type=float, default=0.0,
                    help="> 0 mixes the ground-truth detection loss "
                         "(needs a labeled source, i.e. --synthetic)")
    ap.add_argument("--student-weights", default=None,
                    help="initialize the student from a checkpoint "
                         "(otherwise random init)")
    ap.add_argument("--teacher-arch", default=None,
                    help="teacher arch for metadata-free checkpoints "
                         "(.npz/orbax; .sentis/.onnx/.pt self-describe)")
    ap.add_argument("--teacher-scale", default=None)
    ap.add_argument("--teacher-task", default=None)
    ap.add_argument("--mesh", type=int, default=0,
                    help="DP mesh size (0 = single device)")
    ap.add_argument("--out", default="/tmp/xrseg_distill")
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if not args.images and not args.synthetic:
        ap.error("--images or --synthetic required")
    if args.det_weight > 0 and not args.synthetic:
        ap.error("--det-weight needs a labeled source (--synthetic)")

    import numpy as np
    import jax

    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.io.weights import load_params_auto, save_npz
    from xrseg_tpu.train import data as D
    from xrseg_tpu.train.distill import DistillConfig, make_distill_step
    from xrseg_tpu.train.train_step import (init_train_state,
                                            make_optimizer)

    hw = (args.size, args.size)
    tparams, tcfg = load_params_auto(args.teacher)
    if tcfg is None:                      # metadata-free npz/orbax teacher
        from xrseg_tpu.io.weights import donor_num_classes
        tcfg = ModelConfig(
            arch=args.teacher_arch or args.arch,
            scale=args.teacher_scale or args.scale,
            task=args.teacher_task or (args.task or "segment"),
            num_classes=donor_num_classes(tparams) or 80)
    tcfg = dataclasses.replace(tcfg, input_size=hw)
    task = args.task or tcfg.task
    nc = args.classes or tcfg.num_classes
    if nc != tcfg.num_classes:
        ap.error(f"student classes ({nc}) must match the teacher's "
                 f"({tcfg.num_classes}) — responses ARE the labels")
    scfg = ModelConfig(arch=args.arch, scale=args.scale, task=task,
                       num_classes=nc, input_size=hw)
    print(f"teacher: {tcfg.arch}-{tcfg.scale} {tcfg.task} nc={nc}  ->  "
          f"student: {scfg.arch}-{scfg.scale} {scfg.task}")

    mesh = None
    if args.mesh:
        from xrseg_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh((args.mesh, 1))

    opt = make_optimizer(lr=args.lr, warmup_steps=max(args.steps // 20, 5),
                         total_steps=args.steps)
    state = init_train_state(jax.random.key(0), scfg, opt)
    if args.student_weights:
        sparams, _ = load_params_auto(args.student_weights, scfg)
        state = dataclasses.replace(state, params=sparams)
    dcfg = DistillConfig(temperature=args.temp, cls_weight=args.cls_weight,
                         box_weight=args.box_weight,
                         fg_power=args.fg_power, det_weight=args.det_weight)
    step = make_distill_step(scfg, tcfg, opt, dcfg, mesh=mesh)

    # --- batch source ---
    if args.synthetic:
        ds = D.SyntheticShapesDataset(n=max(args.batch * 8, 64), hw=hw,
                                      n_classes=min(3, nc))
        rng = np.random.default_rng(0)

        def batches():
            while True:
                idx = rng.integers(0, len(ds), args.batch)
                yield D.collate([ds[int(i)] for i in idx], scfg,
                                max_gt=8)
    else:
        exts = (".png", ".jpg", ".jpeg", ".bmp")
        files = sorted(os.path.join(args.images, f)
                       for f in os.listdir(args.images)
                       if f.lower().endswith(exts))
        if not files:
            ap.error(f"no images in {args.images}")
        from PIL import Image
        rng = np.random.default_rng(0)

        def load(f):
            return np.asarray(Image.open(f).convert("RGB"), np.uint8)

        def batches():
            while True:
                idx = rng.integers(0, len(files), args.batch)
                imgs = [D._resize_uint8(load(files[int(i)]), hw)
                        for i in idx]
                yield {"images": np.stack(imgs).astype(np.float32) / 255}

    os.makedirs(args.out, exist_ok=True)
    it = batches()
    m = {}
    for i in range(args.steps):
        state, m = step(state, tparams, next(it))
        if i % args.log_every == 0 or i == args.steps - 1:
            print(f"step {i:5d}  loss {float(m['loss']):.4f}  "
                  f"cls {float(m['distill_cls']):.4f}  "
                  + (f"box {float(m['distill_box']):.4f}  "
                     if "distill_box" in m else "")
                  + f"agree {float(m['teacher_agreement']):.3f}")

    out_path = os.path.join(args.out, "student.npz")
    save_npz(out_path, jax.device_get(state.params))
    summary = {"steps": args.steps,
               "final_loss": round(float(m["loss"]), 5),
               "teacher_agreement": round(float(m["teacher_agreement"]), 4),
               "student": f"{scfg.arch}-{scfg.scale}-{scfg.task}",
               "out": out_path}
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
