"""Task-family training demo: pose / obb / classify on synthetic data.

The detect/segment tasks train through the full Trainer (examples/
train.py). The extended tasks use the same jitted train steps with their
own exact-GT synthetic datasets and collates — this CLI makes those
paths user-reachable:

  python examples/train_tasks.py --task pose     [--steps 60] [--size 64]
  python examples/train_tasks.py --task obb      [--steps 60]
  python examples/train_tasks.py --task classify [--steps 60]

With --data DIR, trains on an ultralytics-format on-disk dataset instead
of synthetic GT: pose/obb expect `DIR/images + DIR/labels` (keypoint /
DOTA 8-point label lines), classify expects `DIR/<class_name>/*.jpg`.
Batches then cycle through the dataset rather than repeating one batch.

With --epochs N, trains through the FULL Trainer instead of the raw step
loop: Loader augmentation (geometry-aware hflip; COCO-17 keypoint
left/right permutation applied automatically for 17-kpt pose), EMA
weights, per-epoch validation on the task metric (enable with --eval),
checkpoints (--ckpt DIR, --resume).

Prints per-step loss (plus accuracy for classify); saves final params to
--out as npz.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _infer_classes(ds, floor: int = 1) -> int:
    """Max label id + 1 across the dataset (bounded scan)."""
    hi = floor - 1
    for i in range(min(len(ds), 256)):
        labels = ds[i]["labels"]
        if len(labels):
            hi = max(hi, int(labels.max()))
    return hi + 1


def _donor_params(args, cfg):
    """--weights: load a donor checkpoint and graft it onto the task
    model (backbone/neck/box branches kept, task head fresh)."""
    if not args.weights:
        return None
    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.io.weights import (load_params_auto, params_match_config,
                                      transfer_params)
    try:
        params, _ = load_params_auto(args.weights, cfg)
    except ValueError:
        donor_cfg = ModelConfig(arch=cfg.arch, scale=cfg.scale,
                                input_size=cfg.input_size,
                                dtype="float32")   # 80-class segmenter
        params, _ = load_params_auto(args.weights, donor_cfg)
    if not params_match_config(params, cfg):
        params, rep = transfer_params(params, cfg)
        print(f"transfer: {rep['copied']} leaves from {args.weights}; "
              f"{len(rep['reinit'])} reinitialized")
    return params


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", required=True,
                    choices=["pose", "obb", "classify"])
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--n-samples", type=int, default=8)
    ap.add_argument("--data", default=None, metavar="DIR",
                    help="ultralytics-format dataset dir (pose/obb: "
                         "images+labels; classify: folder-per-class). "
                         "Default: synthetic exact-GT data")
    ap.add_argument("--ann", default=None, metavar="JSON",
                    help="pose: COCO person_keypoints annotations; "
                         "--data is then the images directory")
    ap.add_argument("--dump", default=None, metavar="JSON",
                    help="pose with --eval: also write detections as a "
                         "COCO keypoint-results JSON (for external "
                         "pycocotools OKS scoring)")
    ap.add_argument("--tta", action="store_true",
                    help="--eval with 2-view TTA (pose uses the COCO-17 "
                         "flip permutation for 17-kpt models, identity "
                         "otherwise)")
    ap.add_argument("--classes", type=int, default=None,
                    help="num classes (default: synthetic preset, or "
                         "inferred from --data labels)")
    ap.add_argument("--kpt-shape", type=int, nargs=2, default=None,
                    metavar=("K", "D"),
                    help="pose keypoint shape in the label files "
                         "(default: 5 3 synthetic, 17 3 with --data)")
    ap.add_argument("--epochs", type=int, default=0, metavar="N",
                    help="train with the FULL Trainer for N epochs "
                         "(EMA, per-epoch validation, checkpoints) "
                         "instead of the raw --steps loop")
    ap.add_argument("--ckpt", default=None, metavar="DIR",
                    help="Trainer mode: checkpoint dir (resume with "
                         "--resume)")
    ap.add_argument("--resume", action="store_true",
                    help="Trainer mode: resume from --ckpt")
    ap.add_argument("--out", default=None, help="save final params (.npz)")
    ap.add_argument("--weights", default=None,
                    help="donor checkpoint (.npz/.sentis/.onnx) to "
                         "transfer from — e.g. the reference's deployed "
                         "80-class segmenter; the backbone/neck/box "
                         "branches are grafted, the task head is fresh")
    ap.add_argument("--eval", type=int, default=0, metavar="N",
                    help="after training, score N dataset images through "
                         "the compiled pipeline (OKS AP / rotated AP / "
                         "top-1 accuracy)")
    ap.add_argument("--render", default=None, metavar="DIR",
                    help="pose/obb: write overlay PNGs (skeletons / "
                         "rotated boxes) for a few dataset images")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fsdp", action="store_true",
                    help="ZeRO-3 state sharding over the data axis "
                         "(with --epochs; uses all visible devices)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="microbatches per optimizer step")
    ap.add_argument("--tb", default=None, metavar="DIR",
                    help="TensorBoard scalar logdir ('auto' = <ckpt>/tb)")
    ap.add_argument("--arch", default="yolo11",
                    choices=["yolo11", "yolov8"])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype (params stay f32 master weights; "
                         "bfloat16 halves conv HBM traffic on TPU)")
    ap.add_argument("--label-smoothing", type=float, default=0.0,
                    help="classify: CE target smoothing eps")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    import xrseg_tpu
    xrseg_tpu.enable_compile_cache()
    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.train import data as D
    from xrseg_tpu.train import train_step as ts

    hw = (args.size, args.size)
    if args.task == "pose":
        kpt = tuple(args.kpt_shape or ((17, 3) if args.data else (5, 3)))
        if args.data and args.ann:
            ds = D.CocoPoseDataset(args.ann, args.data)
            kpt = ds.kpt_shape
            ncls = args.classes or len(ds.class_names) or 1
        elif args.data:
            ds = D.YoloPoseDataset(args.data, kpt_shape=kpt)
            ncls = args.classes or _infer_classes(ds, 1)
        else:
            ds = D.SyntheticPoseDataset(n=args.n_samples, hw=hw,
                                        max_objects=1)
            ncls = args.classes or 2
        # model stores (K, 3); D=2 label files synthesize vis=1 on load
        cfg = ModelConfig(arch=args.arch, scale="n", input_size=hw,
                          dtype=args.dtype,
                          task="pose", kpt_shape=(kpt[0], 3),
                          num_classes=ncls)
        collate = lambda samples: D.collate_pose(samples, hw)
    elif args.task == "obb":
        if args.data:
            ds = D.YoloOBBDataset(args.data)
            ncls = args.classes or _infer_classes(ds, 1)
        else:
            ds = D.SyntheticOBBDataset(n=args.n_samples, hw=hw,
                                       max_objects=1)
            ncls = args.classes or 2
        cfg = ModelConfig(arch=args.arch, scale="n", input_size=hw,
                          dtype=args.dtype,
                          task="obb", num_classes=ncls)
        collate = lambda samples: D.collate_obb(samples, hw)
    else:
        if args.data:
            ds = D.ImageFolderDataset(args.data)
            ncls = args.classes or len(ds.classes)
        else:
            ds = D.SyntheticClassifyDataset(n=args.n_samples, hw=hw)
            ncls = args.classes or 3
        cfg = ModelConfig(arch=args.arch, scale="n", input_size=hw,
                          dtype=args.dtype,
                          task="classify", num_classes=ncls)
        collate = lambda samples: D.collate_classify(samples, hw)

    import numpy as np

    if args.epochs:
        # full Trainer: Loader augmentation (geometry-aware hflip), EMA,
        # per-epoch validation on the task metric, checkpoints/resume
        from xrseg_tpu.train.trainer import TrainConfig, Trainer
        # COCO-17 left/right joint permutation under a horizontal mirror
        flip_idx = ((0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13,
                     16, 15) if args.task == "pose"
                    and cfg.kpt_shape[0] == 17 else None)
        tcfg = TrainConfig(
            epochs=args.epochs, batch=args.batch, lr=args.lr,
            warmup_steps=2, use_remat=False, ckpt_dir=args.ckpt,
            val_max_images=args.eval or 8, kpt_flip_idx=flip_idx,
            fsdp=args.fsdp, grad_accum=args.grad_accum, tb_dir=args.tb,
            label_smoothing=args.label_smoothing,
            aug=D.AugmentConfig(mosaic=0.0, scale=0.0, translate=0.0))
        mesh = None
        if args.fsdp:
            from xrseg_tpu.parallel import mesh as mesh_lib
            mesh = mesh_lib.make_mesh()
        tr = Trainer(cfg, tcfg, mesh=mesh,
                     params=_donor_params(args, cfg))
        t0 = time.perf_counter()
        tr.fit(ds, val_dataset=ds if args.eval else None,
               resume=args.resume)
        print(f"{args.epochs} epochs in {time.perf_counter() - t0:.1f}s")
        params = jax.device_get(tr.eval_params)
    else:
        params = None                       # raw step loop below

    perm = np.random.default_rng(0).permutation(len(ds))

    def batch_at(step_i: int):
        if not args.data:
            # synthetic demo: one fixed batch, exact convergence check
            idx = range(args.batch)
        else:
            # deterministic shuffle so folder-sorted datasets (e.g.
            # classify's one-folder-per-class) mix classes within a batch
            start = (step_i * args.batch) % len(ds)
            idx = [perm[(start + j) % len(ds)] for j in range(args.batch)]
        b = collate([ds[i] for i in idx])
        return {k: jnp.asarray(v) for k, v in b.items()}

    if params is None:
        opt = ts.make_optimizer(args.lr, warmup_steps=2,
                                total_steps=args.steps)
        state = ts.init_train_state(jax.random.key(0), cfg, opt)
        donor = _donor_params(args, cfg)
        if donor is not None:
            state = ts.TrainState(params=donor, opt_state=opt.init(donor),
                                  step=state.step)
        step = ts.make_train_step(cfg, opt, use_remat=False,
                                  label_smoothing=args.label_smoothing)

        t0 = time.perf_counter()
        batch = batch_at(0)
        for i in range(args.steps):
            if args.data and i:
                batch = batch_at(i)
            state, m = step(state, batch)
            if i % 10 == 0 or i == args.steps - 1:
                extra = (f" acc={float(m['acc']):.3f}"
                         if "acc" in m else "")
                print(f"step {i}: loss={float(m['loss']):.4f}{extra}",
                      flush=True)
        print(f"{args.steps} steps in {time.perf_counter() - t0:.1f}s")
        params = jax.device_get(state.params)

    if args.eval:
        from xrseg_tpu.eval.dataset_eval import evaluate_task_dataset
        flip17 = (0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13,
                  16, 15)
        kfi = None
        if args.tta and args.task == "pose":
            kfi = (flip17 if cfg.kpt_shape[0] == 17
                   else tuple(range(cfg.kpt_shape[0])))
        r = evaluate_task_dataset(cfg, params, ds,
                                  max_images=args.eval,
                                  batch=min(4, args.eval),
                                  score_threshold=0.005,
                                  coco_dump=(args.dump if args.task ==
                                             "pose" else None),
                                  tta=(args.tta and
                                       args.task != "classify"),
                                  tta_kpt_flip_idx=kfi)
        print("eval:", {k: (round(v, 4) if isinstance(v, float) else v)
                        for k, v in r.items()})

    if args.render and args.task in ("pose", "obb"):
        import numpy as np
        from PIL import Image

        from xrseg_tpu.compile import build_pipeline
        from xrseg_tpu.config import ExecutorConfig, PostprocessConfig
        from xrseg_tpu.viz.boxer import draw_keypoints, draw_rotated_boxes
        os.makedirs(args.render, exist_ok=True)
        pipe = build_pipeline(
            ExecutorConfig(model=cfg, post=PostprocessConfig(
                score_threshold=0.005)),
            params, batch=1)
        for i in range(min(4, len(ds))):
            frame = np.asarray(ds[i]["image"])
            det = jax.device_get(pipe(frame[None]))
            n = int(det["count"][0])
            if args.task == "obb":
                img = draw_rotated_boxes(frame, det["boxes_xywhr"][0],
                                         det["labels"][0],
                                         det["scores"][0], n)
            else:
                img = draw_keypoints(frame, det["kpts"][0][:n])
            path = os.path.join(args.render, f"{args.task}_{i}.png")
            Image.fromarray(img).save(path)
            print(f"rendered {path} ({n} detections)")

    if args.out:
        from xrseg_tpu.io.weights import save_npz
        save_npz(args.out, params)
        print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
