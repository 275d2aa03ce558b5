"""Task-family training demo: pose / obb / classify on synthetic data.

The detect/segment tasks train through the full Trainer (examples/
train.py). The extended tasks use the same jitted train steps with their
own exact-GT synthetic datasets and collates — this CLI makes those
paths user-reachable:

  python examples/train_tasks.py --task pose     [--steps 60] [--size 64]
  python examples/train_tasks.py --task obb      [--steps 60]
  python examples/train_tasks.py --task classify [--steps 60]

Prints per-step loss (plus accuracy for classify); saves final params to
--out as npz.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", required=True,
                    choices=["pose", "obb", "classify"])
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--n-samples", type=int, default=8)
    ap.add_argument("--out", default=None, help="save final params (.npz)")
    ap.add_argument("--eval", type=int, default=0, metavar="N",
                    help="after training, score N dataset images through "
                         "the compiled pipeline (OKS AP / rotated AP / "
                         "top-1 accuracy)")
    ap.add_argument("--render", default=None, metavar="DIR",
                    help="pose/obb: write overlay PNGs (skeletons / "
                         "rotated boxes) for a few dataset images")
    ap.add_argument("--cpu", action="store_true")
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
        cfg = ModelConfig(scale="n", input_size=hw, dtype="float32",
                          task="pose", kpt_shape=(5, 3), num_classes=2)
        ds = D.SyntheticPoseDataset(n=args.n_samples, hw=hw,
                                    max_objects=1)
        batch = D.collate_pose([ds[i] for i in range(args.batch)], hw)
    elif args.task == "obb":
        cfg = ModelConfig(scale="n", input_size=hw, dtype="float32",
                          task="obb", num_classes=2)
        ds = D.SyntheticOBBDataset(n=args.n_samples, hw=hw,
                                   max_objects=1)
        batch = D.collate_obb([ds[i] for i in range(args.batch)], hw)
    else:
        cfg = ModelConfig(scale="n", input_size=hw, dtype="float32",
                          task="classify", num_classes=3)
        ds = D.SyntheticClassifyDataset(n=args.n_samples, hw=hw)
        batch = D.collate_classify([ds[i] for i in range(args.n_samples)],
                                   hw)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    opt = ts.make_optimizer(args.lr, warmup_steps=2,
                            total_steps=args.steps)
    state = ts.init_train_state(jax.random.key(0), cfg, opt)
    step = (ts.make_classify_train_step(cfg, opt)
            if args.task == "classify"
            else ts.make_train_step(cfg, opt, use_remat=False))

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, batch)
        if i % 10 == 0 or i == args.steps - 1:
            extra = (f" acc={float(m['acc']):.3f}"
                     if "acc" in m else "")
            print(f"step {i}: loss={float(m['loss']):.4f}{extra}",
                  flush=True)
    print(f"{args.steps} steps in {time.perf_counter() - t0:.1f}s")

    if args.eval:
        from xrseg_tpu.eval.dataset_eval import evaluate_task_dataset
        r = evaluate_task_dataset(cfg, state.params, ds,
                                  max_images=args.eval,
                                  batch=min(4, args.eval),
                                  score_threshold=0.005)
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
            jax.device_get(state.params), batch=1)
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
        save_npz(args.out, jax.device_get(state.params))
        print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
