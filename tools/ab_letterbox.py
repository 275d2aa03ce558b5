"""Letterbox-vs-stretch A/B on in-repo ground truth.

The reference STRETCHES frames into the model square (ToTensor,
IEExecutor.cs:370); ultralytics models are letterbox-trained. This tool
quantifies the cost of each train/deploy geometry combination using the
synthetic-shapes dataset's exact GT (train/data.py): train the same
init twice — stretch-augmented vs letterbox-augmented — on NON-SQUARE
source frames, then eval each checkpoint under BOTH deploy geometries
(eval/dataset_eval.py resize_mode), giving the 2x2 matrix

              deploy=stretch   deploy=letterbox
  train=stretch      A                B
  train=letterbox    C                D

A vs D is the apples-to-apples comparison; B and C price the
train/deploy geometry MISMATCH (the situation of running an
ultralytics-letterbox-trained checkpoint through the reference's
stretch deploy).

By default both arms FINE-TUNE from the reference's deployed .sentis
weights (80->3 class graft via io.weights.transfer_params) — transfer
converges in a couple of epochs where random init at this scale needs a
long schedule (a first random-init attempt at lr 2e-3 diverged at epoch
3 in both arms; the deployed-weights arm is also the practically
interesting comparison). Pass --weights none for random init.

CPU scale:  python tools/ab_letterbox.py --cpu --size 128 --epochs 8
Chip scale: python tools/ab_letterbox.py --size 640 --epochs 12
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..")))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--n-val", type=int, default=48)
    ap.add_argument("--lr", type=float, default=None,
                    help="default: 1e-4 fine-tune / 5e-4 random init")
    ap.add_argument("--weights", default=(
        "/root/reference/Assets/Resources/Model/"
        "yolo11n-seg-sentis.sentis"),
        help="donor weights to fine-tune from ('none' for random init)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    import xrseg_tpu
    xrseg_tpu.enable_compile_cache()
    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.eval.dataset_eval import evaluate_dataset
    from xrseg_tpu.train import data as D
    from xrseg_tpu.train.trainer import TrainConfig, Trainer

    size = args.size
    # 3:4 source frames: the stretch/letterbox distinction is real
    data_hw = (int(size * 0.75) // 32 * 32 or 32, size)
    cfg = ModelConfig(scale="n", input_size=(size, size),
                      num_classes=3, dtype="float32")
    train_ds = D.SyntheticShapesDataset(n=args.n_train, hw=data_hw,
                                        n_classes=3)
    val_ds = D.SyntheticShapesDataset(n=args.n_val, hw=data_hw,
                                      n_classes=3, seed=1)
    print(f"source frames {data_hw}, model {size}x{size}, "
          f"{args.n_train} train / {args.n_val} val", flush=True)

    init_params = None
    if args.weights and args.weights.lower() != "none" \
            and os.path.exists(args.weights):
        from xrseg_tpu.io.weights import load_params_auto, transfer_params
        donor_cfg = ModelConfig(scale="n", input_size=(size, size),
                                num_classes=80, dtype="float32")
        donor, _ = load_params_auto(args.weights, donor_cfg)
        init_params, rep = transfer_params(donor, cfg)
        print(f"fine-tuning from {args.weights}: {rep['copied']} leaves "
              f"copied, {len(rep['reinit'])} reinitialized", flush=True)
    lr = args.lr if args.lr is not None else \
        (1e-4 if init_params is not None else 5e-4)

    results = {}
    params_by_mode = {}
    for mode in ("stretch", "letterbox"):
        aug = D.AugmentConfig(letterbox=(mode == "letterbox"))
        tcfg = TrainConfig(epochs=args.epochs, batch=args.batch,
                           lr=lr, max_gt=8, aug=aug, ckpt_dir=None)
        tr = Trainer(cfg, tcfg,
                     params=init_params)   # same init for both arms
        tr.fit(train_ds, val_dataset=None)
        params_by_mode[mode] = tr.eval_params
        print(f"trained {mode}: final loss "
              f"{tr.history[-1].get('loss'):.4f}", flush=True)

    for tmode, params in params_by_mode.items():
        for dmode in ("stretch", "letterbox"):
            r = evaluate_dataset(cfg, params, val_ds, batch=8,
                                 resize_mode=dmode)
            key = f"train_{tmode}__deploy_{dmode}"
            results[key] = {k: round(v, 4) if isinstance(v, float) else v
                            for k, v in r.items()}
            print(json.dumps({"config": key, **results[key]}), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
