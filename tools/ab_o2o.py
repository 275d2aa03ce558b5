"""NMS-free vs NMS accuracy A/B — ONE dual-head checkpoint, two deploys.

Trains a dual-head model (ModelConfig.o2o: standard one-to-many head +
YOLOv10-style one-to-one head) on the synthetic-shapes dataset's exact
GT, then evaluates the SAME weights through both compiled deploy modes:

  o2o=True  -> top-K select from the one-to-one head, NO NMS in program
  o2o=False -> the classic head + exact greedy NMS (Pallas on TPU)

The delta prices what the NMS-free convenience costs (or doesn't) in
mAP; the throughput side is `python bench.py 128 --o2o` on chip.

CPU scale:  python tools/ab_o2o.py --cpu --size 96 --epochs 18
Chip scale: python tools/ab_o2o.py --size 640 --epochs 18
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..")))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=18)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--n-val", type=int, default=48)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weights", default=(
        "/root/reference/Assets/Resources/Model/"
        "yolo11n-seg-sentis.sentis"),
        help="donor weights ('none' for random init; the o2o head always "
             "starts random — the donor has no one-to-one branch)")
    ap.add_argument("--score-gate", type=float, default=0.05,
                    help="eval score threshold (applies to BOTH deploys)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import xrseg_tpu
    xrseg_tpu.enable_compile_cache()
    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.eval.dataset_eval import evaluate_dataset
    from xrseg_tpu.train import data as D
    from xrseg_tpu.train.trainer import TrainConfig, Trainer

    size = args.size
    cfg = ModelConfig(scale="n", input_size=(size, size), num_classes=3,
                      dtype="float32", o2o=True)
    train_ds = D.SyntheticShapesDataset(n=args.n_train, hw=(size, size),
                                        n_classes=3)
    val_ds = D.SyntheticShapesDataset(n=args.n_val, hw=(size, size),
                                      n_classes=3, seed=1)

    params = None
    lr = args.lr
    if args.weights and args.weights.lower() != "none" \
            and os.path.exists(args.weights):
        from xrseg_tpu.io.weights import load_params_auto, transfer_params
        donor_cfg = ModelConfig(scale="n", input_size=(size, size),
                                num_classes=80, dtype="float32")
        donor, _ = load_params_auto(args.weights, donor_cfg)
        params, rep = transfer_params(donor, cfg)
        print(f"graft from {args.weights}: {rep['copied']} copied, "
              f"{len(rep['reinit'])} reinit (incl. the o2o head)",
              flush=True)
    else:
        lr = max(lr, 5e-4)                  # random init needs more

    tr = Trainer(cfg, TrainConfig(epochs=args.epochs, batch=args.batch,
                                  lr=lr, max_gt=8, ckpt_dir=None),
                 params=params)
    tr.fit(train_ds, val_dataset=None)
    trained = tr.eval_params

    if args.out:
        from xrseg_tpu.io.weights import save_npz
        import jax as _jax
        save_npz(args.out + ".student.npz", _jax.device_get(trained))

    # short schedules leave the o2o head's ABSOLUTE confidence low (one
    # positive per GT calibrates slowly — YOLOv10 trains 500 epochs);
    # mAP is ranking-based, so score each mode at the deploy gate AND a
    # low gate that admits the uncalibrated-but-ranked detections
    results = {}
    for mode, mcfg in (("o2o_nms_free", cfg),
                       ("classic_nms", dataclasses.replace(cfg,
                                                           o2o=False))):
        for gate in sorted({args.score_gate, 0.005}, reverse=True):
            r = evaluate_dataset(mcfg, trained, val_ds, batch=8,
                                 score_threshold=gate)
            key = f"{mode}@{gate}"
            results[key] = r
            print(json.dumps({"config": key, **{
                k: round(v, 4) if isinstance(v, float) else v
                for k, v in r.items()}}), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, default=float)
            f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
