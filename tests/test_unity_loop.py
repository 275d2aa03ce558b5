"""The Unity redeploy loop, composed end-to-end (docs/UNITY_LOOP.md):

  reference .sentis  ->  fine-tune in this framework  ->  ONNX export
  ->  execute the exported graph  ->  the golden bus detection survives.

Every stage exists and is unit-tested elsewhere (io/sentis, train/,
io/onnx_export, io/onnx_exec); this test pins the COMPOSITION — the
flagship "TPU-native replacement that round-trips with the reference's
toolchain" story. The exported artifact is exactly what the reference's
editor converter consumes (raw YOLO11-seg ONNX,
Assets/Scripts/InferenceEngine/Editor/IEModelEditorConverter.cs:34).

Gated on the reference assets; runs on CPU (conftest).
"""
import dataclasses
import os

import numpy as np
import pytest

SENTIS = "/root/reference/Assets/Resources/Model/yolo11n-seg-sentis.sentis"
IMAGES = "/root/reference/Assets/Resources/Images"
BUS_IMAGE = os.path.join(IMAGES, "000000002006.jpg")
BUS_CLASS = 5                      # COCO "bus"

pytestmark = pytest.mark.skipif(not os.path.exists(SENTIS),
                                reason="reference assets not available")


def _bus_detections_from_onnx(onnx_path, mcfg640):
    """Execute an exported ONNX on the bus image with the deployed XR
    postprocess; return (labels, scores, boxes) of the detections."""
    import jax.numpy as jnp
    from PIL import Image

    from xrseg_tpu.config import PostprocessConfig
    from xrseg_tpu.io.onnx_exec import run_onnx
    from xrseg_tpu.ops.postprocess import postprocess

    img = np.asarray(Image.open(BUS_IMAGE).convert("RGB").resize(
        (640, 640), Image.BILINEAR), np.float32) / 255.0
    out = run_onnx(onnx_path, {"images": np.transpose(
        img[None], (0, 3, 1, 2)).astype(np.float32)})
    preds = jnp.asarray(np.transpose(out["output0"], (0, 2, 1)))
    protos = jnp.asarray(np.transpose(out["output1"], (0, 2, 3, 1)))
    det = postprocess(preds, protos,
                      PostprocessConfig(iou_threshold=0.43,
                                        score_threshold=0.301),
                      num_classes=mcfg640.num_classes)
    n = int(det["count"][0])
    return (np.asarray(det["labels"][0][:n]),
            np.asarray(det["scores"][0][:n]),
            np.asarray(det["boxes_xywh"][0][:n]))


def test_sentis_finetune_export_roundtrip(tmp_path):
    import jax

    from xrseg_tpu.io.onnx_export import export_onnx
    from xrseg_tpu.io.sentis import load_yolo11_params
    from xrseg_tpu.train.data import SyntheticShapesDataset
    from xrseg_tpu.train.trainer import TrainConfig, Trainer

    params, mcfg = load_yolo11_params(SENTIS)
    mcfg640 = dataclasses.replace(mcfg, dtype="float32")

    # ---- stage 1: golden baseline — the deployed weights, exported as
    # the reference-contract ONNX, still detect the bus
    base_onnx = str(tmp_path / "deployed.onnx")
    export_onnx(jax.device_get(params), mcfg640, base_onnx)
    labels0, scores0, _ = _bus_detections_from_onnx(base_onnx, mcfg640)
    assert BUS_CLASS in labels0, f"baseline lost the bus: {labels0}"
    base_bus_score = float(scores0[labels0 == BUS_CLASS].max())
    assert base_bus_score > 0.7

    # ---- stage 2: fine-tune FROM the deployed weights (not random init).
    # Small LR + warmup keeps the pretrained behavior while the loss
    # adapts to the synthetic classes; weights are resolution-independent
    # so training runs at 160 px for speed and exports at 640.
    train_cfg = dataclasses.replace(mcfg, dtype="float32",
                                    input_size=(160, 160))
    tcfg = TrainConfig(epochs=2, batch=4, lr=5e-5, warmup_steps=4,
                       max_gt=4, log_every=0, ema_decay=0.0,
                       use_remat=False, save_best=False)
    trainer = Trainer(train_cfg, tcfg, params=params)
    ds = SyntheticShapesDataset(n=16, hw=(160, 160), n_classes=3)
    history = trainer.fit(ds, verbose=False)
    assert len(history) == 2
    losses = [h["loss"] for h in history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"fine-tune did not learn: {losses}"

    # ---- stage 3: export the fine-tuned weights to the Unity contract
    ft_onnx = str(tmp_path / "finetuned.onnx")
    export_onnx(jax.device_get(trainer.state.params), mcfg640, ft_onnx)
    assert os.path.getsize(ft_onnx) > 1e6

    # ---- stage 4: the exported graph still detects the golden bus
    labels1, scores1, _ = _bus_detections_from_onnx(ft_onnx, mcfg640)
    assert BUS_CLASS in labels1, \
        f"fine-tune destroyed the bus detection: {labels1}"
    ft_bus_score = float(scores1[labels1 == BUS_CLASS].max())
    assert ft_bus_score > 0.5, (base_bus_score, ft_bus_score)

    # ---- stage 5: redeploy WITHOUT the Unity editor converter — write
    # the fine-tuned weights straight into a .sentis artifact (weight
    # transplant into the deployed template, program region unchanged)
    # and confirm the artifact round-trips: reloading reproduces the
    # fine-tuned weights within the uint8 quantization step.
    from xrseg_tpu.io.sentis import load_yolo11_params, write_yolo11_sentis
    ft_params = jax.device_get(trainer.state.params)
    ft_sentis = str(tmp_path / "finetuned.sentis")
    write_yolo11_sentis(ft_sentis, ft_params, SENTIS, mcfg640)
    reloaded, _ = load_yolo11_params(ft_sentis)
    import jax as _jax
    for a, b in zip(_jax.tree_util.tree_leaves(ft_params),
                    _jax.tree_util.tree_leaves(reloaded)):
        a, b = np.asarray(a), np.asarray(b)
        step = (float(a.max()) - float(a.min())) / 255.0
        assert np.abs(a - b).max() <= step * 0.51 + 1e-6
