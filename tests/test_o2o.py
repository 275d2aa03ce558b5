"""NMS-free one-to-one head (ModelConfig.o2o, YOLOv10-style dual
assignment): structure, training, and the duplicate-free deploy
property — the compiled pipeline contains NO greedy suppression, so the
trained head itself must emit one detection per object."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xrseg_tpu.config import ExecutorConfig, ModelConfig
from xrseg_tpu.models import yolo11
from xrseg_tpu.train import data as D
from xrseg_tpu.train.train_step import init_train_state, make_optimizer, \
    make_train_step

CFG = ModelConfig(scale="n", task="segment", num_classes=3,
                  input_size=(64, 64), o2o=True, dtype="float32")


def test_o2o_init_and_forward_shapes():
    p = yolo11.init_params(jax.random.key(0), CFG)
    assert "det_o2o" in p and "det" in p
    out = yolo11.forward(p, jnp.zeros((2, 64, 64, 3)), CFG)
    A = CFG.num_anchors
    assert out["o2o_boxes_xywh"].shape == (2, A, 4)
    assert out["o2o_cls_logits"].shape == (2, A, 3)
    ot = yolo11.forward_train(p, jnp.zeros((2, 64, 64, 3)), CFG)
    assert ot["o2o_box_logits"].shape == (2, A, 4 * CFG.reg_max)


def test_o2o_rejects_unsupported_task():
    with pytest.raises(ValueError, match="o2o"):
        yolo11.init_params(jax.random.key(0),
                           dataclasses.replace(CFG, task="pose"))


def test_o2o_transfer_from_plain_checkpoint():
    """A plain (no-o2o) checkpoint grafts: everything shape-compatible
    copies and the o2o head WARM-STARTS from the donor's detect head
    (identical structure — topk=1 training then only has to learn
    suppression; a from-scratch o2o head at fine-tune lr never leaves
    ~0.002 confidence, measured in tools/ab_o2o.py)."""
    from xrseg_tpu.io.weights import params_match_config, transfer_params
    plain = yolo11.init_params(jax.random.key(0),
                               dataclasses.replace(CFG, o2o=False))
    assert not params_match_config(plain, CFG)
    grafted, rep = transfer_params(plain, CFG)
    assert "det_o2o" in grafted
    assert not any(k.startswith("det_o2o") for k in rep["reinit"])
    np.testing.assert_array_equal(np.asarray(grafted["b0"]["w"]),
                                  np.asarray(plain["b0"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(grafted["det_o2o"]["cv2"][0]["conv0"]["w"]),
        np.asarray(plain["det"]["cv2"][0]["conv0"]["w"]))


def test_o2o_postprocess_matches_numpy_oracle():
    """Randomized sweep (120 scenes): postprocess_o2o_batch (top-K
    select, no NMS) vs a from-scratch numpy oracle — ties, empty scenes,
    logit/probability inputs, A < max_det padding."""
    from xrseg_tpu.config import PostprocessConfig
    from xrseg_tpu.ops.postprocess import postprocess_o2o_batch

    rng = np.random.default_rng(0)
    for case in range(120):
        A = int(rng.integers(3, 40))
        nc = int(rng.integers(1, 5))
        B = int(rng.integers(1, 3))
        D = int(rng.integers(2, 12))
        logits = rng.normal(0, 2, (B, A, nc)).astype(np.float32)
        if case % 5 == 0:          # force score ties
            logits[:, : A // 2] = logits[:, A // 2:A // 2 + 1]
        if case % 7 == 0:          # empty scene: everything below gate
            logits[:] = -9.0
        boxes = rng.uniform(0, 64, (B, A, 4)).astype(np.float32)
        pcfg = PostprocessConfig(score_threshold=0.3, max_detections=D)
        det = jax.device_get(postprocess_o2o_batch(
            jnp.asarray(boxes), jnp.asarray(logits), None, None, pcfg,
            scores_are_logits=True))

        def sig(x):
            return 1.0 / (1.0 + np.exp(-x))

        for b in range(B):
            s = sig(logits[b]).max(-1)
            lab = logits[b].argmax(-1)
            order = np.argsort(-s, kind="stable")[:D]
            n_valid = int((s > 0.3).sum())
            assert int(det["count"][b]) == min(n_valid, D)
            k = int(det["count"][b])
            # scores must be the top-k descending (ties: any order)
            np.testing.assert_allclose(
                np.sort(det["scores"][b][:k])[::-1],
                np.sort(s[order][:k])[::-1], atol=1e-5)
            # every selected row is self-consistent with its anchor
            for j in range(k):
                a_idx = int(det["indices"][b][j])
                np.testing.assert_allclose(det["boxes_xywh"][b][j],
                                           boxes[b][a_idx], atol=1e-5)
                assert int(det["labels"][b][j]) == int(lab[a_idx])
                np.testing.assert_allclose(det["scores"][b][j],
                                           s[a_idx], atol=1e-5)


def test_o2o_seeded_on_checkpoint_load(tmp_path):
    """Loading a plain artifact under an o2o cfg warm-starts det_o2o
    from the loaded detect head (maybe_seed_o2o — same rationale as the
    transfer seeding)."""
    import torch
    from xrseg_tpu.io.torch_pt import load_yolo11_pt
    from test_pt_loader import make_state_dict
    plain_cfg = dataclasses.replace(CFG, o2o=False, task="detect")
    plain = yolo11.init_params(jax.random.key(0), plain_cfg)
    sd = make_state_dict(plain, plain_cfg, np.random.default_rng(0))
    p = str(tmp_path / "sd.pt")
    torch.save(sd, p)
    o2o_cfg = dataclasses.replace(CFG, task="detect")
    loaded, _ = load_yolo11_pt(p, o2o_cfg)
    np.testing.assert_array_equal(
        np.asarray(loaded["det_o2o"]["cv2"][0]["conv0"]["w"]),
        np.asarray(loaded["det"]["cv2"][0]["conv0"]["w"]))


def test_o2o_tta_rejected():
    from xrseg_tpu.compile import build_pipeline
    params = yolo11.init_params(jax.random.key(0), CFG)
    with pytest.raises(ValueError, match="o2o"):
        build_pipeline(ExecutorConfig(model=CFG), params, batch=1,
                       tta=True)


@pytest.fixture(scope="module")
def trained_o2o():
    """Overfit one fixed image with a LARGE box (the TAL bootstrap needs
    non-negligible init IoU — the same setup tests/test_train.py uses;
    tiny objects bootstrap too slowly for a test budget); both heads
    train in one step (one-to-many topk=10 + one-to-one topk=1)."""
    rng = np.random.default_rng(3)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)),
                              jnp.float32),
        "boxes_xywh": jnp.asarray([[[32.0, 30.0, 34.0, 30.0]]],
                                  jnp.float32),
        "labels": jnp.asarray([[1]], jnp.int32),
        "masks": jnp.asarray(rng.uniform(0, 1, (1, 1, 16, 16)) > 0.5,
                             jnp.float32),
    }
    opt = make_optimizer(lr=2e-3, warmup_steps=2, total_steps=120)
    state = init_train_state(jax.random.key(1), CFG, opt)
    step = make_train_step(CFG, opt, use_remat=False)
    m = {}
    for _ in range(120):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert "o2o_box" in m                  # the dual loss actually ran
    return state.params, batch


def _low_gate_cfg():
    """120 overfit steps localize well but leave confidence ~0.01-0.05
    (TAL's IoU-normalized soft targets rise slowly — same reasoning as
    tests/test_task_training.py's 0.005 val gate)."""
    e = ExecutorConfig(model=CFG)
    return dataclasses.replace(
        e, post=dataclasses.replace(e.post, score_threshold=0.005))


def test_o2o_pipeline_detects_without_nms(trained_o2o):
    params, batch = trained_o2o
    from xrseg_tpu.compile import build_pipeline, unpack_slate
    pipe = build_pipeline(_low_gate_cfg(), params, batch=1)
    frame = (np.asarray(batch["images"][0]) * 255).astype(np.uint8)
    out = pipe(frame[None])
    det = unpack_slate(np.asarray(out["slate"])[0], 50)

    gt = np.asarray(batch["boxes_xywh"][0][0])         # [4] model px

    def iou(a, b):
        ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2
        ax2, ay2 = a[0] + a[2] / 2, a[1] + a[3] / 2
        bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2
        bx2, by2 = b[0] + b[2] / 2, b[1] + b[3] / 2
        iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
        ih = max(0.0, min(ay2, by2) - max(ay1, by1))
        inter = iw * ih
        return inter / (a[2] * a[3] + b[2] * b[3] - inter + 1e-9)

    n = int(det["count"])
    assert n >= 1, "o2o head found nothing after overfit"
    assert iou(det["boxes_xywh"][0], gt) > 0.5, (det["boxes_xywh"][0], gt)
    # the NMS-free property: with no suppression anywhere in the
    # pipeline, at most ONE near-top detection may cover the object
    top = det["scores"][0]
    hits = [i for i in range(n)
            if det["scores"][i] > 0.5 * top
            and iou(det["boxes_xywh"][i], gt) > 0.5]
    assert len(hits) <= 1, (n, det["scores"][:n])


def test_dual_head_checkpoint_deploys_both_ways(trained_o2o):
    """One dual-head checkpoint, two deploy modes: replace(cfg,
    o2o=False) serves the classic NMS path from the SAME params (the
    o2o branches aren't even computed) — the A/B contract."""
    params, batch = trained_o2o
    from xrseg_tpu.compile import build_pipeline, unpack_slate
    from xrseg_tpu.io.weights import params_match_config
    nms_cfg = dataclasses.replace(CFG, o2o=False)
    assert params_match_config(params, nms_cfg)   # no surgery needed
    e = ExecutorConfig(model=nms_cfg)
    e = dataclasses.replace(
        e, post=dataclasses.replace(e.post, score_threshold=0.005))
    pipe = build_pipeline(e, params, batch=1)
    frame = (np.asarray(batch["images"][0]) * 255).astype(np.uint8)
    det = unpack_slate(np.asarray(pipe(frame[None])["slate"])[0], 50)
    assert int(det["count"]) >= 1


def test_o2o_rides_the_sharded_server_builder(trained_o2o):
    """decode_task_outputs carries o2o through parallel/batch.py too."""
    params, batch = trained_o2o
    from xrseg_tpu.parallel.batch import build_serving_pipeline
    from xrseg_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    n = mesh.shape["data"]
    pipe = build_serving_pipeline(_low_gate_cfg(), params,
                                  mesh, batch=n)
    frame = (np.asarray(batch["images"][0]) * 255).astype(np.uint8)
    out = pipe(np.broadcast_to(frame, (n,) + frame.shape))
    counts = np.asarray(out["count"])
    assert counts.shape == (n,) and (counts >= 1).all()