"""Checkpoint save/load roundtrip + int8 quantization quality."""
import os

import jax
import numpy as np
import pytest

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.io import weights as W
from xrseg_tpu.models import yolo11


@pytest.fixture(scope="module")
def small_params():
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32")
    return cfg, yolo11.init_params(jax.random.key(0), cfg)


def test_npz_roundtrip(tmp_path, small_params):
    cfg, params = small_params
    path = os.path.join(tmp_path, "ckpt.npz")
    W.save_npz(path, params)
    loaded = W.load_npz(path)
    flat_a = W.flatten_params(params)
    flat_b = W.flatten_params(loaded)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])
    # structure preserved: lists still lists, dicts still dicts
    assert isinstance(loaded["det"]["cv2"], list)
    assert isinstance(loaded["det"]["cv2"][0], dict)
    # loaded params must be USABLE (the digit-key/list ambiguity bug):
    from xrseg_tpu.models.yolo11 import forward
    x = np.zeros((1, 64, 64, 3), np.float32)
    out = forward(loaded, x, cfg)
    assert out["preds"].shape[0] == 1


def test_quantize_dequantize_error_small(small_params):
    cfg, params = small_params
    q = W.quantize_int8(params)
    dq = W.dequantize_int8(q)
    wa = W.flatten_params(params)
    wb = W.flatten_params(dq)
    for k in wa:
        if k.endswith("/w") or k.endswith("/up_w"):
            scale = np.abs(wa[k]).max()
            if scale > 0:
                assert np.abs(wa[k] - wb[k]).max() <= scale / 127.0 + 1e-7


def test_quantized_model_output_close(small_params):
    cfg, params = small_params
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out_full = yolo11.forward(params, x, cfg)
    dq = W.dequantize_int8(W.quantize_int8(params))
    out_q = yolo11.forward(dq, x, cfg)
    # scores are bounded [0,1]; int8 weight quantization should stay close
    err = np.abs(np.asarray(out_full["scores"]) - np.asarray(out_q["scores"])).max()
    assert err < 0.1, err


def test_quantized_size_reduction(small_params):
    cfg, params = small_params
    full = W.quantized_size_bytes(params)
    q = W.quantized_size_bytes(W.quantize_int8(params))
    assert q < full * 0.35   # ~4x smaller on conv weights


def test_orbax_roundtrip(tmp_path, small_params):
    cfg, params = small_params
    path = os.path.join(tmp_path, "orbax_ckpt")
    W.save_orbax(path, params)
    loaded = W.load_orbax(path, like=params)
    a, b = W.flatten_params(params), W.flatten_params(loaded)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_orbax_overwrite_same_path(tmp_path, small_params):
    """Periodic trainer checkpoints rewrite one path; the second save must
    not raise (regression: orbax refuses existing destinations without
    force=True — hit by Trainer.fit at its second epoch checkpoint)."""
    import jax

    cfg, params = small_params
    path = os.path.join(tmp_path, "ck")
    W.save_orbax(path, params)
    bumped = jax.tree.map(lambda x: x + 1, params)
    W.save_orbax(path, bumped)
    loaded = W.load_orbax(path, like=params)
    a, b = W.flatten_params(bumped), W.flatten_params(loaded)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


# ---------------------------------------------------------------------------
# transfer learning (head surgery): the "fine-tune the reference's deployed
# 80-class model on MY classes/task" path
# ---------------------------------------------------------------------------

def test_transfer_class_surgery_keeps_pretrained_stack(small_params):
    cfg80, donor = small_params
    cfg3 = ModelConfig(scale="n", input_size=(64, 64), num_classes=3,
                       dtype="float32")
    params, rep = W.transfer_params(donor, cfg3, key=jax.random.key(7))

    # backbone + neck + box branch: bit-identical to the donor
    for grp in ("b0", "b9", "h22"):
        fa = W.flatten_params(donor[grp])
        fb = W.flatten_params(params[grp])
        for k in fa:
            np.testing.assert_array_equal(fa[k], fb[k])
    np.testing.assert_array_equal(donor["det"]["cv2"][1]["conv0"]["w"],
                                  params["det"]["cv2"][1]["conv0"]["w"])
    # nc changes c3 (80 -> 64 at scale n): the donor's hidden cls stack is
    # RESCUED (kept at donor width), only the final 1x1 class conv is fresh
    np.testing.assert_array_equal(donor["det"]["cv3"][0]["pw1"]["w"],
                                  params["det"]["cv3"][0]["pw1"]["w"])
    c3d = donor["det"]["cv3"][0]["pw1"]["w"].shape[-1]
    assert params["det"]["cv3"][0]["out"]["w"].shape == (1, 1, c3d, 3)
    # class-prior bias (log(5/nc/anchors^2)), not donor bias
    assert np.allclose(np.asarray(params["det"]["cv3"][0]["out"]["b"]),
                       np.log(5 / 3 / (640 / 8) ** 2))
    assert all(k.startswith("det/cv3") and "/out/" in k
               for k in rep["reinit"]), rep["reinit"]

    # the grafted model runs end to end at the new class count
    from xrseg_tpu.models.yolo11 import forward
    out = forward(params, np.zeros((1, 64, 64, 3), np.float32), cfg3)
    n_anchors = out["preds"].shape[1]
    assert out["preds"].shape == (1, n_anchors, 4 + 3 + cfg3.num_masks)


def test_transfer_task_switch_segment_to_pose(small_params):
    _, donor = small_params          # segment donor
    pose_cfg = ModelConfig(scale="n", input_size=(64, 64), task="pose",
                           num_classes=1, dtype="float32")
    params, rep = W.transfer_params(donor, pose_cfg)
    assert "pose_cv4" in params and "proto" not in params
    # donor-only branches are reported dropped, new branch reported reinit
    assert any(k.startswith("proto/") for k in rep["dropped"])
    assert any(k.startswith("seg_cv4/") for k in rep["dropped"])
    assert any(k.startswith("pose_cv4/") for k in rep["reinit"])
    np.testing.assert_array_equal(donor["b4"]["cv1"]["w"],
                                  params["b4"]["cv1"]["w"])


def test_params_match_config(small_params):
    cfg80, donor = small_params
    assert W.params_match_config(donor, cfg80)
    assert not W.params_match_config(
        donor, ModelConfig(scale="n", input_size=(64, 64), num_classes=3,
                           dtype="float32"))
    assert not W.params_match_config(
        donor, ModelConfig(scale="n", input_size=(64, 64), task="pose",
                           num_classes=80, dtype="float32"))
    # detect target: a segment donor has extra branches -> needs surgery
    det_cfg = ModelConfig(scale="n", input_size=(64, 64), task="detect",
                          dtype="float32")
    assert not W.params_match_config(donor, det_cfg)
    det_params, rep = W.transfer_params(donor, det_cfg)
    assert W.params_match_config(det_params, det_cfg)
    # same-class detect graft: the WHOLE det head transfers bit-exact
    assert rep["reinit"] == []
    np.testing.assert_array_equal(donor["det"]["cv3"][2]["out"]["w"],
                                  det_params["det"]["cv3"][2]["out"]["w"])
