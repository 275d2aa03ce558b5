"""Ultralytics .pt state-dict importer (io/torch_pt.py).

Strategy: our fused param pytree is INVERTED into an ultralytics-style
un-fused state dict (random BN stats per conv, conv.weight divided out),
saved with torch.save, and re-imported — the loader's name mapping,
layout transposes, and BN fusing must reconstruct the original tree.
The fuse arithmetic itself is pinned against the independent torch
oracle (torch.nn.utils.fusion.fuse_conv_bn_weights), so the round trip
is not self-referential.
"""
import dataclasses

import numpy as np
import pytest
import torch

import jax

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.io import torch_pt
from xrseg_tpu.models import yolo11

EPS = torch_pt.ULTRALYTICS_BN_EPS


# ---------------------------------------------------------------------------
# state-dict synthesis (the inverse of the importer)
# ---------------------------------------------------------------------------

def _node_at(params, path):
    node = params
    for k in path:
        node = node[k]
    return node


def make_state_dict(params, cfg, rng, fused=False):
    """Invert our fused param tree into an ultralytics-style state dict."""
    sd = {}
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a, np.float32))
    for path, ul, kind in torch_pt.ultralytics_slots(cfg):
        if kind == "conv":
            n = _node_at(params, path)
            w = np.transpose(np.asarray(n["w"], np.float32), (3, 2, 0, 1))
            b = np.asarray(n["b"], np.float32)
            if fused:
                sd[f"{ul}.conv.weight"] = t(w)
                sd[f"{ul}.conv.bias"] = t(b)
                continue
            O = w.shape[0]
            gamma = rng.uniform(0.5, 1.5, O).astype(np.float32)
            var = rng.uniform(0.25, 1.0, O).astype(np.float32)
            mean = rng.normal(0.0, 0.5, O).astype(np.float32)
            scale = gamma / np.sqrt(var + EPS)
            sd[f"{ul}.conv.weight"] = t(w / scale[:, None, None, None])
            sd[f"{ul}.bn.weight"] = t(gamma)
            sd[f"{ul}.bn.bias"] = t(b + mean * scale)
            sd[f"{ul}.bn.running_mean"] = t(mean)
            sd[f"{ul}.bn.running_var"] = t(var)
            sd[f"{ul}.bn.num_batches_tracked"] = torch.tensor(100)
        elif kind == "plain":
            n = _node_at(params, path)
            sd[f"{ul}.weight"] = t(np.transpose(
                np.asarray(n["w"], np.float32), (3, 2, 0, 1)))
            sd[f"{ul}.bias"] = t(np.asarray(n["b"], np.float32))
        elif kind == "convt":
            n = _node_at(params, path)
            sd[f"{ul}.weight"] = t(np.transpose(
                np.asarray(n["up_w"], np.float32), (2, 3, 0, 1)))
            sd[f"{ul}.bias"] = t(np.asarray(n["up_b"], np.float32))
        elif kind == "linear":
            n = _node_at(params, path)
            sd[f"{ul}.weight"] = t(np.asarray(n["lin_w"], np.float32).T)
            sd[f"{ul}.bias"] = t(np.asarray(n["lin_b"], np.float32))
        elif kind == "dfl":
            sd[f"{ul}.weight"] = t(
                np.arange(cfg.reg_max, dtype=np.float32
                          ).reshape(1, -1, 1, 1))
    return sd


def _assert_trees_close(got, want, rtol=3e-5, atol=3e-5):
    leaves_g, treedef_g = jax.tree.flatten(got)
    leaves_w, treedef_w = jax.tree.flatten(want)
    assert treedef_g == treedef_w
    for lg, lw in zip(leaves_g, leaves_w):
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lw),
                                   rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# fuse arithmetic vs the torch oracle
# ---------------------------------------------------------------------------

def test_fuse_matches_torch_oracle():
    from torch.nn.utils.fusion import fuse_conv_bn_weights
    rng = np.random.default_rng(0)
    for O, I, k in [(8, 4, 3), (16, 1, 3), (32, 16, 1)]:
        w = rng.normal(0, 1, (O, I, k, k)).astype(np.float32)
        gamma = rng.uniform(0.2, 2.0, O).astype(np.float32)
        beta = rng.normal(0, 1, O).astype(np.float32)
        mean = rng.normal(0, 1, O).astype(np.float32)
        var = rng.uniform(0.1, 2.0, O).astype(np.float32)
        wf, bf = torch_pt.fuse_conv_bn(w, gamma, beta, mean, var, EPS)
        ow, ob = fuse_conv_bn_weights(
            torch.from_numpy(w), None, torch.from_numpy(mean),
            torch.from_numpy(var), EPS, torch.from_numpy(gamma),
            torch.from_numpy(beta))
        np.testing.assert_allclose(wf, ow.detach().numpy(), rtol=1e-6,
                                   atol=1e-6)
        np.testing.assert_allclose(bf, ob.detach().numpy(), rtol=1e-6,
                                   atol=1e-6)


# ---------------------------------------------------------------------------
# round trips across the family (+ config inference)
# ---------------------------------------------------------------------------

CASES = [
    ("yolo11", "segment"),
    ("yolo11", "pose"),
    ("yolo11", "obb"),
    ("yolo11", "classify"),
    ("yolo11", "detect"),
    ("yolov8", "segment"),
    ("yolov8", "classify"),
]


@pytest.mark.parametrize("arch,task", CASES)
def test_pt_round_trip(arch, task, tmp_path):
    cfg = ModelConfig(arch=arch, scale="n", task=task, num_classes=5,
                      input_size=(64, 64))
    params = yolo11.init_params(jax.random.key(3), cfg)
    rng = np.random.default_rng(7)
    sd = make_state_dict(params, cfg, rng)
    p = str(tmp_path / "sd.pt")
    torch.save(sd, p)

    loaded, inferred = torch_pt.load_yolo11_pt(p)   # cfg inferred
    assert (inferred.arch, inferred.scale, inferred.task,
            inferred.num_classes) == (arch, "n", task, 5)
    if task == "segment":
        assert inferred.num_masks == cfg.num_masks
    if task == "pose":
        assert tuple(inferred.kpt_shape) == tuple(cfg.kpt_shape)
    _assert_trees_close(loaded, params)


@pytest.mark.parametrize("arch,scale", [("yolo11", "l"), ("yolov8", "m")])
def test_pt_round_trip_deep_scales(arch, scale, tmp_path):
    """Deeper scales exercise the scale-dependent name map: yolo11-l
    forces C3k blocks (force_c3k) with 2 repeats; yolov8-m has 2/4/4/2
    C2f repeats — both different module trees than the n-scale cases."""
    cfg = ModelConfig(arch=arch, scale=scale, task="detect",
                      num_classes=4, input_size=(64, 64))
    params = yolo11.init_params(jax.random.key(5), cfg)
    sd = make_state_dict(params, cfg, np.random.default_rng(2))
    p = str(tmp_path / "deep.pt")
    torch.save(sd, p)
    loaded, inferred = torch_pt.load_yolo11_pt(p)
    assert (inferred.arch, inferred.scale) == (arch, scale)
    _assert_trees_close(loaded, params)


def test_pt_fused_checkpoint_form(tmp_path):
    """After ultralytics model.fuse(): conv.bias present, bn.* gone."""
    cfg = ModelConfig(scale="n", task="segment", num_classes=5,
                      input_size=(64, 64))
    params = yolo11.init_params(jax.random.key(1), cfg)
    sd = make_state_dict(params, cfg, np.random.default_rng(0), fused=True)
    p = str(tmp_path / "fused.pt")
    torch.save(sd, p)
    loaded, _ = torch_pt.load_yolo11_pt(p)
    _assert_trees_close(loaded, params, rtol=1e-6, atol=1e-6)


def test_pt_prefix_and_wrapper(tmp_path):
    """'model.' prefixes and {'model': sd} containers are unwrapped."""
    cfg = ModelConfig(scale="n", task="detect", num_classes=3,
                      input_size=(64, 64))
    params = yolo11.init_params(jax.random.key(2), cfg)
    sd = make_state_dict(params, cfg, np.random.default_rng(1))
    wrapped = {"model": {f"model.model.{k}": v for k, v in sd.items()}}
    p = str(tmp_path / "wrapped.pt")
    torch.save(wrapped, p)
    loaded, inferred = torch_pt.load_yolo11_pt(p)
    assert inferred.task == "detect" and inferred.num_classes == 3
    _assert_trees_close(loaded, params)


# ---------------------------------------------------------------------------
# error paths
# ---------------------------------------------------------------------------

def _small_sd(task="detect"):
    cfg = ModelConfig(scale="n", task=task, num_classes=3,
                      input_size=(64, 64))
    params = yolo11.init_params(jax.random.key(0), cfg)
    return make_state_dict(params, cfg, np.random.default_rng(0)), cfg


def test_pt_leftover_key_rejected():
    sd, cfg = _small_sd()
    sd["99.rogue.weight"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        torch_pt.load_from_state_dict(sd, cfg)


def test_pt_missing_key_rejected():
    sd, cfg = _small_sd()
    del sd["0.conv.weight"]
    with pytest.raises(KeyError, match="missing"):
        torch_pt.load_from_state_dict(sd, cfg)


def test_pt_wrong_arch_rejected():
    sd, cfg = _small_sd()
    bad = dataclasses.replace(cfg, arch="yolov8")
    with pytest.raises((KeyError, ValueError)):
        torch_pt.load_from_state_dict(sd, bad)


def test_pt_non_state_dict_rejected(tmp_path):
    p = str(tmp_path / "junk.pt")
    torch.save({"epoch": 3, "notes": "hi"}, p)
    with pytest.raises(ValueError, match="state dict"):
        torch_pt.load_yolo11_pt(p)


def test_load_params_auto_dispatches_pt(tmp_path):
    from xrseg_tpu.io.weights import load_params_auto
    sd, cfg = _small_sd()
    p = str(tmp_path / "auto.pt")
    torch.save(sd, p)
    params, got_cfg = load_params_auto(p)
    assert got_cfg.task == "detect" and got_cfg.num_classes == 3
