"""Multi-host (DCN-style) execution: two real OS processes, each with two
virtual CPU devices, run the SAME sharded pipeline over one 4-device
global mesh (jax.distributed single-controller-per-process model) and
must reproduce this process's single-controller reference slate exactly
(detection-guaranteeing fixture weights -> nonzero counts + stable
ordering). This is the in-tree stand-in for spanning TPU hosts; see
parallel/multihost.py."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_dp_matches_single_controller(tmp_path):
    import jax

    from xrseg_tpu.compile import build_pipeline
    from xrseg_tpu.config import (ExecutorConfig, ModelConfig,
                                  PostprocessConfig)
    from xrseg_tpu.testing import detection_params

    # reference: unsharded single-controller run (this pytest process)
    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(pre_nms_topk=0, max_detections=10))
    params = detection_params(jax.random.key(0), cfg.model)
    frames = np.random.default_rng(0).integers(
        0, 255, (4, 64, 64, 3)).astype(np.uint8)
    ref = build_pipeline(cfg, params, frame_hw=(64, 64),
                         batch=4)(frames)
    assert int(np.asarray(ref["count"]).min()) > 0

    # reference train step (single controller, no mesh) on the same batch
    from xrseg_tpu.train import train_step as ts
    opt = ts.make_optimizer()
    state = ts.init_train_state(jax.random.key(0), cfg.model, opt)
    step = ts.make_train_step(cfg.model, opt, use_remat=False)
    rng = np.random.default_rng(1)
    gb = {
        "images": rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32),
        "boxes_xywh": rng.uniform(8, 56, (4, 4, 4)).astype(np.float32),
        "labels": rng.integers(0, 80, (4, 4)).astype(np.int32),
        "masks": (rng.uniform(0, 1, (4, 4, 16, 16)) > 0.5
                  ).astype(np.float32),
    }
    _, metrics = step(state, gb)

    ref_path = str(tmp_path / "ref.npz")
    np.savez(ref_path, slate=np.asarray(ref["slate"]),
             train_loss=np.asarray(metrics["loss"]),
             train_grad_norm=np.asarray(metrics["grad_norm"]))

    # two worker processes against a fresh coordinator
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), ref_path],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-2000:]
        assert "MULTIHOST_TRAIN_OK" in out, out[-2000:]
