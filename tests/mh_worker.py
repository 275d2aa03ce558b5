"""Multi-host test worker: one of N processes running the SAME sharded
pipeline over a global mesh (tests/test_multihost.py spawns two of these
and a reference; see parallel/multihost.py).

argv: process_id num_processes port ref_npz_path
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    pid, nproc, port, ref_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np

    from xrseg_tpu.config import (ExecutorConfig, ModelConfig,
                                  PostprocessConfig)
    from xrseg_tpu.parallel import multihost as mh
    from xrseg_tpu.parallel.batch import build_sharded_pipeline
    from xrseg_tpu.testing import detection_params

    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(pre_nms_topk=0, max_detections=10))
    params = detection_params(jax.random.key(0), cfg.model)
    mesh = mh.global_mesh()                       # (2*nproc, 1)

    GB = 2 * nproc                                # one image per device
    fn, gparams = build_sharded_pipeline(cfg, params, mesh, batch=GB,
                                         frame_hw=(64, 64))
    frames = np.random.default_rng(0).integers(
        0, 255, (GB, 64, 64, 3)).astype(np.uint8)   # same on every host
    local = frames[pid * 2:(pid + 1) * 2]           # this host's rows
    garr = mh.shard_host_batch(local, mesh, global_batch=GB)
    det = fn(gparams, garr)
    slate = mh.gather_to_hosts(det["slate"])

    ref_npz = np.load(ref_path)
    ref = ref_npz["slate"]
    assert slate.shape == ref.shape, (slate.shape, ref.shape)
    np.testing.assert_array_equal(
        slate[:, -1], ref[:, -1])                  # counts
    if os.environ.get("MH_DEBUG"):
        d = np.abs(slate - ref)
        print(f"[{pid}] maxdiff {d.max()} at {np.unravel_index(d.argmax(), d.shape)}", flush=True)
        print(f"[{pid}] row0 slate {slate[0][:12]}", flush=True)
        print(f"[{pid}] row0 ref   {ref[0][:12]}", flush=True)
    np.testing.assert_allclose(slate, ref, atol=1e-4)
    print(f"[{pid}] MULTIHOST_OK count={slate[:, -1]}", flush=True)

    # ---- multi-host TRAINING step: batch sharded across hosts, params
    # replicated, gradients all-reduced by XLA across processes ----
    from xrseg_tpu.train import train_step as ts
    opt = ts.make_optimizer()
    state = ts.init_train_state(jax.random.key(0), cfg.model, opt)
    state = ts.shard_train_state(state, mesh)
    step = ts.make_train_step(cfg.model, opt, mesh=mesh, use_remat=False)
    rng = np.random.default_rng(1)
    gb = {
        "images": rng.uniform(0, 1, (GB, 64, 64, 3)).astype(np.float32),
        "boxes_xywh": rng.uniform(8, 56, (GB, 4, 4)).astype(np.float32),
        "labels": rng.integers(0, 80, (GB, 4)).astype(np.int32),
        "masks": (rng.uniform(0, 1, (GB, 4, 16, 16)) > 0.5
                  ).astype(np.float32),
    }
    local_b = {k: v[pid * 2:(pid + 1) * 2] for k, v in gb.items()}
    gbatch = mh.shard_host_batch(local_b, mesh, global_batch=GB)
    state, metrics = step(state, gbatch)
    loss = float(np.asarray(metrics["loss"]))     # replicated output
    gn = float(np.asarray(metrics["grad_norm"]))
    ref_loss = float(ref_npz["train_loss"])
    ref_gn = float(ref_npz["train_grad_norm"])
    assert abs(loss - ref_loss) < 1e-3, (loss, ref_loss)
    assert abs(gn - ref_gn) < 1e-3, (gn, ref_gn)
    print(f"[{pid}] MULTIHOST_TRAIN_OK loss={loss:.4f} "
          f"grad_norm={gn:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
