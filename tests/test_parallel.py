"""Sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrseg_tpu.config import ExecutorConfig, ModelConfig, PostprocessConfig
from xrseg_tpu.models import yolo11
from xrseg_tpu.parallel import batch as pbatch
from xrseg_tpu.parallel import mesh as mesh_lib


def _cfg():
    return ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(pre_nms_topk=64, max_detections=10))


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    m = mesh_lib.make_mesh()
    assert dict(m.shape) == {"data": 8, "model": 1}
    m2 = mesh_lib.make_mesh((4, 2))
    assert dict(m2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh((3, 2))


def test_dp_inference_matches_single_device():
    cfg = _cfg()
    params = yolo11.init_params(jax.random.key(0), cfg.model)
    mesh = mesh_lib.make_mesh((8, 1))
    fn, sparams = pbatch.build_sharded_pipeline(cfg, params, mesh, batch=8,
                                                frame_hw=(64, 64))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3)), jnp.uint8)
    det = jax.block_until_ready(fn(sparams, mesh_lib.shard_batch(frames, mesh)))

    # single-device reference via the unsharded pipeline
    from xrseg_tpu.compile import build_pipeline
    pipe = build_pipeline(cfg, params, frame_hw=(64, 64), batch=8)
    ref = pipe(frames)
    np.testing.assert_allclose(np.asarray(det["boxes_xywh"]),
                               np.asarray(ref["boxes_xywh"]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(det["count"]),
                                  np.asarray(ref["count"]))


def test_tp_param_sharding_applies():
    cfg = _cfg()
    params = yolo11.init_params(jax.random.key(0), cfg.model)
    mesh = mesh_lib.make_mesh((4, 2))
    sp = mesh_lib.shard_params(params, mesh, tp_min_channels=64)
    # find a wide conv: b10 cv1 has >=64 out channels at n-scale? c1024=256
    w = sp["b7"]["w"]
    assert w.shape[-1] >= 64
    spec = w.sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, None, None, "model")
    # small biases replicated
    assert sp["b0"]["b"].sharding.spec == jax.sharding.PartitionSpec()


def test_tp_inference_matches_dp():
    cfg = _cfg()
    params = yolo11.init_params(jax.random.key(1), cfg.model)
    mesh = mesh_lib.make_mesh((4, 2))
    fn, sparams = pbatch.build_sharded_pipeline(
        cfg, params, mesh, batch=4, frame_hw=(64, 64), tp_min_channels=64)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.integers(0, 255, (4, 64, 64, 3)), jnp.uint8)
    det = jax.block_until_ready(fn(sparams, frames))

    from xrseg_tpu.compile import build_pipeline
    ref = build_pipeline(cfg, params, frame_hw=(64, 64), batch=4)(frames)
    np.testing.assert_allclose(np.asarray(det["scores"]),
                               np.asarray(ref["scores"]), atol=1e-4)


def test_batch_divisibility_check():
    cfg = _cfg()
    params = yolo11.init_params(jax.random.key(0), cfg.model)
    mesh = mesh_lib.make_mesh((8, 1))
    with pytest.raises(ValueError):
        pbatch.build_sharded_pipeline(cfg, params, mesh, batch=5,
                                      frame_hw=(64, 64))


def test_multistream_runner():
    cfg = _cfg()
    params = yolo11.init_params(jax.random.key(0), cfg.model)
    mesh = mesh_lib.make_mesh((2, 1), devices=jax.devices()[:2])
    runner = pbatch.MultiStreamRunner(cfg, params, mesh, n_streams=2,
                                      frame_hw=(64, 64))
    frames = np.zeros((2, 64, 64, 3), np.uint8)
    det = runner(frames)
    assert det["count"].shape == (2,)


def test_spatial_partitioning_matches_single_device():
    """SP: H-axis sharded inference must match single-device numerics."""
    from xrseg_tpu.parallel.spatial import build_spatial_pipeline
    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(256, 256), dtype="float32"),
        post=PostprocessConfig(pre_nms_topk=64, max_detections=10))
    params = yolo11.init_params(jax.random.key(2), cfg.model)
    mesh = mesh_lib.make_mesh((4, 1), devices=jax.devices()[:4])
    fn, rp = build_spatial_pipeline(cfg, params, mesh, batch=1,
                                    frame_hw=(256, 256))
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 255, (1, 256, 256, 3)), jnp.uint8)
    det = jax.block_until_ready(fn(rp, frames))

    from xrseg_tpu.compile import build_pipeline
    ref = build_pipeline(cfg, params, frame_hw=(256, 256), batch=1)(frames)
    np.testing.assert_allclose(np.asarray(det["scores"]),
                               np.asarray(ref["scores"]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(det["count"]),
                                  np.asarray(ref["count"]))


def test_pipeline_parallel_matches_single_device():
    """PP: 2-stage split across devices matches single-device numerics."""
    from xrseg_tpu.parallel.pipeline import PipelinedRunner
    cfg = _cfg()
    params = yolo11.init_params(jax.random.key(4), cfg.model)
    runner = PipelinedRunner(cfg, params, devices=jax.devices()[:2],
                             frame_hw=(64, 64), batch=2).warmup()
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3)), jnp.uint8)
    det = jax.block_until_ready(runner(frames))

    from xrseg_tpu.compile import build_pipeline
    ref = build_pipeline(cfg, params, frame_hw=(64, 64), batch=2)(frames)
    np.testing.assert_allclose(np.asarray(det["scores"]),
                               np.asarray(ref["scores"]), atol=1e-4)

    # streaming mode returns one result per input batch, in order, even
    # with more frames than the in-flight bound (host never syncs on the
    # current frame)
    stream = [frames] * 5
    outs = runner.run_stream(iter(stream), max_inflight=2)
    assert len(outs) == 5
    for o in outs:
        np.testing.assert_allclose(np.asarray(o["scores"]),
                                   np.asarray(ref["scores"]), atol=1e-4)


def test_pipeline_parallel_needs_two_devices():
    from xrseg_tpu.parallel.pipeline import PipelinedRunner
    cfg = _cfg()
    params = yolo11.init_params(jax.random.key(0), cfg.model)
    with pytest.raises(ValueError):
        PipelinedRunner(cfg, params, devices=jax.devices()[:1])


def test_sharded_pipeline_speaks_task_family():
    """The sharded serving path shares build_pipeline's decode tail, so
    obb (rotated NMS) and classify — formerly guarded off — now serve
    over the mesh with exact DP parity vs the unsharded pipeline."""
    import jax

    from xrseg_tpu.compile import build_pipeline
    from xrseg_tpu.testing import detection_params

    mesh = mesh_lib.make_mesh((8, 1))
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3)), jnp.uint8)

    # obb: rotated 5-wide boxes, probIoU NMS
    ocfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                          task="obb"),
        post=PostprocessConfig(score_threshold=0.05, max_detections=5))
    oparams = detection_params(jax.random.key(3), ocfg.model)
    fn, sp = pbatch.build_sharded_pipeline(ocfg, oparams, mesh, batch=8,
                                           frame_hw=(64, 64))
    det = jax.block_until_ready(fn(sp, mesh_lib.shard_batch(frames, mesh)))
    ref = build_pipeline(ocfg, oparams, frame_hw=(64, 64), batch=8)(frames)
    assert int(np.asarray(det["count"]).min()) > 0
    np.testing.assert_array_equal(np.asarray(det["count"]),
                                  np.asarray(ref["count"]))
    np.testing.assert_allclose(np.asarray(det["boxes_xywhr"]),
                               np.asarray(ref["boxes_xywhr"]), atol=1e-4)

    # classify: the slate IS the prob row
    ccfg = ExecutorConfig(model=ModelConfig(
        scale="n", input_size=(64, 64), dtype="float32",
        task="classify", num_classes=7))
    from xrseg_tpu.models import yolo11 as y11
    cparams = y11.init_params(jax.random.key(0), ccfg.model)
    cfn, csp = pbatch.build_sharded_pipeline(ccfg, cparams, mesh, batch=8,
                                             frame_hw=(64, 64))
    cdet = jax.block_until_ready(cfn(csp, mesh_lib.shard_batch(frames, mesh)))
    cref = build_pipeline(ccfg, cparams, frame_hw=(64, 64), batch=8)(frames)
    np.testing.assert_allclose(np.asarray(cdet["probs"]),
                               np.asarray(cref["probs"]), atol=1e-5)


def test_pp_and_sp_speak_tasks():
    """PP and SP share the decode tail too: pose keypoints survive the
    2-stage split and the H-sharded program, matching unsharded."""
    import jax

    from xrseg_tpu.compile import build_pipeline
    from xrseg_tpu.parallel.pipeline import PipelinedRunner
    from xrseg_tpu.parallel.spatial import build_spatial_pipeline
    from xrseg_tpu.testing import detection_params

    pcfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                          task="pose", kpt_shape=(5, 3)),
        post=PostprocessConfig(score_threshold=0.05, max_detections=5))
    params = detection_params(jax.random.key(3), pcfg.model)
    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3)), jnp.uint8)
    ref = build_pipeline(pcfg, params, frame_hw=(64, 64), batch=2)(frames)

    runner = PipelinedRunner(pcfg, params, devices=jax.devices()[:2],
                             frame_hw=(64, 64), batch=2).warmup()
    det = jax.block_until_ready(runner(frames))
    np.testing.assert_array_equal(np.asarray(det["count"]),
                                  np.asarray(ref["count"]))
    np.testing.assert_allclose(np.asarray(det["kpts"]),
                               np.asarray(ref["kpts"]), atol=1e-4)

    mesh = mesh_lib.make_mesh((2, 4))     # 64 rows = 2 shards x 32
    spfn, spp = build_spatial_pipeline(pcfg, params, mesh, batch=2,
                                       frame_hw=(64, 64))
    spdet = jax.block_until_ready(spfn(spp, frames))
    np.testing.assert_array_equal(np.asarray(spdet["count"]),
                                  np.asarray(ref["count"]))
    np.testing.assert_allclose(np.asarray(spdet["scores"]),
                               np.asarray(ref["scores"]), atol=1e-4)

    # classify through PP is a loud structural error, not a mis-decode
    ccfg = ExecutorConfig(model=ModelConfig(
        scale="n", input_size=(64, 64), dtype="float32", task="classify"))
    with pytest.raises(ValueError, match="classify"):
        PipelinedRunner(ccfg, detection_params(jax.random.key(0), pcfg.model),
                        devices=jax.devices()[:2])
