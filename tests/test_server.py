"""HTTP inference server tests (stdlib urllib client, ephemeral port)."""
import os
import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from xrseg_tpu.config import ExecutorConfig, ModelConfig, PostprocessConfig


@pytest.fixture(scope="module")
def server():
    from xrseg_tpu.runtime.server import InferenceServer
    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(score_threshold=0.05, max_detections=10))
    srv = InferenceServer(cfg, port=0).start()   # port 0 -> ephemeral
    yield srv
    srv.close()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.port}{path}"


def _post(srv, data: bytes):
    req = urllib.request.Request(_url(srv, "/infer"), data=data,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] is True
    assert h["frame_hw"] == [64, 64]


def test_infer_npy_and_png(server):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)

    buf = io.BytesIO()
    np.save(buf, img)
    out = _post(server, buf.getvalue())
    assert "detections" in out and "latency_ms" in out
    assert out["count"] == len(out["detections"])
    for d in out["detections"]:
        assert set(d) == {"label", "class_name", "score", "box_xywh"}
        assert len(d["box_xywh"]) == 4

    from PIL import Image
    pbuf = io.BytesIO()
    # odd size: the server resizes to its frame geometry
    Image.fromarray(img).resize((48, 80)).save(pbuf, format="PNG")
    out2 = _post(server, pbuf.getvalue())
    assert "detections" in out2


def test_infer_bad_payload_is_400(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, b"this is not an image")
    assert ei.value.code == 400
    body = json.loads(ei.value.read())
    assert "error" in body


def test_stats_counts_requests(server):
    with urllib.request.urlopen(_url(server, "/stats"), timeout=30) as r:
        s = json.loads(r.read())
    assert s["requests"] >= 2
    assert s["errors"] >= 1
    assert "infer" in s["stages"]


# ---------------------------------------------------------------------------
# dynamic micro-batching
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mb_server():
    from xrseg_tpu.runtime.server import InferenceServer
    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(score_threshold=0.05, max_detections=10))
    srv = InferenceServer(cfg, port=0, micro_batch=4,
                          batch_window_ms=150.0).start()
    yield srv
    srv.close()


def _npy(img):
    buf = io.BytesIO()
    np.save(buf, img)
    return buf.getvalue()


def test_micro_batch_concurrent_requests_match_sequential(mb_server):
    """Concurrent requests coalesce into one device batch; every request
    must get ITS OWN result (ordering + padding discard), identical to
    what it gets when sent alone."""
    import threading

    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            for _ in range(3)]
    # sequential reference (each a batch of 1 through the same path)
    ref = [_post(mb_server, _npy(im)) for im in imgs]

    results = [None] * len(imgs)

    def worker(i):
        results[i] = _post(mb_server, _npy(imgs[i]))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, (r, g) in enumerate(zip(results, ref)):
        assert r is not None, f"request {i} got no reply"
        assert r["count"] == g["count"], (i, r, g)
        assert r["detections"] == g["detections"], i

    # the batch histogram must show at least one multi-request batch
    with urllib.request.urlopen(_url(mb_server, "/stats"), timeout=30) as rr:
        st = json.loads(rr.read())
    assert st["micro_batch"] == 4
    assert any(int(k) > 1 for k in st["batch_hist"]), st["batch_hist"]


# ---------------------------------------------------------------------------
# mask serving (COCO RLE)
# ---------------------------------------------------------------------------

def test_rle_roundtrip():
    from xrseg_tpu.runtime.server import rle_decode, rle_encode

    rng = np.random.default_rng(0)
    for _ in range(5):
        m = rng.uniform(0, 1, (13, 9)) > 0.5
        np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)
    # all-zero and all-one edge cases
    for m in (np.zeros((4, 4), bool), np.ones((4, 4), bool)):
        np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)


def test_server_serves_masks():
    from xrseg_tpu.runtime.server import InferenceServer, rle_decode
    import jax

    from xrseg_tpu.testing import detection_params
    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(score_threshold=1e-6, max_detections=5))
    srv = InferenceServer(cfg, port=0, serve_masks=True,
                          params=detection_params(jax.random.key(3),
                                                  cfg.model)).start()
    try:
        img = np.random.default_rng(3).integers(
            0, 255, (64, 64, 3), dtype=np.uint8)
        buf = io.BytesIO()
        np.save(buf, img)
        out = _post(srv, buf.getvalue())
        assert out["count"] > 0, "fixture weights must always detect"
        for d in out["detections"]:
            assert "mask_rle" in d
            m = rle_decode(d["mask_rle"])
            assert m.shape == (16, 16)     # proto resolution = input/4
    finally:
        srv.close()


# ---------------------------------------------------------------------------
# /metrics + /reload (hot swap)
# ---------------------------------------------------------------------------

def test_metrics_endpoint(server):
    with urllib.request.urlopen(_url(server, "/metrics"), timeout=30) as r:
        assert "text/plain" in r.headers["Content-Type"]
        text = r.read().decode()
    assert "xrseg_requests_total" in text
    assert "xrseg_uptime_seconds" in text


def test_reload_hot_swaps_weights(server, tmp_path):
    import jax

    from xrseg_tpu.io.weights import save_npz
    from xrseg_tpu.models import yolo11

    # new weights: a different-seed init of the SAME model
    cfg = server.cfg.model
    new = yolo11.init_params(jax.random.key(123), cfg)
    path = str(tmp_path / "new.npz")
    save_npz(path, jax.device_get(new))
    old_leaf = np.asarray(server.pipeline.params["b0"]["w"])

    req = urllib.request.Request(
        _url(server, "/reload"),
        data=json.dumps({"path": path}).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert out["ok"] is True and out["n_params"] > 0
    got_leaf = np.asarray(server.pipeline.params["b0"]["w"])
    assert not np.array_equal(old_leaf, got_leaf)

    # inference still works on the swapped weights (no recompile needed)
    img = np.zeros((64, 64, 3), np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    assert "detections" in _post(server, buf.getvalue())

    # mismatched weights are rejected with 400
    from xrseg_tpu.config import ModelConfig
    wrong = yolo11.init_params(jax.random.key(0),
                               ModelConfig(scale="n", input_size=(64, 64),
                                           num_classes=3))
    wrong_path = str(tmp_path / "wrong.npz")
    save_npz(wrong_path, jax.device_get(wrong))
    req = urllib.request.Request(
        _url(server, "/reload"),
        data=json.dumps({"path": wrong_path}).encode(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=120)
    assert ei.value.code == 400


def test_loadtest_tool_smoke(mb_server):
    """tools/loadtest.py run_load drives concurrent clients end-to-end
    against the micro-batched server fixture."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "loadtest", os.path.join(os.path.dirname(__file__), "..",
                                 "tools", "loadtest.py"))
    lt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lt)
    out = lt.run_load(f"http://127.0.0.1:{mb_server.port}", clients=3,
                      per_client=2, frame_hw=(64, 64))
    assert out["requests"] == 6 and out["errors"] == 0
    assert out["fps"] > 0 and out["p50_ms"] > 0


# ---------------------------------------------------------------------------
# multi-chip serving (--mesh): sharded pipeline behind the same HTTP surface
# ---------------------------------------------------------------------------

def _tiny_seg_cfg():
    return ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(score_threshold=0.05, max_detections=10))


def test_mesh_server_matches_single_chip():
    """data=2 sharded serving returns the same detections as the
    single-pipeline server on identical weights (8-virtual-device CPU
    mesh from conftest)."""
    import jax

    from xrseg_tpu.runtime.server import InferenceServer
    from xrseg_tpu.testing import detection_params

    cfg = _tiny_seg_cfg()
    params = detection_params(jax.random.key(7), cfg.model)
    img = np.random.default_rng(4).integers(0, 255, (64, 64, 3),
                                            dtype=np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    payload = buf.getvalue()

    single = InferenceServer(cfg, params=params, port=0).start()
    try:
        ref = _post(single, payload)
    finally:
        single.close()

    meshed = InferenceServer(cfg, params=params, port=0,
                             mesh_shape={"data": 2}).start()
    try:
        with urllib.request.urlopen(_url(meshed, "/healthz"),
                                    timeout=30) as r:
            h = json.loads(r.read())
        assert h["mesh"] == {"data": 2, "model": 1}
        out = _post(meshed, payload)
    finally:
        meshed.close()

    assert out["count"] == ref["count"] > 0
    for a, b in zip(out["detections"], ref["detections"]):
        assert a["label"] == b["label"]
        np.testing.assert_allclose(a["box_xywh"], b["box_xywh"], atol=0.1)
        assert abs(a["score"] - b["score"]) < 1e-3


def test_mesh_server_micro_batch_concurrent():
    """mesh + micro-batching: concurrent requests coalesce into the
    sharded batch axis (buckets stay data-axis divisible) and every
    client gets its own correct result back."""
    import concurrent.futures

    import jax

    from xrseg_tpu.runtime.server import InferenceServer
    from xrseg_tpu.testing import detection_params

    cfg = _tiny_seg_cfg()
    params = detection_params(jax.random.key(7), cfg.model)
    srv = InferenceServer(cfg, params=params, port=0,
                          mesh_shape={"data": 2}, micro_batch=4,
                          batch_window_ms=30.0).start()
    try:
        rng = np.random.default_rng(5)
        payloads = []
        for _ in range(8):
            buf = io.BytesIO()
            np.save(buf, rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
            payloads.append(buf.getvalue())
        # sequential references first (each still batched to the mesh)
        refs = [_post(srv, p) for p in payloads]
        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            outs = list(ex.map(lambda p: _post(srv, p), payloads))
        for o, r in zip(outs, refs):
            assert o["count"] == r["count"]
            for a, b in zip(o["detections"], r["detections"]):
                assert a["label"] == b["label"]
                np.testing.assert_allclose(a["box_xywh"], b["box_xywh"],
                                           atol=0.1)
        with urllib.request.urlopen(_url(srv, "/stats"), timeout=30) as rr:
            st = json.loads(rr.read())
        assert any(int(k) > 1 for k in st["batch_hist"]), st["batch_hist"]
    finally:
        srv.close()


def test_server_serves_display_res_masks():
    """mask_res='display': RLE masks come back at the frame geometry,
    upsampled inside the device program (no host-side resampling)."""
    import jax

    from xrseg_tpu.runtime.server import InferenceServer, rle_decode
    from xrseg_tpu.testing import detection_params

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(score_threshold=1e-6, max_detections=5))
    srv = InferenceServer(cfg, port=0, serve_masks=True,
                          mask_res="display",
                          params=detection_params(jax.random.key(3),
                                                  cfg.model)).start()
    try:
        img = np.random.default_rng(3).integers(
            0, 255, (64, 64, 3), dtype=np.uint8)
        buf = io.BytesIO()
        np.save(buf, img)
        out = _post(srv, buf.getvalue())
        assert out["count"] > 0
        for d in out["detections"]:
            m = rle_decode(d["mask_rle"])
            assert m.shape == (64, 64)       # frame res, not proto 16x16
    finally:
        srv.close()
    with pytest.raises(ValueError):
        InferenceServer(cfg, port=0, serve_masks=True, mask_res="bogus")


def test_mesh_server_serves_masks_and_reload(tmp_path):
    """mesh serving composes with mask serving and /reload (re-sharded
    hot swap): proto-res RLE masks on a data=2 mesh, then a weight swap
    changes the served params without recompile."""
    import jax

    from xrseg_tpu.io.weights import save_npz
    from xrseg_tpu.models import yolo11
    from xrseg_tpu.runtime.server import InferenceServer, rle_decode
    from xrseg_tpu.testing import detection_params

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(score_threshold=1e-6, max_detections=5))
    params = detection_params(jax.random.key(3), cfg.model)
    srv = InferenceServer(cfg, params=params, port=0, serve_masks=True,
                          mask_res="display",
                          mesh_shape={"data": 2}).start()
    try:
        img = np.random.default_rng(3).integers(
            0, 255, (64, 64, 3), dtype=np.uint8)
        buf = io.BytesIO()
        np.save(buf, img)
        out = _post(srv, buf.getvalue())
        assert out["count"] > 0
        # display-res masks now compose with --mesh (device-side bilinear
        # upsample inside the sharded program)
        assert rle_decode(out["detections"][0]["mask_rle"]).shape == (64, 64)

        # hot swap on the mesh: params re-shard, inference keeps working
        new = yolo11.init_params(jax.random.key(99), cfg.model)
        path = str(tmp_path / "new.npz")
        save_npz(path, jax.device_get(new))
        req = urllib.request.Request(
            _url(srv, "/reload"),
            data=json.dumps({"path": path}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert json.loads(r.read())["ok"] is True
        out2 = _post(srv, buf.getvalue())        # random init: may be 0
        assert "count" in out2
    finally:
        srv.close()


def test_request_size_cap_413(server):
    """Oversized uploads are rejected with 413 before buffering (the
    Content-Length is checked against max_request_mb)."""
    big = server.max_request_bytes + 1
    req = urllib.request.Request(
        _url(server, "/infer"), data=b"x", method="POST",
        headers={"Content-Length": str(big)})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 413


# ---------------------------------------------------------------------------
# task-family serving (pose / obb / classify responses)
# ---------------------------------------------------------------------------

def test_server_serves_pose_keypoints():
    import jax

    from xrseg_tpu.runtime.server import InferenceServer
    from xrseg_tpu.testing import detection_params

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                          task="pose", kpt_shape=(5, 3)),
        post=PostprocessConfig(score_threshold=0.05, max_detections=5))
    srv = InferenceServer(cfg, port=0,
                          params=detection_params(jax.random.key(3),
                                                  cfg.model)).start()
    try:
        out = _post(srv, _npy(np.random.default_rng(0).integers(
            0, 255, (64, 64, 3), dtype=np.uint8)))
        assert out["count"] > 0
        for d in out["detections"]:
            assert len(d["kpts"]) == 5 and len(d["kpts"][0]) == 3
            assert 0.0 <= d["kpts"][0][2] <= 1.0     # visibility
    finally:
        srv.close()


def test_server_serves_obb_rotated_boxes():
    import jax

    from xrseg_tpu.runtime.server import InferenceServer
    from xrseg_tpu.testing import detection_params

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                          task="obb"),
        post=PostprocessConfig(score_threshold=0.05, max_detections=5))
    srv = InferenceServer(cfg, port=0,
                          params=detection_params(jax.random.key(3),
                                                  cfg.model)).start()
    try:
        out = _post(srv, _npy(np.random.default_rng(1).integers(
            0, 255, (64, 64, 3), dtype=np.uint8)))
        assert out["count"] > 0
        for d in out["detections"]:
            assert len(d["box_xywhr"]) == 5
            assert -np.pi / 4 - 1e-6 < d["box_xywhr"][4] < 3 * np.pi / 4 + 1e-6
            assert "box_xywh" not in d
    finally:
        srv.close()


def test_server_serves_classify_probs():
    import jax

    from xrseg_tpu.models import yolo11
    from xrseg_tpu.runtime.server import InferenceServer

    cfg = ExecutorConfig(model=ModelConfig(
        scale="n", input_size=(64, 64), dtype="float32",
        task="classify", num_classes=7))
    srv = InferenceServer(cfg, port=0,
                          params=yolo11.init_params(jax.random.key(0),
                                                    cfg.model),
                          labels=[f"c{i}" for i in range(7)]).start()
    try:
        out = _post(srv, _npy(np.random.default_rng(2).integers(
            0, 255, (64, 64, 3), dtype=np.uint8)))
        assert len(out["probs"]) == 7
        assert abs(sum(out["probs"]) - 1.0) < 1e-3
        assert out["class_name"] == f"c{out['label']}"
    finally:
        srv.close()


def test_mesh_server_serves_pose():
    """--mesh composes with the task family now that the sharded path
    shares build_pipeline's decode tail: pose keypoints over data=2."""
    import jax

    from xrseg_tpu.runtime.server import InferenceServer
    from xrseg_tpu.testing import detection_params

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                          task="pose", kpt_shape=(5, 3)),
        post=PostprocessConfig(score_threshold=0.05, max_detections=5))
    srv = InferenceServer(cfg, port=0,
                          params=detection_params(jax.random.key(3),
                                                  cfg.model),
                          mesh_shape={"data": 2}).start()
    try:
        out = _post(srv, _npy(np.random.default_rng(0).integers(
            0, 255, (64, 64, 3), dtype=np.uint8)))
        assert out["count"] > 0
        for d in out["detections"]:
            assert len(d["kpts"]) == 5 and len(d["kpts"][0]) == 3
    finally:
        srv.close()


# ---------------------------------------------------------------------------
# overload shedding (503 + Retry-After instead of queueing into the timeout)
# ---------------------------------------------------------------------------

def _post_status(srv, data: bytes):
    """POST /infer; return (status, headers, body_json)."""
    req = urllib.request.Request(_url(srv, "/infer"), data=data,
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, dict(r.headers), json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), json.loads(e.read())


def test_overload_sheds_503_and_recovers():
    """Flood a saturated micro-batch server: excess requests must fail
    FAST with 503 + Retry-After (not camp in the queue until the 300 s
    wait), queued ones still complete, and the server serves normally
    once the flood passes."""
    import threading
    import time as _time

    from xrseg_tpu.runtime.server import InferenceServer

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(score_threshold=0.05, max_detections=10))
    srv = InferenceServer(cfg, port=0, micro_batch=2,
                          batch_window_ms=30.0, max_pending=2).start()
    try:
        img = _npy(np.random.default_rng(0).integers(
            0, 255, (64, 64, 3), dtype=np.uint8))
        assert _post_status(srv, img)[0] == 200    # warm the b=1 bucket

        # stall the device: the dispatcher blocks on srv._lock before
        # compiling/running, so the queue (cap 2) fills behind it
        n = 8
        results = [None] * n
        with srv._lock:
            def worker(i):
                t0 = _time.perf_counter()
                st, hdr, body = _post_status(srv, img)
                results[i] = (st, hdr, body, _time.perf_counter() - t0)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(n)]
            for t in threads:
                t.start()
            # shed responses must arrive while the device is still stalled
            deadline = _time.perf_counter() + 60.0
            while (_time.perf_counter() < deadline and
                   sum(r is not None and r[0] == 503
                       for r in results) < n - 3):
                _time.sleep(0.05)
            shed_now = [r for r in results if r is not None and r[0] == 503]
            # cap 2 in queue + up to 2 already collected by the dispatcher
            assert len(shed_now) >= n - 4, [r and r[0] for r in results]
            for st, hdr, body, dt in shed_now:
                assert hdr.get("Retry-After") == "1"
                assert "error" in body
                assert dt < 60.0     # fast-fail, not the 300 s queue wait
        # lock released: the queued requests now run and succeed
        for t in threads:
            t.join(timeout=300)
        done = [r for r in results if r is not None]
        assert len(done) == n
        ok = [r for r in done if r[0] == 200]
        shed = [r for r in done if r[0] == 503]
        assert len(ok) >= 2 and len(shed) >= n - 4, [r[0] for r in done]

        # recovery: a fresh request after the flood serves normally
        st, _, body = _post_status(srv, img)
        assert st == 200 and "detections" in body

        with urllib.request.urlopen(_url(srv, "/stats"), timeout=30) as rr:
            stats = json.loads(rr.read())
        assert stats["shed"] == len(shed)
        assert stats["max_pending"] == 2
        assert stats["queue_depth"] == 0
    finally:
        srv.close()


def test_overload_sheds_unbatched_path():
    """micro_batch=1 path: threads stacked behind the device lock are
    bounded by max_pending too."""
    import threading

    from xrseg_tpu.runtime.server import InferenceServer

    cfg = ExecutorConfig(
        model=ModelConfig(scale="n", input_size=(64, 64), dtype="float32"),
        post=PostprocessConfig(score_threshold=0.05, max_detections=10))
    srv = InferenceServer(cfg, port=0, max_pending=1).start()
    try:
        img = _npy(np.random.default_rng(0).integers(
            0, 255, (64, 64, 3), dtype=np.uint8))
        assert _post_status(srv, img)[0] == 200    # compile + warm

        n = 4
        results = [None] * n
        with srv._lock:     # stall the device
            def worker(i):
                results[i] = _post_status(srv, img)
            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(n)]
            for t in threads:
                t.start()
            import time as _time
            deadline = _time.perf_counter() + 60.0
            while (_time.perf_counter() < deadline and
                   sum(r is not None and r[0] == 503
                       for r in results) < n - 1):
                _time.sleep(0.05)
            assert sum(r is not None and r[0] == 503
                       for r in results) >= n - 1
        for t in threads:
            t.join(timeout=120)
        codes = sorted(r[0] for r in results)
        assert codes.count(200) == 1 and codes.count(503) == n - 1, codes
    finally:
        srv.close()
