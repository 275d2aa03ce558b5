"""Training data pipeline tests: labels, augmentation geometry, collate
contract, loader determinism/sharding, and a train-step integration run."""
import os

import numpy as np
import pytest

from xrseg_tpu.config import ModelConfig
from xrseg_tpu.train import data as D


def _sample(hw=(64, 48), n=2, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, hw + (3,), dtype=np.uint8)
    boxes = np.asarray([[0.3, 0.4, 0.2, 0.3], [0.7, 0.6, 0.1, 0.2]][:n],
                       np.float32)
    labels = np.asarray([1, 2][:n], np.int32)
    polys = [np.asarray([[0.2, 0.25], [0.4, 0.25], [0.4, 0.55], [0.2, 0.55]],
                        np.float32), None][:n]
    return {"image": img, "boxes": boxes, "labels": labels, "polys": polys}


# ---------------------------------------------------------------------------
# label parsing
# ---------------------------------------------------------------------------

def test_parse_yolo_label_file(tmp_path):
    p = tmp_path / "img.txt"
    p.write_text("3 0.5 0.5 0.2 0.4\n"
                 "7 0.1 0.1 0.3 0.1 0.3 0.3 0.1 0.3\n"
                 "\n"
                 "9 0.5 0.5 0.1\n")          # malformed line -> skipped
    boxes, labels, polys = D.parse_yolo_label_file(str(p))
    assert labels.tolist() == [3, 7]
    np.testing.assert_allclose(boxes[0], [0.5, 0.5, 0.2, 0.4], atol=1e-6)
    # polygon-derived box = extent of the 4 points
    np.testing.assert_allclose(boxes[1], [0.2, 0.2, 0.2, 0.2], atol=1e-6)
    assert polys[0] is None and polys[1].shape == (4, 2)


def test_parse_missing_file_is_empty(tmp_path):
    boxes, labels, polys = D.parse_yolo_label_file(str(tmp_path / "no.txt"))
    assert boxes.shape == (0, 4) and labels.shape == (0,) and polys == []


def test_yolo_dataset_layout(tmp_path):
    from PIL import Image
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        tmp_path / "images" / "a.jpg")
    (tmp_path / "labels" / "a.txt").write_text("5 0.5 0.5 0.5 0.5\n")
    ds = D.YoloDataset(str(tmp_path))
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["labels"].tolist() == [5]


def test_coco_dataset(tmp_path):
    """CocoDataset speaks the Sample contract from real COCO instances
    JSON: sorted-category-id remap (the coco91->80 convention), bbox
    xywh->normalized cxcywh, largest polygon ring kept, iscrowd and
    degenerate boxes excluded, Loader/trainer interop."""
    import json

    from PIL import Image
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(tmp_path / "a.png")
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(tmp_path / "b.png")
    big = [8, 8, 40, 8, 40, 28, 8, 28]            # 32x20 rect ring
    tiny = [0, 0, 2, 0, 2, 2]                     # area 2 ring
    coco = {
        "images": [{"id": 10, "file_name": "a.png", "width": 64,
                    "height": 48},
                   {"id": 11, "file_name": "b.png", "width": 32,
                    "height": 32}],
        # non-contiguous ids, unsorted on purpose -> 1:0, 3:1, 17:2
        "categories": [{"id": 17, "name": "dog"}, {"id": 1, "name": "cat"},
                       {"id": 3, "name": "cow"}],
        "annotations": [
            {"image_id": 10, "category_id": 3, "bbox": [8, 8, 32, 20],
             "segmentation": [tiny, big], "iscrowd": 0},
            {"image_id": 10, "category_id": 17, "bbox": [0, 0, 16, 16],
             "segmentation": [], "iscrowd": 0},
            {"image_id": 10, "category_id": 1, "bbox": [0, 0, 0, 16],
             "iscrowd": 0},                        # degenerate: dropped
            {"image_id": 10, "category_id": 1,
             "bbox": [0, 0, 10, 10], "iscrowd": 1,
             "segmentation": {"counts": [0, 100], "size": [48, 64]}},
        ],
    }
    (tmp_path / "ann.json").write_text(json.dumps(coco))

    ds = D.CocoDataset(str(tmp_path / "ann.json"), str(tmp_path))
    assert len(ds) == 2
    assert ds.class_names == ["cat", "cow", "dog"]

    s = ds[0]
    assert s["image"].shape == (48, 64, 3)
    assert s["labels"].tolist() == [1, 2]          # cow, dog (crowd+degen out)
    np.testing.assert_allclose(
        s["boxes"][0], [24 / 64, 18 / 48, 32 / 64, 20 / 48], atol=1e-6)
    # largest ring kept, normalized
    np.testing.assert_allclose(s["polys"][0][:, 0].max(), 40 / 64, atol=1e-6)
    assert s["polys"][1] is None                   # bbox-only instance
    # rasterized mask matches the polygon extent at proto res
    m = D.rasterize_mask(s["polys"][0], s["boxes"][0], (48, 64))
    assert m[18, 24] == 1.0 and m[2, 2] == 0.0

    # crowd region rides along as an ignore entry (COCO eval semantics),
    # never in the trainable arrays; its RLE decodes at native res
    assert s["ignore_boxes"].shape == (1, 4)
    assert s["ignore_labels"].tolist() == [0]      # cat
    assert s["ignore_masks"][0].shape == (48, 64)
    assert s["ignore_masks"][0].sum() == 100       # counts [0,100]

    s1 = ds[1]                                     # image with no annots
    assert s1["boxes"].shape == (0, 4) and len(s1["polys"]) == 0
    assert "ignore_boxes" not in s1

    # interop: the training Loader consumes it directly
    cfg = ModelConfig(scale="n", input_size=(32, 32), dtype="float32",
                      num_classes=3)
    loader = D.Loader(ds, cfg, batch=2, max_gt=4, seed=0,
                      aug=D.AugmentConfig(mosaic=0.0, scale=0.0,
                                          translate=0.0, hsv=False))
    b = next(iter(loader.epoch(0)))
    assert b["images"].shape == (2, 32, 32, 3)
    assert b["labels"].shape == (2, 4)


def _write_coco_fixture(tmp_path, with_kpts=False):
    import json

    from PIL import Image
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                    ).save(tmp_path / "a.png")
    cat = {"id": 1, "name": "person"}
    ann = {"image_id": 10, "category_id": 1, "bbox": [8, 8, 32, 20],
           "segmentation": [[8, 8, 40, 8, 40, 28, 8, 28]], "iscrowd": 0}
    if with_kpts:
        cat["keypoints"] = ["a", "b", "c"]
        cat["skeleton"] = [[1, 2], [2, 3]]
        ann["keypoints"] = [10, 10, 2, 20, 18, 1, 0, 0, 0]
        ann["num_keypoints"] = 2
    coco = {"images": [{"id": 10, "file_name": "a.png", "width": 64,
                        "height": 48}],
            "categories": [cat], "annotations": [ann]}
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(coco))
    return str(p), str(tmp_path)


def test_coco_pose_dataset(tmp_path):
    import json

    ann, root = _write_coco_fixture(tmp_path, with_kpts=True)
    # add a num_keypoints==0 person: pycocotools marks these IGNORE
    # (about half of val2017's person boxes) — counting them as GT would
    # permanently cap OKS recall
    coco = json.loads(open(ann).read())
    coco["annotations"].append(
        {"image_id": 10, "category_id": 1, "bbox": [2, 2, 10, 10],
         "keypoints": [0] * 9, "num_keypoints": 0, "iscrowd": 0})
    open(ann, "w").write(json.dumps(coco))

    ds = D.CocoPoseDataset(ann, root)
    assert ds.kpt_shape == (3, 3)
    s = ds[0]
    assert s["kpts"].shape == (1, 3, 3)            # labeled person only
    np.testing.assert_allclose(s["kpts"][0, 0],
                               [10 / 64, 10 / 48, 2], atol=1e-6)
    np.testing.assert_allclose(s["kpts"][0, 2], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(
        s["boxes"][0], [24 / 64, 18 / 48, 32 / 64, 20 / 48], atol=1e-6)
    assert s["ignore_boxes"].shape == (1, 4)       # the kpt-less person
    np.testing.assert_allclose(
        s["ignore_boxes"][0], [7 / 64, 7 / 48, 10 / 64, 10 / 48],
        atol=1e-6)


def test_encode_coco_rle_round_trip():
    rng = np.random.default_rng(3)
    for m in (rng.uniform(size=(13, 9)) > 0.5, np.zeros((5, 7), bool),
              np.ones((4, 4), bool)):
        rle = D.encode_coco_rle(m)
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(D.decode_coco_rle(rle), m)


def test_coco_results_dump(tmp_path):
    """evaluate_dataset --dump: standard COCO results JSON in original-
    image pixels with compressed-RLE masks, scoreable by external
    pycocotools (category/image ids from the dataset's COCO mapping)."""
    import json

    import jax

    from xrseg_tpu.eval.dataset_eval import evaluate_dataset
    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.testing import detection_params

    ann, root = _write_coco_fixture(tmp_path)
    ds = D.CocoDataset(ann, root)
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      num_classes=1)
    params = detection_params(jax.random.key(0), cfg)
    out = evaluate_dataset(cfg, params, ds, batch=1,
                           score_threshold=0.3,
                           coco_dump=str(tmp_path / "res.json"))
    rows = json.load(open(tmp_path / "res.json"))
    assert out["dumped"] == len(rows) > 0
    for r in rows:
        assert r["image_id"] == 10
        assert r["category_id"] == 1               # COCO id, not index 0
        x, y, w, h = r["bbox"]                     # original 64x48 pixels
        assert 0 <= x <= 64 and 0 <= y <= 48 and w > 0 and h > 0
        assert 0 < r["score"] <= 1
        m = D.decode_coco_rle(r["segmentation"])
        assert m.shape == (48, 64)                 # original image res


def test_mixup_blends_pixels_and_unions_gt():
    a = _sample(n=2, seed=0)
    b = _sample(n=1, seed=1)
    rng = np.random.default_rng(0)
    m = D.mixup2(a, b, rng)
    assert m["boxes"].shape == (3, 4)          # GT union, unweighted
    assert m["labels"].shape == (3,)
    assert len(m["polys"]) == 3
    np.testing.assert_array_equal(m["boxes"][:2], a["boxes"])
    np.testing.assert_array_equal(m["boxes"][2:], b["boxes"][:1])
    # pixel blend sits strictly between the sources (Beta(32,32) ~ 0.5)
    lo = np.minimum(a["image"].astype(int), b["image"].astype(int))
    hi = np.maximum(a["image"].astype(int), b["image"].astype(int))
    assert (m["image"].astype(int) >= lo - 1).all()
    assert (m["image"].astype(int) <= hi + 1).all()
    assert not np.array_equal(m["image"], a["image"])

    # augment_sample path: mixup=1, mosaic=0 -> two samples' GT
    aug = D.AugmentConfig(mosaic=0.0, mixup=1.0, hflip=0.0, hsv=False,
                          scale=0.0, translate=0.0)
    samples = [_sample(n=1, seed=s) for s in range(4)]
    out = D.augment_sample(lambda j: samples[j], 0,
                           np.random.default_rng(5), (64, 48), aug, 4)
    assert len(out["boxes"]) == 2


def test_mixup_task_family():
    """mixup is wired into the task path too: pose merges kpts, obb
    merges rotated boxes; classify rejects it loudly (hard int labels)."""
    rng = np.random.default_rng(0)

    def pose_sample(seed):
        r = np.random.default_rng(seed)
        return {"image": r.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                "boxes": np.asarray([[0.5, 0.5, 0.4, 0.4]], np.float32),
                "labels": np.asarray([0], np.int32),
                "kpts": r.uniform(0, 1, (1, 3, 3)).astype(np.float32)}

    ds = [pose_sample(s) for s in range(3)]
    aug = D.AugmentConfig(mosaic=0.0, mixup=1.0, hflip=0.0, hsv=False)
    out = D.augment_task_sample(lambda j: ds[j], 0, rng, (32, 32), aug,
                                "pose", n_total=3)
    assert out["kpts"].shape == (2, 3, 3)
    assert out["boxes"].shape == (2, 4)

    def obb_sample(seed):
        r = np.random.default_rng(seed)
        return {"image": r.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                "boxes_xywhr": np.asarray(
                    [[0.5, 0.5, 0.3, 0.2, 0.4]], np.float32),
                "labels": np.asarray([1], np.int32)}

    ds2 = [obb_sample(s) for s in range(3)]
    out2 = D.augment_task_sample(lambda j: ds2[j], 0, rng, (32, 32), aug,
                                 "obb", n_total=3)
    assert out2["boxes_xywhr"].shape == (2, 5)

    with pytest.raises(ValueError, match="classify"):
        D.augment_task_sample(lambda j: ds2[j], 0, rng, (32, 32), aug,
                              "classify", n_total=3)


def test_label_smoothing_mixes_targets():
    import jax.numpy as jnp

    from xrseg_tpu.train.losses import classification_loss
    logits = jnp.asarray([[8.0, -8.0, -8.0]])
    labels = jnp.asarray([0])
    ce0, _ = classification_loss(logits, labels)
    ce_s, aux = classification_loss(logits, labels, label_smoothing=0.1)
    # smoothing charges confident-correct predictions for the mass moved
    # to the wrong classes
    assert float(ce_s) > float(ce0)
    assert float(aux["acc"]) == 1.0
    # exact value: -( (0.9+0.1/3)*logp[0] + 0.1/3*(logp[1]+logp[2]) )
    logp = np.log(np.exp([8.0, -8, -8]) / np.exp([8.0, -8, -8]).sum())
    want = -((0.9 + 0.1 / 3) * logp[0] + 0.1 / 3 * (logp[1] + logp[2]))
    assert float(ce_s) == pytest.approx(want, rel=1e-5)


# ---------------------------------------------------------------------------
# augmentation geometry
# ---------------------------------------------------------------------------

def test_hflip_involution():
    s = _sample()
    f2 = D.hflip_sample(D.hflip_sample(s))
    np.testing.assert_array_equal(f2["image"], s["image"])
    np.testing.assert_allclose(f2["boxes"], s["boxes"], atol=1e-6)
    np.testing.assert_allclose(f2["polys"][0], s["polys"][0], atol=1e-6)


def test_hflip_moves_center():
    s = _sample()
    f = D.hflip_sample(s)
    np.testing.assert_allclose(f["boxes"][:, 0], 1.0 - s["boxes"][:, 0])
    np.testing.assert_allclose(f["boxes"][:, 1:], s["boxes"][:, 1:])


def test_hsv_jitter_identity_at_zero_gain():
    s = _sample()
    out = D.hsv_jitter(s["image"], np.random.default_rng(0),
                       h_gain=0.0, s_gain=0.0, v_gain=0.0)
    # HSV round-trip on uint8 is exact up to rounding
    assert np.abs(out.astype(int) - s["image"].astype(int)).max() <= 1


def test_scale_translate_identity():
    s = _sample()

    class ZeroRng:
        def uniform(self, lo=0.0, hi=1.0, size=None):
            return np.zeros(size) if size else 0.0

    out = D.scale_translate(s, ZeroRng(), scale=0.0, translate=0.0)
    np.testing.assert_array_equal(out["image"], s["image"])
    np.testing.assert_allclose(out["boxes"], s["boxes"], atol=1e-6)


def test_scale_translate_tracks_content():
    """A bright square and its GT box must move together under the affine."""
    img = np.zeros((64, 64, 3), np.uint8)
    img[24:40, 24:40] = 255
    s = {"image": img,
         "boxes": np.asarray([[0.5, 0.5, 0.25, 0.25]], np.float32),
         "labels": np.asarray([0], np.int32), "polys": [None]}
    out = D.scale_translate(s, np.random.default_rng(3),
                            scale=0.3, translate=0.1)
    ys, xs = np.nonzero(out["image"][..., 0] == 255)
    assert len(xs) > 0, "square left the frame entirely"
    cx, cy = (xs.min() + xs.max() + 1) / 2 / 64, (ys.min() + ys.max() + 1) / 2 / 64
    b = out["boxes"][0]
    assert abs(b[0] - cx) < 0.04 and abs(b[1] - cy) < 0.04
    w = (xs.max() - xs.min() + 1) / 64
    assert abs(b[2] - w) < 0.06


def test_mosaic4_contract():
    rng = np.random.default_rng(0)
    samples = [_sample(seed=i) for i in range(4)]
    out = D.mosaic4(samples, rng, (96, 96))
    assert out["image"].shape == (96, 96, 3)
    assert len(out["boxes"]) == len(out["labels"]) == len(out["polys"]) == 8
    assert (out["boxes"][:, :2] >= 0).all() and \
           (out["boxes"][:, :2] <= 1).all()
    # determinism
    out2 = D.mosaic4(samples, np.random.default_rng(0), (96, 96))
    np.testing.assert_array_equal(out["image"], out2["image"])
    np.testing.assert_allclose(out["boxes"], out2["boxes"])


def test_rasterize_mask_polygon_and_box():
    poly = np.asarray([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75],
                       [0.25, 0.75]], np.float32)
    m = D.rasterize_mask(poly, np.asarray([0.5, 0.5, 0.5, 0.5]), (40, 40))
    assert m[20, 20] == 1.0 and m[2, 2] == 0.0
    assert 0.15 < m.mean() < 0.35          # ~quarter of the area
    mb = D.rasterize_mask(None, np.asarray([0.5, 0.5, 0.5, 0.5],
                                           np.float32), (40, 40))
    assert mb[20, 20] == 1.0 and mb[2, 2] == 0.0
    np.testing.assert_allclose(mb.mean(), 0.25, atol=0.05)


# ---------------------------------------------------------------------------
# collate
# ---------------------------------------------------------------------------

def test_collate_contract():
    cfg = ModelConfig(scale="n", input_size=(64, 64))
    s = _sample(hw=(48, 48))
    batch = D.collate([s, s], cfg, max_gt=5)
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["images"].dtype == np.float32
    assert 0.0 <= batch["images"].min() and batch["images"].max() <= 1.0
    assert batch["boxes_xywh"].shape == (2, 5, 4)
    assert batch["labels"].shape == (2, 5)
    assert batch["masks"].shape == (2, 5, 16, 16)
    # pixels-space boxes; pad slots are -1
    np.testing.assert_allclose(batch["boxes_xywh"][0, 0],
                               s["boxes"][0] * 64, atol=1e-4)
    assert (batch["labels"][0, 2:] == -1).all()
    # polygon mask rasterized into slot 0
    assert batch["masks"][0, 0].sum() > 0


def test_collate_filters_tiny_boxes():
    cfg = ModelConfig(scale="n", input_size=(64, 64))
    s = _sample()
    s["boxes"] = np.asarray([[0.5, 0.5, 0.01, 0.01],       # 0.64 px -> drop
                             [0.5, 0.5, 0.5, 0.5]], np.float32)
    batch = D.collate([s], cfg, max_gt=4, min_box_px=2.0)
    assert batch["labels"][0, 0] == s["labels"][1]
    assert (batch["labels"][0, 1:] == -1).all()


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

def test_loader_determinism_and_epochs():
    ds = D.SyntheticShapesDataset(n=8, hw=(48, 48))
    cfg = ModelConfig(scale="n", input_size=(64, 64))
    mk = lambda: D.Loader(ds, cfg, batch=4, max_gt=4, seed=7)
    b1 = next(iter(mk().epoch(0)))
    b2 = next(iter(mk().epoch(0)))
    np.testing.assert_array_equal(np.asarray(b1["images"]),
                                  np.asarray(b2["images"]))
    b3 = next(iter(mk().epoch(1)))
    assert not np.array_equal(np.asarray(b1["images"]),
                              np.asarray(b3["images"]))


def test_loader_steps_and_shapes():
    ds = D.SyntheticShapesDataset(n=10, hw=(48, 48))
    cfg = ModelConfig(scale="n", input_size=(64, 64))
    ld = D.Loader(ds, cfg, batch=4, max_gt=4, seed=0)
    assert ld.steps_per_epoch() == 2
    batches = list(ld.epoch(0))
    assert len(batches) == 2
    for b in batches:
        assert b["images"].shape == (4, 64, 64, 3)
        assert b["masks"].shape == (4, 4, 16, 16)


def test_loader_sharded_over_mesh():
    import jax
    from xrseg_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh((8, 1))
    ds = D.SyntheticShapesDataset(n=8, hw=(48, 48))
    cfg = ModelConfig(scale="n", input_size=(64, 64))
    ld = D.Loader(ds, cfg, batch=8, max_gt=4, seed=0, mesh=mesh)
    b = next(iter(ld.epoch(0)))
    sh = b["images"].sharding
    assert sh.is_fully_replicated is False
    assert len(sh.device_set) == 8


def test_loader_feeds_train_step():
    """End-to-end: dataset -> augment -> loader -> sharded train step."""
    import jax

    from xrseg_tpu.parallel import mesh as mesh_lib
    from xrseg_tpu.train import train_step as ts

    mesh = mesh_lib.make_mesh((8, 1))
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32")
    ds = D.SyntheticShapesDataset(n=16, hw=(64, 64))
    ld = D.Loader(ds, cfg, batch=8, max_gt=4, seed=0, mesh=mesh,
                  aug=D.AugmentConfig(mosaic=0.5))
    opt = ts.make_optimizer()
    state = ts.init_train_state(jax.random.key(0), cfg, opt)
    state = ts.shard_train_state(state, mesh)
    step = ts.make_train_step(cfg, opt, mesh=mesh)
    losses = []
    for batch in ld.epoch(0):
        state, metrics = step(state, batch)
        losses.append(float(jax.device_get(metrics["loss"])))
    assert len(losses) == 2
    assert all(np.isfinite(l) for l in losses)


def test_loader_abandoned_generator_cleans_up():
    """Breaking out of an epoch must not leak a blocked producer thread."""
    import threading

    ds = D.SyntheticShapesDataset(n=16, hw=(48, 48))
    cfg = ModelConfig(scale="n", input_size=(64, 64))
    ld = D.Loader(ds, cfg, batch=4, max_gt=4, seed=0, prefetch=1)
    before = threading.active_count()
    for _ in range(3):
        gen = ld.epoch(0)
        next(gen)          # take one batch, abandon the rest
        gen.close()        # triggers the generator's finally
    assert threading.active_count() <= before + 1


# ---------------------------------------------------------------------------
# copy-paste augmentation + multi-scale training
# ---------------------------------------------------------------------------

def test_copy_paste_appends_donor_instances():
    rng = np.random.default_rng(0)
    dst = _sample(hw=(64, 64), n=1)        # 1 GT (has a polygon)
    src = _sample(hw=(64, 64), n=2, seed=1)
    out = D.copy_paste(dst, src, rng, p=1.0)
    # only src's polygon-bearing instance (index 0) can be pasted
    assert len(out["labels"]) == 2
    assert out["labels"][-1] == src["labels"][0]
    np.testing.assert_allclose(out["boxes"][-1], src["boxes"][0])
    # pasted pixels come from the donor image inside the polygon
    poly = src["polys"][0]
    h, w = out["image"].shape[:2]
    cx = int((poly[:, 0].mean()) * w)
    cy = int((poly[:, 1].mean()) * h)
    src_resized = D._resize_uint8(src["image"], (h, w))
    np.testing.assert_array_equal(out["image"][cy, cx], src_resized[cy, cx])
    # p=0 is identity
    same = D.copy_paste(dst, src, rng, p=0.0)
    assert len(same["labels"]) == 1


def test_copy_paste_in_augment_pipeline():
    ds = D.SyntheticShapesDataset(n=8, hw=(48, 48), max_objects=1)
    rng = np.random.default_rng(3)
    aug = D.AugmentConfig(mosaic=0.0, scale=0.0, translate=0.0, hflip=0.0,
                          hsv=False, copy_paste=1.0)
    s = D.augment_sample(ds.__getitem__, 0, rng, (64, 64), aug, len(ds))
    # every synthetic instance has a polygon, so pasting must have added GT
    assert len(s["labels"]) > len(ds[0]["labels"])


def test_multiscale_loader_shapes_and_train_step():
    """Multi-scale buckets: batches cycle fixed shapes; the train step
    runs (retraces per bucket) with anchors matching each batch shape."""
    import jax

    from xrseg_tpu.train import train_step as ts

    scales = [(32, 32), (64, 64)]
    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32")
    ds = D.SyntheticShapesDataset(n=24, hw=(48, 48))
    ld = D.Loader(ds, cfg, batch=4, max_gt=4, seed=1, scales=scales,
                  aug=D.AugmentConfig(mosaic=0.0))
    seen = set()
    opt = ts.make_optimizer()
    state = ts.init_train_state(jax.random.key(0), cfg, opt)
    step = ts.make_train_step(cfg, opt)
    for batch in ld.epoch(0):
        hw = tuple(int(x) for x in batch["images"].shape[1:3])
        assert hw in [(32, 32), (64, 64)]
        # mask targets track proto resolution H//4
        assert batch["masks"].shape[-2:] == (hw[0] // 4, hw[1] // 4)
        seen.add(hw)
        state, metrics = step(state, batch)
        assert np.isfinite(float(jax.device_get(metrics["loss"])))
    assert len(seen) == 2, f"both buckets should appear, saw {seen}"


def test_loader_rejects_bad_scales():
    cfg = ModelConfig(scale="n", input_size=(64, 64))
    ds = D.SyntheticShapesDataset(n=4, hw=(48, 48))
    with pytest.raises(ValueError):
        D.Loader(ds, cfg, batch=2, scales=[(50, 64)])


def test_loader_slow_consumer_terminates():
    """Regression: with a consumer slower than the producer the queue is
    full when the producer finishes; the end-of-epoch SENTINEL must still
    arrive (a dropped sentinel hangs the epoch forever — seen on the real
    chip where each batch transfer took ~60s)."""
    import threading
    import time

    ds = D.SyntheticShapesDataset(n=8, hw=(32, 32))
    cfg = ModelConfig(scale="n", input_size=(32, 32))
    ld = D.Loader(ds, cfg, batch=4, max_gt=4, seed=0, prefetch=1)
    done = []

    def consume():
        n = 0
        for _ in ld.epoch(0):
            time.sleep(0.3)      # let the producer finish and fill the queue
            n += 1
        done.append(n)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=30)
    assert done == [2], f"epoch hung or wrong count: {done}"


def test_loader_propagates_dataset_errors():
    """A failing dataset must raise out of the epoch iterator, not
    silently truncate the epoch (review finding: swallowed producer
    exceptions made every epoch quietly stop at the bad sample)."""
    class BadDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise RuntimeError("corrupt sample")

    cfg = ModelConfig(scale="n", input_size=(32, 32))
    ld = D.Loader(BadDataset(), cfg, batch=4, max_gt=2,
                  aug=D.AugmentConfig(mosaic=0.0))
    with pytest.raises(RuntimeError, match="corrupt sample"):
        for _ in ld.epoch(0):
            pass


def test_loader_drop_last_false_pads_to_fixed_shape():
    """drop_last=False: the final partial batch is padded to the
    configured size (ONE compiled shape per geometry, mesh-divisible) and
    carries sample_weight zeros for padding; the weighted loss equals the
    unpadded loss on the real rows."""
    import jax.numpy as jnp

    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.models import yolo11
    from xrseg_tpu.train.data import (AugmentConfig, Loader,
                                      SyntheticShapesDataset)
    from xrseg_tpu.train.losses import detection_loss

    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      task="detect")
    ds = SyntheticShapesDataset(n=5, hw=(64, 64))      # 5 % 4 != 0
    aug = AugmentConfig(mosaic=0.0, hsv=False, scale=0.0, translate=0.0)
    loader = Loader(ds, cfg, batch=4, max_gt=4, aug=aug, drop_last=False)
    assert loader.steps_per_epoch() == 2
    batches = list(loader._host_batches(0))
    assert len(batches) == 2
    for b in batches:
        assert b["images"].shape[0] == 4               # fixed shape
        assert b["sample_weight"].shape == (4,)        # constant pytree
    full, part = batches
    assert full["sample_weight"].sum() == 4
    assert part["sample_weight"].sum() == 1            # 5 - 4 real rows
    assert (part["labels"][1:] == -1).all()            # padded GT empty
    assert (part["images"][1:] == 0).all()

    # weighted loss on the padded batch == loss on just the real row
    params = yolo11.init_params(__import__("jax").random.key(0), cfg)
    out = yolo11.forward_train(params, jnp.asarray(part["images"]), cfg)
    tgt = {"boxes_xywh": jnp.asarray(part["boxes_xywh"]),
           "labels": jnp.asarray(part["labels"]),
           "sample_weight": jnp.asarray(part["sample_weight"])}
    loss_pad, _ = detection_loss(out, tgt, cfg)

    out1 = yolo11.forward_train(params, jnp.asarray(part["images"][:1]),
                                cfg)
    tgt1 = {"boxes_xywh": jnp.asarray(part["boxes_xywh"][:1]),
            "labels": jnp.asarray(part["labels"][:1])}
    loss_real, _ = detection_loss(out1, tgt1, cfg)
    np.testing.assert_allclose(float(loss_pad), float(loss_real),
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# ultralytics on-disk formats for the extended tasks (pose / OBB)
# ---------------------------------------------------------------------------

def test_parse_pose_label_3dim(tmp_path):
    p = tmp_path / "a.txt"
    # K=2 keypoints with COCO visibility (0=absent, 1=occluded, 2=visible)
    p.write_text("0 0.5 0.5 0.2 0.4 0.4 0.4 2 0.6 0.6 0\n"
                 "1 0.2 0.2 0.1 0.1 0.2 0.2 1 0.3 0.3 2\n"
                 "9 0.5 0.5 0.1 0.1 0.5\n")          # malformed -> skipped
    boxes, labels, kpts = D.parse_yolo_pose_label_file(str(p), (2, 3))
    assert labels.tolist() == [0, 1]
    assert kpts.shape == (2, 2, 3)
    np.testing.assert_allclose(boxes[0], [0.5, 0.5, 0.2, 0.4], atol=1e-6)
    # v>=1 counts visible, v=0 does not
    assert kpts[0, :, 2].tolist() == [1.0, 0.0]
    assert kpts[1, :, 2].tolist() == [1.0, 1.0]


def test_parse_pose_label_2dim(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("0 0.5 0.5 0.2 0.4 0.4 0.4 0.6 0.6\n")
    boxes, labels, kpts = D.parse_yolo_pose_label_file(str(p), (2, 2))
    assert kpts.shape == (1, 2, 3)                    # vis synthesized
    assert (kpts[0, :, 2] == 1).all()
    np.testing.assert_allclose(kpts[0, 0, :2], [0.4, 0.4], atol=1e-6)


def test_parse_obb_label_nonsquare(tmp_path):
    # rotated rect drawn in PIXEL space of a 200x100 (WxH) image, corners
    # normalized per-axis the ultralytics way; parser must recover the
    # pixel-space geometry (angle/w/h computed on normalized coords would
    # be skewed by the 2:1 aspect)
    W, H = 200, 100
    cx, cy, w, h, ang = 100.0, 50.0, 40.0, 20.0, np.deg2rad(30)
    u = np.asarray([np.cos(ang), np.sin(ang)])
    v = np.asarray([-np.sin(ang), np.cos(ang)])
    c = np.asarray([cx, cy])
    pts = np.stack([c - w / 2 * u - h / 2 * v, c + w / 2 * u - h / 2 * v,
                    c + w / 2 * u + h / 2 * v, c - w / 2 * u + h / 2 * v])
    pts_n = pts / (W, H)
    p = tmp_path / "a.txt"
    p.write_text("3 " + " ".join(f"{x:.6f}" for x in pts_n.ravel()) + "\n")
    boxes, labels = D.parse_yolo_obb_label_file(str(p), (H, W))
    assert labels.tolist() == [3]
    np.testing.assert_allclose(
        boxes[0], [cx / W, cy / H, w / W, h / H, ang], atol=1e-4)


def test_parse_obb_angle_folds_into_model_range(tmp_path):
    # a rect at 150 deg == the same rect at -30 deg (pi symmetry); the
    # model's angle range is (-pi/4, 3pi/4)
    W = H = 100
    cx, cy, w, h, ang = 50.0, 50.0, 30.0, 10.0, np.deg2rad(150)
    u = np.asarray([np.cos(ang), np.sin(ang)])
    v = np.asarray([-np.sin(ang), np.cos(ang)])
    c = np.asarray([cx, cy])
    pts = np.stack([c - w / 2 * u - h / 2 * v, c + w / 2 * u - h / 2 * v,
                    c + w / 2 * u + h / 2 * v, c - w / 2 * u + h / 2 * v])
    p = tmp_path / "a.txt"
    p.write_text("0 " + " ".join(f"{x:.6f}" for x in (pts / W).ravel())
                 + "\n")
    boxes, _ = D.parse_yolo_obb_label_file(str(p), (H, W))
    np.testing.assert_allclose(boxes[0, 4], np.deg2rad(-30), atol=1e-4)
    np.testing.assert_allclose(boxes[0, 2:4], [w / W, h / H], atol=1e-4)


def _write_img(path, hw=(32, 32)):
    from PIL import Image
    Image.fromarray(np.zeros(hw + (3,), np.uint8)).save(path)


def test_yolo_pose_dataset_collates(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    _write_img(tmp_path / "images" / "a.jpg")
    (tmp_path / "labels" / "a.txt").write_text(
        "0 0.5 0.5 0.2 0.4 0.4 0.4 2 0.6 0.6 2 0.5 0.5 0\n")
    ds = D.YoloPoseDataset(str(tmp_path), kpt_shape=(3, 3))
    assert len(ds) == 1
    batch = D.collate_pose([ds[0]], (64, 64), max_gt=4)
    assert batch["kpts"].shape == (1, 4, 3, 3)
    np.testing.assert_allclose(batch["boxes_xywh"][0, 0],
                               [32, 32, 12.8, 25.6], atol=1e-4)
    np.testing.assert_allclose(batch["kpts"][0, 0, 0],
                               [25.6, 25.6, 1.0], atol=1e-4)


def test_yolo_obb_dataset_collates(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    _write_img(tmp_path / "images" / "a.jpg")
    # axis-aligned square: corners of a 0.2x0.2 box centered at (0.5, 0.5)
    (tmp_path / "labels" / "a.txt").write_text(
        "1 0.4 0.4 0.6 0.4 0.6 0.6 0.4 0.6\n")
    ds = D.YoloOBBDataset(str(tmp_path))
    s = ds[0]
    assert s["boxes_xywhr"].shape == (1, 5)
    batch = D.collate_obb([s], (64, 64), max_gt=4)
    np.testing.assert_allclose(batch["boxes_xywhr"][0, 0],
                               [32, 32, 12.8, 12.8, 0.0], atol=1e-4)
    assert batch["labels"][0, 0] == 1


def test_hsv_native_matches_numpy_oracle():
    """The C++ single-pass HSV kernel reproduces the numpy round-trip:
    bit-exact on ~all pixels, never more than one uint8 step apart (fp32
    rounding at hue-sextant boundaries)."""
    try:
        from xrseg_tpu.io.native import hsv_jitter_native, NativeUnavailable
        from xrseg_tpu.io import native as native_mod
        native_mod.load_library()
    except Exception:
        import pytest
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (123, 77, 3), dtype=np.uint8)
    for gains in ([1.0, 1.0, 1.0], [1.013, 0.55, 1.32], [0.99, 1.5, 0.7]):
        ref = D._hsv_jitter_numpy(img, np.asarray(gains))
        out = hsv_jitter_native(img, *gains)
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1, diff.max()
        assert (diff == 0).mean() > 0.99, (diff > 0).mean()


def test_resize2tap_native_matches_oracles():
    """The C++ 2-tap resize == the numpy 2-tap gather == the DEVICE
    preprocess resampling (jit'd ops.preprocess on the same image), so
    host-side training/eval resizes carry zero train/serve skew."""
    try:
        from xrseg_tpu.io import native as native_mod
        native_mod.load_library()
    except Exception:
        import pytest
        pytest.skip("native toolchain unavailable")
    import jax.numpy as jnp

    from xrseg_tpu.io.native import resize2tap_native
    from xrseg_tpu.ops.preprocess import preprocess

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (97, 143, 3), dtype=np.uint8)
    for hw in ((64, 64), (200, 100), (97, 143)):
        out = resize2tap_native(img, hw)
        ref = D._resize2tap_numpy(img, hw)
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1 and (diff == 0).mean() > 0.999, hw
        # device-program parity: preprocess() normalizes to [0,1] f32
        dev = np.asarray(preprocess(jnp.asarray(img[None]), hw,
                                    dtype=jnp.float32))[0]
        dev_u8 = (dev * 255.0 + 0.5).astype(np.uint8)
        ddiff = np.abs(out.astype(int) - dev_u8.astype(int))
        assert ddiff.max() <= 1, (hw, ddiff.max())


def test_letterbox_sample_geometry():
    """Aspect-preserving remap: a 2:1-wide image letterboxed into a
    square canvas scales by width, centers vertically, and remaps
    normalized boxes/polys into the padded frame."""
    from xrseg_tpu.train.data import letterbox_sample
    img = np.zeros((50, 100, 3), np.uint8)
    img[:, :, 0] = 200
    s = {"image": img,
         "boxes": np.asarray([[0.5, 0.5, 0.2, 0.4]], np.float32),
         "labels": np.asarray([1], np.int32),
         "polys": [np.asarray([[0.4, 0.3], [0.6, 0.7]], np.float32)]}
    out = letterbox_sample(s, (100, 100))
    assert out["image"].shape == (100, 100, 3)
    # content occupies rows 25..75 (50*1.0 scaled by r=1.0 -> 50 rows)
    assert (out["image"][:25] == 114).all()
    assert (out["image"][75:] == 114).all()
    assert (out["image"][25:75, :, 0] == 200).all()
    b = out["boxes"][0]
    # x untouched (full width), y: 0.5*0.5 + 0.25 = 0.5; h: 0.4*0.5
    np.testing.assert_allclose(b, [0.5, 0.5, 0.2, 0.2], atol=1e-6)
    p = out["polys"][0]
    np.testing.assert_allclose(p[:, 0], [0.4, 0.6], atol=1e-6)
    np.testing.assert_allclose(p[:, 1], [0.3 * 0.5 + 0.25,
                                         0.7 * 0.5 + 0.25], atol=1e-6)


def test_letterbox_square_is_identity():
    """On square sources letterboxing is a no-op, so the augment
    pipeline with letterbox=True reproduces the stretch pipeline
    sample-for-sample (same rng stream)."""
    from xrseg_tpu.train.data import (AugmentConfig, SyntheticShapesDataset,
                                      augment_sample, letterbox_sample)
    ds = SyntheticShapesDataset(n=8, hw=(64, 64))
    s0 = ds[0]
    lb = letterbox_sample(s0, (64, 64))
    np.testing.assert_array_equal(lb["image"], s0["image"])
    np.testing.assert_allclose(lb["boxes"], s0["boxes"], atol=1e-7)
    for a, b in ((AugmentConfig(letterbox=False),
                  AugmentConfig(letterbox=True)),):
        r1 = augment_sample(lambda j: ds[j], 0, np.random.default_rng(3),
                            (64, 64), a, len(ds))
        r2 = augment_sample(lambda j: ds[j], 0, np.random.default_rng(3),
                            (64, 64), b, len(ds))
        np.testing.assert_array_equal(r1["image"], r2["image"])
        np.testing.assert_allclose(r1["boxes"], r2["boxes"], atol=1e-6)


def test_evaluate_dataset_letterbox_mode():
    """evaluate_dataset(resize_mode='letterbox') scores a non-square
    dataset with aspect-preserving geometry; fixture weights detect in
    both modes and GT mapping stays consistent (nonzero mAP, GT count
    unchanged)."""
    import jax

    from xrseg_tpu.config import ModelConfig
    from xrseg_tpu.eval.dataset_eval import evaluate_dataset
    from xrseg_tpu.testing import detection_params
    from xrseg_tpu.train.data import SyntheticShapesDataset

    cfg = ModelConfig(scale="n", input_size=(64, 64), dtype="float32",
                      num_classes=3)
    params = detection_params(jax.random.key(0), cfg)
    ds = SyntheticShapesDataset(n=4, hw=(48, 64), n_classes=3)
    r_s = evaluate_dataset(cfg, params, ds, batch=2, max_images=4)
    r_l = evaluate_dataset(cfg, params, ds, batch=2, max_images=4,
                           resize_mode="letterbox")
    assert r_s["n_gt"] == r_l["n_gt"] > 0
    # fixture weights fire everywhere; both modes must produce scored
    # detections (the numbers differ — that's the point of the A/B)
    assert r_s["box_mAP"] >= 0.0 and r_l["box_mAP"] >= 0.0
    assert np.isfinite(r_s["box_mAP"]) and np.isfinite(r_l["box_mAP"])
