"""Tests for the generic segmentation trainer (SURVEY R13).

Mirrors the reference's implied test strategy (SURVEY.md §4): loss parity
against torch formulas, metric parity against the numpy reference
semantics, dataset-layout fixtures on disk, and an end-to-end train loop
smoke on a tiny config.
"""
import json
import os

import jax
import numpy as np
import pytest

from seg2eye_tpu.segtrain import colormap, transforms as tr
from seg2eye_tpu.segtrain.datasets import (
    COCOSegmentation, CityscapesSegmentation, CombineDBs, SBDSegmentation,
    VOCSegmentation, _decode_rle, _rle_counts_from_string, make_data_loader)
from seg2eye_tpu.segtrain.losses import SegmentationLosses
from seg2eye_tpu.segtrain.lr_scheduler import LRScheduler
from seg2eye_tpu.segtrain.metrics import Evaluator


class Args:
    """Minimal args namespace for datasets/trainer."""
    def __init__(self, **kw):
        self.backbone = "resnet"
        self.out_stride = 16
        self.dataset = "pascal"
        self.use_sbd = False
        self.workers = 0
        self.base_size = 64
        self.crop_size = 32
        self.sync_bn = False
        self.freeze_bn = False
        self.loss_type = "ce"
        self.epochs = 1
        self.start_epoch = 0
        self.batch_size = 2
        self.test_batch_size = 2
        self.use_balanced_weights = False
        self.lr = 0.007
        self.lr_scheduler = "poly"
        self.momentum = 0.9
        self.weight_decay = 5e-4
        self.nesterov = False
        self.seed = 1
        self.resume = None
        self.checkname = "deeplab-test"
        self.ft = False
        self.eval_interval = 1
        self.no_val = False
        self.data_root = None
        self.resnet_layers = (1, 1, 1, 1)
        for k, v in kw.items():
            setattr(self, k, v)


# --------------------------------------------------------------------- #
# fixtures: synthetic dataset trees
# --------------------------------------------------------------------- #

def _save_img(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def make_voc(root, ids_train, ids_val, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "VOCdevkit", "VOC2012")
    for split, ids in (("train", ids_train), ("val", ids_val)):
        os.makedirs(os.path.join(base, "ImageSets", "Segmentation"),
                    exist_ok=True)
        with open(os.path.join(base, "ImageSets", "Segmentation",
                               split + ".txt"), "w") as f:
            f.write("\n".join(ids))
        for iid in ids:
            _save_img(os.path.join(base, "JPEGImages", iid + ".jpg"),
                      rng.integers(0, 255, (h, w, 3), np.uint8))
            mask = rng.integers(0, 21, (h, w)).astype(np.uint8)
            mask[0, :] = 255                       # ignore border
            _save_img(os.path.join(base, "SegmentationClass", iid + ".png"),
                      mask)
    return base


def make_sbd(root, ids, h=48, w=64, seed=1):
    import scipy.io
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "benchmark_RELEASE")
    ds = os.path.join(base, "dataset")
    os.makedirs(os.path.join(ds, "img"), exist_ok=True)
    os.makedirs(os.path.join(ds, "cls"), exist_ok=True)
    with open(os.path.join(ds, "train.txt"), "w") as f:
        f.write("\n".join(ids))
    with open(os.path.join(ds, "val.txt"), "w") as f:
        f.write("")
    for iid in ids:
        _save_img(os.path.join(ds, "img", iid + ".jpg"),
                  rng.integers(0, 255, (h, w, 3), np.uint8))
        seg = rng.integers(0, 21, (h, w)).astype(np.uint8)
        scipy.io.savemat(os.path.join(ds, "cls", iid + ".mat"),
                         {"GTcls": {"Segmentation": seg}})
    return base


def make_cityscapes(root, n=2, h=64, w=96, seed=2):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "cityscapes")
    raw_vals = np.asarray(CityscapesSegmentation.VALID_CLASSES
                          + [0, 4, 29], np.uint8)
    for split in ("train", "val", "test"):
        for i in range(n):
            name = f"city_{split}_{i:06d}_000019"
            _save_img(os.path.join(base, "leftImg8bit", split, "city",
                                   name + "_leftImg8bit.png"),
                      rng.integers(0, 255, (h, w, 3), np.uint8))
            raw = raw_vals[rng.integers(0, len(raw_vals), (h, w))]
            _save_img(os.path.join(base, "gtFine_trainvaltest", "gtFine",
                                   split, "city",
                                   name + "_gtFine_labelIds.png"), raw)
    return base


def make_coco(root, n=3, h=64, w=64, seed=3):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "coco")
    img_dir = os.path.join(base, "images", "train2017")
    os.makedirs(os.path.join(base, "annotations"), exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    for i in range(n):
        fn = f"{i:012d}.jpg"
        _save_img(os.path.join(img_dir, fn),
                  rng.integers(0, 255, (h, w, 3), np.uint8))
        images.append({"id": i, "file_name": fn, "height": h, "width": w})
        # large polygon (qualifies: > 1000 px), category 5 -> class 1
        annotations.append({
            "id": 10 * i, "image_id": i, "category_id": 5,
            "segmentation": [[4.0, 4.0, 60.0, 4.0, 60.0, 40.0, 4.0, 40.0]]})
        # uncompressed RLE strip, category 2 -> class 2
        annotations.append({
            "id": 10 * i + 1, "image_id": i, "category_id": 2,
            "segmentation": {"size": [h, w],
                             "counts": [h * 50, h * 4, h * 10]}})
        # category outside CAT_LIST: skipped
        annotations.append({
            "id": 10 * i + 2, "image_id": i, "category_id": 99,
            "segmentation": [[0.0, 0.0, 10.0, 0.0, 10.0, 10.0]]})
    with open(os.path.join(base, "annotations",
                           "instances_train2017.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    # val split: reuse the same images
    with open(os.path.join(base, "annotations",
                           "instances_val2017.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    os.makedirs(os.path.join(base, "images", "val2017"), exist_ok=True)
    for i in range(n):
        fn = f"{i:012d}.jpg"
        os.link(os.path.join(img_dir, fn),
                os.path.join(base, "images", "val2017", fn))
    return base


# --------------------------------------------------------------------- #
# losses: torch parity
# --------------------------------------------------------------------- #

def _torch_ce(logits_nhwc, target, weight=None, batch_average=True):
    import torch
    lg = torch.tensor(np.moveaxis(logits_nhwc, -1, 1))
    tg = torch.tensor(target).long()
    w = None if weight is None else torch.tensor(weight).float()
    crit = torch.nn.CrossEntropyLoss(weight=w, ignore_index=255,
                                     reduction="mean")
    loss = crit(lg, tg)
    if batch_average:
        loss = loss / lg.shape[0]
    return float(loss)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 8, 9, 5)).astype(np.float32)
    target = rng.integers(0, 5, (3, 8, 9)).astype(np.float32)
    target[:, 0, :] = 255
    ours = float(SegmentationLosses().build_loss("ce")(logits, target))
    assert np.isclose(ours, _torch_ce(logits, target), rtol=1e-5)


def test_weighted_cross_entropy_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 6, 7, 4)).astype(np.float32)
    target = rng.integers(0, 4, (2, 6, 7)).astype(np.float32)
    target[0, :2, :] = 255
    w = rng.uniform(0.5, 3.0, 4).astype(np.float32)
    ours = float(SegmentationLosses(weight=w).build_loss("ce")(
        logits, target))
    assert np.isclose(ours, _torch_ce(logits, target, weight=w), rtol=1e-5)


def test_focal_matches_reference_formula():
    """Focal applies the transform to the AGGREGATED scalar CE
    (utils/loss.py:35-51) — verified against the torch composition."""
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 5, 5, 6)).astype(np.float32)
    target = rng.integers(0, 6, (2, 5, 5)).astype(np.float32)
    n = logits.shape[0]
    logpt = -_torch_ce(logits, target, batch_average=False)
    pt = np.exp(logpt)
    want = (-((1 - pt) ** 2.0) * (logpt * 0.5)) / n
    ours = float(SegmentationLosses().build_loss("focal")(logits, target))
    assert np.isclose(ours, want, rtol=1e-5)


def test_build_loss_rejects_unknown():
    with pytest.raises(NotImplementedError):
        SegmentationLosses().build_loss("dice")


# --------------------------------------------------------------------- #
# metrics: numpy reference semantics
# --------------------------------------------------------------------- #

def _np_confusion(gt, pred, nc):
    mask = (gt >= 0) & (gt < nc)
    label = nc * gt[mask].astype(int) + pred[mask]
    return np.bincount(label, minlength=nc ** 2).reshape(nc, nc)


def test_evaluator_matches_numpy_reference():
    rng = np.random.default_rng(3)
    nc = 6
    gt = rng.integers(0, nc, (4, 16, 16))
    gt[gt == 5] = 255                      # class 5 absent + ignore pixels
    pred = rng.integers(0, nc, (4, 16, 16))
    ev = Evaluator(nc)
    ev.add_batch(gt, pred)
    conf = _np_confusion(gt, pred, nc)
    np.testing.assert_array_equal(ev.confusion, conf)

    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(conf).sum() / conf.sum()
        acc_cls = np.nanmean(np.diag(conf) / conf.sum(1))
        iou = np.diag(conf) / (conf.sum(1) + conf.sum(0) - np.diag(conf))
        miou = np.nanmean(iou)
        freq = conf.sum(1) / conf.sum()
        fwiou = (freq[freq > 0] * iou[freq > 0]).sum()
    assert np.isclose(ev.Pixel_Accuracy(), acc)
    assert np.isclose(ev.Pixel_Accuracy_Class(), acc_cls)
    assert np.isclose(ev.Mean_Intersection_over_Union(), miou)
    assert np.isclose(ev.Frequency_Weighted_Intersection_over_Union(),
                      fwiou)
    ev.reset()
    assert ev.confusion.sum() == 0


# --------------------------------------------------------------------- #
# LR scheduler
# --------------------------------------------------------------------- #

def test_lr_scheduler_modes():
    poly = LRScheduler("poly", 0.01, 10, iters_per_epoch=100)
    assert np.isclose(poly(0, 0), 0.01)
    assert np.isclose(poly(50, 4), 0.01 * (1 - 450 / 1000) ** 0.9)
    cos = LRScheduler("cos", 0.01, 10, iters_per_epoch=100)
    assert np.isclose(cos(0, 0), 0.01)
    assert np.isclose(cos(0, 5), 0.5 * 0.01 * (1 + np.cos(np.pi * 0.5)))
    step = LRScheduler("step", 0.01, 10, iters_per_epoch=100, lr_step=3)
    assert np.isclose(step(0, 7), 0.01 * 0.1 ** 2)
    with pytest.raises(AssertionError):
        LRScheduler("step", 0.01, 10, iters_per_epoch=100)  # train.py quirk
    warm = LRScheduler("poly", 0.01, 10, iters_per_epoch=100,
                       warmup_epochs=2)
    assert warm(0, 0) == 0.0
    assert np.isclose(warm(100, 0),
                      0.01 * (1 - 100 / 1000) ** 0.9 * 100 / 200)


# --------------------------------------------------------------------- #
# colormap + transforms
# --------------------------------------------------------------------- #

def test_decode_encode_segmap_roundtrip():
    rng = np.random.default_rng(4)
    lab = rng.integers(0, 21, (10, 12))
    rgb = colormap.decode_segmap(lab, "pascal")
    assert rgb.shape == (10, 12, 3) and rgb.max() <= 1.0
    back = colormap.encode_segmap((rgb * 255).round())
    np.testing.assert_array_equal(back, lab)
    # ignore label renders black
    assert (colormap.decode_segmap(np.full((2, 2), 255), "cityscapes")
            == 0).all()


def test_transform_chains_shapes_and_fill():
    from PIL import Image
    rng = np.random.default_rng(5)
    img = Image.fromarray(rng.integers(0, 255, (40, 30, 3), np.uint8))
    mask = Image.fromarray(rng.integers(0, 19, (40, 30)).astype(np.uint8))
    train = tr.train_transform(base_size=64, crop_size=48, fill=255)
    for seed in range(4):
        out = train({"image": img, "label": mask},
                    np.random.default_rng(seed))
        assert out["image"].shape == (48, 48, 3)
        assert out["image"].dtype == np.float32
        assert out["label"].shape == (48, 48)
        # any padded mask region must be the ignore fill, never class 0
        assert set(np.unique(out["label"])) <= set(range(19)) | {255.0}
    val = tr.val_transform(crop_size=32)
    out = val({"image": img, "label": mask}, np.random.default_rng(0))
    assert out["image"].shape == (32, 32, 3)
    # determinism under the explicit rng
    a = train({"image": img, "label": mask}, np.random.default_rng(7))
    b = train({"image": img, "label": mask}, np.random.default_rng(7))
    np.testing.assert_array_equal(a["image"], b["image"])


# --------------------------------------------------------------------- #
# datasets
# --------------------------------------------------------------------- #

def test_voc_sbd_combine(tmp_path):
    root = str(tmp_path)
    make_voc(root, ["a", "b", "c"], ["c_val"])
    make_sbd(root, ["b", "d"])            # 'b' duplicates VOC train
    args = Args(data_root=root, base_size=32, crop_size=24)
    voc_tr = VOCSegmentation(args, split="train")
    voc_val = VOCSegmentation(args, split="val")
    sbd = SBDSegmentation(args, split=["train", "val"])
    assert len(voc_tr) == 3 and len(voc_val) == 1 and len(sbd) == 2
    comb = CombineDBs([voc_tr, sbd], excluded=[voc_val])
    assert sorted(comb.im_ids) == ["a", "b", "c", "d"]  # deduped union
    s = comb.__getitem__(0, rng=np.random.default_rng(0))
    assert s["image"].shape == (24, 24, 3) and s["label"].shape == (24, 24)
    # val transform path
    sv = voc_val.__getitem__(0, rng=np.random.default_rng(0))
    assert sv["image"].shape == (24, 24, 3)


def test_cityscapes_encoding(tmp_path):
    root = str(tmp_path)
    make_cityscapes(root)
    args = Args(data_root=root, dataset="cityscapes", base_size=48,
                crop_size=32)
    ds = CityscapesSegmentation(args, split="train")
    assert len(ds) == 2
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    labs = set(np.unique(s["label"]))
    assert labs <= set(range(19)) | {255.0}    # raw ids remapped
    val = CityscapesSegmentation(args, split="val")
    sv = val.__getitem__(0, rng=np.random.default_rng(0))
    assert sv["image"].shape == (32, 32, 3)
    ts = CityscapesSegmentation(args, split="test")
    st = ts.__getitem__(0, rng=np.random.default_rng(0))
    assert st["image"].shape == (32, 32, 3)


def test_rle_decode_forms():
    # uncompressed: 64x64, first 50 cols 0, then 4 cols 1 (column-major)
    m = _decode_rle([64 * 50, 64 * 4, 64 * 10], 64, 64)
    assert m.shape == (64, 64)
    assert (m[:, :50] == 0).all() and (m[:, 50:54] == 1).all() \
        and (m[:, 54:] == 0).all()
    # compressed string round-trip (cocoapi char encoding)
    def encode(counts):
        s = []
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)
                            or x == -1 and (c & 0x10))
                if more:
                    c |= 0x20
                s.append(chr(c + 48))
        return "".join(s)
    counts = [5, 300, 2, 61, 8, 100]
    assert _rle_counts_from_string(encode(counts)) == counts


def test_coco_dataset(tmp_path):
    root = str(tmp_path)
    make_coco(root)
    args = Args(data_root=root, dataset="coco", base_size=48, crop_size=32)
    ds = COCOSegmentation(args, split="train")
    assert len(ds) == 3                     # all qualify (>1000 px polygon)
    assert os.path.exists(os.path.join(root, "coco", "annotations",
                                       "train_ids_2017.npy"))
    # mask semantics on the raw generator: polygon paints class 1,
    # RLE strip paints class 2 only where still empty, cat 99 skipped
    mask = ds._gen_seg_mask(ds.anns_by_img[0], 64, 64)
    assert set(np.unique(mask)) <= {0, 1, 2}
    assert mask[20, 20] == 1                # inside polygon
    assert mask[0, 52] == 2                 # RLE strip outside polygon
    assert mask[2, 2] == 0                  # cat 99 region skipped
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert s["image"].shape == (32, 32, 3)
    # ids cache is honored on reload
    ds2 = COCOSegmentation(args, split="train")
    assert ds2.ids == ds.ids


def test_make_data_loader_pascal(tmp_path):
    root = str(tmp_path)
    make_voc(root, ["a", "b"], ["v"])
    make_sbd(root, ["c"])
    args = Args(data_root=root, base_size=32, crop_size=24, use_sbd=True,
                batch_size=2)
    train, val, test, nclass = make_data_loader(args)
    assert nclass == 21 and test is None
    batch = next(iter(train))
    assert batch["image"].shape == (2, 24, 24, 3)
    assert batch["label"].shape == (2, 24, 24)


def test_make_data_loader_multiprocess_drops_eval_tail(tmp_path, monkeypatch):
    """Under multi-process DP the val loader must drop a tail batch (it can
    neither be process-sharded evenly nor replicated from process-local
    data) — single-process keeps the reference's full-coverage
    drop_last=False."""
    root = str(tmp_path)
    make_voc(root, ["a", "b", "c"], ["v", "w", "x"])   # val size 3
    args = Args(data_root=root, base_size=32, crop_size=24, use_sbd=False,
                batch_size=2)
    _, val_single, _, _ = make_data_loader(args)
    assert val_single.drop_last is False and len(val_single) == 2

    import jax as _jax
    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    monkeypatch.setattr(_jax, "process_index", lambda: 0)
    train, val, _, _ = make_data_loader(args)
    assert val.drop_last is True and len(val) == 1     # 3-sample val, tail dropped
    assert train.drop_last is True


def test_calculate_weights_labels(tmp_path):
    from seg2eye_tpu.segtrain.weights import calculate_weights_labels
    batches = [{"label": np.array([[0, 0, 1, 255]], np.float32)},
               {"label": np.array([[1, 1, 2, 300]], np.float32)}]
    w = calculate_weights_labels(str(tmp_path), "pascal", batches, 3)
    z = np.array([2, 3, 1], np.float64)
    want = 1.0 / np.log(1.02 + z / z.sum())   # calculate_weights.py:20-25
    np.testing.assert_allclose(w, want)
    cached = np.load(os.path.join(str(tmp_path),
                                  "pascal_classes_weights.npy"))
    np.testing.assert_allclose(cached, want)


def test_cli_defaults_per_dataset():
    """train.py:250-290 auto defaults."""
    from seg2eye_tpu.segtrain.trainer import build_argparser, finalize_args
    n = jax.device_count()
    args = finalize_args(build_argparser().parse_args(
        ["--dataset", "pascal"]))
    assert args.epochs == 50 and args.batch_size == 4 * n
    assert np.isclose(args.lr, 0.007 / (4 * n) * args.batch_size)
    assert args.checkname == "deeplab-resnet"
    args = finalize_args(build_argparser().parse_args(
        ["--dataset", "cityscapes", "--backbone", "mobilenet",
         "--batch-size", "16"]))
    assert args.epochs == 200 and args.batch_size == 16
    assert np.isclose(args.lr, 0.01 / (4 * n) * 16)
    assert args.checkname == "deeplab-mobilenet"


# --------------------------------------------------------------------- #
# trainer end-to-end
# --------------------------------------------------------------------- #

@pytest.fixture
def voc_env(tmp_path, monkeypatch):
    root = str(tmp_path / "data")
    make_voc(root, ["a", "b", "c", "d"], ["v1", "v2"], h=40, w=40)
    monkeypatch.chdir(tmp_path)            # Saver writes ./run/...
    return root


def _tiny_args(root, **kw):
    base = dict(data_root=root, base_size=40, crop_size=32, batch_size=2,
                epochs=2, lr=0.01)
    base.update(kw)
    return Args(**base)


def test_trainer_end_to_end(voc_env):
    from seg2eye_tpu.segtrain.trainer import SegTrainer
    t = SegTrainer(_tiny_args(voc_env))
    loss0 = t.training(0)
    assert np.isfinite(loss0)
    miou = t.validation(0)
    assert 0.0 <= miou <= 1.0
    # best checkpoint artifacts (saver.py parity)
    exp = t.saver.experiment_dir
    assert os.path.exists(os.path.join(exp, "checkpoint.ckpt"))
    assert os.path.exists(os.path.join(exp, "best_pred.txt"))
    assert os.path.exists(os.path.join("run", "pascal", "deeplab-test",
                                       "model_best.ckpt"))
    with open(os.path.join(exp, "parameters.txt")) as f:
        txt = f.read()
    assert txt.startswith("datset:pascal\n")         # reference typo kept
    assert "crop_size:32" in txt

    # resume restores epoch + best_pred (train.py:72-91)
    t2 = SegTrainer(_tiny_args(
        voc_env, resume=os.path.join(exp, "checkpoint.ckpt")))
    assert t2.args.start_epoch == 1
    assert np.isclose(t2.best_pred, t.best_pred)
    p0 = np.asarray(jax.tree_util.tree_leaves(t.state["params"])[0])
    q0 = np.asarray(jax.tree_util.tree_leaves(t2.state["params"])[0])
    np.testing.assert_array_equal(p0, q0)
    # --ft clears start_epoch and the optimizer
    t3 = SegTrainer(_tiny_args(
        voc_env, resume=os.path.join(exp, "checkpoint.ckpt"), ft=True))
    assert t3.args.start_epoch == 0


def test_trainer_bf16_precision(voc_env):
    """--precision bfloat16: convs compute bf16 (params/BN/loss f32), the
    loop trains and evaluates finite, and the trajectory stays near the f32
    run (TPU-native mixed precision; default float32 = reference parity)."""
    from seg2eye_tpu.segtrain.trainer import SegTrainer, build_argparser
    assert build_argparser().parse_args([]).precision == "float32"
    t16 = SegTrainer(_tiny_args(voc_env, precision="bfloat16",
                                checkname="deeplab-bf16"))
    t32 = SegTrainer(_tiny_args(voc_env, checkname="deeplab-f32"))
    l16, l32 = t16.training(0), t32.training(0)
    assert np.isfinite(l16) and np.isfinite(l32)
    assert abs(l16 - l32) < 0.1 * abs(l32) + 0.05, (l16, l32)
    miou = t16.validation(0)
    assert 0.0 <= miou <= 1.0


def test_trainer_balanced_weights_wiring(voc_env):
    """--use-balanced-weights computes + caches the class weights and bakes
    them into the criterion (train.py:46-57)."""
    from seg2eye_tpu.segtrain.trainer import SegTrainer
    t = SegTrainer(_tiny_args(voc_env, use_balanced_weights=True))
    path = os.path.join(voc_env, "VOCdevkit", "VOC2012",
                        "pascal_classes_weights.npy")
    assert os.path.exists(path)
    w = np.load(path)
    assert w.shape == (21,) and (w > 0).all()
    # second construction loads the cache instead of recomputing
    t2 = SegTrainer(_tiny_args(voc_env, use_balanced_weights=True))
    assert t2.criterion.__self__.weight is not None


def test_trainer_no_val_checkpoints_every_epoch(voc_env):
    from seg2eye_tpu.segtrain.trainer import SegTrainer
    t = SegTrainer(_tiny_args(voc_env, no_val=True))
    t.training(0)
    assert os.path.exists(os.path.join(t.saver.experiment_dir,
                                       "checkpoint.ckpt"))
    assert not os.path.exists(os.path.join(t.saver.experiment_dir,
                                           "best_pred.txt"))


def test_trainer_dp_matches_single_device(tmp_path, monkeypatch):
    """One epoch of data-parallel training over the 8-device mesh produces
    the same loss as the single-device run (GSPMD BN-sync + gradient psum
    replace torch DataParallel + SyncBN, train.py:66-70)."""
    import seg2eye_tpu.segtrain.trainer as trainer_mod
    root = str(tmp_path / "data")
    make_voc(root, [f"t{i}" for i in range(8)], ["v1"], h=40, w=40)
    monkeypatch.chdir(tmp_path)
    dp = trainer_mod.SegTrainer(_tiny_args(root, batch_size=8, epochs=1))
    assert dp.mesh is not None and dp.mesh.shape["data"] == 8
    monkeypatch.setattr(trainer_mod, "default_mesh", lambda bs: None)
    sd = trainer_mod.SegTrainer(_tiny_args(root, batch_size=8, epochs=1))
    assert sd.mesh is None
    l_dp = dp.training(0)
    l_sd = sd.training(0)
    assert np.isclose(l_dp, l_sd, rtol=2e-4), (l_dp, l_sd)


def test_trainer_nonprimary_host_writes_nothing(voc_env, monkeypatch):
    """Host-0 convention under multi-host DP (trainer.py): a non-primary
    SegTrainer must not write parameters.txt or checkpoints and its TB
    writer no-ops, but it still trains and tracks best_pred (so every
    process agrees on is_best decisions)."""
    import jax as _jax
    monkeypatch.setattr(_jax, "process_index", lambda: 1)
    from seg2eye_tpu.segtrain.trainer import SegTrainer
    t = SegTrainer(_tiny_args(voc_env))
    assert t._primary is False and t.writer.writer is None
    assert t.saver is None
    # the strong invariant: a non-primary process creates NO run directory
    # at all (a Saver glob-then-mkdir would race host 0's run-id derivation
    # and leave ghost experiment_N dirs) and opens no event file
    assert not os.path.exists("run")
    t.training(0)
    miou = t.validation(0)
    assert t.best_pred == miou
    assert not os.path.exists("run")
