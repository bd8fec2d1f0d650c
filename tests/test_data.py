"""Data pipeline tests against the documented H5 schema (SURVEY §2 C17/C20)."""
import numpy as np
import pytest

from seg2eye_tpu.data import schema
from seg2eye_tpu.data.loader import (DataLoader, create_dataloader,
                                     create_inference_dataloader)
from seg2eye_tpu.data.openeds import OpenEDSDataset
from seg2eye_tpu.options import Options


@pytest.fixture(scope="module")
def h5_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("openeds")
    data = schema.write_synthetic_h5(str(d / "data.h5"), h=64, w=40)
    ref = schema.write_synthetic_style_ref(str(d / "ref.h5"), data,
                                           use_subsets=True)
    return data, ref


def opt_for(data, **kw):
    base = dict(dataroot=data, crop_size=32, aspect_ratio=1.0, input_ns=2,
                batchSize=2, isTrain=True, seed=3)
    base.update(kw)
    return Options(**base).finalize()


def test_index_and_len(h5_paths):
    data, _ = h5_paths
    ds = OpenEDSDataset(opt_for(data), dataset_key="train")
    assert len(ds) == 6            # 2 users x 3 labeled each
    assert ds.N_start == [0, 3]
    assert ds._locate(0) == ("U001", 0)
    assert ds._locate(3) == ("U002", 0)
    assert ds._locate(5) == ("U002", 2)


def test_getitem_shapes_and_ranges(h5_paths):
    data, _ = h5_paths
    opt = opt_for(data)
    ds = OpenEDSDataset(opt, dataset_key="train")
    rng = np.random.default_rng(0)
    item = ds.__getitem__(1, rng=rng)
    assert item["label"].shape == (32, 32) and item["label"].dtype == np.uint8
    assert set(np.unique(item["label"])) <= {0, 1, 2, 3}
    assert item["style_image"].shape == (2, 32, 32, 1)
    assert item["target"].shape == (32, 32, 1)
    # default transport is uint8 (opt.device_normalize); normalization to
    # [-1,1] runs in-graph with the identical formula
    assert item["target"].dtype == np.uint8
    assert item["style_image"].dtype == np.uint8
    f32 = OpenEDSDataset(opt_for(data, device_normalize=False),
                         dataset_key="train"
                         ).__getitem__(1, rng=np.random.default_rng(0))
    assert f32["target"].dtype == np.float32
    assert f32["target"].min() >= -1 and f32["target"].max() <= 1
    np.testing.assert_allclose(
        (item["target"].astype(np.float32) / 255.0 - 0.5) / 0.5,
        f32["target"], atol=1e-6)
    np.testing.assert_allclose(
        (item["style_image"].astype(np.float32) / 255.0 - 0.5) / 0.5,
        f32["style_image"], atol=1e-6)
    # target_original stays at native fixture res
    assert item["target_original"].shape == (64, 40, 1)
    assert item["user"] == "U001"


def test_test_split_keys(h5_paths):
    data, _ = h5_paths
    opt = opt_for(data, dataset_key="test", isTrain=False, no_flip=True,
                  serial_batches=True)
    ds = OpenEDSDataset(opt)
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert "target" not in item          # no ground truth on test
    assert item["style_image"].shape == (2, 32, 32, 1)


def test_style_sampling_methods(h5_paths):
    data, ref = h5_paths
    rng = np.random.default_rng(0)
    # first: deterministic (disable flip so the rng only affects sampling)
    ds = OpenEDSDataset(opt_for(data, style_sample_method="first",
                                no_flip=True), "train")
    a = ds.__getitem__(0, rng=np.random.default_rng(1))
    b = ds.__getitem__(0, rng=np.random.default_rng(2))
    np.testing.assert_array_equal(a["style_image"], b["style_image"])
    # ref_first: uses ranking file, spans gen+seq subsets
    ds2 = OpenEDSDataset(opt_for(data, style_sample_method="ref_first",
                                 style_ref=ref), "train")
    item = ds2.__getitem__(0, rng=rng)
    assert item["style_image"].shape == (2, 32, 32, 1)
    # ref_random4
    ds3 = OpenEDSDataset(opt_for(data, style_sample_method="ref_random4",
                                 style_ref=ref), "train")
    item3 = ds3.__getitem__(0, rng=rng)
    assert item3["style_image"].shape == (2, 32, 32, 1)
    # missing ref file -> clear error
    ds4 = OpenEDSDataset(opt_for(data, style_sample_method="ref_first"),
                         "train")
    with pytest.raises(AssertionError):
        ds4.__getitem__(0, rng=rng)


def test_flip_consistency(h5_paths):
    """Flip must apply to label, style, target AND target_original together."""
    data, _ = h5_paths
    opt = opt_for(data)
    ds = OpenEDSDataset(opt, dataset_key="train")

    # find rngs producing flip=True and flip=False (via get_params itself:
    # the crop-position draws consume seed-dependent amounts of entropy, so
    # the flip coin is not simply the generator's first draw)
    from seg2eye_tpu.data import transforms

    def item_with(flip):
        for s in range(50):
            p = transforms.get_params(opt, np.random.default_rng(s),
                                      size=(64, 40))
            if p["flip"] == flip:
                return ds.__getitem__(0, rng=np.random.default_rng(s))
        raise AssertionError
    it_f = item_with(True)
    it_n = item_with(False)
    np.testing.assert_array_equal(it_f["label"], it_n["label"][:, ::-1])
    np.testing.assert_array_equal(it_f["target_original"][:, :, 0],
                                  it_n["target_original"][:, ::-1, 0])


def test_dataloader_batching(h5_paths):
    data, _ = h5_paths
    opt = opt_for(data)
    dl = create_dataloader(opt)
    assert len(dl) == 3            # 6 samples / bs 2, drop_last
    batches = list(iter(dl))
    assert len(batches) == 3
    b = batches[0]
    assert b["label"].shape == (2, 32, 32)
    assert b["style_image"].shape == (2, 2, 32, 32, 1)
    assert len(b["filename"]) == 2
    # shuffling differs across epochs
    order1 = [f for bt in batches for f in bt["filename"]]
    order2 = [f for bt in iter(dl) for f in bt["filename"]]
    assert sorted(order1) == sorted(order2)


def test_inference_dataloader_clone(h5_paths):
    data, _ = h5_paths
    dl = create_inference_dataloader(opt_for(data))
    assert dl.dataset.dataset_key == "validation"
    assert dl.shuffle is False and dl.drop_last is False
    item = dl.get_particular(2)
    assert item["label"].shape == (1, 32, 32)


def test_validation_indices(h5_paths):
    data, _ = h5_paths
    ds = OpenEDSDataset(opt_for(data), dataset_key="train")
    assert ds.get_validation_indices() == [0, 3, 2, 5]


def test_resize_cache_identical(h5_paths):
    """The host ResizeCache is semantics-neutral: cached and uncached
    datasets yield bit-identical items (incl. under flips), and repeat
    epochs hit the cache."""
    data, _ = h5_paths
    on = OpenEDSDataset(opt_for(data, host_cache_mb=64), dataset_key="train")
    off = OpenEDSDataset(opt_for(data, host_cache_mb=0), dataset_key="train")
    assert on._cache is not None and off._cache is None
    for epoch in range(2):
        for i in range(len(on)):
            a = on.__getitem__(i, rng=np.random.default_rng(100 + i))
            b = off.__getitem__(i, rng=np.random.default_rng(100 + i))
            for k in ("label", "style_image", "target", "target_original"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert on._cache.hits > 0
    # eviction respects the byte cap
    assert on._cache.size <= 64 << 20


def test_resize_cache_disabled_outside_fixed(h5_paths):
    data, _ = h5_paths
    ds = OpenEDSDataset(opt_for(data, preprocess_mode="scale_width",
                                load_size=32, host_cache_mb=64),
                        dataset_key="train")
    assert ds._cache is None


def test_get_params_swapped_source_size_and_clamped_crop(h5_paths):
    """Reference quirk (openeds_dataset.py:89): mask.shape — (H,W) — feeds
    get_params' ``w, h = size`` unpack, so *_and_crop position domains come
    from a TRANSPOSED source size; and where that would push the crop out of
    the resized extent (PIL pads black in the reference), our slice clamps
    to a full-size in-bounds crop (PARITY.md "swapped crop domain")."""
    from seg2eye_tpu.data import transforms

    data, _ = h5_paths
    opt = opt_for(data, preprocess_mode="scale_width_and_crop",
                  load_size=48, crop_size=32, no_flip=True)
    ds = OpenEDSDataset(opt, dataset_key="train")
    # native fixture is H=64, W=40: the swap makes get_params treat
    # w=64, h=40 -> new_h = 48*40//64 = 30 < crop 32 -> y domain = {0},
    # x domain = [0, 48-32]; the ACTUAL resized extent is 48 x 76
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["label"].shape[:2] == (32, 32)      # clamped, full-size

    rng = np.random.default_rng(1)
    for _ in range(8):
        p = transforms.get_params(opt, rng, size=(64, 40))   # (H,W) swap
        x, y = p["crop_pos"]
        assert y == 0 and 0 <= x <= 48 - 32
