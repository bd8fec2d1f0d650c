"""Property-based tests (hypothesis) of host-side invariants that example
tests cannot sweep: the N_start flat-index bijection, multi-process loader
partitioning, ResizeCache byte accounting, transform involutions, and the
OpenEDS metric formula.  All CPU-only, small shapes, bounded example counts
(the suite must stay fast)."""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from seg2eye_tpu.data import transforms
from seg2eye_tpu.data.loader import DataLoader
from seg2eye_tpu.data.openeds import OpenEDSDataset
from seg2eye_tpu.options import Options

FAST = settings(max_examples=25, deadline=None)


def tiny_opt(**kw):
    base = dict(crop_size=32, aspect_ratio=1.0, isTrain=True)
    base.update(kw)
    return Options(**base).finalize()


# --------------------------------------------------------------------- #
# N_start prefix-table indexing (openeds.py _locate; reference
# openeds_dataset.py:52-80)
# --------------------------------------------------------------------- #

def _fake_dataset(sizes):
    """OpenEDSDataset skeleton with only the index-table attributes set."""
    ds = object.__new__(OpenEDSDataset)
    ds.user_ids = [f"u{i}" for i in range(len(sizes))]
    ds.N_start = list(np.cumsum([0] + list(sizes[:-1])).astype(int))
    ds.N = int(np.sum(sizes))
    return ds


@FAST
@given(st.lists(st.integers(0, 7), min_size=1, max_size=9))
def test_locate_is_a_bijection(sizes):
    """Every flat index maps to exactly one (user, within) pair with
    within < that user's size — including empty users anywhere in the
    order (duplicate N_start entries)."""
    ds = _fake_dataset(sizes)
    seen = set()
    for idx in range(ds.N):
        user, within = ds._locate(idx)
        u = ds.user_ids.index(user)
        assert 0 <= within < sizes[u], (idx, user, within, sizes)
        seen.add((u, within))
    assert len(seen) == ds.N
    assert seen == {(u, i) for u, s in enumerate(sizes) for i in range(s)}


# --------------------------------------------------------------------- #
# multi-process loader partitioning (loader.py _load)
# --------------------------------------------------------------------- #

class _IdxDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        return {"idx": np.array([i])}


@FAST
@given(n=st.integers(1, 40), pc=st.sampled_from([1, 2, 4]),
       per=st.integers(1, 3), shuffle=st.booleans(),
       seed=st.integers(0, 3))
def test_process_shards_partition_the_global_batch(n, pc, per, shuffle, seed):
    """Concatenating the per-process local shards of every batch
    reconstructs exactly the single-process loader's global batches (same
    seed -> same epoch permutation on every process)."""
    bs = pc * per
    if n < bs:
        return                          # zero batches with drop_last
    def run(pi, count):
        dl = DataLoader(_IdxDataset(n), batch_size=bs, shuffle=shuffle,
                        drop_last=True, seed=seed, prefetch=0,
                        process_index=pi, process_count=count)
        return [b["idx"][:, 0].tolist() for b in dl]
    global_batches = run(0, 1)
    sharded = [run(pi, pc) for pi in range(pc)]
    assert all(len(s) == len(global_batches) for s in sharded)
    for bi, gb in enumerate(global_batches):
        assert sum((sharded[pi][bi] for pi in range(pc)), []) == gb
    # every global batch is full-size and indices are unique across an epoch
    flat = sum(global_batches, [])
    assert len(set(flat)) == len(flat) == (n // bs) * bs


# --------------------------------------------------------------------- #
# ResizeCache byte accounting (transforms.py)
# --------------------------------------------------------------------- #

@FAST
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(1, 64)),
                min_size=1, max_size=40),
       st.integers(0, 1))
def test_resize_cache_accounting_invariants(ops, limit_kb):
    """After any access sequence: ``size`` equals the exact sum of stored
    bytes (no drift from racing double-inserts or evictions), and either
    the cap holds or the cache is empty (a single over-cap item evicts
    itself)."""
    cache = transforms.ResizeCache(0)
    cache.limit = limit_kb << 10        # sub-MB caps for the test
    for key, kb in ops:
        # key on (key, kb): in real use the key determines the content, so
        # the same key never maps to two different payload sizes (a hit on
        # a repeated key legitimately returns the first payload)
        v = cache.get((key, kb), lambda kb=kb: np.zeros(kb << 10, np.uint8))
        assert v.nbytes == kb << 10
        assert cache.size == sum(a.nbytes for a in cache._d.values())
        assert cache.size <= cache.limit or not cache._d
    assert cache.hits + cache.misses == len(ops)


# --------------------------------------------------------------------- #
# transform involutions / invariants (transforms.py)
# --------------------------------------------------------------------- #

@FAST
@given(h=st.integers(8, 70), w=st.integers(8, 70), seed=st.integers(0, 99))
def test_flip_commutes_with_fixed_transform(h, w, seed):
    """flip happens AFTER the resize, so transform(img, flip=True) equals
    the unflipped output mirrored along W — for any source size."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    opt = tiny_opt()
    a = transforms.transform_image(img, opt, {"crop_pos": (0, 0),
                                              "flip": False})
    b = transforms.transform_image(img, opt, {"crop_pos": (0, 0),
                                              "flip": True})
    assert a.shape == (opt.image_height, opt.image_width, 1)
    np.testing.assert_array_equal(b, a[:, ::-1])
    assert a.min() >= -1.0 and a.max() <= 1.0


@FAST
@given(h=st.integers(8, 70), w=st.integers(8, 70), seed=st.integers(0, 99),
       nlabels=st.integers(1, 4))
def test_mask_transform_preserves_label_set(h, w, seed, nlabels):
    """Nearest-neighbor mask resize never invents class ids (the reference
    keeps masks uint8 through cv2 INTER_NEAREST, openeds_dataset.py:89-94)."""
    rng = np.random.default_rng(seed)
    mask = rng.integers(0, nlabels, (h, w), dtype=np.uint8)
    opt = tiny_opt()
    out = transforms.transform_mask(mask, opt, {"crop_pos": (0, 0),
                                                "flip": False})
    assert out.shape == (opt.image_height, opt.image_width)
    assert out.dtype == np.uint8
    assert set(np.unique(out)) <= set(np.unique(mask))


@FAST
@given(w=st.integers(16, 120), h=st.integers(16, 120),
       mode=st.sampled_from(["fixed", "resize_and_crop",
                             "scale_width_and_crop",
                             "scale_shortside_and_crop"]),
       seed=st.integers(0, 9), no_flip=st.booleans())
def test_get_params_crop_within_resized_canvas(w, h, mode, seed, no_flip):
    """Crop positions stay inside the post-resize canvas for every mode and
    source size; --no_flip forces flip=False (base_dataset.py:25-47)."""
    opt = tiny_opt(preprocess_mode=mode, load_size=48, no_flip=no_flip)
    params = transforms.get_params(opt, np.random.default_rng(seed),
                                   size=(w, h))
    new_w, new_h = w, h
    if mode == "resize_and_crop":
        new_w = new_h = opt.load_size
    elif mode == "scale_width_and_crop":
        new_w, new_h = opt.load_size, opt.load_size * h // w
    elif mode == "scale_shortside_and_crop":
        ss, ls = min(w, h), max(w, h)
        ls = int(opt.load_size * ls / ss)
        new_w, new_h = (ss, ls) if w == ss else (ls, ss)
    x, y = params["crop_pos"]
    assert 0 <= x <= max(0, new_w - opt.crop_size)
    assert 0 <= y <= max(0, new_h - opt.crop_size)
    if no_flip:
        assert params["flip"] is False


# --------------------------------------------------------------------- #
# OpenEDS metric formula (ops/metrics.py; reference loss.py:102-111,
# 158-174)
# --------------------------------------------------------------------- #

@FAST
@given(seed=st.integers(0, 999))
def test_openeds_metric_matches_direct_formula(seed):
    from seg2eye_tpu.ops import metrics
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (3, 6, 5, 1)).astype(np.float32)
    b = rng.integers(0, 256, (3, 6, 5, 1)).astype(np.float32)
    got = np.asarray(metrics.mse_for_images(a, b))
    want = np.sqrt(((a - b) ** 2).sum(axis=(1, 2, 3))) / (6 * 5)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    stats = metrics.error_statistics(got, "full", "validation")
    np.testing.assert_allclose(stats["mse/validation/full/relative"],
                               got.mean() * 1471, rtol=1e-6)
