"""OpenEDS H5 dataset (host side).

Parity notes (reference: data/openeds_dataset.py):
  * Flattened index -> (user, within-index) via the N_start prefix table
    (openeds_dataset.py:52-80).
  * Split-dependent key selection (openeds_dataset.py:44-48).
  * Style sampling methods random / first / ref_first / ref_randomN, the
    ref_* methods joining a precomputed similarity-ranking H5 that may span
    the generative+sequence subsets (openeds_dataset.py:150-209).
  * Filenames have stray dots removed (openeds_dataset.py:97-99).
  * Returns {label, filename, user, style_image[k], target, target_original}
    (openeds_dataset.py:103-118); target_original is the unresized native
    image, flipped consistently with the transform.

Randomness is explicit: every stochastic call takes a numpy Generator
(SURVEY §5.2 — the reference used global np.random/random state).
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional

import h5py
import numpy as np

from seg2eye_tpu.data import schema, transforms


class OpenEDSDataset:
    def __init__(self, opt, dataset_key: Optional[str] = None):
        self.opt = opt
        self.dataset_key = dataset_key or opt.dataset_key
        self.root = opt.dataroot
        self.keys = schema.split_keys(self.dataset_key)
        self._h5 = None
        self._style_refs = None
        # deterministic-resize LRU (see transforms.ResizeCache): only the
        # 'fixed' hot path caches; 0 MB disables
        mb = getattr(opt, "host_cache_mb", 0)
        self._cache = (transforms.ResizeCache(mb)
                       if mb and opt.preprocess_mode == "fixed" else None)

        with h5py.File(self.root, "r") as f:
            grp = f[self.dataset_key]
            self.user_ids = list(grp.keys())
            self.N = 0
            self.N_start: List[int] = []
            for user in self.user_ids:
                self.N_start.append(self.N)
                if self.keys["filenames"] in grp[user]:
                    self.N += grp[user][self.keys["filenames"]].shape[0]

    # lazy per-worker/thread open (openeds_dataset.py:23-34)
    @property
    def h5(self):
        if self._h5 is None:
            self._h5 = h5py.File(self.root, "r")
        return self._h5[self.dataset_key]

    @property
    def style_refs(self):
        if self._style_refs is None:
            assert self.opt.style_ref, \
                "You need to provide a h5 file for style references."
            self._style_refs = h5py.File(self.opt.style_ref, "r")
        return self._style_refs[self.dataset_key]

    def __len__(self) -> int:
        return self.N

    def _locate(self, index: int):
        idx_user = int(np.searchsorted(np.asarray(self.N_start), index,
                                       side="right") - 1)
        return self.user_ids[idx_user], index - self.N_start[idx_user]

    # ------------------------------------------------------------------ #
    def _sample_style_idx(self, n_images: int, n: int,
                          rng: np.random.Generator, user: str,
                          filename: str):
        """(openeds_dataset.py:150-188)"""
        method = self.opt.style_sample_method
        subsets = None
        if method == "random":
            indices = rng.choice(n_images, n)
        elif method == "first":
            indices = list(range(min(n, n_images)))
        elif "ref" in method:
            node = self.style_refs[user][filename]
            use_seq = "subset" in node.keys()
            all_indices = node["index"]
            all_subsets = node["subset"] if use_seq else None
            if "random" in method:
                digits = re.sub(r"[^\d]", "", method)
                reduced_n = int(digits) if digits else 40
                to_select = rng.choice(reduced_n, n)
                indices = [all_indices[int(i)] for i in to_select]
                if use_seq:
                    subsets = [all_subsets[int(i)] for i in to_select]
            else:
                indices = list(all_indices[:n])
                if use_seq:
                    subsets = list(all_subsets[:n])
        else:
            raise ValueError(f"Invalid style sampling method: {method}")
        return list(indices), subsets

    def get_style_images(self, user: str, n: int, params: Dict,
                         rng: np.random.Generator, filename: str) -> np.ndarray:
        grp = self.h5[user]
        key_style = self.keys["style_images"]
        n_images = grp[key_style].shape[0]
        selected, subsets = self._sample_style_idx(n_images, n, rng, user,
                                                   filename)
        subset_keys = {b"g": key_style, b"s": "images_seq"}
        images = []
        for i, sel in enumerate(selected):
            key = subset_keys[subsets[i]] if subsets is not None else key_style
            sel = int(sel)
            if key == "images_seq":
                # seq ranking indices are offset by the gen count
                # (openeds_dataset.py:195-199)
                sel = sel - n_images
            if self._cache is not None:
                images.append(self._cache.get(
                    (user, key, sel),
                    lambda g=grp, k=key, s=sel: transforms.resize_for_fixed(
                        np.asarray(g[k][s]), self.opt)))
            else:
                images.append(grp[key][sel])
        if self._cache is not None:
            if getattr(self.opt, "device_normalize", False):
                return transforms.assemble_u8(images,
                                              bool(params.get("flip")))
            from seg2eye_tpu import native
            return native.assemble_images(
                images, [bool(params.get("flip"))] * len(images))
        return transforms.transform_images_batch(images, self.opt, params)

    # ------------------------------------------------------------------ #
    def __getitem__(self, index: int,
                    rng: Optional[np.random.Generator] = None) -> Dict:
        rng = rng or np.random.default_rng()
        user, within = self._locate(index)
        grp = self.h5[user]
        mask = grp[self.keys["labels"]][within]
        # reference quirk, reproduced: openeds_dataset.py:89 passes
        # ``mask.shape`` — numpy (H, W) order — into get_params' ``w, h =
        # size`` unpack, so the *_and_crop position domains are computed
        # from a TRANSPOSED source size (biased crops; inert in the default
        # 'fixed' mode).  PARITY.md "swapped crop domain".
        params = transforms.get_params(self.opt, rng,
                                       size=tuple(mask.shape[:2]))

        filename = grp[self.keys["filenames"]][within].decode("utf-8")
        filename = re.sub(r"\.", "", filename)

        style = self.get_style_images(user, self.opt.input_ns, params, rng,
                                      filename)
        item = {
            "label": transforms.transform_mask(mask, self.opt, params),
            "filename": filename,
            "user": user,
            "style_image": style,
        }
        if self.dataset_key != "test":
            target = np.asarray(grp["images_ss"][within])
            dev_norm = getattr(self.opt, "device_normalize", False)
            if self._cache is not None:
                resized = self._cache.get(
                    (user, "images_ss", within),
                    lambda t=target: transforms.resize_for_fixed(t, self.opt))
                finish = (transforms.finish_image_u8 if dev_norm
                          else transforms.finish_image)
                item["target"] = finish(resized, params)
            elif dev_norm:
                out = transforms.spatial_image(target, self.opt, params)
                item["target"] = np.ascontiguousarray(out)[..., None]
            else:
                item["target"] = transforms.transform_image(target, self.opt,
                                                            params)
            orig = target[:, ::-1] if params["flip"] else target
            # uint8 transport (values are native 0..255 — exact); int32
            # mirrors the reference's default collate otherwise
            odt = np.uint8 if dev_norm else np.int32
            item["target_original"] = \
                np.ascontiguousarray(orig).astype(odt)[..., None]
        return item

    # ------------------------------------------------------------------ #
    def get_validation_indices(self) -> List[int]:
        """First and last index of each user (openeds_dataset.py:139-144)."""
        indices = list(self.N_start)
        indices += [idx - 1 for idx in self.N_start[1:]] + [self.N - 1]
        return indices

    def get_random_indices(self, n: int,
                           rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        return list(rng.choice(self.N, n))

    def close(self):
        if self._h5 is not None:
            self._h5.close()
        if self._style_refs is not None:
            self._style_refs.close()
        self._h5 = self._style_refs = None
