#!/usr/bin/env python3
"""Build the nearest-neighbor style-ranking H5 (distances_and_indices).

The reference CONSUMES a precomputed similarity ranking
('0910_deeplab_top_image_indices_for_marcel.h5', options/base_options.py:54-57
and refinenet/dataset.py:88-105) but never shipped the code that builds it.
This tool closes that gap: for every labeled target image it ranks the same
user's unlabeled style images (generative + sequence subsets) by segmentation
-mask similarity, the criterion described in the paper (nearest neighbor in
mask space).

Inputs: the packed data H5 (prepare_openeds.py) and the predicted-mask H5s
from refinenet/evaluate_segnet.py (gen + seq). Output schema matches the
reference consumer exactly:

    <out.h5>/<split>/<user>/<target filename>/index   (R,) int64
    <out.h5>/<split>/<user>/<target filename>/subset  (R,) S1  b'g'|b's'
    (sequence indices offset by the user's generative count,
     openeds_dataset.py:195-199)

Distance: mean squared difference between downsampled colorized masks
(in-graph, batched over all candidates of a user at once).

    python tools/build_style_ranking.py --dataroot data.h5 \
        --segmentations_generative segs_gen.h5 --segmentations_sequence segs_seq.h5 \
        --out distances_and_indices.h5 [--splits train,validation] [--top_k 100]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import h5py                                                # noqa: E402
import jax                                                 # noqa: E402
import jax.numpy as jnp                                    # noqa: E402
import numpy as np                                         # noqa: E402

from seg2eye_tpu.data.schema import split_keys             # noqa: E402
from seg2eye_tpu.ops.image import colorize_segmap, resize_nearest  # noqa: E402


@jax.jit
def _mask_distances(target_mask, candidate_masks):
    """target (H,W) int, candidates (N,H,W) int -> (N,) mse over colorized
    64x64-downsampled masks."""
    t = colorize_segmap(target_mask)[None, ..., None]
    c = colorize_segmap(candidate_masks)[..., None]
    t = resize_nearest(t, 64, 64)[..., 0]
    c = resize_nearest(c, 64, 64)[..., 0]
    d = (c - t) ** 2
    return jnp.mean(d.reshape(d.shape[0], -1), axis=1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--segmentations_generative", required=True)
    p.add_argument("--segmentations_sequence", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--splits", default="train,validation,test")
    p.add_argument("--top_k", type=int, default=0, help="0 = keep all")
    a = p.parse_args(argv)

    data = h5py.File(a.dataroot, "r")
    segs_gen = h5py.File(a.segmentations_generative, "r")
    segs_seq = h5py.File(a.segmentations_sequence, "r") \
        if a.segmentations_sequence else None

    with h5py.File(a.out, "w") as out:
        for split in a.splits.split(","):
            if split not in data:
                continue
            keys = split_keys(split)
            for user in data[split].keys():
                grp = data[split][user]
                if split not in segs_gen or user not in segs_gen[split]:
                    continue
                cand_masks = [np.asarray(segs_gen[split][user])]
                n_gen = cand_masks[0].shape[0]
                subsets = [np.full(n_gen, b"g", dtype="S1")]
                offsets = [np.arange(n_gen)]
                if segs_seq is not None and split in segs_seq and \
                        user in segs_seq[split]:
                    seq = np.asarray(segs_seq[split][user])
                    cand_masks.append(seq)
                    subsets.append(np.full(seq.shape[0], b"s", dtype="S1"))
                    # seq ranking indices are offset by the gen count
                    offsets.append(np.arange(seq.shape[0]) + n_gen)
                cand = jnp.asarray(np.concatenate(cand_masks))
                subset_all = np.concatenate(subsets)
                index_all = np.concatenate(offsets)

                labels = np.asarray(grp[keys["labels"]])
                # group names must match the CONSUMER's lookup source
                # (RefineNetDataset reads labels_{ss,gen}_filenames,
                # refinenet/dataset.py __getitem__) and be index-aligned
                # with `labels` — images_ss_filenames is neither: it only
                # coincides for exactly-12-char OpenEDS ids (S13 truncation
                # accident) and can be shorter when prep dropped unreadable
                # images
                fname_key = keys["labels"] + "_filenames"
                fnames = [f.decode("utf-8").replace(".", "")
                          for f in grp[fname_key][:]]
                assert len(fnames) == labels.shape[0], \
                    (user, fname_key, len(fnames), labels.shape[0])
                for i, fname in enumerate(fnames):
                    d = np.asarray(_mask_distances(jnp.asarray(labels[i]),
                                                   cand))
                    order = np.argsort(d, kind="stable")
                    if a.top_k:
                        order = order[:a.top_k]
                    g = out.create_group(f"{split}/{user}/{fname}")
                    g.create_dataset("index",
                                     data=index_all[order].astype(np.int64))
                    g.create_dataset("subset", data=subset_all[order])
                    g.create_dataset("distance",
                                     data=d[order].astype(np.float32))
                print(f"{split}/{user}: ranked {len(fnames)} targets over "
                      f"{cand.shape[0]} candidates")
    print("wrote", a.out)


if __name__ == "__main__":
    main()
