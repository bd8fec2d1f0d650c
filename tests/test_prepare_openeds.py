"""prepare_openeds builder test on a synthetic raw OpenEDS folder tree."""
import json
import os

import h5py
import numpy as np
import pytest

from seg2eye_tpu.data.prepare_openeds import OpenEDSPreparator

imageio = pytest.importorskip("imageio")


def make_raw_tree(root, users=("U1", "U2"), n_ss=2, n_gen=2, n_seq=1,
                  h=32, w=24):
    rng = np.random.default_rng(0)

    def write_pngs(folder, ids):
        os.makedirs(folder, exist_ok=True)
        for fid in ids:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            imageio.imwrite(os.path.join(folder, fid), img)

    def write_labels(folder, ids):
        os.makedirs(folder, exist_ok=True)
        for fid in ids:
            np.save(os.path.join(folder, fid[:-4] + ".npy"),
                    rng.integers(0, 4, (h, w)).astype(np.uint8))

    for subset in ("train", "validation", "test"):
        mapping = []
        for u in users:
            ss_ids = [f"{u}_ss_{i:04d}.png" for i in range(n_ss)]
            gen_ids = [f"{u}_g_{i:05d}.png" for i in range(n_gen)]
            seq_ids = [f"{u}_s_{i:05d}.png" for i in range(n_seq)]
            mapping.append({"id": u,
                            "semantic_segmenation_images": ss_ids,
                            "generative_images": gen_ids,
                            "sequence_images": seq_ids})
            ss = os.path.join(root, "Semantic_Segmentation_Dataset", subset)
            write_pngs(os.path.join(ss, "images"), ss_ids)
            write_labels(os.path.join(ss, "labels"), ss_ids)
            gen = os.path.join(root, "Generative_Dataset", subset)
            write_pngs(gen, gen_ids)
            if subset == "test":
                write_labels(os.path.join(gen, "labels"), gen_ids)
            write_pngs(os.path.join(root, "Sequence_Dataset", subset),
                       seq_ids)
        with open(os.path.join(
                root, f"OpenEDS_{subset}_userID_mapping_to_images.json"),
                "w") as f:
            json.dump(mapping, f)


def test_preparator_builds_schema(tmp_path):
    make_raw_tree(str(tmp_path))
    out = OpenEDSPreparator(str(tmp_path), n_jobs=2).run()
    with h5py.File(out, "r") as f:
        assert set(f.keys()) == {"train", "validation", "test"}
        tr = f["train"]["U1"]
        assert tr["images_ss"].shape == (2, 32, 24)
        assert tr["labels_ss"].shape == (2, 32, 24)
        assert tr["images_ss"].dtype == np.uint8
        assert set(tr.keys()) >= {"images_ss", "labels_ss", "images_gen",
                                  "images_seq", "images_ss_filenames",
                                  "labels_ss_filenames"}
        te = f["test"]["U1"]
        assert set(te.keys()) >= {"images_ss", "labels_gen",
                                  "labels_gen_filenames", "images_seq"}
        # filenames are the ids sans extension for images
        names = [n.decode() for n in tr["images_ss_filenames"][:]]
        assert names[0].startswith("U1_ss_")
