"""CLI dress rehearsal: the COMPLETE user journey, raw files to submission.

Every piece has its own test; this chains them exactly as a user would type
them (reference journey: README.md "Training/Testing" + refinenet/README.md
"Pipeline"), each stage a real subprocess of the real CLI:

  1. raw OpenEDS tree      (synthetic fixture, schema.write_synthetic_raw_tree)
  2. prepare_openeds.py    raw tree -> packed openeds.h5
  3. train.py              Seg2Eye GAN, a few steps, checkpoint saved
  4. test.py --produce_npy Seg2Eye predictions + manifest
  5. refinenet/train_segnet.py
  6. refinenet/evaluate_segnet.py  predicted-mask H5s (gen + seq)
  7. tools/build_style_ranking.py  NN style ranking H5
  8. refinenet/train_refinenet.py
  9. refinenet/evaluate_refinenet.py  submission npys + manifest
 10. tools/export_serving.py --verify            Seg2Eye AOT artifact
 11. tools/export_refinenet_serving.py --verify  RefineNet AOT artifact
 12. tools/export_refinenet_serving.py --verify  SegNet AOT artifact
 13. tools/export_torch_checkpoint.py  both trained checkpoints back to
     reference-format .pth/.pt (torch-loadable; strict-load vs the real
     reference modules is tools/check_reference_parity.py's job)

Asserts the final manifests and writes evidence/dress_rehearsal.json.
Tiny geometry + CPU so the whole chain runs in minutes on this host:

    python tools/dress_rehearsal.py [--workdir DIR] [--steps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY_SEG2EYE = ["--ngf", "4", "--ndf", "4", "--crop_size", "32",
                "--aspect_ratio", "1.0", "--w_dim", "8", "--input_ns", "2",
                "--compute_dtype", "float32", "--batchSize", "4"]
TINY_REFINENET = ["--input_width", "40", "--input_height", "64",
                  "--resnet_depth", "14", "--batch_size", "4",
                  "--test_batch_size", "4", "--test_num_samples", "8",
                  "--compute_dtype", "float32", "--prefetch", "0"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/dress_rehearsal")
    ap.add_argument("--steps", type=int, default=3,
                    help="train steps per training stage")
    ap.add_argument("--out", default="evidence/dress_rehearsal.json")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir (default: wiped first)")
    args = ap.parse_args()

    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, "tests",
                                                     ".jax_cache"),
           "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.1"}
    wd = os.path.abspath(args.workdir)
    if os.path.exists(wd) and not args.keep:
        shutil.rmtree(wd)
    os.makedirs(wd, exist_ok=True)

    stages = []

    def run(name: str, cmd: list, parse_output_dir: bool = False):
        print(f"=== {name}: {' '.join(cmd)}", file=sys.stderr)
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=REPO, env=env, text=True,
                              capture_output=True)
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        if proc.returncode != 0:
            raise SystemExit(f"stage '{name}' failed rc={proc.returncode}")
        stages.append({"stage": name, "cmd": " ".join(cmd),
                       "seconds": round(time.time() - t0, 1)})
        if parse_output_dir:
            m = re.search(r"^output_dir: (.+)$", proc.stdout, re.M)
            assert m, f"stage '{name}' printed no output_dir"
            return m.group(1).strip()
        return None

    # 1. raw tree (the form the challenge distributed)
    from seg2eye_tpu.data import schema
    raw = os.path.join(wd, "raw")
    schema.write_synthetic_raw_tree(raw, users=("U001", "U002"), n_ss=6,
                                    n_gen=6, n_seq=2, h=64, w=40,
                                    learnable=True)
    stages.append({"stage": "raw fixture", "cmd": "write_synthetic_raw_tree",
                   "seconds": 0.0})

    # 2. pack
    run("prepare_openeds", [sys.executable, "prepare_openeds.py",
                            "--base_path", raw, "--n_jobs", "2"])
    h5 = os.path.join(raw, "openeds.h5")
    assert os.path.exists(h5), h5

    # 3. Seg2Eye train
    ckpt = os.path.join(wd, "checkpoints")
    run("train.py", [sys.executable, "train.py", "--dataroot", h5,
                     "--name", "rehearsal", "--checkpoints_dir", ckpt,
                     "--niter", "1", "--max_steps", str(args.steps)]
        + TINY_SEG2EYE)

    # 3b. resume: the crash-recovery path users actually hit — reload the
    # checkpoint + iter.txt + optimizer state and continue under an
    # extended schedule (bitwise resumed-vs-unbroken trajectory equality is
    # asserted in tests/test_e2e.py::test_resume_trajectory_bitwise; this
    # exercises the same path through the real CLI chain)
    run("train.py --continue_train", [
        sys.executable, "train.py", "--dataroot", h5,
        "--name", "rehearsal", "--checkpoints_dir", ckpt,
        "--niter", "2", "--continue_train",
        "--max_steps", str(args.steps)] + TINY_SEG2EYE)

    # 4. Seg2Eye predictions (the reference's submission path, test.py:13-28)
    run("test.py", [sys.executable, "test.py", "--dataroot", h5,
                    "--name", "rehearsal", "--checkpoints_dir", ckpt,
                    "--load_from_opt_file", "--dataset_key", "validation",
                    "--produce_npy", "--how_many", "4"])
    s2e_manifest = os.path.join(ckpt, "rehearsal", "results", "validation",
                                "pred_npy_list.txt")
    assert os.path.exists(s2e_manifest), s2e_manifest
    n_s2e = sum(1 for line in open(s2e_manifest) if line.strip())

    # 5. SegNet train
    outputs = os.path.join(wd, "outputs")
    seg_out = run("train_segnet", [sys.executable,
                                   "refinenet/train_segnet.py",
                                   "--dataroot", h5,
                                   "--output_dir_base", outputs,
                                   "--max_steps", str(args.steps),
                                   "--test_every_n_steps", str(args.steps)]
                  + TINY_REFINENET, parse_output_dir=True)

    # 6. predicted masks for both unlabeled subsets
    segs_gen = os.path.join(wd, "segs_gen.h5")
    segs_seq = os.path.join(wd, "segs_seq.h5")
    run("evaluate_segnet gen", [sys.executable,
                                "refinenet/evaluate_segnet.py",
                                "--resume_from", seg_out, "--dataroot", h5,
                                "--output", segs_gen] + TINY_REFINENET)
    run("evaluate_segnet seq", [sys.executable,
                                "refinenet/evaluate_segnet.py",
                                "--resume_from", seg_out, "--dataroot", h5,
                                "--image_key", "images_seq",
                                "--output", segs_seq] + TINY_REFINENET)

    # 7. NN style ranking (the H5 the reference consumed but never shipped)
    ranking = os.path.join(wd, "ranking.h5")
    run("build_style_ranking", [sys.executable,
                                "tools/build_style_ranking.py",
                                "--dataroot", h5,
                                "--segmentations_generative", segs_gen,
                                "--segmentations_sequence", segs_seq,
                                "--out", ranking])

    # 8. RefineNet train
    join = ["--distances_and_indices", ranking,
            "--segmentations_train", segs_gen,
            "--segmentations_generative", segs_gen,
            "--segmentations_sequence", segs_seq]
    ref_out = run("train_refinenet", [sys.executable,
                                      "refinenet/train_refinenet.py",
                                      "--dataroot", h5,
                                      "--output_dir_base", outputs,
                                      "--max_steps", str(args.steps),
                                      "--test_every_n_steps",
                                      str(args.steps)]
                  + TINY_REFINENET + join, parse_output_dir=True)

    # 9. submission npys
    run("evaluate_refinenet", [sys.executable,
                               "refinenet/evaluate_refinenet.py",
                               "--resume_from", ref_out, "--dataroot", h5]
        + TINY_REFINENET + join)
    manifest = os.path.join(ref_out, "predictions", "pred_npy_list.txt")
    assert os.path.exists(manifest), manifest
    files = [line.strip() for line in open(manifest) if line.strip()]
    assert files, "empty submission manifest"
    import numpy as np
    arr = np.load(files[0])
    assert arr.dtype == np.uint8 and arr.shape == (64, 40), (arr.dtype,
                                                             arr.shape)

    # 10-12. AOT serving artifacts from the just-trained checkpoints,
    # each --verify round-tripped against its live model
    run("export_serving", [sys.executable, "tools/export_serving.py",
                           "--name", "rehearsal",
                           "--checkpoints_dir", ckpt,
                           "--out_dir", os.path.join(wd, "art_seg2eye"),
                           "--platforms", "cpu", "--native_hw", "64,40",
                           "--verify"])
    run("export_refinenet_serving", [
        sys.executable, "tools/export_refinenet_serving.py",
        "--model", "refinenet", "--resume_from", ref_out,
        "--out_dir", os.path.join(wd, "art_refinenet"),
        "--platforms", "cpu", "--verify", "--dataroot", h5]
        + TINY_REFINENET + join)
    run("export_segnet_serving", [
        sys.executable, "tools/export_refinenet_serving.py",
        "--model", "segnet", "--resume_from", seg_out,
        "--out_dir", os.path.join(wd, "art_segnet"),
        "--platforms", "cpu", "--verify", "--dataroot", h5]
        + TINY_REFINENET)

    # 13. reverse export: both trained checkpoints back to reference files
    pth = os.path.join(wd, "pth")
    run("export_torch_checkpoint seg2eye", [
        sys.executable, "tools/export_torch_checkpoint.py",
        "--checkpoints_dir", ckpt, "--name", "rehearsal",
        "--which_epoch", "latest", "--out_dir", pth])
    run("export_torch_checkpoint segnet", [
        sys.executable, "tools/export_torch_checkpoint.py",
        "--refinenet_dir", os.path.join(seg_out, "checkpoints"),
        "--out_dir", pth])
    import torch
    for f, probe in (("latest_net_G.pth", "fc.weight"),
                     ("latest_net_E.pth", "layer0.0.weight_orig"),
                     ("latest_net_D.pth", "discriminator_0.model0.0.weight")):
        sd = torch.load(os.path.join(pth, f), map_location="cpu")
        assert probe in sd, (f, sorted(sd)[:4])
    pts = [f for f in os.listdir(pth) if f.endswith(".pt")]
    assert pts, "segnet export produced no .pt"
    sd = torch.load(os.path.join(pth, pts[0]), map_location="cpu")
    assert "backbone.conv1.weight" in sd and "decoder.last_conv.8.weight" in sd

    result = {"metric": "cli_dress_rehearsal", "ok": True,
              "stages": stages,
              "seg2eye_manifest_files": n_s2e,
              "submission_manifest_files": len(files),
              "total_seconds": round(sum(s["seconds"] for s in stages), 1)}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
