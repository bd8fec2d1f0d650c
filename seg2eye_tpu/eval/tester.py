"""Evaluation harness (Tester parity).

Parity notes (reference: util/tester.py):
  * Clones options into a serial/no-flip/eval config with its own dataloader
    (tester.py:16-42).
  * ``run(mode=full|rand|fix)``: index selection semantics (tester.py:153-176),
    the ``counter > limit`` break (tester.py:104-107), relative x1471 error
    statistics, "Error so far" progress prints.
  * Error-log H5 with per-sample error/user/filename and a (1,380,1000) uint8
    side-by-side visualization (tester.py:67-90).
  * ``run_test``: per-image uint8 .npy + pred_npy_list.txt manifest
    (tester.py:193-219).
  * ``run_partial_modes``: mode 'rand' during training (tester.py:221-233).

TPU-first: the score path (generator forward -> bilinear resize to 640x400 ->
truncating [0,255] conversion -> per-image error) is ONE jitted program; only
uint8 results cross back to host (reference round-tripped through cv2 on CPU,
tester.py:44-47).
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from seg2eye_tpu.data.loader import create_dataloader
from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.ops import metrics
from seg2eye_tpu.ops.image import to_255resized
from seg2eye_tpu.utils.visualizer import Visualizer, visualize_sidebyside


class Tester:
    def __init__(self, opt, dataset_key: str = "test",
                 visualizer: Optional[Visualizer] = None):
        self.opt = opt.replace(serial_batches=True, no_flip=True,
                               isTrain=False, dataset_key=dataset_key)
        self.dataloader = create_dataloader(self.opt)
        self.visualizer = visualizer or Visualizer(self.opt)
        self.is_validation = dataset_key in ("validation", "train")
        self.N = self.dataloader.dataset.N
        self.results_dir = os.path.join(
            opt.checkpoints_dir, opt.name, self.opt.results_dir, dataset_key)
        os.makedirs(self.results_dir, exist_ok=True)
        self._fwd = None
        self._score = None
        self._rng = np.random.default_rng(self.opt.seed)
        # --spatial_shard: context-parallel eval — H-band activations over
        # the 'data' mesh axis (a low-batch eval uses every chip; see
        # parallel/sharding.py spatial_constraint for why the per-resolution
        # policy is mandatory)
        self.mesh = None
        if getattr(opt, "spatial_shard", False) and jax.device_count() > 1:
            from seg2eye_tpu.parallel.sharding import make_mesh
            self.mesh = make_mesh(None, data=jax.device_count(), model=1)
        # (variables, replicated pytree) cache — keyed by the OBJECT (held
        # strongly and compared with `is`), never id(): a freed dict's id
        # can be recycled by a new variables pytree mid-training, which
        # would silently serve stale weights
        self._placed_vars = None

    # ------------------------------------------------------------------ #
    def _forward_fn(self, model: Pix2Pix):
        if self._fwd is None:
            constrain = None
            if self.mesh is not None:
                from seg2eye_tpu.parallel.sharding import spatial_constraint
                constrain = spatial_constraint(self.mesh)

            def fwd(variables, label, style, h, w):
                fake = model.inference(variables, {"label": label,
                                                   "style_image": style},
                                       constrain=constrain)
                fake_resized = to_255resized(fake, w=w, h=h)  # [0,255] ints
                return fake, fake_resized
            self._fwd = jax.jit(fwd, static_argnums=(3, 4))
        return self._fwd

    def _score_fn(self, model: Pix2Pix):
        """Scored eval is ONE jitted program (inference -> native resize ->
        truncating [0,255] -> per-image error): the per-batch eager metric
        ops and the unconditional full-image device_get this replaces were
        the eval-loop bottleneck over a remote-TPU tunnel."""
        if self._score is None:
            constrain = None
            if self.mesh is not None:
                from seg2eye_tpu.parallel.sharding import spatial_constraint
                constrain = spatial_constraint(self.mesh)

            def fn(variables, label, style, target, h, w):
                fake = model.inference(variables, {"label": label,
                                                   "style_image": style},
                                       constrain=constrain)
                fake_resized = to_255resized(fake, w=w, h=h)
                errors = metrics.mse_for_images(
                    fake_resized, target.astype(jnp.float32))
                return errors, fake
            self._score = jax.jit(fn, static_argnums=(4, 5))
        return self._score

    def _place(self, variables, batch: Dict, target: bool = False):
        """Device placement for one eval batch (+ variables, cached): plain
        jnp arrays single-device, H-band sharded under --spatial_shard.
        With ``target`` also places batch['target_original'] (replicated
        under the mesh — the native-size ground truth is not H-band-split)."""
        if self.mesh is None:
            out = (variables, jnp.asarray(batch["label"]),
                   jnp.asarray(batch["style_image"]))
            return out + ((jnp.asarray(batch["target_original"]),)
                          if target else ())
        from jax.sharding import NamedSharding, PartitionSpec
        from seg2eye_tpu.parallel.sharding import shard_batch_spatial
        if self._placed_vars is None or self._placed_vars[0] is not variables:
            repl = jax.device_put(
                variables, NamedSharding(self.mesh, PartitionSpec()))
            self._placed_vars = (variables, repl)
        db = shard_batch_spatial({"label": batch["label"],
                                  "style_image": batch["style_image"]},
                                 self.mesh)
        out = (self._placed_vars[1], db["label"], db["style_image"])
        if target:
            out += (jax.device_put(
                np.asarray(batch["target_original"]),
                NamedSharding(self.mesh, PartitionSpec())),)
        return out

    def _native_hw(self, batch: Dict):
        """Score at the dataset's native resolution — 640x400 for OpenEDS
        (loss.py:120), derived from target_original so synthetic fixtures
        score at their own native size."""
        if "target_original" in batch:
            return batch["target_original"].shape[1:3]
        return (640, 400)

    def run_batch(self, batch: Dict, model: Pix2Pix, variables,
                  need_fake: bool = True):
        """-> (per-image errors, fake or None).  ``need_fake=False`` skips
        the full-image device->host transfer (only the tiny error vector
        crosses back) — run_validation needs fake only for the error log."""
        fn = self._score_fn(model)
        h, w = self._native_hw(batch)
        variables, label, style, target = self._place(variables, batch,
                                                      target=True)
        errors, fake = fn(variables, label, style, target, h, w)
        return np.asarray(errors), (np.asarray(fake) if need_fake else None)

    # ------------------------------------------------------------------ #
    def _iterator(self, indices: Optional[List[int]]):
        if indices is None:
            yield from self.dataloader
        else:
            for i in indices:
                yield self.dataloader.get_particular(int(i))

    def _validation_indices(self, mode: str, limit: int):
        if "rand" in mode:
            return self.dataloader.dataset.get_random_indices(limit, self._rng)
        if "fix" in mode:
            return self.dataloader.dataset.get_validation_indices()[:limit]
        if "full" in mode:
            return None
        raise ValueError(f"Invalid mode: {mode}")

    def _prepare_error_log(self):
        log = h5py.File(os.path.join(
            self.results_dir, f"error_log_{self.opt.dataset_key}.h5"), "w")
        log.create_dataset("error", shape=(self.N,), dtype=np.float64)
        log.create_dataset("user", shape=(self.N,), dtype="S4")
        log.create_dataset("filename", shape=(self.N,), dtype="S13")
        log.create_dataset("visualisation", shape=(self.N, 1, 380, 1000),
                           dtype=np.uint8)
        return log

    def _write_error_log_batch(self, log, batch, lo, fake, errors):
        """``lo`` is the running count of samples already written — NOT
        batch_index * batchSize: 'rand'/'fix' modes iterate single-sample
        batches (get_particular), where stride-batchSize offsets would
        scatter entries and overrun the dataset."""
        vis = visualize_sidebyside({**batch, "fake": fake},
                                   error_list=errors)
        hi = lo + len(errors)
        log["user"][lo:hi] = np.array(batch["user"], dtype="S4")
        log["filename"][lo:hi] = np.array(batch["filename"], dtype="S13")
        log["error"][lo:hi] = errors
        arr = np.array([np.copy(v) for v in vis.values()])
        log["visualisation"][lo:hi] = ((arr + 1) * 128).clip(0, 255).astype(np.uint8)

    # ------------------------------------------------------------------ #
    def run_validation(self, model, variables, generator, limit=-1,
                       write_error_log=False) -> List[float]:
        assert self.is_validation, "Must be in validation mode"
        log = self._prepare_error_log() if write_error_log else None
        all_errors: List[float] = []
        counter = 0
        for i, batch in enumerate(generator):
            counter += batch["label"].shape[0]
            if limit > 0 and counter > limit:
                break
            if i % 10 == 9:
                print(f"Processing batch {i}")
                print(f"Error so far: "
                      f"{np.sum(all_errors) / max(len(all_errors), 1) * metrics.RELATIVE_FACTOR}")
            errors, fake = self.run_batch(
                batch, model, variables, need_fake=log is not None)
            if log is not None:
                self._write_error_log_batch(log, batch, len(all_errors),
                                            fake, errors)
            all_errors += list(errors)
        if log is not None:
            log.close()
        return all_errors

    def run(self, model: Pix2Pix, variables, mode: str, epoch=None,
            n_steps=None, limit: int = -1, write_error_log: bool = False,
            log: bool = False) -> Dict:
        print(f"Running validation for mode '{mode}'...")
        limit = limit if limit > 0 else self.N
        indices = self._validation_indices(mode, limit)
        gen = self._iterator(indices)
        all_errors = self.run_validation(model, variables, gen, limit=limit,
                                         write_error_log=write_error_log)
        errors_dict = metrics.error_statistics(all_errors, mode=mode,
                                               dataset_key=self.opt.dataset_key)
        self.print_results(all_errors, errors_dict, epoch, n_steps)
        if log:
            self.visualizer.print_current_errors(epoch or 0, n_steps or 0,
                                                 errors_dict, t=0)
            self.visualizer.plot_current_errors(errors_dict, n_steps or 0)
        return errors_dict

    def print_results(self, all_errors, errors_dict, epoch="n.a.",
                      n_steps="n.a."):
        print("Validation Results")
        print("------------------")
        print(f"Error calculated on {len(all_errors)} / {self.N} samples")
        for k in sorted(errors_dict):
            print(f"  {k}, {errors_dict[k]:.2f}")
        print(f"  dataset_key: {self.opt.dataset_key}, "
              f"model: {self.opt.name}, epoch: {epoch}, n_steps: {n_steps}")

    # ------------------------------------------------------------------ #
    def run_test(self, model: Pix2Pix, variables, limit: int = -1) -> str:
        filepaths = []
        for i, batch in enumerate(self.dataloader):
            if limit > 0 and i * self.opt.batchSize >= limit:
                break
            if i % 10 == 0:
                print(f"Processing batch {i} "
                      f"(processed {self.opt.batchSize * i} images)")
            names = [re.sub(r"\.", "", f) for f in batch["filename"]]
            _, _, fake_resized = self.run_batch_inference(batch, model,
                                                          variables)
            for b, name in enumerate(names):
                path = os.path.join(self.results_dir, name + ".npy")
                arr = fake_resized[b]
                assert arr.min() >= 0 and arr.max() <= 255
                np.save(path, arr.astype(np.uint8)[..., 0])
                filepaths.append(path)
        manifest = os.path.join(self.results_dir, "pred_npy_list.txt")
        with open(manifest, "w") as f:
            for line in filepaths:
                f.write(line + os.linesep)
        print(f"Written {len(filepaths)} files. Filepath: {manifest}")
        return manifest

    def run_batch_inference(self, batch, model, variables):
        """Like run_batch but without ground truth (test split)."""
        fwd = self._forward_fn(model)
        h, w = self._native_hw(batch)
        variables, label, style = self._place(variables, batch)
        fake, fake_resized = fwd(variables, label, style, h, w)
        return None, np.asarray(fake), np.asarray(fake_resized)

    def run_partial_modes(self, model, variables, epoch, n_steps, log,
                          visualize_images, limit):
        for mode in ["rand"]:
            self.run(model, variables, mode=mode, epoch=epoch,
                     n_steps=n_steps, log=log, limit=limit)
            if visualize_images:
                self.run_visual_validation(model, variables, mode, epoch,
                                           n_steps, limit=4)

    def run_visual_validation(self, model, variables, mode, epoch, n_steps,
                              limit):
        indices = self._validation_indices(mode, limit)
        results, error_list = [], []
        for idx in (indices if indices is not None else range(limit)):
            batch = self.dataloader.get_particular(int(idx))
            errors, fake = self.run_batch(batch, model, variables)
            batch["fake"] = fake
            results.append(batch)
            error_list.append(errors)
        merged = {k: ([x for r in results for x in r[k]]
                      if isinstance(results[0][k], list)
                      else np.concatenate([r[k] for r in results]))
                  for k in results[0].keys()}
        visuals = visualize_sidebyside(merged,
                                       error_list=np.concatenate(error_list))
        self.visualizer.display_current_results(visuals, epoch, n_steps)
