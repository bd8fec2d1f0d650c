"""RefineNet/SegNet training framework.

Parity notes (reference: refinenet/core/training.py):
  * SGD(momentum=0.99, nesterov) with lr = batch_size * base_lr and L2 weight
    decay (train_refinenet.py:236-243, config_default.py).
  * LR schedule: linear warmup from base_lr to target over num_warmup_epochs,
    then 'exponential' step decay (factor^interval) or 'cyclic'
    (training.py:462-496) — implemented as a pure step->lr function fed to
    the optimizer as a runtime hyperparameter (no recompiles).
  * main_loop: step-based epochs, grad clip, log every log_every_n_steps,
    test_model_on_all + checkpoint every test_every_n_steps, final full test
    (training.py:503-631, 430-459).  The reference's inversion-of-control
    generator is replaced by a ``step_callback`` hook: the whole
    forward+backward+update is ONE jitted XLA program.
  * test_model_on_all: dataset-size-weighted mean of every scalar output
    (training.py:247-300).
"""
from __future__ import annotations

import logging
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seg2eye_tpu.data.loader import DataLoader, device_prefetch
from seg2eye_tpu.utils.platform import training_jit
from seg2eye_tpu.refinenet.checkpoint_manager import CheckpointManager
from seg2eye_tpu.refinenet.config import RefineNetConfig
from seg2eye_tpu.refinenet.loggers import GoogleSheetLogger, Tensorboard
from seg2eye_tpu.utils.signals import is_preemption, sigterm_raises

logger = logging.getLogger(__name__)


def learning_rate_schedule(cfg: RefineNetConfig, steps_per_epoch: int,
                           step: int) -> float:
    """training.py:462-496, as a pure function of the step."""
    target = cfg.learning_rate
    base = target / cfg.batch_size
    num_warmup = int(steps_per_epoch * cfg.num_warmup_epochs)
    if step < num_warmup:
        return base + (target - base) * step / float(num_warmup)
    epoch = (step - num_warmup) / float(steps_per_epoch)
    interval = int(epoch / cfg.lr_decay_epoch_interval)
    if cfg.lr_decay_strategy == "none":           # segnet.json uses this
        return target
    if cfg.lr_decay_strategy == "exponential":
        return target * (cfg.lr_decay_factor ** interval)
    if cfg.lr_decay_strategy == "cyclic":
        peak_a = target * (cfg.lr_decay_factor ** interval)
        peak_b = peak_a * cfg.lr_decay_factor
        half = 0.5 * cfg.lr_decay_epoch_interval
        start = interval * cfg.lr_decay_epoch_interval
        mid = start + half
        if epoch < mid:
            slope = -(peak_a - base) / half
        else:
            slope = (peak_b - base) / half
        return slope * (epoch - mid) + base
    raise ValueError(cfg.lr_decay_strategy)


def make_optimizer(cfg: RefineNetConfig,
                   momentum: float = 0.99) -> optax.GradientTransformation:
    """SGD with nesterov momentum; the reference hardcodes momentum per
    trainer script: 0.99 for RefineNet (train_refinenet.py:236) and 0.9 for
    SegNet (train_segnet.py:139)."""
    chain = []
    if cfg.gradient_norm_clip > 0.0:
        chain.append(optax.clip_by_global_norm(cfg.gradient_norm_clip))
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.trace(decay=momentum, nesterov=True))

    def build(learning_rate):
        return optax.chain(*chain, optax.scale(-learning_rate))

    return optax.inject_hyperparams(build)(learning_rate=cfg.learning_rate)


class Trainer:
    """Owns the jitted train/eval steps for a task model (RefineNet/SegNet).

    ``mesh``: optional ('data','model') Mesh for data-parallel training —
    parameters replicated, batches sharded on 'data'; gradient averaging and
    batch-norm synchronization lower to psum over the sharded batch axis
    (the GSPMD replacement for the reference's threaded SyncBN, SURVEY §2.4
    R8).  The reference RefineNet trainer is single-GPU (refinenet/core/
    training.py has no DataParallel); DP here is a TPU-first extension with
    identical step semantics (tests/test_refinenet.py::test_dp_step_matches
    _single_device)."""

    def __init__(self, model, cfg: RefineNetConfig, loss_key: str,
                 momentum: float = 0.99, mesh=None, donate: bool = True):
        self.model = model
        self.cfg = cfg
        self.loss_key = loss_key
        self.mesh = mesh
        self.tx = make_optimizer(cfg, momentum=momentum)
        # donate the train state: params/momentum/batch-stats buffers are
        # updated in place (input-output aliasing), halving their HBM
        # footprint during the update.  Callers that keep the pre-step state
        # alive (e.g. trajectory-comparison tests) must pass donate=False.
        self.train_step = training_jit(
            self._train_step, donate_argnums=(0,) if donate else ())
        self.eval_step = jax.jit(self._eval_step)
        # the variables eval helpers read; set by init_state and kept fresh
        # by update_variables so test_model_on_all works standalone
        self.current_variables: Optional[Dict] = None
        # live train state, tracked by main_loop's step runner so the
        # preemption/interrupt path can checkpoint mid-interval work
        self.last_state: Optional[Dict] = None
        self.last_step: Optional[int] = None

    def init_state(self, rng: jax.Array) -> Dict:
        variables = self.model.init(rng)
        state = {"variables": variables,
                 "opt": self.tx.init(variables["params"]),
                 "step": jnp.zeros((), jnp.int32)}
        state = self.place_state(state)
        self.current_variables = state["variables"]
        return state

    def place_state(self, state: Dict) -> Dict:
        """Replicate the train state across the mesh (no-op without one)."""
        if self.mesh is None:
            return state
        from seg2eye_tpu.parallel.sharding import replicate_state
        return replicate_state(state, self.mesh)

    def update_variables(self, state: Dict) -> None:
        """Point eval helpers at ``state``'s variables (cheap: pytree of
        device-array references, no transfer)."""
        self.current_variables = state["variables"]

    def _train_step(self, state: Dict, batch: Dict, lr: jax.Array,
                    rng: jax.Array):
        state["opt"].hyperparams["learning_rate"] = lr

        def loss_fn(params):
            variables = {**state["variables"], "params": params}
            out, newv = self.model.forward(variables, batch, train=True,
                                           rng=rng)
            return out[self.loss_key], (out, newv)

        params = state["variables"]["params"]
        (loss, (out, newv)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = self.tx.update(grads, state["opt"], params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
        new_state = {"variables": {**newv, "params": new_params},
                     "opt": new_opt, "step": state["step"] + 1}
        scalars = {k: v for k, v in out.items()
                   if hasattr(v, "ndim") and v.ndim == 0}
        return new_state, scalars, out

    def _eval_step(self, variables: Dict, batch: Dict):
        out, _ = self.model.forward(variables, batch, train=False)
        return out


def default_mesh(cfg: RefineNetConfig):
    """Data-parallel mesh over all attached devices, when the batch divides
    them; None (single-device semantics) otherwise.  The TPU-native default
    for the RefineNet CLIs — one chip degenerates to a 1-device mesh-free
    run, a pod slice gets DP for free.

    Single-process only: the RefineNet CLIs build UNSHARDED loaders, which
    shard_batch would misread as per-process shards under multi-process DP
    (every host's full batch assembled as if it were 1/N of a global one) —
    refuse loudly instead of silently training on duplicated data.  For
    multi-host runs use the seg2eye train loop or segtrain, whose loaders
    process-shard (data/loader.py)."""
    if jax.process_count() > 1:
        raise RuntimeError(
            "RefineNet/SegNet CLIs are single-process (multi-device DP "
            "only); their loaders are not process-sharded, so multi-process "
            "runs would silently duplicate every batch")
    from seg2eye_tpu.parallel.sharding import default_data_mesh
    mesh = default_data_mesh(cfg.batch_size,
                             warn=lambda m: logger.warning("%s", m))
    if mesh is not None:
        logger.info("data-parallel mesh over %d devices",
                    mesh.shape["data"])
    return mesh


def device_batch(batch: Dict, mesh=None) -> Dict:
    """Host batch -> device.  With a mesh, shard the batch axis over 'data'
    (tail/eval batches whose size doesn't divide the axis are replicated —
    correct either way, sharding is only the efficient layout).

    Divisibility is judged on the GLOBAL batch: under multi-process DP the
    loader yields only this process's local shard (data/loader.py:64-72),
    and shard_batch assembles the global array across processes.  The
    replicate fallback is host-local data, so it is single-process only."""
    arrs = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    if mesh is not None:
        from seg2eye_tpu.parallel.sharding import shard_batch
        from jax.sharding import NamedSharding, PartitionSpec
        nproc = jax.process_count()
        bs = len(next(iter(arrs.values()))) * nproc
        if bs % mesh.shape["data"] == 0:
            return shard_batch(arrs, mesh)
        if nproc > 1:
            raise ValueError(
                f"global batch {bs} must divide the data axis "
                f"({mesh.shape['data']}) under multi-process DP — tail "
                f"batches cannot be replicated from process-local data")
        return jax.device_put(arrs, NamedSharding(mesh, PartitionSpec()))
    return {k: jnp.asarray(v) for k, v in arrs.items()}


def _np32(v) -> np.ndarray:
    """Device array (possibly bf16) -> float32 numpy."""
    return np.asarray(jax.device_get(v)).astype(np.float32)


def do_visualizations(out: Dict, tensorboard: Tensorboard, step: int,
                      max_images: int = 2, tag_prefix: str = "train") -> int:
    """Annotated prediction strips, the reference's per-image training
    observability (refinenet/core/training.py:306-342 do_visualizations,
    called at :589; refinenet/train_refinenet.py:256-290): one horizontal
    strip per sample — every input channel (colorized target mask | NN
    reference | NN reference mask for RefineNet) followed by the prediction
    and the groundtruth, with a per-image-score text footer.  Returns the
    number of images logged."""
    pred = out.get("prediction")
    if pred is None:
        return 0
    from seg2eye_tpu.utils.visualizer import _text_strip, _to_img01
    inp = _np32(out["input"])
    pred = _np32(pred)
    gt = out.get("groundtruth", out.get("target"))
    scores = out.get("per_image_score")
    tensorboard.update_current_step(step)
    logged = 0
    for i in range(min(max_images, inp.shape[0])):
        panels = [_to_img01(inp[i, ..., c]) for c in range(inp.shape[-1])]
        panels.append(_to_img01(pred[i]))
        if gt is not None:
            panels.append(_to_img01(_np32(gt)[i]))
        row = np.concatenate(panels, axis=1)
        txt = f"step {step}"
        if scores is not None:
            txt += f" score={float(_np32(scores)[i]):.4f}"
        strip = np.concatenate([row, _text_strip(txt, row.shape[1])], axis=0)
        tensorboard.add_image(f"{tag_prefix}/prediction_{i}", strip[None])
        logged += 1
    return logged


def test_model_on_all(trainer: Trainer, test_data: Dict[str, DataLoader],
                      step: int, tensorboard: Optional[Tensorboard] = None,
                      log_key_prefix: str = "test") -> Dict[str, Dict]:
    final: Dict[str, Dict] = {}
    for tag, loader in test_data.items():
        n = len(loader.dataset)
        acc: Dict[str, float] = {}
        for batch in loader:
            bs = len(batch["input"])
            out = trainer.eval_step(trainer.current_variables,
                                    device_batch(batch, trainer.mesh))
            for k, v in out.items():
                if hasattr(v, "ndim") and v.ndim == 0:
                    acc[k] = acc.get(k, 0.0) + float(v) * (bs / n)
        final[tag] = acc
        if tensorboard is not None:
            for k, v in acc.items():
                tensorboard.add_scalar(f"{log_key_prefix}/{tag}/{k}", v)
    return final


def main_loop(model, cfg: RefineNetConfig, train_loader: DataLoader,
              test_data: Dict[str, DataLoader], loss_key: str,
              step_callback: Optional[Callable] = None,
              model_name: Optional[str] = None,
              momentum: float = 0.99, mesh=None) -> Dict:
    """Returns {'state', 'output_dir', 'steps'}.  ``mesh``: optional
    ('data','model') Mesh for data-parallel training (see Trainer)."""
    model_name = model_name or type(model).__name__
    if cfg.resume_from:
        identifier = cfg.resume_from.rstrip("/").split("/")[-1]
        output_dir = cfg.resume_from
    else:
        identifier = cfg.identifier(model_name)
        output_dir = os.path.join(cfg.output_dir_base, identifier)
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        f.write(cfg.full_json())
    tensorboard = Tensorboard(output_dir)
    gsheet = GoogleSheetLogger(identifier, cfg.full_json(), output_dir)
    ckpt_mgr = CheckpointManager(output_dir, cfg.checkpoints_keep_n)

    trainer = Trainer(model, cfg, loss_key, momentum=momentum, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    start_step = 0
    if cfg.resume_from:
        step0, state = ckpt_mgr.load_last_checkpoint(state)
        if step0 is not None:
            start_step = step0
            logger.info("Resumed from step %d", start_step)
        state = trainer.place_state(state)
        trainer.update_variables(state)

    steps_per_epoch = max(1, len(train_loader.dataset) // cfg.batch_size)
    num_steps = int(cfg.num_epochs * steps_per_epoch)
    if cfg.max_steps:
        num_steps = min(num_steps, start_step + cfg.max_steps)

    rng = jax.random.PRNGKey(cfg.seed + 1)

    def host_batches():
        """exactly the step budget, restarting epochs as needed"""
        it = iter(train_loader)
        for _ in range(start_step, num_steps):
            try:
                yield next(it)
            except StopIteration:
                it = iter(train_loader)
                try:
                    yield next(it)
                except StopIteration:
                    # PEP 479 would surface this as an opaque
                    # "generator raised StopIteration" RuntimeError
                    raise RuntimeError(
                        f"train loader yields no batches: dataset has "
                        f"{len(train_loader.dataset)} samples, batch_size "
                        f"{cfg.batch_size} with drop_last — reduce "
                        f"batch_size") from None

    # transfer of the next batch overlaps the in-flight step (worker thread;
    # see data/loader.py device_prefetch)
    prefetched = device_prefetch(host_batches(),
                                 lambda b: (b, device_batch(b, mesh)),
                                 depth=1)
    t_last = time.time()
    step = start_step
    try:
        with sigterm_raises():
            step = _run_steps(trainer, cfg, state, prefetched, start_step,
                              num_steps, steps_per_epoch, train_loader,
                              test_data, step_callback, tensorboard, gsheet,
                              ckpt_mgr, rng, t_last)
    except (KeyboardInterrupt, SystemExit) as e:
        # preemption/interrupt: save the current step NOW (the reference has
        # no crash-safety here — up to test_every_n_steps-1 steps of work
        # would be lost) and skip the final full test (eviction grace
        # periods are short)
        state = trainer.last_state if trainer.last_state is not None else state
        step = trainer.last_step if trainer.last_step is not None else step
        name = "SIGTERM (preemption)" if is_preemption(e) \
            else type(e).__name__
        logger.warning("%s — saving checkpoint at step %d and stopping",
                       name, step + 1)
        try:
            ckpt_mgr.save_at_step(step + 1, state)
        except Exception:
            # a signal landing exactly during train_step dispatch can leave
            # last_state's donated buffers deleted — losing the interval
            # since the last periodic checkpoint matches reference behavior
            logger.exception("interrupt-time checkpoint failed; the last "
                             "periodic checkpoint remains the resume point")
        tensorboard.close()
        return {"state": state, "output_dir": output_dir, "steps": step + 1,
                "final": {}, "trainer": trainer, "interrupted": True}
    state = trainer.last_state if trainer.last_state is not None else state

    ckpt_mgr.save_at_step(step + 1, state)
    final = test_model_on_all(trainer, test_data, step + 1, tensorboard,
                              log_key_prefix="final_test")
    gsheet.update_or_append_row(
        {"Step": step + 1,
         **{f"final/{t}/{k}": v for t, d in final.items()
            for k, v in d.items()}})
    tensorboard.close()
    return {"state": state, "output_dir": output_dir, "steps": step + 1,
            "final": final, "trainer": trainer}


def _run_steps(trainer, cfg, state, prefetched, start_step, num_steps,
               steps_per_epoch, train_loader, test_data, step_callback,
               tensorboard, gsheet, ckpt_mgr, rng, t_last):
    """The step loop body of main_loop; tracks the live state on the trainer
    (trainer.last_state/last_step) so the interrupt path can checkpoint it."""
    step = start_step
    trainer.last_state, trainer.last_step = state, step
    for step in range(start_step, num_steps):
        batch, db = next(prefetched)
        lr = learning_rate_schedule(cfg, steps_per_epoch, step)
        rng, sub = jax.random.split(rng)
        state, scalars, out = trainer.train_step(
            state, db, jnp.asarray(lr, jnp.float32), sub)
        trainer.update_variables(state)
        trainer.last_state, trainer.last_step = state, step

        if step_callback is not None:
            step_callback(step, scalars, out, batch)

        if step % cfg.log_every_n_steps == cfg.log_every_n_steps - 1:
            host = {k: float(v) for k, v in scalars.items()}
            dt = (time.time() - t_last) / cfg.log_every_n_steps
            t_last = time.time()
            epoch = step * cfg.batch_size / len(train_loader.dataset)
            logger.info("Step %d, Epoch %.2f> %s (%.3fs/step, lr %.2g)",
                        step + 1, epoch,
                        ", ".join(f"{k}: {v:.4g}"
                                  for k, v in sorted(host.items())),
                        dt, lr)
            tensorboard.update_current_step(step + 1)
            for k, v in host.items():
                tensorboard.add_scalar(f"train/{k}", v)
            tensorboard.add_scalar("lr/optim_0", lr)

        if cfg.tensorboard_images_every_n_steps and \
                step % cfg.tensorboard_images_every_n_steps == \
                cfg.tensorboard_images_every_n_steps - 1:
            do_visualizations(out, tensorboard, step + 1)

        if step % cfg.test_every_n_steps == cfg.test_every_n_steps - 1:
            results = test_model_on_all(trainer, test_data, step + 1,
                                        tensorboard)
            row = {"Step": step + 1}
            for tag, d in results.items():
                for k, v in d.items():
                    row[f"{tag}/{k}"] = v
            gsheet.update_or_append_row(row)
            ckpt_mgr.save_at_step(step + 1, state)

    return step
