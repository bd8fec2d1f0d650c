"""Training loop (parity port of the reference train.py entry).

Structure mirrors reference train.py:46-116: epoch loop, G step every
``D_steps_per_G`` iterations + D step every iteration (fused into one jitted
program when D_steps_per_G == 1), periodic print/display/save/full-validation,
crash-safe final save in ``finally``.
"""
from __future__ import annotations

import contextlib
import os
import traceback
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from seg2eye_tpu.data.loader import create_dataloader, device_prefetch
from seg2eye_tpu.eval.tester import Tester
from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options
from seg2eye_tpu.train import state as state_lib
from seg2eye_tpu.train.steps import StepFunctions
from seg2eye_tpu.utils import checkpoint
from seg2eye_tpu.utils import files
from seg2eye_tpu.utils.files import copy_src
from seg2eye_tpu.utils.iter_counter import IterationCounter
from seg2eye_tpu.utils.signals import is_preemption, sigterm_raises
from seg2eye_tpu.utils.visualizer import Visualizer
from seg2eye_tpu.parallel.sharding import (make_mesh, param_shardings,
                                           place_state, shard_batch)


def device_batch(batch: Dict, mesh=None) -> Dict:
    out = {k: batch[k] for k in ("label", "style_image", "target")
           if k in batch}
    if mesh is not None:
        return shard_batch(out, mesh)
    return {k: jnp.asarray(v) for k, v in out.items()}


def train(opt: Options, max_steps: Optional[int] = None,
          step_hook=None) -> Dict:
    """Returns a summary dict (final losses, steps run).

    ``step_hook(step, losses)`` (optional) fires after every optimizer step
    with the 1-based step index and the device loss dict — full-precision
    observability for convergence/equivalence studies (the RefineNet loop's
    ``step_callback`` counterpart).

    Multi-process DP (jax.process_count() > 1): computation stays symmetric
    across processes (the fused step runs on global arrays), but only
    process 0 touches the shared run directory — src.zip, checkpoints,
    iter.txt, loss_log/tensorboard, and the periodic Tester evals (which
    run on a host copy of the variables: the Tester's own loaders and
    placement are process-local, so they must not consume global arrays).
    """
    primary = jax.process_index() == 0
    multiproc = jax.process_count() > 1
    if primary:
        # anchored to the framework checkout, not cwd: launching the CLI
        # from elsewhere must not snapshot an unrelated directory tree
        copy_src(files.project_root(), opt.expr_dir)

    dataloader = create_dataloader(opt)
    model = Pix2Pix(opt)
    steps = StepFunctions(model)
    mesh = make_mesh(opt)

    state = state_lib.create_state(model, jax.random.PRNGKey(opt.seed))
    if not opt.no_vgg_loss:
        state = state.replace(
            variables=checkpoint.load_vgg(state.variables, opt))
    iter_counter = IterationCounter(opt, len(dataloader) * opt.batchSize,
                                    write_records=primary)
    resume_skip = 0
    if opt.continue_train and checkpoint.has_checkpoint(opt, opt.which_epoch):
        state = checkpoint.load_state(state, opt, opt.which_epoch)
        print(f"Resumed networks from '{opt.which_epoch}' checkpoint")
        # skip the already-trained batches of the resumed epoch so the
        # resumed trajectory is BITWISE the unbroken one (the reference
        # replays the whole epoch — its enumerate(start=epoch_iter),
        # train.py:49, only renumbers the loop variable; tested:
        # tests/test_e2e.py::test_resume_trajectory_bitwise)
        resume_skip = iter_counter.epoch_iter // opt.batchSize
    if mesh is not None:
        # explicit placement: DP-replicated parameters, or TP-sharded conv
        # kernels over 'model' when opt.model_axis > 1 (GSPMD inserts the
        # collectives); batches are sharded over 'data' in device_batch
        state = place_state(
            state, param_shardings(state, mesh,
                                   min_channels=opt.tp_min_channels))

    # host-0 invariant: the Visualizer appends a loss_log.txt header (and
    # opens a tensorboard writer under --tf_log) at CONSTRUCTION, and the
    # Testers build process-local eval loaders — none of which non-primary
    # processes may touch (their only job is the symmetric fused step)
    if primary:
        visualizer = Visualizer(opt)
        tester_train = Tester(opt, dataset_key="train", visualizer=visualizer)
        tester_validation = Tester(opt, dataset_key="validation",
                                   visualizer=visualizer)
    else:
        visualizer = tester_train = tester_validation = None

    max_steps = max_steps or (opt.max_steps or None)
    last_losses: Dict = {}
    g_losses: Dict = {}        # latest G losses (D_steps_per_G > 1 reporting)
    n_iters = 0
    stop = False
    profiling = False
    # preemption-aware shutdown: route SIGTERM (cloud-TPU eviction) into the
    # same crash-safe save path as Ctrl-C — the reference's finally
    # (train.py:111-116) only covered in-process exceptions
    exit_stack = contextlib.ExitStack()
    exit_stack.enter_context(sigterm_raises())
    try:
        for epoch in iter_counter.training_epochs():
            if iter_counter.current_epoch != epoch:
                iter_counter.record_epoch_start(epoch)
            state = state_lib.set_learning_rate(state, opt, epoch)
            # keys the shuffle + augmentation streams to the TRAINING epoch,
            # so an epoch-boundary resume replays the unbroken run's stream
            dataloader.set_epoch(epoch)
            if resume_skip and epoch == iter_counter.first_epoch:
                dataloader.skip_next_batches(resume_skip)

            # host->device transfer of the next batch overlaps this step
            prefetched = device_prefetch(
                dataloader, lambda b: (b, device_batch(b, mesh)), depth=1)
            for i, (batch, db) in enumerate(prefetched,
                                            start=iter_counter.epoch_iter):
                iter_counter.record_one_iteration()

                if opt.D_steps_per_G == 1:
                    state, losses, generated = steps.train_step(state, db)
                else:
                    if i % opt.D_steps_per_G == 0:
                        state, g_raw, generated = steps.g_step(state, db)
                        g_losses = dict(g_raw)
                    # D-only iterations keep reporting the LATEST generator
                    # losses (reference get_latest_losses merges the stored
                    # g_losses with each d_losses, pix2pix_trainer.py:47-53)
                    state, d_losses = steps.d_step(state, db)
                    losses = {**g_losses, **d_losses}
                last_losses = losses
                n_iters += 1
                if step_hook is not None:
                    step_hook(n_iters, losses)

                # jax.profiler tracing window (SURVEY §5.1: the reference only
                # had wall-clock time_per_iter; we add real device traces)
                if opt.profile_steps:
                    if n_iters == 2:
                        jax.profiler.start_trace(
                            os.path.join(opt.expr_dir, "profile"))
                        profiling = True
                    elif profiling and n_iters >= 2 + opt.profile_steps:
                        jax.tree_util.tree_map(
                            lambda x: x.block_until_ready()
                            if hasattr(x, "block_until_ready") else x,
                            losses)
                        jax.profiler.stop_trace()
                        profiling = False
                        print("profile written to",
                              os.path.join(opt.expr_dir, "profile"))

                if iter_counter.needs_printing():
                    # the mean itself is symmetric across processes (losses
                    # are global arrays); only the file/console logging is
                    # host-0's
                    host_losses = {k: float(jnp.mean(v))
                                   for k, v in losses.items()}
                    if primary:
                        visualizer.print_current_errors(
                            epoch, iter_counter.total_steps_so_far,
                            host_losses, iter_counter.time_per_iter)
                        visualizer.plot_current_errors(
                            host_losses, iter_counter.total_steps_so_far)

                # Tester placement/loaders are process-local: under
                # multi-process DP only host 0 evaluates, on a HOST COPY of
                # the variables (a process-local jit must not consume the
                # training loop's global arrays)
                if iter_counter.needs_displaying() and primary:
                    eval_vars = jax.device_get(state.variables) \
                        if multiproc else state.variables
                    for tester in (tester_train, tester_validation):
                        tester.run_partial_modes(
                            model, eval_vars,
                            epoch=epoch,
                            n_steps=iter_counter.total_steps_so_far,
                            log=True, visualize_images=opt.tf_log,
                            limit=min(opt.validation_limit, tester.N))

                if iter_counter.needs_saving() and primary:
                    print("saving the latest model (epoch %d, total_steps %d)"
                          % (epoch, iter_counter.total_steps_so_far))
                    checkpoint.save_state(state, opt, "latest")
                    iter_counter.record_current_iter()

                if iter_counter.needs_full_validation() and primary:
                    eval_vars = jax.device_get(state.variables) \
                        if multiproc else state.variables
                    for tester in (tester_train, tester_validation):
                        tester.run(model, eval_vars, mode="full",
                                   epoch=epoch,
                                   n_steps=iter_counter.total_steps_so_far,
                                   log=True,
                                   write_error_log=opt.write_error_log)

                if max_steps and n_iters >= max_steps:
                    stop = True
                    break

            iter_counter.record_epoch_end()
            if (epoch % opt.save_epoch_freq == 0 or
                    epoch == iter_counter.total_epochs) and primary:
                print("saving the model at the end of epoch %d, iters %d"
                      % (epoch, iter_counter.total_steps_so_far))
                checkpoint.save_state(state, opt, "latest")
                checkpoint.save_state(state, opt, epoch)
            if stop:
                break
        print("Training was successfully finished.")
    except (KeyboardInterrupt, SystemExit) as e:
        name = "SIGTERM (preemption)" if is_preemption(e) \
            else "KeyboardInterrupt"
        print(f"{name}. Shutting down.")
    except Exception:
        print(traceback.format_exc())
        raise
    finally:
        exit_stack.close()
        if profiling:
            jax.profiler.stop_trace()
            print("profile written to",
                  os.path.join(opt.expr_dir, "profile"))
        if primary:
            print("saving the model before quitting")
            checkpoint.save_state(state, opt, "latest")
            iter_counter.record_current_iter()
    return {"losses": {k: float(jnp.mean(v)) for k, v in last_losses.items()},
            "steps": n_iters, "state": state}
