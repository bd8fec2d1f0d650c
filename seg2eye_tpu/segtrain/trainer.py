"""Generic DeepLabV3+ trainer over VOC/SBD/COCO/Cityscapes (SURVEY R13).

Parity notes (reference: refinenet/deeplab/train.py):
  * Trainer wires Saver + TensorboardSummary + loaders + DeepLab + SGD with
    1×/10× param groups (backbone vs ASPP+decoder, train.py:39-44) +
    optional class-balanced CE/focal loss (train.py:46-57) + Evaluator +
    LR scheduler (train.py:60-64) + resume/ft (train.py:72-91).
  * training(epoch): per-iteration scheduler call, loss logging, 10
    visualization dumps per epoch, per-epoch checkpoint when --no-val
    (train.py:93-129).
  * validation(epoch): loss + confusion-matrix metrics, best-mIoU
    checkpoint promotion (train.py:132-176).
  * main(): the full argparse surface with per-dataset epoch/batch/lr
    defaults (train.py:178-303).

TPU-native design:
  * one fused jitted XLA program per train step — forward, loss, backward,
    SGD(momentum, nesterov, weight decay) update, and BN running-stat
    update; the LR is a runtime scalar (no recompiles across the schedule);
  * the 10× head LR is an optax mask over the param tree (backbone vs
    rest), mirroring _adjust_learning_rate (lr_scheduler.py:63-70);
  * data parallelism: batches sharded over the 'data' mesh axis, params
    replicated; gradient averaging AND batch-norm synchronization lower to
    psum via GSPMD (replacing torch DataParallel + SyncBN, train.py:66-70 —
    so --sync-bn is honored automatically whenever a mesh is active);
  * validation accumulates the confusion matrix on device (metrics.py);
  * --freeze-bn runs BN in inference mode inside the (still stochastic,
    dropout-active) train step, like torch's module.eval() freeze
    (modeling/deeplab.py:36-41).
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seg2eye_tpu.models.deeplab import DeepLab
from seg2eye_tpu.refinenet.training import device_batch
from seg2eye_tpu.utils.platform import training_jit
from seg2eye_tpu.segtrain.datasets import db_root_dir, make_data_loader
from seg2eye_tpu.segtrain.losses import SegmentationLosses
from seg2eye_tpu.segtrain.lr_scheduler import LRScheduler
from seg2eye_tpu.segtrain.metrics import Evaluator, confusion_matrix
from seg2eye_tpu.segtrain.saver import Saver
from seg2eye_tpu.segtrain.summaries import TensorboardSummary
from seg2eye_tpu.segtrain.weights import calculate_weights_labels


def head_mask(params: Dict) -> Dict:
    """True for every leaf OUTSIDE the backbone — the reference's 10× LR
    group (train.py:39-40: get_1x_lr_params = backbone,
    get_10x_lr_params = ASPP + decoder)."""
    return {top: jax.tree_util.tree_map(lambda _: top != "backbone", sub)
            for top, sub in params.items()}


def make_optimizer(args) -> optax.GradientTransformation:
    """torch.optim.SGD(momentum, weight_decay, nesterov) with the head
    running at 10× LR (train.py:39-44)."""
    def build(learning_rate):
        chain = []
        if args.weight_decay:
            chain.append(optax.add_decayed_weights(args.weight_decay))
        chain.append(optax.trace(decay=args.momentum,
                                 nesterov=args.nesterov))
        chain.append(optax.masked(optax.scale(10.0), head_mask))
        chain.append(optax.scale(-learning_rate))
        return optax.chain(*chain)
    return optax.inject_hyperparams(build)(learning_rate=args.lr)


def default_mesh(batch_size: int):
    """Data-parallel mesh over all devices when the batch divides them
    (hard error instead of a silent mesh-free fallback under multi-process
    DP — see parallel.sharding.default_data_mesh)."""
    from seg2eye_tpu.parallel.sharding import default_data_mesh
    return default_data_mesh(batch_size)


class SegTrainer:
    def __init__(self, args):
        self.args = args
        # multi-host DP: only process 0 owns the run directory — N processes
        # writing the same model_best.ckpt / TB event files would corrupt
        # both (standard JAX host-0-logs convention)
        self._primary = jax.process_index() == 0
        if self._primary:
            self.saver = Saver(args)
            self.saver.save_experiment_config()
            self.summary = TensorboardSummary(self.saver.experiment_dir)
            self.writer = self.summary.create_summary()
        else:
            # non-primary hosts must create NO run directory (Saver's
            # glob-then-mkdir would race host 0's run-id derivation and
            # leave ghost experiment_N dirs) and NO event file — the
            # dir-less Tensorboard no-ops every scalar/image
            self.saver = None
            self.summary = TensorboardSummary(None)
            self.writer = self.summary.create_summary()

        (self.train_loader, self.val_loader, self.test_loader,
         self.nclass) = make_data_loader(args, seed=args.seed)

        self.model = DeepLab(
            backbone=args.backbone, output_stride=args.out_stride,
            num_classes=self.nclass,
            resnet_layers=tuple(getattr(args, "resnet_layers",
                                        (3, 4, 23, 3))))

        # class-balanced weights (train.py:46-57)
        weight = None
        if args.use_balanced_weights:
            root = db_root_dir(args.dataset,
                               getattr(args, "data_root", None))
            path = os.path.join(root, args.dataset + "_classes_weights.npy")
            if os.path.isfile(path):
                weight = np.load(path)
            else:
                # full-dataset pass (reference semantics): the train loader
                # is process-sharded under multi-host DP, so build a
                # non-sharded loader — every host derives IDENTICAL weights
                # (they are baked into the jitted step as constants)
                from seg2eye_tpu.data.loader import DataLoader
                full = DataLoader(self.train_loader.dataset,
                                  batch_size=args.batch_size,
                                  shuffle=False, drop_last=False, prefetch=0)
                weight = calculate_weights_labels(
                    root, args.dataset, full, self.nclass,
                    save=self._primary)
        self.criterion = SegmentationLosses(
            weight=weight).build_loss(mode=args.loss_type)

        self.evaluator = Evaluator(self.nclass)
        self.scheduler = LRScheduler(args.lr_scheduler, args.lr,
                                     args.epochs, len(self.train_loader))
        self.tx = make_optimizer(args)
        self.mesh = default_mesh(args.batch_size)

        rng = jax.random.PRNGKey(args.seed)
        dummy = jnp.zeros((1, args.crop_size, args.crop_size, 3),
                          jnp.float32)
        variables = self.model.init(rng, dummy, train=False)
        self.state = {"params": variables["params"],
                      "batch_stats": variables.get("batch_stats", {}),
                      "opt": self.tx.init(variables["params"])}
        self.state = self._place(self.state)
        self._rng = jax.random.PRNGKey(args.seed + 1)
        self.train_step = self._build_train_step()
        self.eval_step = self._build_eval_step()

        # Resuming checkpoint (train.py:72-91)
        self.best_pred = 0.0
        if args.resume is not None:
            template = {"epoch": 0, "best_pred": 0.0,
                        **jax.device_get(self.state)}
            ckpt = Saver.load_checkpoint(template, args.resume)
            args.start_epoch = int(ckpt["epoch"])
            new = {"params": ckpt["params"],
                   "batch_stats": ckpt["batch_stats"],
                   "opt": ckpt["opt"] if not args.ft else self.state["opt"]}
            self.state = self._place(new)
            self.best_pred = float(ckpt["best_pred"])
            print(f"=> loaded checkpoint '{args.resume}' "
                  f"(epoch {ckpt['epoch']})")
        if args.ft:
            args.start_epoch = 0

    # ------------------------------------------------------------------ #
    def _place(self, state: Dict) -> Dict:
        if self.mesh is None:
            return state
        from seg2eye_tpu.parallel.sharding import replicate_state
        return replicate_state(state, self.mesh)

    def _compute_dtype(self):
        """--precision: bf16 convs via the models' input-dtype-following
        policy (models/deeplab.py ConvBN); f32 default = reference parity."""
        return jnp.bfloat16 if getattr(self.args, "precision",
                                       "float32") == "bfloat16" \
            else jnp.float32

    def _build_train_step(self):
        model, criterion, tx = self.model, self.criterion, self.tx
        freeze_bn = bool(self.args.freeze_bn)
        dtype = self._compute_dtype()

        def step(state, image, target, lr, rng):
            image = image.astype(dtype)
            state["opt"].hyperparams["learning_rate"] = lr

            def loss_fn(params):
                variables = {"params": params,
                             "batch_stats": state["batch_stats"]}
                if freeze_bn:
                    logits = model.apply(
                        variables, image, train=False, deterministic=False,
                        rngs={"dropout": rng})
                    new_bs = state["batch_stats"]
                else:
                    logits, mut = model.apply(
                        variables, image, train=True, deterministic=False,
                        rngs={"dropout": rng}, mutable=["batch_stats"])
                    new_bs = mut["batch_stats"]
                return criterion(logits, target), (logits, new_bs)

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"])
            updates, new_opt = tx.update(grads, state["opt"],
                                         state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            return ({"params": new_params, "batch_stats": new_bs,
                     "opt": new_opt}, loss, logits)

        # donate the train state: params/momentum/batch-stats are updated via
        # input-output aliasing instead of a second copy (self.state is always
        # reassigned; checkpoint device_gets read the current state only)
        return training_jit(step, donate_argnums=(0,))

    def _build_eval_step(self):
        model, criterion, nclass = self.model, self.criterion, self.nclass
        dtype = self._compute_dtype()

        def step(params, batch_stats, image, target):
            variables = {"params": params, "batch_stats": batch_stats}
            logits = model.apply(variables, image.astype(dtype), train=False,
                                 deterministic=True)
            loss = criterion(logits, target)
            pred = jnp.argmax(logits, axis=-1)
            return loss, confusion_matrix(target, pred, nclass)

        return jax.jit(step)

    def _device(self, sample: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        db = device_batch({"image": np.asarray(sample["image"]),
                           "label": np.asarray(sample["label"])}, self.mesh)
        return db["image"], db["label"]

    # ------------------------------------------------------------------ #
    def training(self, epoch: int, step_hook=None) -> float:
        """``step_hook(step_in_epoch, loss_float)``: observability/test hook
        (the reference's tqdm postfix + per-iter scalar, train.py:108-110)."""
        from seg2eye_tpu.data.loader import device_prefetch
        train_loss = 0.0
        num_img_tr = len(self.train_loader)
        if num_img_tr == 0:
            raise RuntimeError(
                f"train loader yields no batches: {len(self.train_loader.dataset)} "
                f"samples < global batch_size {self.args.batch_size} with "
                f"drop_last — reduce --batch-size")
        i, sample = 0, None
        # host->device transfer of the next batch overlaps the in-flight
        # step (the remote-TPU tunnel makes transfer the loop bottleneck)
        prefetched = device_prefetch(iter(self.train_loader),
                                     lambda s: (s, self._device(s)), depth=1)
        for i, (sample, (image, target)) in enumerate(prefetched):
            lr = self.scheduler(i, epoch)
            self._rng, sub = jax.random.split(self._rng)
            self.state, loss, logits = self.train_step(
                self.state, image, target, jnp.float32(lr), sub)
            train_loss += float(loss)
            if step_hook is not None:
                step_hook(i, float(loss))
            self.writer.update_current_step(i + num_img_tr * epoch)
            self.writer.add_scalar("train/total_loss_iter", float(loss))

            # 10 * 3 inference results each epoch (train.py:112-115).
            # Multi-process DP: logits are sharded across hosts and the
            # local shard isn't the first-3 grid — skip the image dump
            # (scalars still log everywhere).
            if i % max(1, num_img_tr // 10) == 0 \
                    and jax.process_count() == 1:
                self.summary.visualize_image(
                    self.writer, self.args.dataset,
                    np.asarray(sample["image"]), np.asarray(sample["label"]),
                    np.asarray(jax.device_get(logits)),
                    i + num_img_tr * epoch)

        self.writer.update_current_step(epoch)
        self.writer.add_scalar("train/total_loss_epoch", train_loss)
        print("[Epoch: %d, numImages: %5d]"
              % (epoch, i * self.args.batch_size + len(sample["image"])))
        print("Loss: %.3f" % train_loss)

        if self.args.no_val and self._primary:
            self.saver.save_checkpoint(
                {"epoch": epoch + 1, "best_pred": self.best_pred,
                 **jax.device_get(self.state)}, is_best=False)
        return train_loss

    def validation(self, epoch: int) -> float:
        self.evaluator.reset()
        if len(self.val_loader) == 0:
            raise RuntimeError("val loader yields no batches")
        test_loss = 0.0
        i, sample = 0, None
        for i, sample in enumerate(self.val_loader):
            image, target = self._device(sample)
            loss, conf = self.eval_step(self.state["params"],
                                        self.state["batch_stats"],
                                        image, target)
            test_loss += float(loss)
            self.evaluator.add_matrix(conf)

        acc = self.evaluator.pixel_accuracy()
        acc_class = self.evaluator.pixel_accuracy_class()
        miou = self.evaluator.mean_intersection_over_union()
        fwiou = self.evaluator.frequency_weighted_intersection_over_union()
        self.writer.update_current_step(epoch)
        self.writer.add_scalar("val/total_loss_epoch", test_loss)
        self.writer.add_scalar("val/mIoU", miou)
        self.writer.add_scalar("val/Acc", acc)
        self.writer.add_scalar("val/Acc_class", acc_class)
        self.writer.add_scalar("val/fwIoU", fwiou)
        print("Validation:")
        print("[Epoch: %d, numImages: %5d]"
              % (epoch, i * self.args.batch_size + len(sample["image"])))
        print(f"Acc:{acc}, Acc_class:{acc_class}, mIoU:{miou}, "
              f"fwIoU: {fwiou}")
        print("Loss: %.3f" % test_loss)

        if miou > self.best_pred:
            self.best_pred = miou              # tracked on every process
            if self._primary:
                self.saver.save_checkpoint(
                    {"epoch": epoch + 1, "best_pred": self.best_pred,
                     **jax.device_get(self.state)}, is_best=True)
        return miou


# --------------------------------------------------------------------- #
EPOCHS = {"coco": 30, "cityscapes": 200, "pascal": 50}
LRS = {"coco": 0.1, "cityscapes": 0.01, "pascal": 0.007}


def build_argparser() -> argparse.ArgumentParser:
    """The reference CLI surface (train.py:179-248).  --no-cuda forces the
    CPU backend; --gpu-ids and --sync-bn are accepted for compatibility
    (device selection and BN sync are the mesh's job here)."""
    p = argparse.ArgumentParser(description="JAX DeeplabV3Plus Training")
    p.add_argument("--backbone", type=str, default="resnet",
                   choices=["resnet", "xception", "drn", "mobilenet"])
    p.add_argument("--out-stride", type=int, default=16)
    p.add_argument("--dataset", type=str, default="pascal",
                   choices=["pascal", "coco", "cityscapes"])
    p.add_argument("--use-sbd", action="store_true", default=True)
    p.add_argument("--workers", type=int, default=4, metavar="N")
    p.add_argument("--base-size", type=int, default=513)
    p.add_argument("--crop-size", type=int, default=513)
    p.add_argument("--sync-bn", type=bool, default=None)
    p.add_argument("--freeze-bn", type=bool, default=False)
    p.add_argument("--loss-type", type=str, default="ce",
                   choices=["ce", "focal"])
    p.add_argument("--epochs", type=int, default=None, metavar="N")
    p.add_argument("--start_epoch", type=int, default=0, metavar="N")
    p.add_argument("--batch-size", type=int, default=None, metavar="N")
    p.add_argument("--test-batch-size", type=int, default=None, metavar="N")
    p.add_argument("--use-balanced-weights", action="store_true",
                   default=False)
    p.add_argument("--lr", type=float, default=None, metavar="LR")
    p.add_argument("--lr-scheduler", type=str, default="poly",
                   choices=["poly", "step", "cos"])
    p.add_argument("--momentum", type=float, default=0.9, metavar="M")
    p.add_argument("--weight-decay", type=float, default=5e-4, metavar="M")
    p.add_argument("--nesterov", action="store_true", default=False)
    p.add_argument("--no-cuda", action="store_true", default=False)
    p.add_argument("--gpu-ids", type=str, default="0")
    p.add_argument("--seed", type=int, default=1, metavar="S")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--checkname", type=str, default=None)
    p.add_argument("--ft", action="store_true", default=False)
    p.add_argument("--eval-interval", type=int, default=1)
    p.add_argument("--no-val", action="store_true", default=False)
    p.add_argument("--data-root", type=str, default=None,
                   help="dataset root (replaces the reference's hardcoded "
                        "mypath.py paths); default $SEG2EYE_DATA_ROOT or "
                        "./datasets")
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype for the DeepLab convs (TPU-native "
                        "mixed precision: params, BN statistics and the "
                        "loss stay f32).  Default float32 = exact reference "
                        "semantics (the reference trainer has no AMP)")
    return p


def finalize_args(args) -> argparse.Namespace:
    """Per-dataset defaults (train.py:250-290)."""
    n_dev = jax.device_count()
    if args.sync_bn is None:
        args.sync_bn = n_dev > 1          # auto: synced whenever DP is on
    if args.epochs is None:
        args.epochs = EPOCHS[args.dataset.lower()]
    if args.batch_size is None:
        args.batch_size = 4 * n_dev
    if args.test_batch_size is None:
        args.test_batch_size = args.batch_size
    if args.lr is None:
        args.lr = LRS[args.dataset.lower()] / (4 * n_dev) * args.batch_size
    if args.checkname is None:
        args.checkname = "deeplab-" + str(args.backbone)
    return args


def main(argv: Optional[list] = None) -> SegTrainer:
    args = finalize_args(build_argparser().parse_args(argv))
    print(args)
    trainer = SegTrainer(args)
    print("Starting Epoch:", trainer.args.start_epoch)
    print("Total Epoches:", trainer.args.epochs)
    for epoch in range(trainer.args.start_epoch, trainer.args.epochs):
        trainer.training(epoch)
        if not trainer.args.no_val and \
                epoch % args.eval_interval == (args.eval_interval - 1):
            trainer.validation(epoch)
    trainer.writer.close()
    return trainer
