"""Options / config system.

Mirrors the reference 3-stage argparse system (reference: options/base_options.py,
options/train_options.py, options/test_options.py) with a typed dataclass core.
The full reference flag surface is preserved so that reference invocations like

    python train.py --dataroot data.h5 --name exp --batchSize 8

keep working.  TPU-specific flags (mesh shape, compute dtype) are additive.

Persistence parity (reference: options/base_options.py:118-129):
  * ``opt.txt``  — human-readable, default-diffed dump
  * ``opt.pkl``  — pickled options, consumed by ``--load_from_opt_file``
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import pickle
from dataclasses import dataclass


@dataclass
class Options:
    # ------------------------------------------------------------------ #
    # experiment specifics (reference: options/base_options.py:19-31)
    # ------------------------------------------------------------------ #
    name: str = ""
    checkpoints_dir: str = "./checkpoints"
    model: str = "pix2pix"
    norm_G: str = "spectralspadebatch3x3"
    norm_D: str = "spectralinstance"
    norm_E: str = "spectralinstance"
    netG: str = "spadestyle"
    netD: str = "multiscale"
    netE: str = "conv"

    # input/output sizes (base_options.py:33-44)
    batchSize: int = 1
    preprocess_mode: str = "fixed"
    load_size: int = 256
    crop_size: int = 256
    aspect_ratio: float = 0.8
    label_nc: int = 4
    input_nc: int = 1
    output_nc: int = 1
    input_ns: int = 4
    style_aggr_method: str = "mean"           # mean | max
    style_sample_method: str = "random"       # random | first | ref_first | ref_randomN

    # inputs (base_options.py:46-58)
    dataroot: str = ""
    dataset_key: str = "train"
    dataset_mode: str = "openeds"
    serial_batches: bool = False
    no_flip: bool = False
    nThreads: int = 0
    load_from_opt_file: bool = False
    style_ref: str = ""
    seg_file: str = ""

    ngf: int = 64
    init_type: str = "xavier"
    init_variance: float = 0.02
    w_dim: int = 16
    nef: int = 16

    # generator arch (generator.py:14-19)
    num_upsampling_layers: str = "normal"     # normal | more | most

    # discriminator arch (discriminator.py:16-21, 70-73)
    netD_subarch: str = "n_layer"
    num_D: int = 2
    n_layers_D: int = 4

    # ------------------------------------------------------------------ #
    # train options (reference: options/train_options.py)
    # ------------------------------------------------------------------ #
    isTrain: bool = True
    display_freq: int = 5000
    print_freq: int = 500
    save_latest_freq: int = 5000
    save_epoch_freq: int = 1
    tf_log: bool = False
    validation_limit: int = 250
    write_error_log: bool = False
    full_val_freq: int = 50000

    continue_train: bool = False
    which_epoch: str = "latest"
    niter: int = 14
    niter_decay: int = 7
    optimizer: str = "adam"
    beta1: float = 0.5
    beta2: float = 0.999
    lr: float = 0.0002
    D_steps_per_G: int = 1
    weight_decay: float = 0.0

    ndf: int = 64
    lambda_feat: float = 10.0
    lambda_vgg: float = 10.0
    lambda_l2: float = 0.0
    lambda_l1: float = 0.0
    lambda_openeds: float = 0.0
    no_ganFeat_loss: bool = False
    no_vgg_loss: bool = True                  # train_options.py:51 set_defaults
    # converted VGG19 weights (tools/convert_torch_checkpoint.py --vgg19_pth)
    # for --no_vgg_loss=False; empty + VGG enabled -> random features error
    vgg_weights: str = ""
    gan_mode: str = "hinge"                   # ls | original | hinge | w
    no_TTUR: bool = False
    lambda_kld: float = 0.05
    lambda_style_w: float = 0.0
    lambda_style_feat: float = 0.0
    lambda_gram: float = 0.0

    # ------------------------------------------------------------------ #
    # test options (reference: options/test_options.py)
    # ------------------------------------------------------------------ #
    results_dir: str = "results/"
    how_many: float = float("inf")
    produce_npy: bool = False

    # ------------------------------------------------------------------ #
    # TPU-native additions (no reference equivalent)
    # ------------------------------------------------------------------ #
    seed: int = 0
    compute_dtype: str = "bfloat16"           # bfloat16 | float32 compute policy
    data_axis: int = 0                        # devices along the `data` mesh axis; 0 = all
    model_axis: int = 1                       # devices along the `model` mesh axis
    tp_min_channels: int = 256                # TP: shard conv kernels with >= this many out-channels
    prefetch: int = 2                         # host->device prefetch depth
    # Host-side LRU cache (MB) of deterministic image resizes — identical
    # outputs, skips redundant H5 read + PIL bicubic work across epochs/evals
    # on the hot 'fixed' path (small TPU hosts are input-bound; see
    # data/transforms.py ResizeCache). 0 disables.
    host_cache_mb: int = 1024
    # Ship images to the device as uint8 and run Normalize(0.5,0.5) in-graph
    # with the exact host formula (bit-identical f32): 4x less host->device
    # transfer + no host float conversion. Purely a transport optimization.
    device_normalize: bool = True
    eval_use_running_stats: bool = False      # reference never calls .eval(); parity=False
    max_steps: int = 0                        # 0 = unlimited; handy for smoke runs
    profile_steps: int = 0                    # trace N steps with jax.profiler
    # OPT-IN deviation: train D on the G-step's fake instead of regenerating
    # with the just-updated G params (the reference regenerates,
    # pix2pix_model.py:251-254). Standard GAN practice; ~35% faster steps.
    reuse_fake: bool = False
    # Spatial (context-parallel) eval/serving: shard activation H-bands over
    # the 'data' mesh axis so batches smaller than the device count still
    # use every chip (PARITY.md "spatial sharding"). test.py only.
    spatial_shard: bool = False
    # Reference-EXACT per-sample style encoding (auto | on | off).  The
    # reference encodes each sample's k style refs in a separate netE
    # forward (pix2pix_model.py:285,299-303): spectral-norm u advances once
    # PER SAMPLE, and a batch-subnorm encoder (norm_E='spectralbatch')
    # normalizes each sample's refs with stats over ITS OWN k images.  The
    # TPU-first default fuses the (B,k) axes into one encoder batch — same
    # math at B=1 or at the spectral fixed point, one XLA call.  'auto'
    # enables the exact lax.scan path only for a batch-subnorm encoder,
    # where the fused batch statistics would deviate persistently at B>1.
    per_sample_encode: str = "auto"
    # Rematerialize the generator's SPADE+Style blocks under autodiff
    # (jax.checkpoint / nn.remat): the backward pass recomputes each block's
    # internals instead of keeping them resident, trading ~1/3 extra G FLOPs
    # for a large cut in activation HBM.  Numerics are unchanged (same ops,
    # same order).  Off by default — the 256 geometry fits comfortably; the
    # historical 512 geometry uses it to fit larger per-chip batches.
    remat: bool = False

    # derived (filled by finalize(); base_options.py:158-161)
    semantic_nc: int = 4

    def finalize(self) -> "Options":
        self.semantic_nc = self.label_nc
        if self.per_sample_encode not in ("auto", "on", "off"):
            raise ValueError(
                f"--per_sample_encode must be auto|on|off, "
                f"got {self.per_sample_encode!r}")
        return self

    @property
    def per_sample_encode_enabled(self) -> bool:
        """'auto' resolves to ON exactly for a batch-subnorm encoder, where
        the fused (B*k) statistics deviate persistently from the reference's
        per-sample loop at B>1 (PARITY.md 'Batch-subnorm stats')."""
        if self.per_sample_encode == "auto":
            sub = (self.norm_E[len("spectral"):]
                   if self.norm_E.startswith("spectral") else self.norm_E)
            return sub == "batch"
        return self.per_sample_encode == "on"

    # image geometry used everywhere: 'fixed' preprocess resizes to
    # W=crop_size, H=round(crop_size/aspect_ratio) (data/base_dataset.py:67-70)
    @property
    def image_width(self) -> int:
        return self.crop_size

    @property
    def image_height(self) -> int:
        return round(self.crop_size / self.aspect_ratio)

    @property
    def expr_dir(self) -> str:
        return os.path.join(self.checkpoints_dir, self.name)

    def replace(self, **kw) -> "Options":
        return dataclasses.replace(self, **kw).finalize()

    # -------------------------- persistence --------------------------- #
    def save(self):
        os.makedirs(self.expr_dir, exist_ok=True)
        defaults = Options()
        lines = ["----------------- Options ---------------"]
        for f in sorted(dataclasses.fields(self), key=lambda f: f.name):
            v = getattr(self, f.name)
            comment = ""
            if v != getattr(defaults, f.name):
                comment = "\t[default: %s]" % str(getattr(defaults, f.name))
            lines.append("{:>25}: {:<30}{}".format(f.name, str(v), comment))
        lines.append("----------------- End -------------------")
        with open(os.path.join(self.expr_dir, "opt.txt"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
        with open(os.path.join(self.expr_dir, "opt.pkl"), "wb") as fh:
            pickle.dump(dataclasses.asdict(self), fh)

    @classmethod
    def load(cls, expr_dir: str) -> "Options":
        with open(os.path.join(expr_dir, "opt.pkl"), "rb") as fh:
            d = pickle.load(fh)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known}).finalize()


def _add_args(parser: argparse.ArgumentParser, defaults: Options, skip=()):
    """Auto-generate argparse flags from the dataclass (like the reference's
    explicit add_argument calls, options/base_options.py:19-66)."""
    for f in dataclasses.fields(Options):
        if f.name in ("semantic_nc", "isTrain") or f.name in skip:
            continue
        v = getattr(defaults, f.name)
        if isinstance(v, bool):
            if v:
                parser.add_argument("--no_" + f.name if not f.name.startswith("no_")
                                    else "--" + f.name[3:],
                                    dest=f.name, action="store_false")
                parser.add_argument("--" + f.name, dest=f.name, action="store_true",
                                    default=v)
            else:
                parser.add_argument("--" + f.name, action="store_true", default=v)
        else:
            parser.add_argument("--" + f.name, type=type(v), default=v)
    return parser


def parse_options(argv=None, is_train: bool = True, save: bool = None) -> Options:
    """CLI entry, mirrors TrainOptions().parse() / TestOptions().parse()."""
    defaults = Options()
    if not is_train:
        # test defaults (test_options.py:17-20)
        defaults = defaults.replace(serial_batches=True, no_flip=True)
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    _add_args(parser, defaults)
    ns, _ = parser.parse_known_args(argv)
    d = vars(ns)

    if d.get("load_from_opt_file"):
        # overlay saved options, then re-apply CLI (base_options.py:131-142)
        loaded = Options.load(os.path.join(d["checkpoints_dir"], d["name"]))
        merged = dataclasses.asdict(loaded)
        # CLI values that differ from (test-)defaults win over the loaded file
        for f in dataclasses.fields(Options):
            if f.name in d and d[f.name] != getattr(defaults, f.name):
                merged[f.name] = d[f.name]
        d = merged

    known = {f.name for f in dataclasses.fields(Options)}
    opt = Options(**{k: v for k, v in d.items() if k in known})
    opt.isTrain = is_train
    if not is_train:
        opt.serial_batches = True
        opt.no_flip = True
    opt.finalize()
    _print_options(opt, defaults)
    if save if save is not None else is_train:
        opt.save()
    return opt


def _print_options(opt: Options, defaults: Options) -> None:
    """Console dump with default diffs (base_options.py:99-109)."""
    print("----------------- Options ---------------")
    for f in sorted(dataclasses.fields(Options), key=lambda f: f.name):
        v = getattr(opt, f.name)
        comment = ""
        if f.name != "isTrain" and v != getattr(defaults, f.name):
            comment = "\t[default: %s]" % str(getattr(defaults, f.name))
        print("{:>25}: {:<30}{}".format(f.name, str(v), comment))
    print("----------------- End -------------------")
