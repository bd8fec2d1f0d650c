"""Roofline of the RefineNet/SegNet (DeepLabV3+) train step on one chip.

The Seg2Eye G+D step has a full component roofline (tools/bench_components.py,
BASELINE.md: 112 TF/s, ~95% of XLA's conv-emitter ceiling); the DeepLab step
(the challenge-winning RefineNet path, reference refinenet/train_refinenet.py)
only ever had a wall-clock figure (~0.11-0.14 s/step bs8).  This prints the
same measured-ms / XLA-FLOP / achieved-TF/s / MFU breakdown for:

  * DeepLab forward (train-mode batch stats),
  * the full jitted SGD train step (fwd+bwd+momentum update),
  * the eval step (running stats),

for RefineNet (num_classes=1, 3ch input) and/or SegNet (num_classes=4),
at the production geometry (640x400, bf16, bs from config).

Usage: python tools/bench_deeplab_step.py [--bs 8] [--model refinenet|segnet|both]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
import numpy as np                                       # noqa: E402

from seg2eye_tpu.refinenet.config import RefineNetConfig  # noqa: E402
from seg2eye_tpu.refinenet.model import (RefineNetModel,  # noqa: E402
                                         SegNetModel)
from seg2eye_tpu.refinenet.training import Trainer       # noqa: E402
from seg2eye_tpu.utils.roofline import (flops_of, peak_flops,  # noqa: E402
                                        report as _report, timeit)

PEAK = peak_flops()


def report(name, t, fl):
    _report(name, t, fl, PEAK, width=30)


def make_batch(cfg: RefineNetConfig, bs: int, channels: int,
               segnet: bool) -> dict:
    rng = np.random.default_rng(0)
    h, w = cfg.input_height, cfg.input_width
    batch = {"input": jnp.asarray(
        rng.integers(0, 256, (bs, h, w, channels)).astype(np.uint8))}
    if segnet:
        batch["target"] = jnp.asarray(
            rng.integers(0, 4, (bs, h, w)).astype(np.int32))
    else:
        batch["target"] = jnp.asarray(
            rng.integers(0, 256, (bs, h, w, 1)).astype(np.uint8))
    return batch


def bench_model(name: str, model, loss_key: str, cfg: RefineNetConfig,
                bs: int, channels: int, momentum: float):
    print(f"== {name} (backbone={cfg.backbone}, os{cfg.output_stride}, "
          f"{cfg.input_height}x{cfg.input_width}, bs={bs}, "
          f"{cfg.compute_dtype}) ==")
    trainer = Trainer(model, cfg, loss_key, momentum=momentum, donate=False)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(cfg, bs, channels, segnet=loss_key == "ce_loss")
    lr = jnp.asarray(1e-4, jnp.float32)
    rng = jax.random.PRNGKey(1)

    fwd = jax.jit(lambda v, b, r: model.forward(v, b, train=True, rng=r))
    t = timeit(fwd, (state["variables"], batch, rng))
    report("fwd (train stats)", t, flops_of(fwd, state["variables"], batch,
                                            rng))

    t = timeit(trainer.train_step, (state, batch, lr, rng))
    fl = flops_of(trainer.train_step, state, batch, lr, rng)
    report("train step (fwd+bwd+sgd)", t, fl)
    print(f"{'':>30}  -> {bs / t:.1f} img/s/chip at bs={bs}")

    t = timeit(trainer.eval_step, (state["variables"], batch))
    report("eval step (running stats)", t,
           flops_of(trainer.eval_step, state["variables"], batch))
    print()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)    # refinenet.json batch
    ap.add_argument("--model", default="both",
                    choices=["refinenet", "segnet", "both"])
    ap.add_argument("--backbone", default="resnet")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="float32 reproduces the pre-round-4 behavior "
                         "(flax promoted everything to the f32 params)")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0].device_kind}  "
          f"peak {PEAK / 1e12:.0f} TF/s (bf16)")
    cfg = RefineNetConfig(batch_size=args.bs, backbone=args.backbone,
                          compute_dtype=args.dtype)
    if args.model in ("refinenet", "both"):
        bench_model("RefineNet", RefineNetModel(cfg), "eds_loss", cfg,
                    args.bs, channels=3, momentum=0.99)
    if args.model in ("segnet", "both"):
        bench_model("SegNet", SegNetModel(cfg), "ce_loss", cfg,
                    args.bs, channels=1, momentum=0.9)


if __name__ == "__main__":
    main()
