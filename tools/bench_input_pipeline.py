"""Real-loop throughput: host H5 loading + transfer + fused train step.

bench.py times the device step on device-resident synthetic batches; THIS
tool times the production path — DataLoader (H5 read, PIL resize, style
sampling) -> device_prefetch -> fused G+D step — and so measures what the
host input pipeline and host->device transport cost on top.

Compares transport/caching configurations:
  legacy   : f32 transport, no resize cache (round-1 behavior)
  default  : uint8 transport (in-graph normalize) + host resize cache +
             threaded device_prefetch

Usage: python tools/bench_input_pipeline.py [--steps 30] [--data H5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from seg2eye_tpu.data import schema  # noqa: E402
from seg2eye_tpu.data.loader import create_dataloader, device_prefetch  # noqa: E402
from seg2eye_tpu.models.pix2pix import Pix2Pix  # noqa: E402
from seg2eye_tpu.options import Options  # noqa: E402
from seg2eye_tpu.train import state as state_lib  # noqa: E402
from seg2eye_tpu.train.loop import device_batch  # noqa: E402
from seg2eye_tpu.train.steps import StepFunctions  # noqa: E402


def run(name: str, opt: Options, steps_n: int) -> float:
    model = Pix2Pix(opt)
    steps = StepFunctions(model)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    loader = create_dataloader(opt)

    def batches():
        while True:
            yield from loader

    it = device_prefetch(batches(), lambda b: (b, device_batch(b)), depth=1)
    # warmup: compile + one epoch of cache fill
    for _ in range(max(len(loader), 3)):
        _, db = next(it)
        state, losses, _ = steps.train_step(state, db)
    float(np.mean(np.asarray(losses["GAN"])))

    t0 = time.time()
    for _ in range(steps_n):
        _, db = next(it)
        state, losses, _ = steps.train_step(state, db)
    float(np.mean(np.asarray(losses["GAN"])))     # honest sync
    dt = (time.time() - t0) / steps_n
    print(f"{name:>8}: {dt * 1e3:8.1f} ms/step  "
          f"{opt.batchSize / dt:6.1f} img/s  (bs{opt.batchSize})")
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--data", default="runs/convergence_data.h5")
    ap.add_argument("--legacy_only", action="store_true")
    ap.add_argument("--default_only", action="store_true")
    ap.add_argument("--reuse_fake", action="store_true",
                    help="bench the recommended fast config")
    args = ap.parse_args()

    if not os.path.exists(args.data):
        schema.write_synthetic_h5(
            args.data, users=("U001", "U002", "U003", "U004"),
            n_ss=24, n_gen=8, n_seq=4, seed=0, learnable=True)

    base = dict(batchSize=args.bs, dataroot=args.data,
                compute_dtype="bfloat16", reuse_fake=args.reuse_fake)
    if not args.default_only:
        run("legacy", Options(**base, device_normalize=False,
                              host_cache_mb=0).finalize(), args.steps)
    if not args.legacy_only:
        run("default", Options(**base).finalize(), args.steps)


if __name__ == "__main__":
    main()
