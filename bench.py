"""Benchmark: fused G+D training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "train_images_per_sec_chip", "value": N, "unit": "images/sec",
   "vs_baseline": N / 2.5, ...}

Headline semantics: `--reuse_fake` throughput (D trains on the G-step's fake
instead of regenerating with the just-updated G params).  Promotion is
evidence-backed: matched 1500-step convergence studies on the learnable
synthetic set show identical validation-error trajectories with and without
the flag (evidence/convergence_baseline.jsonl and
evidence/convergence_reuse_fake.jsonl; BASELINE.md r2).
The exact-reference-semantics number is reported alongside
(`ref_semantics_images_per_sec`); training still defaults to reference
semantics (PARITY.md "Documented deviations").

Baseline note: the reference repo publishes no throughput numbers
(BASELINE.md).  Its historical training setup was batch size 1 on a single
>=10GB GPU with up to 120h wall time (scripts/current_runs_spadestyle.sh).  A
SPADE-class G+D step at 320x256 bs=1 on that class of GPU runs ~0.4 s/iter,
i.e. ~2.5 images/sec — used here as the vs_baseline denominator.

Timing methodology: this environment's remote TPU platform resolves
block_until_ready before execution finishes; a device_get of a loss scalar
per step is the honest synchronization.
"""
from __future__ import annotations

import json
import os
import sys
import time

from seg2eye_tpu.utils.platform import configure_from_env

# persistent compile cache: first-ever compile of the fused step takes
# ~10 min over the remote-TPU tunnel; cached runs start in seconds
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

configure_from_env()

import jax                                               # noqa: E402
# module scope on purpose: importing this inside measure()'s except handler
# would make `jax` a local of the whole function and unbind every other
# `jax.` reference there (the round-2 UnboundLocalError regression)
import jax.extend.backend                                # noqa: E402
import numpy as np                                       # noqa: E402

from seg2eye_tpu.models.pix2pix import Pix2Pix           # noqa: E402
from seg2eye_tpu.options import Options                  # noqa: E402
from seg2eye_tpu.train import state as state_lib         # noqa: E402
from seg2eye_tpu.train.steps import StepFunctions        # noqa: E402

from seg2eye_tpu.utils.roofline import peak_flops        # noqa: E402

ASSUMED_BASELINE_IMG_S = 2.5


def _setup(bs: int, reuse_fake: bool, crop_size: int = 256,
           remat: bool = False):
    opt = Options(batchSize=bs, compute_dtype="bfloat16",
                  reuse_fake=reuse_fake, crop_size=crop_size,
                  remat=remat).finalize()
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    steps = StepFunctions(model, donate=True)
    rng = np.random.default_rng(0)
    h, w = opt.image_height, opt.image_width
    # dtypes match the production loader under the device_normalize default:
    # uint8 class-id labels AND uint8 image transport, with the
    # (x/255-0.5)/0.5 normalize running in-graph — the measured program is
    # exactly the one the real loader-fed training loop executes
    # (data/transforms.py transform_images_batch; PARITY.md "uint8 device
    # transport")
    batch = {
        "label": jax.numpy.asarray(
            rng.integers(0, 4, (bs, h, w)).astype(np.uint8)),
        "style_image": jax.numpy.asarray(rng.integers(
            0, 256, (bs, opt.input_ns, h, w, 1)).astype(np.uint8)),
        "target": jax.numpy.asarray(
            rng.integers(0, 256, (bs, h, w, 1)).astype(np.uint8)),
    }
    # warmup / compile (may raise on OOM-ish compile failures)
    state, losses, _ = steps.train_step(state, batch)
    _sync = float(np.mean(np.asarray(losses["GAN"])))
    return state, steps, batch


def measure(bs_candidates, steps_n: int, reuse_fake: bool,
            crop_size: int = 256, remat: bool = False):
    state = steps = batch = None
    retry_sleep_s = int(os.environ.get("BENCH_RETRY_SLEEP_S", "120"))
    for ci, bs in enumerate(bs_candidates):
        # the preferred (first) batch size gets retries after a backend
        # reset: a transient tunnel/device wedge (e.g. HBM left allocated by
        # a killed earlier run, or the remote tunnel dropping and needing
        # time to re-establish) must not silently degrade the headline bs
        for attempt in range(3 if ci == 0 else 1):
            try:
                state, steps, batch = _setup(bs, reuse_fake, crop_size,
                                             remat)
                break
            # degrade batch size ONLY on resource/compile failures (OOM,
            # remote compile-helper crashes); numerical or shape regressions
            # (ValueError/TypeError/AssertionError/NaN) must fail loudly
            except (jax.errors.JaxRuntimeError, RuntimeError,
                    MemoryError) as e:
                print(f"[bench] bs={bs} attempt {attempt + 1} failed "
                      f"({type(e).__name__}: {str(e)[:200]})",
                      file=sys.stderr)
                jax.clear_caches()
                jax.extend.backend.clear_backends()
                # a wedged tunnel needs time to recover; retrying
                # immediately just re-enters the same wedge
                if ci == 0 and attempt + 1 < 3:
                    print(f"[bench] sleeping {retry_sleep_s}s before retry",
                          file=sys.stderr)
                    time.sleep(retry_sleep_s)
        if state is not None:
            break
    assert state is not None, "no batch size compiled"
    bs = batch["target"].shape[0]

    # roofline accounting: XLA's own cost analysis of the compiled fused
    # G+D step (forward+backward+optimizers), for the MFU figure
    flops_per_step = 0.0
    try:
        # same compiler options as the jitted step (utils/platform.py
        # training_jit): hits the cache instead of recompiling, and avoids
        # re-entering the space-to-batch crash at small batch
        cost = steps.train_step.lower(state, batch).compile(
            compiler_options=steps.compiler_options or None).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
    except Exception as e:                     # cost analysis is best-effort
        print(f"[bench] cost_analysis unavailable: {type(e).__name__}",
              file=sys.stderr)

    # (a) per-step latency with a host sync each step
    times = []
    for _ in range(steps_n):
        t0 = time.time()
        state, losses, _ = steps.train_step(state, batch)
        _sync = float(np.mean(np.asarray(losses["GAN"])))   # honest sync
        times.append(time.time() - t0)
    latency_s = float(np.median(times))

    # (b) pipelined throughput: chain steps via the donated state and sync
    # once at the end — this is how the training loop actually runs (it only
    # syncs at print_freq), so it is the honest throughput number.
    t0 = time.time()
    for _ in range(steps_n):
        state, losses, _ = steps.train_step(state, batch)
    _sync = float(np.mean(np.asarray(losses["GAN"])))
    step_s = (time.time() - t0) / steps_n
    peak = peak_flops(jax.devices()[0])
    mfu = (flops_per_step / step_s / peak) if (peak and flops_per_step) else 0.0
    print(f"[bench] crop={crop_size} reuse_fake={reuse_fake} bs={bs} "
          f"pipelined={step_s * 1000:.1f}ms/step, "
          f"synced latency={latency_s * 1000:.1f}ms ({steps_n} steps), "
          f"{flops_per_step / 1e12:.2f} TFLOP/step, "
          f"device={jax.devices()[0].device_kind!r}, "
          f"MFU={mfu * 100:.1f}%", file=sys.stderr)
    return {"bs": bs, "step_s": step_s, "img_s": bs / step_s, "mfu": mfu,
            "flops_per_step": flops_per_step}


def main() -> None:
    steps_n = int(os.environ.get("BENCH_STEPS", "8"))
    candidates = [int(os.environ["BENCH_BS"])] if "BENCH_BS" in os.environ \
        else [16, 8, 4]
    ref = measure(candidates, steps_n, reuse_fake=False)
    rf = measure([ref["bs"]], steps_n, reuse_fake=True)
    # Historical size-512 geometry (the published reference checkpoints came
    # from crop/load 512 runs, scripts/current_runs_spadestyle.sh:11,62):
    # one row at the 512x640 production shape so the config's fit and speed
    # on one chip are MEASURED, not assumed.  bs=8 is the measured best
    # (evidence/probe_512.json: 21.7 img/s, MFU 51%) now that
    # configure_from_env disables XLA's crashing space-to-batch pass —
    # round 4's bs=4 "HTTP 500" was that pass CHECK-failing, not OOM; bs=16
    # genuinely OOMs and generator remat alone doesn't save it (same file).
    # Best-effort: a 512 failure must not kill the headline
    # (skip with BENCH_SKIP_512=1).
    s512 = None
    if not os.environ.get("BENCH_SKIP_512"):
        try:
            s512 = measure([8, 4, 2], steps_n, reuse_fake=True,
                           crop_size=512)
        except Exception as e:                           # noqa: BLE001
            print(f"[bench] size-512 row failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
    extra = {}
    if s512 is not None:
        extra = {
            "size512_images_per_sec": round(s512["img_s"], 2),
            "size512_step_ms": round(s512["step_s"] * 1000, 1),
            "size512_batch_size": s512["bs"],
            "size512_mfu": round(s512["mfu"], 4),
        }
    print(json.dumps({
        "metric": "train_images_per_sec_chip",
        "value": round(rf["img_s"], 2),
        "unit": "images/sec",
        "vs_baseline": round(rf["img_s"] / ASSUMED_BASELINE_IMG_S, 2),
        "step_ms": round(rf["step_s"] * 1000, 1),
        "batch_size": rf["bs"],
        "mfu": round(rf["mfu"], 4),
        "flops_per_step": rf["flops_per_step"],
        # exact reference step semantics (D's fake regenerated post-G-update)
        "ref_semantics_images_per_sec": round(ref["img_s"], 2),
        "ref_semantics_step_ms": round(ref["step_s"] * 1000, 1),
        "ref_semantics_mfu": round(ref["mfu"], 4),
        "headline_note": "reuse_fake promoted on matched convergence "
                         "evidence (BASELINE.md r2)",
        **extra,
    }))


if __name__ == "__main__":
    main()
