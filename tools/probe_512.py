"""Probe the historical size-512 geometry on the chip (round-5).

Round-4 measured the 512 row at bs=2 / MFU 22.6%, and bs=4 crashed the
remote compile helper with HTTP 500 (BASELINE.md "Round-5 close-out").
Round-5 root-caused the crash by reproducing it locally on a small-batch
crop-128 config: XLA's space-to-batch converter CHECK-fails while
propagating a backprop-filter convolution
(space_to_batch_converter.cc:2011, "Operands to select must be the same
shape; got f32[...] and pred[...]") and SIGABRTs the compile helper.  The
pass only activates at small batch — exactly the 512 regime — so each
variant here runs in a subprocess with
``--xla_disable_hlo_passes=space-to-batch-converter`` (a generic
DebugOptions flag; the axon helper forwards proto-backed xla_* flags
per-compile even though xla_tpu_* tuning flags are unreachable, see
evidence/xla_flags_probe.json) and/or the ``--remat`` generator
checkpointing, to find the best measured 512 configuration.

Usage:
  python tools/probe_512.py                       # default variant sweep
  python tools/probe_512.py --variants bs4_nostb  # one variant
Results merge into evidence/probe_512.json across runs.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVIDENCE = os.path.join(REPO, "evidence", "probe_512.json")

# name -> (bs, remat, disable_space_to_batch, crop_size)
VARIANTS = {
    "bs2_default": (2, False, False, 512),
    "bs2_nostb": (2, False, True, 512),
    "bs4_nostb": (4, False, True, 512),
    "bs8_nostb": (8, False, True, 512),
    "bs4_remat_nostb": (4, True, True, 512),
    "bs8_remat_nostb": (8, True, True, 512),
    "bs16_nostb": (16, False, True, 512),
    "bs16_remat_nostb": (16, True, True, 512),
    # headline-256 guard: disabling the pass must not regress the bs16
    # crop-256 headline (162-164 ms in BENCH_r04) before it can go global
    "c256_bs16_nostb": (16, False, True, 256),
    "c256_bs16_nostb_reuse0": (16, False, True, -256),
}


def worker(bs: int, remat: bool, steps_n: int,
           crop_size: int = 512) -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    sys.path.insert(0, REPO)
    from seg2eye_tpu.utils.platform import configure_from_env
    configure_from_env()
    import jax
    import numpy as np

    import bench

    t0 = time.time()
    # negative crop encodes reuse_fake=False (the ref-semantics arm)
    reuse = crop_size > 0
    state, steps, batch = bench._setup(bs, reuse, abs(crop_size), remat)
    compile_s = time.time() - t0

    flops = 0.0
    try:
        cost = steps.train_step.lower(state, batch).compile(
            compiler_options=getattr(steps, "compiler_options", None) or None
        ).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"[probe512] cost_analysis unavailable: {type(e).__name__}",
              file=sys.stderr)

    t0 = time.time()
    for _ in range(steps_n):
        state, losses, _ = steps.train_step(state, batch)
    sync = float(np.mean(np.asarray(losses["GAN"])))   # honest device sync
    step_s = (time.time() - t0) / steps_n
    assert np.isfinite(sync), f"non-finite loss under this variant: {sync}"

    from seg2eye_tpu.utils.roofline import peak_flops
    peak = peak_flops(jax.devices()[0])
    mfu = (flops / step_s / peak) if (peak and flops) else 0.0
    print("PROBE512 " + json.dumps({
        "bs": bs, "remat": remat, "steps": steps_n,
        "crop_size": abs(crop_size), "reuse_fake": reuse,
        "compile_s": round(compile_s, 1),
        "step_ms": round(step_s * 1000, 1),
        "img_s": round(bs / step_s, 2),
        "mfu": round(mfu, 4),
        "flops_per_step": flops,
        "loss_gan": sync,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--bs", type=int)
    ap.add_argument("--remat", type=int, default=0)
    ap.add_argument("--crop", type=int, default=512)
    args = ap.parse_args()

    if args.worker:
        worker(args.bs, bool(args.remat), args.steps, args.crop)
        return

    results = {}
    if os.path.exists(EVIDENCE):
        with open(EVIDENCE) as f:
            results = json.load(f).get("variants", {})

    for name in args.variants:
        bs, remat, nostb, crop = VARIANTS[name]
        env = dict(os.environ)
        if not nostb:
            # training_jit disables the pass by default now; this arm
            # re-enables it to measure/SIGABRT the stock behavior
            env["SEG2EYE_SPACE_TO_BATCH"] = "1"
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--bs", str(bs), "--remat", str(int(remat)),
               "--crop", str(crop), "--steps", str(args.steps)]
        print(f"[probe512] {name}: bs={bs} remat={remat} nostb={nostb}",
              file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                               timeout=args.timeout)
        except subprocess.TimeoutExpired:
            results[name] = {"error": f"timeout after {args.timeout}s"}
            continue
        rec = None
        for line in r.stdout.splitlines():
            if line.startswith("PROBE512 "):
                rec = json.loads(line[len("PROBE512 "):])
        if r.returncode == 0 and rec is not None:
            rec["wall_s"] = round(time.time() - t0, 1)
            rec["space_to_batch_disabled"] = nostb
            results[name] = rec
            print(f"[probe512] {name}: {rec['img_s']} img/s "
                  f"({rec['step_ms']} ms, MFU {rec['mfu']:.1%})",
                  file=sys.stderr, flush=True)
        else:
            tail = (r.stderr or r.stdout)[-1500:]
            results[name] = {"error": f"rc={r.returncode}", "tail": tail}
            print(f"[probe512] {name}: FAILED rc={r.returncode}\n{tail}",
                  file=sys.stderr, flush=True)
        os.makedirs(os.path.dirname(EVIDENCE), exist_ok=True)
        with open(EVIDENCE, "w") as f:
            json.dump({"metric": "probe_512", "crop_size": 512,
                       "note": "space-to-batch CHECK-fail root cause; "
                               "see tools/probe_512.py docstring",
                       "variants": results}, f, indent=1)
    print(json.dumps({"metric": "probe_512", "variants": results}))


if __name__ == "__main__":
    main()
