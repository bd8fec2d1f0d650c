"""Probe TPU XLA flag variants on the fused G+D training step.

The fused step already sustains ~95% of XLA's conv-emitter ceiling
(BASELINE.md "Component roofline"), so the only remaining single-chip
lever outside the program itself is the compiler's own tuning surface.
The one knob that plausibly moves conv-dominated programs is the scoped
VMEM budget (`--xla_tpu_scoped_vmem_limit_kib`): it bounds how large
fusions may get before spilling to HBM, and both directions can win
(bigger fusions = fewer HBM round trips; smaller = better overlap).

Each variant must be a FRESH process (XLA flags are read at backend
init), so this spawns one subprocess per variant that compiles and times
the bs=16 `--reuse_fake` step exactly as bench.py does (pipelined chain,
honest device_get sync — BASELINE.md "Timing methodology").  Expect
~10 min of compile per non-default variant over the remote-TPU tunnel
(new flag set = new persistent-cache key).

    python tools/probe_xla_flags.py [--steps 20] \
        [--out evidence/xla_flags_probe.json]

Recorded close-out or adoption lives in BASELINE.md.

MEASURED CLOSE-OUT (driver round 3, evidence/xla_flags_probe.json): the
remote-TPU (axon) client build registers NO xla_tpu_* flags locally —
``Unknown flag in XLA_FLAGS: --xla_tpu_scoped_vmem_limit_kib`` — and the
compile happens server-side behind the tunnel, so the TPU compiler-flag
tuning surface is unreachable in this environment.  The default-flags
step re-measured 162.0 ms (98.8 img/s), consistent with bench.py.  Rerun
this probe if the environment ever moves to a direct TPU runtime.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "default": "",
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
}

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from seg2eye_tpu.utils.platform import configure_from_env
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join({repo!r}, ".jax_cache"))
configure_from_env()
import jax
import numpy as np
from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.options import Options
from seg2eye_tpu.train import state as state_lib
from seg2eye_tpu.train.steps import StepFunctions

steps_n = int(sys.argv[1])
opt = Options(batchSize=16, compute_dtype="bfloat16",
              reuse_fake=True).finalize()
model = Pix2Pix(opt)
state = state_lib.create_state(model, jax.random.PRNGKey(0))
steps = StepFunctions(model, donate=True)
rng = np.random.default_rng(0)
h, w = opt.image_height, opt.image_width
batch = {{
    "label": jax.numpy.asarray(
        rng.integers(0, 4, (16, h, w)).astype(np.uint8)),
    "style_image": jax.numpy.asarray(rng.integers(
        0, 256, (16, opt.input_ns, h, w, 1)).astype(np.uint8)),
    "target": jax.numpy.asarray(
        rng.integers(0, 256, (16, h, w, 1)).astype(np.uint8)),
}}
t0 = time.time()
state, losses, _ = steps.train_step(state, batch)          # compile+warm
_ = float(np.mean(np.asarray(losses["GAN"])))
compile_s = time.time() - t0
t0 = time.time()
for _i in range(steps_n):
    state, losses, _ = steps.train_step(state, batch)
_ = float(np.mean(np.asarray(losses["GAN"])))
step_s = (time.time() - t0) / steps_n
print("RESULT " + json.dumps({{"step_ms": step_s * 1000,
                               "img_s": 16 / step_s,
                               "compile_s": compile_s}}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="evidence/xla_flags_probe.json")
    args = ap.parse_args()

    results = {}
    for name, flags in VARIANTS.items():
        env = {**os.environ}
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        print(f"=== {name}: XLA_FLAGS={flags!r}", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=REPO),
             str(args.steps)],
            env=env, text=True, capture_output=True, cwd=REPO)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if proc.returncode != 0 or line is None:
            results[name] = {"error": proc.stderr[-500:]}
            print(f"  {name}: FAILED rc={proc.returncode}", file=sys.stderr)
            continue
        results[name] = json.loads(line[len("RESULT "):])
        print(f"  {name}: {results[name]['step_ms']:.1f} ms/step "
              f"({results[name]['img_s']:.1f} img/s)", file=sys.stderr)

    base = results.get("default", {}).get("step_ms")
    for name, r in results.items():
        if base and "step_ms" in r:
            r["vs_default"] = round(base / r["step_ms"], 4)
    out = {"metric": "xla_flags_probe", "bs": 16, "reuse_fake": True,
           "steps": args.steps, "variants": results}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
