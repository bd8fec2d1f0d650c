"""Export a trained RefineNet or SegNet checkpoint as an AOT serving
artifact.

    python tools/export_refinenet_serving.py --model refinenet \
        --resume_from OUTPUT_DIR [--out_dir DIR] [--platforms cpu,tpu] \
        [--verify] [other RefineNetConfig flags]

Same artifact layout as the Seg2Eye export (program.jaxexport +
variables.msgpack + meta.json), loadable with
seg2eye_tpu.serving.load_serving — no model code, config, or tracing at
serving time; batch-polymorphic.  The reference's only inference story for
this system is re-running evaluate_{refinenet,segnet}.py inside the
training repo (refinenet/evaluate_refinenet.py:83-128).

--verify reloads the artifact and checks it against the live model on a
random batch.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import numpy as np                                         # noqa: E402


def main() -> int:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--model", choices=("refinenet", "segnet"),
                     default="refinenet")
    pre.add_argument("--out_dir", default=None,
                     help="default: <resume_from>/serving_<model>")
    pre.add_argument("--platforms", default="cpu,tpu")
    pre.add_argument("--verify", action="store_true")
    ns, rest = pre.parse_known_args()

    import jax
    from seg2eye_tpu.refinenet.checkpoint_manager import CheckpointManager
    from seg2eye_tpu.refinenet.config import RefineNetConfig
    from seg2eye_tpu.refinenet.model import RefineNetModel, SegNetModel
    from seg2eye_tpu.refinenet.training import Trainer
    from seg2eye_tpu.serving import export_refiner, load_serving

    cfg = RefineNetConfig.from_args(rest)
    assert cfg.resume_from, "--resume_from OUTPUT_DIR required"
    if ns.model == "refinenet":
        model = RefineNetModel(cfg)
        trainer = Trainer(model, cfg, loss_key="eds_loss")
    else:
        model = SegNetModel(cfg)
        trainer = Trainer(model, cfg, loss_key="ce_loss")
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    step, state = CheckpointManager(cfg.resume_from,
                                    cfg.checkpoints_keep_n
                                    ).load_last_checkpoint(state)
    if step is None:                   # never silently export random weights
        raise SystemExit(
            f"no checkpoint found under '{cfg.resume_from}/checkpoints' — "
            "a random-weights serving artifact would be garbage; check "
            "--resume_from")
    print(f"loaded checkpoint at step {step}")

    out_dir = ns.out_dir or os.path.join(cfg.resume_from,
                                         f"serving_{ns.model}")
    export_refiner(model, jax.device_get(state["variables"]), out_dir,
                   platforms=tuple(ns.platforms.split(",")))
    size = sum(os.path.getsize(os.path.join(out_dir, f))
               for f in os.listdir(out_dir))
    print(f"exported {ns.model} serving artifact -> {out_dir} "
          f"({size / 1e6:.1f} MB, platforms={ns.platforms}, "
          f"batch-polymorphic)")

    if ns.verify:
        served = load_serving(out_dir)
        rng = np.random.default_rng(0)
        h, w = cfg.input_height, cfg.input_width
        ch = 3 if ns.model == "refinenet" else 1
        x = rng.integers(0, 256, (2, h, w, ch)).astype(np.uint8)
        out = trainer.eval_step(state["variables"], {"input": x})
        if ns.model == "refinenet":
            pred_s, pred_u8_s = served(x)
            live = np.asarray(out["prediction"], np.float32)
            diff = np.abs(pred_s - live).max()
            live_u8 = np.clip((live + 1.0) * 255.0 / 2.0,
                              0, 255).astype(np.uint8)[..., 0]
            d_u8 = np.abs(pred_u8_s.astype(np.int32)
                          - live_u8.astype(np.int32)).max()
            ok = diff < 1e-4 and d_u8 <= 1
            print(f"verify: max|artifact - live| = {diff:.2e}, "
                  f"submission-u8 drift {d_u8} ({'OK' if ok else 'MISMATCH'})")
        else:
            pred_s = served(x)
            live = np.asarray(out["prediction"]).astype(np.uint8)
            mismatch = int((pred_s != live).sum())
            ok = mismatch == 0
            print(f"verify: class-map mismatches = {mismatch}/{live.size} "
                  f"({'OK' if ok else 'MISMATCH'})")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
