"""Export a trained Seg2Eye checkpoint as an AOT serving artifact.

    python tools/export_serving.py --name EXP --checkpoints_dir CKPTS \
        [--which_epoch latest] [--out_dir serving_artifact] \
        [--platforms cpu,tpu] [--verify]

Produces a self-contained directory (program.jaxexport + variables.msgpack +
meta.json) loadable with seg2eye_tpu.serving.load_serving — no model code,
Options, or tracing at serving time; batch-polymorphic (one artifact, any
batch size).  The reference has no serving story beyond re-running test.py
inside the training repo (test.py:13-28).

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
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--name", required=True)
    ap.add_argument("--checkpoints_dir", default="./checkpoints")
    ap.add_argument("--which_epoch", default="latest")
    ap.add_argument("--out_dir", default=None,
                    help="default: <expr_dir>/serving_<which_epoch>")
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering targets baked into the "
                         "artifact")
    ap.add_argument("--native_hw", default="640,400",
                    help="native eval size H,W for the [0,255] output "
                         "(OpenEDS native: 640,400)")
    ap.add_argument("--stats", choices=("running", "batch"),
                    default="running",
                    help="BN statistics baked into the serving program. "
                         "'running' (default) = proper eval mode: "
                         "deterministic per-sample outputs (batch-"
                         "composition-invariant) and 5-10%% faster at "
                         "bs=1/16 (evidence/serving_stats_study.json; "
                         "PARITY.md 'Serving statistics'). 'batch' = "
                         "exact reference semantics (its Tester never "
                         "calls .eval(), util/tester.py:98-121).")
    ap.add_argument("--verify", action="store_true",
                    help="reload the artifact and compare against the live "
                         "model on a random batch")
    args = ap.parse_args()

    import jax
    from seg2eye_tpu.models.pix2pix import Pix2Pix
    from seg2eye_tpu.options import Options
    from seg2eye_tpu.serving import export_inference, load_serving
    from seg2eye_tpu.train import state as state_lib
    from seg2eye_tpu.utils import checkpoint

    # restore the training config from the run's opt.pkl (as test.py's
    # --load_from_opt_file would)
    opt = Options.load(os.path.join(args.checkpoints_dir, args.name))
    opt.isTrain = False
    # serving default is running statistics (documented deviation from the
    # reference Tester's train-mode inference; evidence:
    # evidence/serving_stats_study.json) — --stats batch opts back into
    # exact reference semantics
    opt.eval_use_running_stats = args.stats == "running"
    opt.finalize()
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    state = checkpoint.load_state(state, opt, args.which_epoch,
                                  load_optim=False, strict=True)
    out_dir = args.out_dir or os.path.join(
        opt.expr_dir, f"serving_{args.which_epoch}")
    nh, nw = (int(v) for v in args.native_hw.split(","))
    export_inference(model, state.variables, out_dir, native_hw=(nh, nw),
                     platforms=tuple(args.platforms.split(",")))
    size = sum(os.path.getsize(os.path.join(out_dir, f))
               for f in os.listdir(out_dir))
    print(f"exported serving artifact -> {out_dir} ({size / 1e6:.1f} MB, "
          f"platforms={args.platforms}, batch-polymorphic)")

    if args.verify:
        served = load_serving(out_dir)
        rng = np.random.default_rng(0)
        h, w = opt.image_height, opt.image_width
        label = rng.integers(0, opt.semantic_nc, (2, h, w)).astype(np.uint8)
        style = rng.integers(0, 256, (2, opt.input_ns, h, w, 1)
                             ).astype(np.uint8)
        fake_s, f255_s = served(label, style)
        import jax.numpy as jnp
        from seg2eye_tpu.ops.image import to_255resized
        fake = model.inference(
            state.variables,
            {"label": jnp.asarray(label), "style_image": jnp.asarray(style)})
        f255 = np.asarray(to_255resized(fake, w=nw, h=nh))
        fake = np.asarray(fake)
        diff = np.abs(fake_s - fake).max()
        # resized [0,255] output: same shape (incl. H/W orientation) and
        # at most one truncated-integer step of drift
        d255 = (np.abs(f255_s - f255).max()
                if f255_s.shape == f255.shape else np.inf)
        ok = diff < 1e-4 and d255 <= 1
        print(f"verify: max|artifact - live| = {diff:.2e}, "
              f"fake_255 {f255_s.shape} drift {d255:.0f} "
              f"({'OK' if ok else 'MISMATCH'})")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
