#!/usr/bin/env python3
"""Cross-framework convergence twin (round-3 verdict item 2).

Runs the ACTUAL torch reference training dynamics — Pix2PixModel +
create_optimizers + the run_generator/run_discriminator step pair
(/root/reference/train.py:46-116, trainers/pix2pix_trainer.py:26-45) — on
CPU at a tiny config over a learnable synthetic batch stream, and our
training loop (seg2eye_tpu.train.steps.StepFunctions, reuse_fake=False =
exact reference semantics) from the SAME converted initial weights on the
SAME batch sequence.  Both are scored every eval_every steps with one shared
numpy scorer (the OpenEDS x1471 relative metric formula) on a held-out
validation set, plus per-step G/D loss trajectories.

The two trajectories cannot be bitwise-equal: the reference's per-sample
encoder loop advances spectral-norm u once per sample (intra-batch drift,
PARITY.md "spectral u drift"), the fused encode once per step.  The twin
therefore compares statistically: both must converge, with matching loss
curves (relative gap + correlation reported).

Writes evidence/<--out> (default torch_twin.json; torch_twin_ls.json holds
the second-config run: --gan_mode ls --lambdas lambda_gram=120,
lambda_style_feat=0.5).
Usage: JAX_PLATFORMS=cpu python tools/torch_twin.py [--steps 120]
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["JAX_PLATFORMS"] = "cpu"

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import numpy as np  # noqa: E402

CFG = dict(ngf=8, ndf=8, w_dim=8, crop_size=256, aspect_ratio=0.8,
           label_nc=4, num_D=2, n_layers_D=4)
LAM = dict(lambda_l2=10.0, lambda_style_w=1.0, lambda_feat=10.0,
           lambda_l1=0.0, lambda_openeds=0.0, lambda_style_feat=0.0,
           lambda_gram=0.0)
B, K, H, W = 2, 2, 320, 256
LR, WD = 2e-4, 0.0
GRAY = np.array([-0.8, -0.3, 0.2, 0.7], np.float32)
GAN_MODE = "hinge"


def make_stream(n_train=24, n_val=4, seed=5):
    """Learnable synthetic stream: blocky 4-class label maps; target = the
    per-class gray level + a fixed horizontal ramp; style refs = target +
    small per-ref noise (same 'user' appearance)."""
    rng = np.random.default_rng(seed)
    ramp = np.linspace(-0.05, 0.05, W, dtype=np.float32)[None, :]

    def batch():
        labels = np.zeros((B, H, W), np.int64)
        for b in range(B):
            for _ in range(6):
                c = int(rng.integers(0, 4))
                y0, x0 = int(rng.integers(0, H - 40)), int(rng.integers(0, W - 40))
                hh, ww = int(rng.integers(20, 120)), int(rng.integers(20, 120))
                labels[b, y0:y0 + hh, x0:x0 + ww] = c
        target = GRAY[labels] + ramp[None]
        target = np.clip(target, -1, 1)[..., None].astype(np.float32)
        style = np.stack([
            np.clip(target[:, :, :, 0] +
                    rng.normal(0, 0.02, (B, H, W)).astype(np.float32), -1, 1)
            for _ in range(K)], axis=1)[..., None]
        return {"label": labels, "style_image": style, "target": target}

    return [batch() for _ in range(n_train)], [batch() for _ in range(n_val)]


def score_batch(fake: np.ndarray, target: np.ndarray) -> float:
    """Shared numpy scorer: x1471 relative OpenEDS error on [-1,1] images
    (models/networks/loss.py:102-174 formula, truncating to_255)."""
    f = np.trunc((fake.astype(np.float64) + 1) * 255 / 2)
    t = np.trunc((target.astype(np.float64) + 1) * 255 / 2)
    per = np.sqrt(((f - t) ** 2).reshape(f.shape[0], -1).sum(1)) / (H * W)
    return float(per.mean() * 1471)


def run_torch(train_batches, val_batches, steps, eval_every, ref, seed=42):
    import torch

    from tools import _ref_compat

    _ref_compat.stub_torchvision()
    _ref_compat.add_reference_path(ref)
    _ref_compat.stub_util_tester()
    from models.pix2pix_model import Pix2PixModel

    topt = argparse.Namespace(
        isTrain=True, continue_train=False, gpu_ids=[],
        init_type="xavier", init_variance=0.02,
        no_ganFeat_loss=False, no_vgg_loss=True,
        gan_mode=GAN_MODE, style_aggr_method="mean",
        norm_G="spectralspadebatch3x3", norm_D="spectralinstance",
        norm_E="spectralinstance", semantic_nc=4, input_nc=1, output_nc=1,
        num_upsampling_layers="normal", netD_subarch="n_layer",
        no_TTUR=False, beta1=0.5, beta2=0.999, lr=LR, weight_decay=WD,
        **LAM, **CFG)
    torch.manual_seed(seed)
    model = Pix2PixModel(topt)
    model.train()
    sd0 = {n: {k: v.detach().numpy().copy()
               for k, v in m.state_dict().items()}
           for n, m in (("G", model.netG), ("E", model.netE),
                        ("D", model.netD))}
    with _ref_compat.float_betas_adam():
        opt_g, opt_d = model.create_optimizers(topt)

    def tdata(nb):
        return {
            "label": torch.from_numpy(nb["label"][:, None]),
            "style_image": torch.from_numpy(
                np.transpose(nb["style_image"], (0, 1, 4, 2, 3))),
            "target": torch.from_numpy(
                np.transpose(nb["target"], (0, 3, 1, 2))),
            "filename": ["x"] * B,
        }

    def evaluate():
        # The model stays in train mode for inference (reference Tester
        # semantics: batch stats, never .eval()), but in torch that ALSO
        # advances spectral-norm u in-place on every forward — a side
        # effect our functional inference discards.  Snapshot + restore so
        # the training trajectory is invariant to --eval_every, matching
        # the jax arm.
        saved = {n: {k: v.detach().clone()
                     for k, v in m.state_dict().items()}
                 for n, m in (("G", model.netG), ("E", model.netE),
                              ("D", model.netD))}
        scores = []
        with torch.no_grad():
            for nb in val_batches:
                d = tdata(nb)
                fake = model(d, mode="inference")
                scores.append(score_batch(
                    np.transpose(fake.numpy(), (0, 2, 3, 1)), nb["target"]))
        for n, m in (("G", model.netG), ("E", model.netE),
                     ("D", model.netD)):
            m.load_state_dict(saved[n], strict=True)
        return float(np.mean(scores))

    hist = {"step": [], "val": [], "g_loss": [], "d_loss": []}
    for it in range(steps):
        d = tdata(train_batches[it % len(train_batches)])
        # trainers/pix2pix_trainer.py:26-45 (G step then D step)
        opt_g.zero_grad()
        g_losses, _ = model(d, mode="generator")
        g_loss = sum(g_losses.values()).mean()
        g_loss.backward()
        opt_g.step()
        opt_d.zero_grad()
        d_losses = model(d, mode="discriminator")
        d_loss = sum(d_losses.values()).mean()
        d_loss.backward()
        opt_d.step()
        if it % eval_every == 0 or it == steps - 1:
            hist["step"].append(it)
            hist["val"].append(evaluate())
            hist["g_loss"].append(float(g_loss.detach()))
            hist["d_loss"].append(float(d_loss.detach()))
            print(f"[torch] step {it}: val {hist['val'][-1]:.2f} "
                  f"g {hist['g_loss'][-1]:.4f} d {hist['d_loss'][-1]:.4f}",
                  flush=True)
    return sd0, hist


def run_jax(sd0, train_batches, val_batches, steps, eval_every):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, "tests", ".jax_cache"))
    from seg2eye_tpu.models.pix2pix import Pix2Pix
    from seg2eye_tpu.options import Options
    from seg2eye_tpu.train import state as state_lib
    from seg2eye_tpu.train.steps import StepFunctions
    from seg2eye_tpu.utils import torch_convert as tc

    opt = Options(compute_dtype="float32", isTrain=True, input_ns=K,
                  batchSize=B, no_ganFeat_loss=False, gan_mode=GAN_MODE,
                  style_aggr_method="mean", lr=LR, weight_decay=WD,
                  reuse_fake=False, **LAM, **CFG).finalize()
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    variables = dict(state.variables)
    variables["G"] = tc.convert_generator(sd0["G"], variables["G"])
    variables["E"] = tc.convert_encoder(sd0["E"], variables["E"],
                                        w_dim=CFG["w_dim"])
    variables["D"] = tc.convert_discriminator(sd0["D"], variables["D"],
                                              num_d=CFG["num_D"],
                                              n_layers=CFG["n_layers_D"])
    state = state.replace(variables=variables)
    steps_fn = StepFunctions(model, donate=False)
    infer = jax.jit(lambda v, b: model.inference(v, b))

    def evaluate(st):
        scores = []
        for nb in val_batches:
            fake = infer(st.variables, {"label": jnp.asarray(nb["label"]),
                                        "style_image":
                                            jnp.asarray(nb["style_image"])})
            scores.append(score_batch(np.asarray(fake), nb["target"]))
        return float(np.mean(scores))

    hist = {"step": [], "val": [], "g_loss": [], "d_loss": []}
    for it in range(steps):
        nb = train_batches[it % len(train_batches)]
        jb = {k: jnp.asarray(v) for k, v in nb.items()}
        state, losses, _fake = steps_fn.train_step(state, jb)
        if it % eval_every == 0 or it == steps - 1:
            g = sum(float(np.mean(np.asarray(losses[k])))
                    for k in losses if not k.startswith("D/")
                    and not k.endswith("/raw"))
            d = sum(float(np.mean(np.asarray(losses[k])))
                    for k in ("D/Fake", "D/real"))
            hist["step"].append(it)
            hist["val"].append(evaluate(state))
            hist["g_loss"].append(g)
            hist["d_loss"].append(d)
            print(f"[jax]   step {it}: val {hist['val'][-1]:.2f} "
                  f"g {g:.4f} d {d:.4f}", flush=True)
    return hist


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument("--ref", default="/root/reference")
    p.add_argument("--gan_mode", default="hinge",
                   choices=("hinge", "original", "ls", "w"))
    p.add_argument("--lambdas", default="",
                   help="comma k=v overrides of the LAM dict, e.g. "
                        "lambda_gram=120,lambda_style_feat=0.5")
    p.add_argument("--out", default="torch_twin.json",
                   help="evidence filename (under evidence/)")
    p.add_argument("--extra_seeds", type=int, default=2,
                   help="number of extra torch init seeds for the within-"
                        "framework noise spread (one sample of a chaotic "
                        "GAN endpoint is a weak estimate; 2-3 averaged "
                        "samples make the 1.5x gate stable across reruns)")
    a = p.parse_args(argv)
    global GAN_MODE
    GAN_MODE = a.gan_mode
    for kv in filter(None, a.lambdas.split(",")):
        k, v = kv.split("=")
        assert k in LAM, k
        LAM[k] = float(v)

    train_batches, val_batches = make_stream()
    sd0, th = run_torch(train_batches, val_batches, a.steps, a.eval_every,
                        a.ref)
    # within-framework noise probes: the SAME reference loop from different
    # init seeds on the same batches — GAN val endpoints are chaotic, so the
    # cross-framework gap is judged against torch's own seed-to-seed spread
    # (the segnet_dp_twin methodology, applied honestly to a GAN).  The
    # spread is AVERAGED over --extra_seeds probes: one sample of a chaotic
    # endpoint made the 1.5x gate flappable (round-4 advisor finding).
    probes = {}
    for i in range(max(1, a.extra_seeds)):
        seed = 43 + i
        _, probes[seed] = run_torch(train_batches, val_batches, a.steps,
                                    a.eval_every, a.ref, seed=seed)
    jh = run_jax(sd0, train_batches, val_batches, a.steps, a.eval_every)

    def tail(h, k=3):
        return float(np.mean(np.array(h["val"])[-k:]))

    tv, jv = np.array(th["val"]), np.array(jh["val"])
    corr = float(np.corrcoef(tv, jv)[0, 1]) if len(tv) > 2 else None
    both_converge = bool(tv[-1] < 0.7 * tv[0] and jv[-1] < 0.7 * jv[0])
    t_tail, j_tail = tail(th), tail(jh)
    probe_tails = {s_: tail(h) for s_, h in probes.items()}
    seed_noise = float(np.mean([abs(t_tail - pt) / max(t_tail, 1e-6)
                                for pt in probe_tails.values()]))
    gap = abs(t_tail - j_tail) / max(t_tail, 1e-6)
    verdict = bool(both_converge and (corr or 0) > 0.9
                   and gap <= max(0.15, 1.5 * seed_noise))
    out = {
        "config": {"steps": a.steps, "B": B, "K": K, "HxW": [H, W],
                   "lambdas": LAM, "lr": LR, "gan_mode": GAN_MODE,
                   "reference_loop":
                       "train.py:46-116 + pix2pix_trainer.py:26-45",
                   "ours": "StepFunctions.train_step reuse_fake=False, "
                           "identical converted init + batch stream"},
        "torch": th,
        **{f"torch_seed{s_}": h for s_, h in probes.items()},
        "jax": jh,
        "summary": {"tail_val_torch": t_tail,
                    "tail_val_torch_probes": probe_tails,
                    "tail_val_jax": j_tail,
                    "within_framework_seed_noise_rel": seed_noise,
                    "seed_noise_probes": len(probes),
                    "cross_framework_gap_rel": gap,
                    "val_corr": corr, "both_converge": both_converge,
                    "pass": verdict},
    }
    path = os.path.join(REPO, "evidence", a.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    corr_s = "n/a" if corr is None else f"{corr:.3f}"
    probe_s = "/".join(f"{v:.2f}" for v in probe_tails.values())
    print(f"TORCH TWIN: {'PASS' if verdict else 'FAIL'} "
          f"(tail val torch {t_tail:.2f} / probes {probe_s} / "
          f"jax {j_tail:.2f}; cross gap {gap:.1%} vs mean seed noise "
          f"{seed_noise:.1%} over {len(probes)} probes; corr {corr_s}) "
          f"-> {path}")
    return 0 if verdict else 1


if __name__ == "__main__":
    sys.exit(main())
