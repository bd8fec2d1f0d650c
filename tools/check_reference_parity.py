#!/usr/bin/env python3
"""Numerical forward-equivalence check against the PyTorch reference.

Builds the reference networks (from /root/reference, read-only) at a small
config with random weights, converts the state_dicts with
seg2eye_tpu.utils.torch_convert, and compares forward outputs element-wise:
generator (given seg one-hot + w), encoder (mu/logvar), discriminator
(all per-scale intermediates).  Run results are recorded in PARITY.md.

Usage:  JAX_PLATFORMS=cpu python tools/check_reference_parity.py [ref_path]
"""
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This tool compares against torch on the host CPU; TPU f32 convs use a
# lower default matmul precision (bf16 passes) and produce false FAILs
# (rel ~1e-2 on the deep DeepLab stacks — measured: the TPU conv deviates
# 2e-3 from f64 where torch deviates 3e-7).  Force CPU: a hard override,
# because this environment's shell profile exports JAX_PLATFORMS=axon, so
# setdefault would silently leave the checker on the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import numpy as np                                         # noqa: E402


def main(ref="/root/reference"):
    import argparse

    import jax
    import jax.numpy as jnp
    import torch

    # stub torchvision (only transitively imported by the reference)
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Compose = tr.Resize = tr.Lambda = tr.ToTensor = tr.Normalize = object
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.path.insert(0, ref)

    from models.networks.discriminator import MultiscaleDiscriminator
    from models.networks.encoder import ConvEncoder
    from models.networks.generator import SPADESTYLEGenerator

    from seg2eye_tpu.models.pix2pix import Pix2Pix
    from seg2eye_tpu.options import Options
    from seg2eye_tpu.utils import torch_convert as tc

    # crop_size must be >=256: the reference encoder's fc layers are sized
    # for the 6-layer/4x4 path only (encoder.py:36-47 crashes below 256)
    cfg = dict(ngf=8, ndf=8, w_dim=8, crop_size=256, aspect_ratio=0.8,
               label_nc=4, num_D=2, n_layers_D=4)
    ns = argparse.Namespace(
        norm_G="spectralspadebatch3x3", norm_D="spectralinstance",
        norm_E="spectralinstance", semantic_nc=4, input_nc=1, output_nc=1,
        num_upsampling_layers="normal", netD_subarch="n_layer",
        no_ganFeat_loss=False, **cfg)
    torch.manual_seed(0)
    tg, te, td = SPADESTYLEGenerator(ns), ConvEncoder(ns), \
        MultiscaleDiscriminator(ns)
    for m in (tg, te, td):
        m.eval()

    def sd(m):
        return {k: v.detach().numpy()
                for k, v in m.state_dict().items()}

    opt = Options(compute_dtype="float32", **cfg).finalize()
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0))
    vg = tc.convert_generator(sd(tg), variables["G"])
    ve = tc.convert_encoder(sd(te), variables["E"], w_dim=cfg["w_dim"])
    vd = tc.convert_discriminator(sd(td), variables["D"],
                                  num_d=cfg["num_D"],
                                  n_layers=cfg["n_layers_D"])

    # -------- reverse export: torch -> flax -> torch must be lossless ----
    # Every exported dict must strict-load into the unmodified reference
    # module and match the original state_dict bitwise (num_batches_tracked
    # is bookkeeping; fresh models carry 0, which the exporter emits).
    from seg2eye_tpu.utils import torch_export as tex

    def check_reverse(name, sd_orig, sd_back, module):
        good = True
        missing = set(sd_orig) - set(sd_back)
        extra = set(sd_back) - set(sd_orig)
        if missing or extra:
            good = False
            print(f"  {name}: missing={sorted(missing)[:4]} "
                  f"extra={sorted(extra)[:4]}")
        for k in sd_orig:
            if k in sd_back and not np.array_equal(
                    np.asarray(sd_orig[k]), np.asarray(sd_back[k])):
                good = False
                print(f"  {name}: value mismatch at {k}")
        try:
            module.load_state_dict(
                {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in sd_back.items()}, strict=True)
        except Exception as e:                       # noqa: BLE001
            good = False
            print(f"  {name}: strict load_state_dict failed: {e}")
        print(f"{'OK ' if good else 'FAIL'} {name} reverse export "
              f"({len(sd_back)} keys bitwise + strict torch load)")
        return good

    ok = True
    ok &= check_reverse("generator", sd(tg), tex.export_generator(vg), tg)
    ok &= check_reverse("encoder", sd(te), tex.export_encoder(ve), te)
    ok &= check_reverse("discriminator", sd(td),
                        tex.export_discriminator(
                            vd, num_d=cfg["num_D"],
                            n_layers=cfg["n_layers_D"]), td)

    rng = np.random.default_rng(0)
    B, H, W = 2, 320, 256
    seg_np = jax.nn.one_hot(rng.integers(0, 4, (B, H, W)), 4,
                            dtype=np.float32)
    w_np = rng.normal(size=(B, cfg["w_dim"])).astype(np.float32)
    img_np = rng.uniform(-1, 1, (B, H, W, 1)).astype(np.float32)

    def report(name, ours, theirs, tol):
        ours, theirs = np.asarray(ours), np.asarray(theirs)
        diff = np.max(np.abs(ours - theirs))
        scale = max(np.max(np.abs(theirs)), 1e-6)
        status = "OK " if diff / scale < tol else "FAIL"
        print(f"{status} {name}: max|diff| {diff:.3e} (rel {diff / scale:.3e})")
        return diff / scale < tol

    # generator (eval: running BN stats, stored spectral u/v)
    with torch.no_grad():
        out_t = tg(torch.from_numpy(np.transpose(np.asarray(seg_np),
                                                 (0, 3, 1, 2))),
                   torch.from_numpy(w_np)).numpy()
    out_t = np.transpose(out_t, (0, 2, 3, 1))
    out_j = model.gen.apply(vg, jnp.asarray(seg_np), jnp.asarray(w_np),
                            update_stats=False, use_running_average=True)
    ok &= report("generator fwd", out_j, out_t, 2e-4)

    # encoder
    with torch.no_grad():
        mu_t, logvar_t, feats_t = te(torch.from_numpy(
            np.transpose(img_np, (0, 3, 1, 2))))
    mu_j, logvar_j, feats_j = model.enc.apply(ve, jnp.asarray(img_np),
                                              update_stats=False)
    ok &= report("encoder mu", mu_j, mu_t.numpy(), 2e-4)
    ok &= report("encoder logvar", logvar_j, logvar_t.numpy(), 2e-4)
    for i, (fj, ft) in enumerate(zip(feats_j, feats_t)):
        ok &= report(f"encoder feat{i}",
                     fj, np.transpose(ft.numpy(), (0, 2, 3, 1)), 2e-4)

    # discriminator
    din = rng.uniform(-1, 1, (B, H, W, 5)).astype(np.float32)
    with torch.no_grad():
        outs_t = td(torch.from_numpy(np.transpose(din, (0, 3, 1, 2))))
    outs_j = model.disc.apply(vd, jnp.asarray(din), update_stats=False)
    for s in range(len(outs_t)):
        for l in range(len(outs_t[s])):
            ok &= report(
                f"D scale{s} layer{l}", outs_j[s][l],
                np.transpose(outs_t[s][l].numpy(), (0, 2, 3, 1)), 2e-4)

    # -------- train-mode semantics: batch stats + spectral updates --------
    tg.train()
    with torch.no_grad():
        out_t_train = tg(torch.from_numpy(np.transpose(np.asarray(seg_np),
                                                       (0, 3, 1, 2))),
                         torch.from_numpy(w_np)).numpy()
    out_j_train, mut = model.gen.apply(
        vg, jnp.asarray(seg_np), jnp.asarray(w_np),
        update_stats=True, use_running_average=False,
        mutable=["batch_stats", "spectral"])
    ok &= report("generator fwd (train mode, batch stats)", out_j_train,
                 np.transpose(out_t_train, (0, 2, 3, 1)), 2e-4)
    # running-stat update semantics (momentum 0.1, unbiased var)
    sd_t = tg.state_dict()
    ok &= report(
        "BN running_mean update (head_0.norm_0)",
        mut["batch_stats"]["head_0"]["norm_0"]["mean"],
        sd_t["head_0.norm_0.spade.param_free_norm.running_mean"].numpy(),
        2e-4)
    ok &= report(
        "BN running_var update (head_0.norm_0)",
        mut["batch_stats"]["head_0"]["norm_0"]["var"],
        sd_t["head_0.norm_0.spade.param_free_norm.running_var"].numpy(),
        2e-4)
    ok &= report("spectral u update (head_0.conv_0)",
                 mut["spectral"]["head_0"]["conv_0"]["u"],
                 sd_t["head_0.conv_0.weight_u"].numpy(), 2e-3)

    # DeepLab (RefineNet backbone) forward parity
    sys.path.insert(0, os.path.join(ref, "refinenet", "deeplab"))
    import torch.utils.model_zoo as zoo
    zoo.load_url = lambda *a, **k: {}
    orig_lsd = torch.nn.Module.load_state_dict
    torch.nn.Module.load_state_dict = lambda s, d, strict=True: None
    from modeling.deeplab import DeepLab as TorchDeepLab
    torch.nn.Module.load_state_dict = orig_lsd

    from seg2eye_tpu.models.deeplab import DeepLab as FlaxDeepLab
    tdl = TorchDeepLab(backbone="resnet", output_stride=16, num_classes=1,
                       sync_bn=False)
    tdl.eval()
    fdl = FlaxDeepLab(backbone="resnet", output_stride=16, num_classes=1)
    template = fdl.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    vdl = tc.convert_deeplab(
        {k: v.detach().numpy() for k, v in tdl.state_dict().items()},
        template)
    xin = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = tdl(torch.from_numpy(np.transpose(xin, (0, 3, 1, 2)))).numpy()
    out_j = fdl.apply(vdl, jnp.asarray(xin), train=False, deterministic=True)
    ok &= report("deeplab(resnet) fwd", out_j,
                 np.transpose(out_t, (0, 2, 3, 1)), 5e-4)
    ok &= check_reverse("deeplab(resnet)",
                        {k: v.detach().numpy()
                         for k, v in tdl.state_dict().items()},
                        tex.export_deeplab(vdl, backbone="resnet"), tdl)

    # the other three backbones (backbone/__init__.py:3-13): random torch
    # weights -> convert -> forward must match.  Pretrained-zoo loading is
    # stubbed out (drn_d_54 even dels fc keys from the downloaded dict,
    # drn.py:377-381 — tolerate that too).
    class _FakeZooDict(dict):
        def __delitem__(self, key):
            self.pop(key, None)

    zoo.load_url = lambda *a, **k: _FakeZooDict()
    for bb in ("xception", "drn", "mobilenet"):
        torch.manual_seed(1)
        torch.nn.Module.load_state_dict = lambda s, d, strict=True: None
        tdl = TorchDeepLab(backbone=bb, output_stride=16, num_classes=1,
                           sync_bn=False)
        torch.nn.Module.load_state_dict = orig_lsd
        tdl.eval()
        fdl = FlaxDeepLab(backbone=bb, output_stride=16, num_classes=1)
        template = jax.eval_shape(
            lambda k: fdl.init(k, jnp.zeros((1, 64, 64, 3), jnp.float32)),
            jax.random.PRNGKey(0))
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), template)
        vdl = tc.convert_deeplab(
            {k: v.detach().numpy() for k, v in tdl.state_dict().items()},
            template, backbone=bb)
        with torch.no_grad():
            out_t = tdl(torch.from_numpy(
                np.transpose(xin, (0, 3, 1, 2)))).numpy()
        out_j = fdl.apply(vdl, jnp.asarray(xin), train=False,
                          deterministic=True)
        ok &= report(f"deeplab({bb}) fwd", out_j,
                     np.transpose(out_t, (0, 2, 3, 1)), 5e-4)
        ok &= check_reverse(f"deeplab({bb})",
                            {k: v.detach().numpy()
                             for k, v in tdl.state_dict().items()},
                            tex.export_deeplab(vdl, backbone=bb), tdl)

    print("\nPARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
