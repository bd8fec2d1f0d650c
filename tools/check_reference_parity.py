#!/usr/bin/env python3
"""Numerical forward-equivalence check against the PyTorch reference.

Builds the reference networks (from /root/reference, read-only) at a small
config with random weights, converts the state_dicts with
seg2eye_tpu.utils.torch_convert, and compares forward outputs element-wise:
generator (given seg one-hot + w), encoder (mu/logvar), discriminator
(all per-scale intermediates).  Run results are recorded in PARITY.md.

Usage:  JAX_PLATFORMS=cpu python tools/check_reference_parity.py [ref_path]
"""
import json
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


class _CheckCounter:
    """Counts 'OK '/'FAIL' verdict lines so the advertised check count is
    MEASURED, not hand-synced (tests/test_docs.py compares the docs against
    the evidence/parity_counts.json this writes)."""

    def __init__(self, wrapped):
        self.wrapped = wrapped
        self.ok = 0
        self.fail = 0

    def write(self, text):
        for line in text.splitlines():
            if line.startswith("OK "):
                self.ok += 1
            elif line.startswith("FAIL"):
                self.fail += 1
        return self.wrapped.write(text)

    def flush(self):
        return self.wrapped.flush()


def main(ref="/root/reference"):
    import argparse

    import jax
    import jax.numpy as jnp
    import torch

    counter = sys.stdout = _CheckCounter(sys.stdout)

    # persistent compile cache (shared with the test suite's CPU cache):
    # the training-parity value_and_grad programs are the slow part on this
    # 1-core host; warm reruns of this tool then start in seconds
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", ".jax_cache"))

    from tools import _ref_compat

    # stub torchvision (only transitively imported by the reference)
    _ref_compat.stub_torchvision()
    _ref_compat.add_reference_path(ref)

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

    # -------- spectralbatch norm_D/norm_E variant (round 4) ---------------
    # The reference-legal batch subnorm (get_nonspade_norm_layer,
    # normalization.py:15-47: Sequential(spectral conv, affine BatchNorm2d),
    # conv bias removed).  Running stats are randomized before conversion so
    # the BN stat mapping is checked numerically, eval forwards compared,
    # and the reverse export strict-loads bitwise.
    from seg2eye_tpu.models.discriminator import (
        MultiscaleDiscriminator as FlaxMSD)
    from seg2eye_tpu.models.encoder import ConvEncoder as FlaxEnc

    ns_b = argparse.Namespace(**{**vars(ns), "norm_D": "spectralbatch",
                                 "norm_E": "spectralbatch"})
    torch.manual_seed(5)
    td_b, te_b = MultiscaleDiscriminator(ns_b), ConvEncoder(ns_b)
    with torch.no_grad():
        for mod in (td_b, te_b):
            mod.eval()
            for bname, buf in mod.named_buffers():
                if bname.endswith("running_mean"):
                    buf.copy_(torch.from_numpy(
                        rng.normal(size=tuple(buf.shape))
                        .astype(np.float32)))
                elif bname.endswith("running_var"):
                    buf.copy_(torch.from_numpy(
                        rng.uniform(0.5, 1.5, tuple(buf.shape))
                        .astype(np.float32)))

    jd_b = FlaxMSD(ndf=cfg["ndf"], n_layers=cfg["n_layers_D"],
                   num_d=cfg["num_D"], norm_d="spectralbatch")
    vdb = tc.convert_discriminator(
        sd(td_b), jd_b.init(jax.random.PRNGKey(2),
                            jnp.zeros((1, 64, 64, 5), jnp.float32)),
        num_d=cfg["num_D"], n_layers=cfg["n_layers_D"])
    with torch.no_grad():
        outs_tb = td_b(torch.from_numpy(np.transpose(din, (0, 3, 1, 2))))
    outs_jb = jd_b.apply(vdb, jnp.asarray(din), update_stats=False,
                         use_running_average=True)
    for s in range(len(outs_tb)):
        for l in range(len(outs_tb[s])):
            ok &= report(
                f"D(spectralbatch) scale{s} layer{l}", outs_jb[s][l],
                np.transpose(outs_tb[s][l].numpy(), (0, 2, 3, 1)), 2e-4)
    ok &= check_reverse("discriminator(spectralbatch)", sd(td_b),
                        tex.export_discriminator(
                            vdb, num_d=cfg["num_D"],
                            n_layers=cfg["n_layers_D"]), td_b)

    # spectralnone D: add_norm_layer returns the conv DIRECTLY (no
    # Sequential wrapper, bias kept, normalization.py:26-28) -> flat
    # model{n}.0.* keys; checks the layout-detecting converter/exporter
    ns_n = argparse.Namespace(**{**vars(ns), "norm_D": "spectralnone"})
    torch.manual_seed(6)
    td_n = MultiscaleDiscriminator(ns_n)
    td_n.eval()
    jd_n = FlaxMSD(ndf=cfg["ndf"], n_layers=cfg["n_layers_D"],
                   num_d=cfg["num_D"], norm_d="spectralnone")
    vdn = tc.convert_discriminator(
        sd(td_n), jd_n.init(jax.random.PRNGKey(4),
                            jnp.zeros((1, 64, 64, 5), jnp.float32)),
        num_d=cfg["num_D"], n_layers=cfg["n_layers_D"])
    with torch.no_grad():
        outs_tn = td_n(torch.from_numpy(np.transpose(din, (0, 3, 1, 2))))
    outs_jn = jd_n.apply(vdn, jnp.asarray(din), update_stats=False)
    for s in range(len(outs_tn)):
        for l in range(len(outs_tn[s])):
            ok &= report(
                f"D(spectralnone) scale{s} layer{l}", outs_jn[s][l],
                np.transpose(outs_tn[s][l].numpy(), (0, 2, 3, 1)), 2e-4)
    ok &= check_reverse("discriminator(spectralnone)", sd(td_n),
                        tex.export_discriminator(
                            vdn, num_d=cfg["num_D"],
                            n_layers=cfg["n_layers_D"]), td_n)

    # ---- generator variants: more/most upsampling + spadeinstance -------
    # (generator.py:48-61 n_up branches; SPADE param-free instance norm,
    # normalization.py:72-73 — no running stats, so conversion must
    # tolerate an absent batch_stats collection)
    from seg2eye_tpu.models.generator import SpadeStyleGenerator as FlaxGen

    # 'most' is untestable against the reference: its branch calls
    # self._get_resnet_block (generator.py:45), a method that does not
    # exist in the fork (upstream-SPADE rename leftover) — the reference
    # CRASHES at construction for num_upsampling_layers='most'.  Our
    # generalization keeps it working (round-trip tested); recorded in
    # PARITY.md "Reference-side dead code".
    for up, ng in (("more", "spectralspadebatch3x3"),
                   ("normal", "spectralspadeinstance3x3")):
        ns_g = argparse.Namespace(**{**vars(ns),
                                     "num_upsampling_layers": up,
                                     "norm_G": ng})
        torch.manual_seed(8)
        tg_v = SPADESTYLEGenerator(ns_g)
        with torch.no_grad():
            tg_v.eval()
            for bname, buf in tg_v.named_buffers():
                if bname.endswith("running_mean"):
                    buf.copy_(torch.from_numpy(
                        rng.normal(size=tuple(buf.shape))
                        .astype(np.float32) * 0.1))
                elif bname.endswith("running_var"):
                    buf.copy_(torch.from_numpy(
                        rng.uniform(0.5, 1.5, tuple(buf.shape))
                        .astype(np.float32)))
        jg_v = FlaxGen(ngf=cfg["ngf"], crop_size=cfg["crop_size"],
                       aspect_ratio=cfg["aspect_ratio"],
                       w_dim=cfg["w_dim"], num_upsampling_layers=up,
                       norm_g=ng)
        vgv = tc.convert_generator(
            sd(tg_v), jg_v.init(jax.random.PRNGKey(5),
                                jnp.asarray(seg_np[:1]),
                                jnp.zeros((1, cfg["w_dim"]),
                                          jnp.float32)))
        with torch.no_grad():
            out_tv = tg_v(torch.from_numpy(np.transpose(
                np.asarray(seg_np), (0, 3, 1, 2))),
                torch.from_numpy(w_np)).numpy()
        out_jv = jg_v.apply(vgv, jnp.asarray(seg_np), jnp.asarray(w_np),
                            update_stats=False, use_running_average=True)
        tag = f"G({up},{'instance' if 'instance' in ng else 'batch'})"
        ok &= report(f"{tag} fwd", out_jv,
                     np.transpose(out_tv, (0, 2, 3, 1)), 2e-4)
        ok &= check_reverse(tag, sd(tg_v), tex.export_generator(vgv), tg_v)

    je_b = FlaxEnc(ngf=cfg["ngf"], w_dim=cfg["w_dim"],
                   crop_size=cfg["crop_size"], norm_e="spectralbatch")
    veb = tc.convert_encoder(
        sd(te_b), je_b.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, 256, 256, 1), jnp.float32)),
        w_dim=cfg["w_dim"])
    # The (B,1,H,W) tensor must carry torch-NATURAL strides: from_numpy
    # gives the singleton channel dim stride 1, which torch's memory-format
    # inference reads as channels_last; the convs then emit genuinely
    # channels_last activations all the way to the reference's
    # `out.view(...)` (encoder.py:69), which raises on modern torch.
    # torch.empty(...).copy_() materializes natural strides, so the
    # reference forward runs as written.
    xe_b = torch.empty((img_np.shape[0], 1) + img_np.shape[1:3])
    xe_b.copy_(torch.from_numpy(np.transpose(img_np, (0, 3, 1, 2))))
    with torch.no_grad():
        mu_tb, logvar_tb, _ = te_b(xe_b)
    mu_jb, logvar_jb, _ = je_b.apply(veb, jnp.asarray(img_np),
                                     update_stats=False,
                                     use_running_average=True)
    ok &= report("E(spectralbatch) mu", mu_jb, mu_tb.numpy(), 2e-4)
    ok &= report("E(spectralbatch) logvar", logvar_jb, logvar_tb.numpy(),
                 2e-4)
    ok &= check_reverse("encoder(spectralbatch)", sd(te_b),
                        tex.export_encoder(veb), te_b)

    # DeepLab (RefineNet backbone) forward parity
    sys.path.insert(0, os.path.join(ref, "refinenet", "deeplab"))
    import torch.utils.model_zoo as zoo
    orig_zoo = zoo.load_url
    zoo.load_url = lambda *a, **k: {}
    orig_lsd = torch.nn.Module.load_state_dict
    torch.nn.Module.load_state_dict = lambda s, d, strict=True: None
    try:
        from modeling.deeplab import DeepLab as TorchDeepLab
    finally:
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
        try:
            tdl = TorchDeepLab(backbone=bb, output_stride=16, num_classes=1,
                               sync_bn=False)
        finally:
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

    zoo.load_url = orig_zoo
    ok &= check_size512(ref)
    ok &= check_refinenet_wrapper(ref)
    ok &= check_training_parity(ref)
    ok &= check_per_sample_encode(ref)
    ok &= check_lockstep_dynamics(ref)
    ok &= check_tester_epilogue(ref)

    sys.stdout = counter.wrapped
    n_checks = counter.ok + counter.fail
    counts = {"checks": n_checks, "ok": counter.ok, "fail": counter.fail,
              "pass": bool(ok)}
    cpath = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "evidence", "parity_counts.json")
    with open(cpath, "w") as f:
        json.dump(counts, f, indent=1)
    print(f"\nPARITY: {'PASS' if ok else 'FAIL'} "
          f"({counter.ok}/{n_checks} checks; counts -> {cpath})")
    return 0 if ok else 1


def check_size512(ref="/root/reference"):
    """Historical size-512 geometry oracle (round-4 verdict item 3).

    The published reference checkpoints came from crop/load 512 runs
    (scripts/current_runs_spadestyle.sh:11 'size512' pretrained path, :62
    --crop_size $load_size): image geometry W=512, H=round(512/0.8)=640,
    generator head fc sized from sh=16 (generator.py:52-67).  Checks:

      * FULL-config (ngf=64, w_dim=16) parameter-count parity at 512 for
        netG and netE — torch construction vs our eval_shape (no FLOPs);
      * converted-forward oracle at 512 geometry (ngf=8): generator fwd and
        encoder mu/logvar vs torch on one 640x512 batch.
    """
    import argparse
    import math

    import jax
    import jax.numpy as jnp
    import torch

    from models.networks.encoder import ConvEncoder
    from models.networks.generator import SPADESTYLEGenerator

    from seg2eye_tpu.models.encoder import ConvEncoder as FlaxEnc
    from seg2eye_tpu.models.generator import SpadeStyleGenerator as FlaxGen
    from seg2eye_tpu.models.layers import param_count
    from seg2eye_tpu.utils import torch_convert as tc

    ok = True

    # ---- full-config param parity at 512 (counts only, no forward) ------
    full = argparse.Namespace(
        norm_G="spectralspadebatch3x3", norm_E="spectralinstance",
        semantic_nc=4, input_nc=1, output_nc=1, ngf=64, w_dim=16,
        crop_size=512, aspect_ratio=0.8, num_upsampling_layers="normal",
        init_type="xavier", init_variance=0.02, label_nc=4)
    torch.manual_seed(0)
    tg_full, te_full = SPADESTYLEGenerator(full), ConvEncoder(full)
    for jmod, tmod, x_args, name in (
            (FlaxGen(ngf=64, crop_size=512, aspect_ratio=0.8, w_dim=16),
             tg_full,
             (jnp.zeros((1, 640, 512, 4), jnp.float32),
              jnp.zeros((1, 16), jnp.float32)), "netG@512"),
            (FlaxEnc(ngf=64, w_dim=16, crop_size=512), te_full,
             (jnp.zeros((1, 640, 512, 1), jnp.float32),), "netE@512")):
        shapes = jax.eval_shape(jmod.init, jax.random.PRNGKey(0), *x_args)
        n_ours = sum(math.prod(l.shape) for l in
                     jax.tree_util.tree_leaves(shapes["params"]))
        n_torch = sum(p.numel() for p in tmod.parameters())
        good = n_ours == n_torch
        ok &= good
        print(f"{'OK ' if good else 'FAIL'} {name} param count: "
              f"ours {n_ours:,} torch {n_torch:,}")
    del tg_full, te_full

    # ---- converted-forward oracle at 512 geometry (small channels) ------
    ns = argparse.Namespace(**{**vars(full), "ngf": 8, "w_dim": 8})
    torch.manual_seed(51)
    tg, te = SPADESTYLEGenerator(ns), ConvEncoder(ns)
    tg.eval()
    te.eval()

    def sd(m):
        return {k: v.detach().numpy() for k, v in m.state_dict().items()}

    jg = FlaxGen(ngf=8, crop_size=512, aspect_ratio=0.8, w_dim=8)
    je = FlaxEnc(ngf=8, w_dim=8, crop_size=512)
    rng = np.random.default_rng(9)
    H, W = 640, 512
    seg_np = jax.nn.one_hot(rng.integers(0, 4, (1, H, W)), 4,
                            dtype=np.float32)
    w_np = rng.normal(size=(1, 8)).astype(np.float32)
    img_np = rng.uniform(-1, 1, (1, H, W, 1)).astype(np.float32)
    vg = tc.convert_generator(sd(tg), jg.init(
        jax.random.PRNGKey(0), jnp.asarray(seg_np), jnp.asarray(w_np)))
    ve = tc.convert_encoder(sd(te), je.init(
        jax.random.PRNGKey(1), jnp.asarray(img_np)), w_dim=8)

    def report(name, ours, theirs, tol=2e-4):
        ours, theirs = np.asarray(ours), np.asarray(theirs)
        diff = np.max(np.abs(ours - theirs))
        scale = max(np.max(np.abs(theirs)), 1e-6)
        good = diff / scale < tol
        print(f"{'OK ' if good else 'FAIL'} {name}: max|diff| {diff:.3e} "
              f"(rel {diff / scale:.3e})")
        return good

    with torch.no_grad():
        out_t = tg(torch.from_numpy(np.transpose(np.asarray(seg_np),
                                                 (0, 3, 1, 2))),
                   torch.from_numpy(w_np)).numpy()
        xe = torch.empty((1, 1, H, W))
        xe.copy_(torch.from_numpy(np.transpose(img_np, (0, 3, 1, 2))))
        mu_t, logvar_t, _ = te(xe)
    out_j = jg.apply(vg, jnp.asarray(seg_np), jnp.asarray(w_np),
                     update_stats=False, use_running_average=True)
    mu_j, logvar_j, _ = je.apply(ve, jnp.asarray(img_np),
                                 update_stats=False)
    ok &= report("G@512 fwd (640x512)", out_j,
                 np.transpose(out_t, (0, 2, 3, 1)))
    ok &= report("E@512 mu", mu_j, mu_t.numpy())
    ok &= report("E@512 logvar", logvar_j, logvar_t.numpy())
    return ok


def _compare_losses(tag, jdict, tdict, tol=3e-4):
    good = True
    if set(jdict) != set(tdict):
        print(f"FAIL {tag} loss keys: ours-only="
              f"{sorted(set(jdict) - set(tdict))} "
              f"torch-only={sorted(set(tdict) - set(jdict))}")
        good = False
    worst, wkey = -1.0, None
    for k in sorted(set(jdict) & set(tdict)):
        # torch entries may be (1,)- or (B,)-shaped (GANLoss list path,
        # per-image openeds); the trainer means them — compare means
        tval = float(np.mean(tdict[k]))
        jval = float(np.mean(np.asarray(jdict[k])))
        rel = abs(jval - tval) / max(abs(tval), 1e-6)
        if rel > worst:
            worst, wkey = rel, k
        if rel >= tol:
            print(f"  {tag} {k}: ours {jval:.6g} torch {tval:.6g} "
                  f"(rel {rel:.2e})")
            good = False
    print(f"{'OK ' if good else 'FAIL'} {tag} losses "
          f"({len(tdict)} entries, worst rel {worst:.2e} @ {wkey})")
    return good


def _compare_grads(tag, jraw, jexp, tgrads, tol=5e-3):
    import jax
    import jax.numpy as jnp

    good = True
    for n in ("G", "E", "D"):
        tnet = {k: v for k, v in tgrads[n].items() if v is not None}
        if not tnet:
            # torch no_grad path (D-step G/E): ours must be exactly 0
            # (checked on the raw pytree — the export view also carries
            # the nonzero u/v and BN-stat buffers)
            zmax = max(float(jnp.max(jnp.abs(x)))
                       for x in jax.tree_util.tree_leaves(jraw[n]))
            net_ok = zmax == 0.0
            good &= net_ok
            print(f"{'OK ' if net_ok else 'FAIL'} {tag} grad {n}: torch "
                  f"has no grads (no_grad); ours max|g| = {zmax:.1e}")
            continue
        gmax = max(np.max(np.abs(v)) for v in tnet.values())
        worst, wkey, cnt, net_ok = -1.0, None, 0, True
        for k, tg in tnet.items():
            ja = np.asarray(jexp[n][k])
            # floor tiny per-param scales at 1e-3 of the net-wide max so
            # roundoff on near-zero grads can't masquerade as mismatch
            denom = max(np.max(np.abs(tg)), 1e-3 * gmax, 1e-12)
            diff = float(np.max(np.abs(ja - tg)))
            rel = diff / denom
            cnt += 1
            if rel > worst:
                worst, wkey = rel, k
            # absolute-noise gate: some grads are ANALYTICALLY zero
            # (e.g. wgan-mode D final-layer bias — the +b term cancels
            # between the fake and real means), so both sides hold pure
            # roundoff and their relative comparison is meaningless;
            # only flag when the difference is also non-noise vs the
            # net-wide gradient scale
            if rel >= tol and diff >= 1e-4 * gmax:
                print(f"  {tag} grad {n}.{k}: rel {rel:.2e} "
                      f"(|t|max {np.max(np.abs(tg)):.3g})")
                net_ok = False
        good &= net_ok
        print(f"{'OK ' if net_ok else 'FAIL'} {tag} grad {n} "
              f"({cnt} params, worst rel {worst:.2e} @ {wkey})")
    return good


def _compare_grads_floored(tag, jraw, jexp, tg32, tg64, mult=5.0,
                           floor_abs=5e-3):
    """Gradient comparison with a measured noise floor: ours-vs-torch-f64
    must sit within ``mult`` x torch-f32's own deviation from torch-f64
    (separates cross-framework conv rounding from a semantic mismatch,
    which would not shrink in f64).  Same scheme as the RefineNet-wrapper
    and lockstep oracles."""
    import jax
    import jax.numpy as jnp

    good = True
    for n in ("G", "E", "D"):
        t32 = {k: v for k, v in tg32[n].items() if v is not None}
        if not t32:
            zmax = max(float(jnp.max(jnp.abs(x)))
                       for x in jax.tree_util.tree_leaves(jraw[n]))
            net_ok = zmax == 0.0
            good &= net_ok
            print(f"{'OK ' if net_ok else 'FAIL'} {tag} grad {n}: torch "
                  f"has no grads (no_grad); ours max|g| = {zmax:.1e}")
            continue
        t64 = {k: v for k, v in tg64[n].items() if v is not None}
        gmax = max(np.max(np.abs(v)) for v in t64.values())
        worst_dev, worst_floor, wkey = -1.0, -1.0, None
        for k, g64 in t64.items():
            denom = max(np.max(np.abs(g64)), 1e-3 * gmax, 1e-12)
            floor = float(np.max(np.abs(t32[k] - g64)) / denom)
            dev = float(np.max(np.abs(np.asarray(jexp[n][k]) - g64)) / denom)
            worst_floor = max(worst_floor, floor)
            if dev > worst_dev:
                worst_dev, wkey = dev, k
        net_ok = worst_dev <= max(mult * worst_floor, floor_abs)
        good &= net_ok
        print(f"{'OK ' if net_ok else 'FAIL'} {tag} grad {n} "
              f"({len(t64)} params, ours-vs-f64 worst rel {worst_dev:.2e} "
              f"@ {wkey}; torch-f32-vs-f64 floor {worst_floor:.2e})")
    return good


def check_per_sample_encode(ref="/root/reference"):
    """--per_sample_encode oracle (round-4 verdict item 2): the exact
    per-sample encode must match the reference at FRESH spectral-u and B=4
    — the regime where the fused encode measurably deviates (gram rel
    ~1e-1, E-grad 2.5e-1, PARITY.md 'Spectral u drift').

    Two arms, no burn-in, all style losses on:
      * norm_E='spectralinstance' (default) — per-sample u advance,
      * norm_E='spectralbatch' — per-sample u AND per-sample-k BN batch
        statistics (normalization.py:15-47), the variant where the fused
        path deviates persistently even at the spectral fixed point.
    G and D losses + all gradients compared at the standard training-parity
    tolerances.  Match: pix2pix_model.py:271-305 (per-sample loop).
    """
    import argparse
    import copy

    import jax
    import jax.numpy as jnp
    import torch

    from tools import _ref_compat

    _ref_compat.stub_util_tester()
    from models.pix2pix_model import Pix2PixModel

    from seg2eye_tpu.models.pix2pix import Pix2Pix
    from seg2eye_tpu.options import Options
    from seg2eye_tpu.utils import torch_convert as tc
    from seg2eye_tpu.utils import torch_export as tex

    cfg = dict(ngf=8, ndf=8, w_dim=8, crop_size=256, aspect_ratio=0.8,
               label_nc=4, num_D=2, n_layers_D=4)
    lam = dict(lambda_l2=7.0, lambda_l1=3.0, lambda_openeds=2.0,
               lambda_style_w=1.5, lambda_style_feat=0.5, lambda_gram=120.0,
               lambda_feat=10.0)
    B, K = 4, 2
    H, W = 320, 256
    rng = np.random.default_rng(31)
    label = rng.integers(0, 4, (B, H, W))
    style = rng.uniform(-1, 1, (B, K, H, W, 1)).astype(np.float32)
    target = rng.uniform(-1, 1, (B, H, W, 1)).astype(np.float32)
    # torch-NATURAL strides for the 5D style tensor: a transposed
    # from_numpy view carries stride 1 on the singleton channel dim, which
    # torch's memory-format inference reads as channels_last and the
    # reference encoder's out.view (encoder.py:69) then raises on
    ts = torch.empty((B, K, 1, H, W))
    ts.copy_(torch.from_numpy(np.transpose(style, (0, 1, 4, 2, 3))))
    tdata = {
        "label": torch.from_numpy(label[:, None]).long(),
        "style_image": ts,
        "target": torch.from_numpy(np.transpose(target, (0, 3, 1, 2))),
        "filename": ["a", "b", "c", "d"],
    }
    batch = {"label": jnp.asarray(label),
             "style_image": jnp.asarray(style),
             "target": jnp.asarray(target)}

    ok = True
    for norm_e in ("spectralinstance", "spectralbatch"):
        topt = argparse.Namespace(
            isTrain=True, continue_train=False, gpu_ids=[],
            init_type="xavier", init_variance=0.02,
            no_ganFeat_loss=False, no_vgg_loss=True,
            gan_mode="hinge", style_aggr_method="mean",
            norm_G="spectralspadebatch3x3", norm_D="spectralinstance",
            norm_E=norm_e, semantic_nc=4, input_nc=1, output_nc=1,
            num_upsampling_layers="normal", netD_subarch="n_layer",
            **lam, **cfg)
        torch.manual_seed(41)
        tmodel = Pix2PixModel(topt)
        tmodel.train()
        nets = {"G": tmodel.netG, "E": tmodel.netE, "D": tmodel.netD}
        sd0 = {n: copy.deepcopy(m.state_dict()) for n, m in nets.items()}
        # f64 oracle twin for the gradient noise floor (see
        # _compare_grads_floored); FloatTensor drives the one-hot scatter
        # and the GAN_Feat accumulator (pix2pix_model.py:151,233)
        tmodel64 = Pix2PixModel(topt)
        for n, m in (("G", tmodel64.netG), ("E", tmodel64.netE),
                     ("D", tmodel64.netD)):
            m.load_state_dict(sd0[n], strict=True)
        tmodel64.double()
        tmodel64.FloatTensor = torch.DoubleTensor
        tmodel64.train()
        nets64 = {"G": tmodel64.netG, "E": tmodel64.netE,
                  "D": tmodel64.netD}
        sd064 = {n: copy.deepcopy(m.state_dict())
                 for n, m in nets64.items()}
        tdata64 = dict(tdata)
        tdata64["style_image"] = ts.double()
        tdata64["target"] = tdata["target"].double()

        def sdnp(n):
            return {k: v.detach().numpy() for k, v in sd0[n].items()}

        jopt = Options(compute_dtype="float32", isTrain=True, input_ns=K,
                       batchSize=B, no_ganFeat_loss=False, gan_mode="hinge",
                       style_aggr_method="mean", norm_E=norm_e,
                       per_sample_encode="on", **lam, **cfg).finalize()
        assert jopt.per_sample_encode_enabled
        jmodel = Pix2Pix(jopt)
        jvars = jmodel.init_variables(jax.random.PRNGKey(1))
        jvars = {
            "G": tc.convert_generator(sdnp("G"), jvars["G"]),
            "E": tc.convert_encoder(sdnp("E"), jvars["E"],
                                    w_dim=cfg["w_dim"]),
            "D": tc.convert_discriminator(sdnp("D"), jvars["D"],
                                          num_d=cfg["num_D"],
                                          n_layers=cfg["n_layers_D"]),
        }
        params0 = {n: jvars[n]["params"] for n in ("G", "E", "D")}

        def torch_step(which, double=False):
            model = tmodel64 if double else tmodel
            mnets = nets64 if double else nets
            msd = sd064 if double else sd0
            data = tdata64 if double else tdata
            for n, m in mnets.items():
                m.load_state_dict(msd[n], strict=True)
                m.zero_grad(set_to_none=True)
            model.reset_loss_log()
            if which == "G":
                losses, _ = model(copy.copy(data), mode="generator")
            else:
                losses = model(copy.copy(data), mode="discriminator")
            sum(losses.values()).mean().backward()
            out = {k: v.detach().numpy() for k, v in losses.items()}
            out.update({k: v.detach().numpy()
                        for k, v in model.get_loss_log().items()})
            grads = {n: {k: (None if p.grad is None
                             else p.grad.detach().numpy())
                         for k, p in m.named_parameters()}
                     for n, m in mnets.items()}
            return out, grads

        def gloss(p, b):
            v = {n: {**jvars[n], "params": p[n]} for n in ("G", "E", "D")}
            total, (losses, _fake, _newv) = jmodel.generator_loss(v, b)
            return total, losses

        def dloss(p, b):
            v = {n: {**jvars[n], "params": p[n]} for n in ("G", "E", "D")}
            total, (losses, _newv) = jmodel.discriminator_loss(v, b)
            return total, losses

        def export_grads(g):
            return {
                "G": tex.export_generator({**jvars["G"], "params": g["G"]}),
                "E": tex.export_encoder({**jvars["E"], "params": g["E"]}),
                "D": tex.export_discriminator(
                    {**jvars["D"], "params": g["D"]},
                    num_d=cfg["num_D"], n_layers=cfg["n_layers_D"]),
            }

        tg_losses, tg_grads = torch_step("G")
        td_losses, td_grads = torch_step("D")
        _, tg_grads64 = torch_step("G", double=True)
        _, td_grads64 = torch_step("D", double=True)
        (_, jg_losses), jg_grads = jax.jit(
            jax.value_and_grad(gloss, has_aux=True))(params0, batch)
        (_, jd_losses), jd_grads = jax.jit(
            jax.value_and_grad(dloss, has_aux=True))(params0, batch)
        tag = f"per-sample[{norm_e}]"
        ok &= _compare_losses(f"{tag} G", jg_losses, tg_losses)
        ok &= _compare_losses(f"{tag} D", jd_losses, td_losses)
        ok &= _compare_grads_floored(f"{tag} G", jg_grads,
                                     export_grads(jg_grads),
                                     tg_grads, tg_grads64)
        ok &= _compare_grads_floored(f"{tag} D", jd_grads,
                                     export_grads(jd_grads),
                                     td_grads, td_grads64)
    return ok


_LOCKSTEP_CFG = dict(ngf=8, ndf=8, w_dim=8, crop_size=256, aspect_ratio=0.8,
                     label_nc=4, num_D=2, n_layers_D=4)
_LOCKSTEP_LAM = dict(lambda_l2=7.0, lambda_l1=3.0, lambda_openeds=2.0,
                     lambda_style_w=1.5, lambda_style_feat=0.5,
                     lambda_gram=120.0, lambda_feat=10.0)
_LOCKSTEP_SHAPE = dict(B=1, K=2, H=320, W=256)
_LOCKSTEP_LR, _LOCKSTEP_WD = 2e-4, 1e-4


def _lockstep_stream(n_steps):
    B, K, H, W = (_LOCKSTEP_SHAPE[k] for k in ("B", "K", "H", "W"))
    rng = np.random.default_rng(21)
    stream = []
    for _ in range(n_steps):
        stream.append({
            "label": rng.integers(0, 4, (B, H, W)),
            "style_image": rng.uniform(
                -1, 1, (B, K, H, W, 1)).astype(np.float32),
            "target": rng.uniform(-1, 1, (B, H, W, 1)).astype(np.float32),
        })
    return stream


def _lockstep_sd0(lam):
    """Deterministic shared init: torch seed 17 -> reference Pix2PixModel
    state_dicts as numpy (identical in the parent and the x64 subprocess)."""
    import argparse
    import copy

    import torch

    from tools import _ref_compat

    _ref_compat.stub_util_tester()
    from models.pix2pix_model import Pix2PixModel

    topt = argparse.Namespace(
        isTrain=True, continue_train=False, gpu_ids=[],
        init_type="xavier", init_variance=0.02,
        no_ganFeat_loss=False, no_vgg_loss=True,
        gan_mode="hinge", style_aggr_method="mean",
        norm_G="spectralspadebatch3x3", norm_D="spectralinstance",
        norm_E="spectralinstance", semantic_nc=4, input_nc=1, output_nc=1,
        num_upsampling_layers="normal", netD_subarch="n_layer",
        no_TTUR=False, beta1=0.5, beta2=0.999, lr=_LOCKSTEP_LR,
        weight_decay=_LOCKSTEP_WD, **lam, **_LOCKSTEP_CFG)
    torch.manual_seed(17)
    proto = Pix2PixModel(topt)
    sd0 = {n: copy.deepcopy(m.state_dict())
           for n, m in (("G", proto.netG), ("E", proto.netE),
                        ("D", proto.netD))}
    return topt, sd0


def _run_lockstep_jax_arm(sd0, stream, lam, compute_dtype="float32"):
    """Our fused G+D trajectory on the shared init/stream; returns per-step
    torch-layout float64 snapshots.  compute_dtype='float64' is the
    verification arm (requires JAX_ENABLE_X64=1 in the process env — run it
    in a subprocess; see check_lockstep_dynamics)."""
    import jax
    import jax.numpy as jnp

    from seg2eye_tpu.models.pix2pix import Pix2Pix
    from seg2eye_tpu.options import Options
    from seg2eye_tpu.train import state as state_lib
    from seg2eye_tpu.train.steps import StepFunctions
    from seg2eye_tpu.utils import torch_convert as tc
    from seg2eye_tpu.utils import torch_export as tex

    cfg = _LOCKSTEP_CFG
    B, K = _LOCKSTEP_SHAPE["B"], _LOCKSTEP_SHAPE["K"]

    def sdnp(n):
        return {k: v.detach().numpy() for k, v in sd0[n].items()}

    jopt = Options(compute_dtype=compute_dtype, isTrain=True, input_ns=K,
                   batchSize=B, no_ganFeat_loss=False, gan_mode="hinge",
                   style_aggr_method="mean", lr=_LOCKSTEP_LR,
                   weight_decay=_LOCKSTEP_WD, reuse_fake=False,
                   **lam, **cfg).finalize()
    jmodel = Pix2Pix(jopt)
    st = state_lib.create_state(jmodel, jax.random.PRNGKey(0))
    variables = dict(st.variables)
    variables["G"] = tc.convert_generator(sdnp("G"), variables["G"])
    variables["E"] = tc.convert_encoder(sdnp("E"), variables["E"],
                                        w_dim=cfg["w_dim"])
    variables["D"] = tc.convert_discriminator(
        sdnp("D"), variables["D"], num_d=cfg["num_D"],
        n_layers=cfg["n_layers_D"])
    sf = StepFunctions(jmodel, donate=False)
    if compute_dtype == "float64":
        # the torch arm loads the shared f32 init then widens (model.double())
        # — mirror that exactly: widen every float leaf, and rebuild the Adam
        # moments from the widened params (optax zeros_like the template)
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)
        st = st.replace(
            opt_g=sf.tx_g.init({"G": variables["G"]["params"],
                                "E": variables["E"]["params"]}),
            opt_d=sf.tx_d.init(variables["D"]["params"]))
    st = st.replace(variables=variables)
    snaps = []
    for nb in stream:
        jb = {k: jnp.asarray(v) for k, v in nb.items()}
        st, _losses, _fake = sf.train_step(st, jb)
        snaps.append({
            "G": tex.export_generator(st.variables["G"]),
            "E": tex.export_encoder(st.variables["E"]),
            "D": tex.export_discriminator(st.variables["D"],
                                          num_d=cfg["num_D"],
                                          n_layers=cfg["n_layers_D"]),
        })
    return snaps


def _run_lockstep_torch_arm(topt, sd0, stream, double):
    """Reference trajectory on the shared init/stream (f64 oracle or f32
    floor).  G-then-D step order per train.py:52-62 via
    pix2pix_trainer.py:26-45."""
    import copy

    import torch

    from tools import _ref_compat
    from models.pix2pix_model import Pix2PixModel

    B = _LOCKSTEP_SHAPE["B"]
    m = Pix2PixModel(topt)
    for name, net in (("G", m.netG), ("E", m.netE), ("D", m.netD)):
        net.load_state_dict(sd0[name], strict=True)
    if double:
        m.double()
        # the one-hot scatter (pix2pix_model.py:151) and the GAN_Feat
        # accumulator (:233) are built via self.FloatTensor; with f64
        # weights the f32 one-hot errors and the f32 += f64 in-place
        # accumulate is rejected by torch promotion rules
        m.FloatTensor = torch.DoubleTensor
    m.train()
    with _ref_compat.float_betas_adam():
        opt_g, opt_d = m.create_optimizers(topt)
    ft = torch.float64 if double else torch.float32
    snaps = []
    for nb in stream:
        d = {
            "label": torch.from_numpy(nb["label"][:, None]),
            "style_image": torch.from_numpy(np.transpose(
                nb["style_image"], (0, 1, 4, 2, 3))).to(ft),
            "target": torch.from_numpy(np.transpose(
                nb["target"], (0, 3, 1, 2))).to(ft),
            "filename": ["x"] * B,
        }
        opt_g.zero_grad()
        g_losses, _ = m(copy.copy(d), mode="generator")
        sum(g_losses.values()).mean().backward()
        opt_g.step()
        opt_d.zero_grad()
        d_losses = m(copy.copy(d), mode="discriminator")
        sum(d_losses.values()).mean().backward()
        opt_d.step()
        snaps.append({
            name: {k: v.detach().numpy().astype(np.float64).copy()
                   for k, v in net.state_dict().items()
                   if v.dtype.is_floating_point}
            for name, net in (("G", m.netG), ("E", m.netE),
                              ("D", m.netD))})
    return snaps


def run_lockstep_f64_arm(out_path, ref="/root/reference", n_steps=8):
    """Subprocess entry (--lockstep-f64-arm): rebuild the shared init/stream
    deterministically, run OUR step semantics in float64, save snapshots."""
    import jax

    assert jax.config.read("jax_enable_x64"), \
        "run with JAX_ENABLE_X64=1 (the whole point of this arm)"
    from tools import _ref_compat

    _ref_compat.stub_torchvision()
    _ref_compat.add_reference_path(ref)
    _, sd0 = _lockstep_sd0(_LOCKSTEP_LAM)
    snaps = _run_lockstep_jax_arm(sd0, _lockstep_stream(n_steps),
                                  _LOCKSTEP_LAM, compute_dtype="float64")
    flat = {}
    for s, snap in enumerate(snaps):
        for n, tensors in snap.items():
            for k, v in tensors.items():
                flat[f"{s}|{n}|{k}"] = np.asarray(v, np.float64)
    np.savez_compressed(out_path, **flat)
    print(f"[lockstep-f64] {len(flat)} tensors x {n_steps} steps -> "
          f"{out_path}")


def check_lockstep_dynamics(ref="/root/reference", n_steps=8):
    """Multi-step LOCKSTEP weight-trajectory parity vs the torch reference.

    The statistical convergence twin (tools/torch_twin.py) cannot be bitwise
    because at B>1 the reference's per-sample encoder loop
    (pix2pix_model.py:285) advances spectral-norm u once per SAMPLE while the
    fused encode advances it once per STEP.  At **B=1 the two semantics
    coincide exactly**, so the full training dynamics — TTUR Adam
    (pix2pix_model.py:92-110, betas (0,.9), G lr/2 D lr*2, coupled
    weight_decay), the G-then-D step order (train.py:52-62), every u power
    iteration and BatchNorm running-stat update of all three nets — can be
    compared step-for-step on the actual weight trajectories.

    Three arms from one converted init on one fixed batch stream:
      * torch float64 — the ground-truth trajectory (model.double()),
      * torch float32 — the reference's own rounding noise floor,
      * ours float32  — StepFunctions.train_step (reuse_fake=False).
    After every fused G+D step, every floating tensor of the three
    state_dicts (params, weight_u/v, BN running stats — via the bitwise
    reverse exporters) is compared against the f64 oracle.  PASS iff our
    drift from the f64 trajectory stays within a small multiple of torch's
    own f32 drift: beta1=0 Adam normalizes by |g|, so sub-roundoff gradient
    differences near zero-crossings legitimately amplify to O(lr) on BOTH
    f32 arms — the floor calibration is what makes the check honest.
    """
    import subprocess
    import tempfile

    from tools import _ref_compat

    _ref_compat.stub_util_tester()

    lam = _LOCKSTEP_LAM
    B, K = _LOCKSTEP_SHAPE["B"], _LOCKSTEP_SHAPE["K"]
    H, W = _LOCKSTEP_SHAPE["H"], _LOCKSTEP_SHAPE["W"]
    LR, WD = _LOCKSTEP_LR, _LOCKSTEP_WD
    topt, sd0 = _lockstep_sd0(lam)
    stream = _lockstep_stream(n_steps)

    t64 = _run_lockstep_torch_arm(topt, sd0, stream, double=True)
    t32 = _run_lockstep_torch_arm(topt, sd0, stream, double=False)
    ours = _run_lockstep_jax_arm(sd0, stream, lam)

    # ---- ours-float64 arm (round-4 verdict item 1): OUR step semantics in
    # double precision, in a subprocess (JAX_ENABLE_X64 is process-global).
    # If our E path were semantically different from the reference's, the
    # drift would NOT shrink in f64; if the f32 2.4e-2 E.params step-1 drift
    # is pure conditioning of near-cancelling style grads through beta1=0
    # Adam, ours64-vs-torch64 collapses to f64 noise.
    ours64 = None
    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "lockstep_f64.npz")
        env = {**os.environ, "JAX_ENABLE_X64": "1", "JAX_PLATFORMS": "cpu"}
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--lockstep-f64-arm", npz, ref, str(n_steps)],
            env=env, capture_output=True, text=True)
        if proc.returncode != 0:
            print("FAIL lockstep ours-f64 arm subprocess:\n"
                  + proc.stdout[-2000:] + proc.stderr[-2000:])
        else:
            with np.load(npz) as z:
                ours64 = [{n: {} for n in ("G", "E", "D")}
                          for _ in range(n_steps)]
                for key in z.files:
                    s, n, k = key.split("|", 2)
                    ours64[int(s)][n][k] = z[key]

    def group_of(k):
        if k.endswith("running_mean") or k.endswith("running_var"):
            return "stats"
        if k.endswith("weight_u") or k.endswith("weight_v"):
            return "uv"
        return "params"

    ok = True
    evidence = {"config": {"n_steps": n_steps, "B": B, "K": K,
                           "HxW": [H, W], "lr": LR, "weight_decay": WD,
                           "lambdas": lam, "gan_mode": "hinge",
                           "arms": ["torch float64 (oracle)",
                                    "torch float32 (floor)",
                                    "ours float32",
                                    "ours float64 (semantics proof)"]},
                "per_step_rel_rms": {}}
    if ours64 is None:
        ok = False
    for n in ("G", "E", "D"):
        for grp in ("params", "uv", "stats"):
            rows = []
            rows64 = []
            for s in range(n_steps):
                num_o = num_f = num_d = den = 0.0
                max_o = max_f = 0.0
                for k, a64 in t64[s][n].items():
                    if group_of(k) != grp:
                        continue
                    ao = np.asarray(ours[s][n][k], np.float64)
                    a32 = t32[s][n][k]
                    num_o += float(((ao - a64) ** 2).sum())
                    num_f += float(((a32 - a64) ** 2).sum())
                    if ours64 is not None:
                        ad = ours64[s][n][k]
                        num_d += float(((ad - a64) ** 2).sum())
                    den += float((a64 ** 2).sum())
                    max_o = max(max_o, float(np.max(np.abs(ao - a64))))
                    max_f = max(max_f, float(np.max(np.abs(a32 - a64))))
                if den == 0.0:
                    rows = None
                    break
                rows.append(((num_o / den) ** 0.5, (num_f / den) ** 0.5,
                             max_o, max_f))
                rows64.append((num_d / den) ** 0.5)
            if rows is None:
                continue  # net has no tensors of this group (e.g. E stats)
            rms_o, rms_f, max_o, max_f = rows[-1]
            traj_o = " ".join(f"{r[0]:.1e}" for r in rows)
            traj_f = " ".join(f"{r[1]:.1e}" for r in rows)
            # Envelope criterion (final step): by step ~4 BOTH f32 arms
            # decorrelate from the f64 oracle to O(0.01-1) relative rms —
            # beta1=0 Adam turns roundoff-level gradient sign flips near
            # zero-crossings into full +-lr moves, so single-precision GAN
            # training here is chaotic WITHIN torch itself (measured floor;
            # the basis for judging multi-step dynamics statistically in
            # tools/torch_twin.py).  Ours must sit inside the same envelope.
            net_ok = (rms_o <= 3.0 * rms_f + 1e-9
                      and max_o <= 5.0 * max_f + 1e-7)
            # Step-1 criterion (discriminative): after ONE fused step the
            # arms are still numerically coupled, so the update PLUMBING
            # shows sharply.  A skipped/extra spectral power iteration
            # (torch advances u on EVERY training-mode forward incl. the
            # D-phase no_grad regeneration, pix2pix_model.py:251-254) or a
            # missed BN running-stat update would leave an O(1e-2..1e-1)
            # step-1 residual; measured step-1 drift is <=3.1e-6 (uv) /
            # <=5.7e-4 (stats).  params are excluded from the f32 step-1
            # gate: their step-1 drift is legitimately dominated by
            # cross-framework conv rounding (~1e-3 rel grads) through the
            # sign-sensitive Adam update.  (The ours-f64 gate below covers
            # params too — it is what caught the fc_var dead-param
            # divergence that f32 floor-comparisons had hidden.)
            if grp == "uv":
                net_ok &= rows[0][0] <= max(10.0 * rows[0][1], 1e-4)
            elif grp == "stats":
                net_ok &= rows[0][0] <= max(10.0 * rows[0][1], 1e-3)
            # Step-1 SEMANTICS criterion (ours-f64 arm): in double precision
            # the conditioning excuse is gone — after one step our update
            # must land on torch-f64's to near-f64 noise.  This is what
            # closes the E.params "26x above floor" question with a
            # measurement: a real E-path semantic difference would keep an
            # O(floor)+ residual here; pure f32 conditioning vanishes.
            # Measured step-1 ours64 drift (this host, post-fc_var-fix):
            # G.params 5.7e-12, E.params 6.1e-12, D.params 1.1e-9 (beta1=0
            # Adam amplifies even f64 rounding near gradient zero
            # crossings), uv/stats <=1.3e-10 — the round-4 fc_var
            # divergence sat at 2.4e-2 here, SEVEN orders above this gate.
            if ours64 is not None:
                net_ok &= rows64[0] <= 1e-8
            ok &= net_ok
            traj_d = " ".join(f"{r:.1e}" for r in rows64) \
                if ours64 is not None else "n/a"
            print(f"{'OK ' if net_ok else 'FAIL'} lockstep {n}.{grp} "
                  f"final rms {rms_o:.2e} (floor {rms_f:.2e}) "
                  f"max {max_o:.2e} (floor {max_f:.2e})\n"
                  f"     ours-vs-f64 per step  [{traj_o}]\n"
                  f"     t32 -vs-f64 per step  [{traj_f}]\n"
                  f"     ours64-vs-f64 per step [{traj_d}]")
            evidence["per_step_rel_rms"][f"{n}.{grp}"] = {
                "ours_vs_f64": [r[0] for r in rows],
                "torch32_vs_f64_floor": [r[1] for r in rows],
                "ours_f64_vs_f64": list(rows64) if ours64 is not None
                else None,
                "max_abs_ours_vs_f64": [r[2] for r in rows],
                "max_abs_torch32_vs_f64_floor": [r[3] for r in rows],
                "ok": bool(net_ok)}

    # ---- style-lambda ablation (round-4 verdict item 1, second arm):
    # with lambda_style_w/feat/gram = 0 the near-cancelling style gradients
    # disappear, so if they are what amplifies E.params step-1 drift under
    # beta1=0 Adam, the drift must collapse to the torch-f32 floor.
    lam_a = {**lam, "lambda_style_w": 0.0, "lambda_style_feat": 0.0,
             "lambda_gram": 0.0}
    topt_a, sd0_a = _lockstep_sd0(lam_a)
    stream_a = _lockstep_stream(2)
    t64a = _run_lockstep_torch_arm(topt_a, sd0_a, stream_a, double=True)
    t32a = _run_lockstep_torch_arm(topt_a, sd0_a, stream_a, double=False)
    oursa = _run_lockstep_jax_arm(sd0_a, stream_a, lam_a)
    evidence["style_ablation"] = {"lambdas": lam_a, "step1_rel_rms": {}}
    for n in ("G", "E", "D"):
        num_o = num_f = den = 0.0
        for k, a64 in t64a[0][n].items():
            if group_of(k) != "params":
                continue
            ao = np.asarray(oursa[0][n][k], np.float64)
            num_o += float(((ao - a64) ** 2).sum())
            num_f += float(((t32a[0][n][k] - a64) ** 2).sum())
            den += float((a64 ** 2).sum())
        drift, floor = (num_o / den) ** 0.5, (num_f / den) ** 0.5
        net_ok = drift <= max(3.0 * floor, 1e-6)
        ok &= net_ok
        print(f"{'OK ' if net_ok else 'FAIL'} lockstep-ablation {n}.params "
              f"step-1 rms {drift:.2e} (floor {floor:.2e}) — style "
              f"lambdas zeroed")
        evidence["style_ablation"]["step1_rel_rms"][f"{n}.params"] = {
            "ours_vs_f64": drift, "torch32_vs_f64_floor": floor,
            "ok": bool(net_ok)}

    evidence["pass"] = bool(ok)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "evidence", "lockstep.json")
    with open(path, "w") as f:
        json.dump(evidence, f, indent=1)
    print(f"[lockstep] evidence -> {path}")
    return ok


def check_tester_epilogue(ref="/root/reference"):
    """Tester epilogue oracle (round-3 verdict stretch item 7).

    One batch through the reference's inference epilogue — fake ->
    ImageProcessor.to_255resized_imagebatch (cv2 INTER_LINEAR 320x256 ->
    640x400 + truncating unnormalize, data/postprocessor.py:97-115) ->
    MSECalculator.calculate_mse_for_images (models/networks/loss.py:116-133,
    the util/tester.py:44-47,92-96 path) — vs our in-graph
    ops.image.to_255resized + ops.metrics.mse_for_images, quantifying the
    cv2-vs-in-graph-bilinear delta on BOTH a smooth (eye-like) and a
    white-noise (worst-case) batch with a stated bound.

    The reference's resize calls ``.astype(np.float)``; modern numpy removed
    the alias, so it is shimmed to builtins.float for the oracle run only.
    """
    import jax.numpy as jnp
    import torch

    from tools import _ref_compat

    # stub torchvision for data/__init__ -> base_dataset (idempotent; main()
    # installs the same stub, but keep this check standalone-runnable)
    _ref_compat.stub_torchvision()

    had_float = hasattr(np, "float")
    if not had_float:
        np.float = float                           # reference-era alias
    try:
        _ref_compat.add_reference_path(ref)
        from data.postprocessor import ImageProcessor
        from models.networks.loss import MSECalculator

        from seg2eye_tpu.ops.image import to_255resized
        from seg2eye_tpu.ops import metrics

        rng = np.random.default_rng(21)
        B, H, W = 2, 320, 256
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        smooth = np.stack([
            np.sin(yy / 37.0 + b) * np.cos(xx / 23.0 - b) * 0.8
            for b in range(B)])[..., None].astype(np.float32)
        noise = rng.uniform(-1, 1, (B, H, W, 1)).astype(np.float32)
        target = rng.integers(0, 256, (B, 1, 640, 400)).astype(np.float64)

        ok = True
        for tag, fake in (("smooth", smooth), ("noise", noise)):
            tfake = torch.from_numpy(np.transpose(fake, (0, 3, 1, 2)))
            t255 = ImageProcessor.to_255resized_imagebatch(tfake,
                                                           as_tensor=True)
            terr = MSECalculator.calculate_mse_for_images(
                t255.float(), torch.from_numpy(target).float()).numpy()
            j255 = np.asarray(to_255resized(jnp.asarray(fake)))
            jerr = np.asarray(metrics.mse_for_images(
                jnp.asarray(j255),
                jnp.asarray(np.transpose(target, (0, 2, 3, 1)))))
            px = np.abs(j255[..., 0] - t255.numpy()[:, 0])
            frac_off = float((px > 1).mean())
            err_rel = float(np.max(np.abs(jerr - terr) / terr))
            good = err_rel < 2e-3 and frac_off < 0.02
            ok &= good
            print(f"{'OK ' if good else 'FAIL'} tester epilogue [{tag}]: "
                  f"score rel diff {err_rel:.2e}; resized-255 pixels "
                  f"max|d| {px.max():.0f}, frac>1 {frac_off:.4f} "
                  f"(cv2 vs in-graph bilinear + trunc)")
        return ok
    finally:
        if not had_float:
            del np.float


def check_refinenet_wrapper(ref="/root/reference"):
    """RefineNet task-wrapper oracle (round-3 verdict item 4).

    Drives the reference's /root/reference/refinenet/model.py:20-66 RefineNet
    (DeepLab subclass) on CPU with converted weights and one batch, and
    compares against seg2eye_tpu.refinenet.model.RefineNetModel:

      * eval-mode outputs: residual, prediction (residual+reference clamp),
        l1_loss, per_image_score, score (x1471), eds_loss
      * train-mode outputs (BN batch stats; dropout forced off on both sides)
      * gradients of eds_loss w.r.t. every trainable parameter
      * one matched SGD(momentum=0.99, nesterov, weight_decay=1e-4) update
        (the production optimizer, refinenet/train_refinenet.py:236-243),
        taken with OUR optimizer factory (refinenet/training.py
        make_optimizer) vs torch.optim.SGD — post-step params compared.
    """
    import importlib.util

    import jax
    import jax.numpy as jnp
    import optax
    import torch

    # the reference module does `from core import DefaultConfig`; the real
    # core/__init__ drags in gsheet/tensorboard deps — stub with the real
    # DefaultConfig loaded straight from core/config_default.py
    spec = importlib.util.spec_from_file_location(
        "ref_core_config",
        os.path.join(ref, "refinenet", "core", "config_default.py"))
    core_cfg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(core_cfg)
    core_stub = types.ModuleType("core")
    core_stub.DefaultConfig = core_cfg.DefaultConfig

    import torch.utils.model_zoo as zoo

    class _FakeZooDict(dict):
        def __delitem__(self, key):
            self.pop(key, None)

    # patch only around the reference-module import + construction, and
    # restore even on failure: a leaked no-op load_state_dict would make
    # every later strict-load reverse-export check vacuously pass
    had_core = "core" in sys.modules
    orig_core = sys.modules.get("core")
    orig_zoo = zoo.load_url
    orig_lsd = torch.nn.Module.load_state_dict
    sys.modules["core"] = core_stub
    sys.path.insert(0, os.path.join(ref, "refinenet"))
    zoo.load_url = lambda *a, **k: _FakeZooDict()
    torch.nn.Module.load_state_dict = lambda s, d, strict=True: None
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_refinenet_model", os.path.join(ref, "refinenet", "model.py"))
        ref_model_mod = importlib.util.module_from_spec(spec)
        torch.manual_seed(7)
        spec.loader.exec_module(ref_model_mod)
        tnet = ref_model_mod.RefineNet(num_classes=1, backbone="resnet",
                                       output_stride=16, sync_bn=False,
                                       freeze_bn=False)
    finally:
        torch.nn.Module.load_state_dict = orig_lsd
        zoo.load_url = orig_zoo
        sys.path.remove(os.path.join(ref, "refinenet"))
        if had_core:
            sys.modules["core"] = orig_core
        else:
            sys.modules.pop("core", None)

    from seg2eye_tpu.refinenet.config import RefineNetConfig
    from seg2eye_tpu.refinenet.model import RefineNetModel
    from seg2eye_tpu.refinenet.training import make_optimizer
    from seg2eye_tpu.utils import torch_convert as tc
    from seg2eye_tpu.utils import torch_export as tex

    cfg = RefineNetConfig(batch_size=2, compute_dtype="float32",
                          resnet_depth=101, backbone="resnet",
                          output_stride=16, input_width=64, input_height=64,
                          weight_decay=1e-4, gradient_norm_clip=0.0,
                          prefetch=0)
    jmodel = RefineNetModel(cfg)
    template = jax.eval_shape(
        lambda k: jmodel.net.init(k, jnp.zeros((1, 64, 64, 3), jnp.float32)),
        jax.random.PRNGKey(0))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    jvars = tc.convert_deeplab(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()},
        template)

    rng = np.random.default_rng(11)
    B, H, W = 2, 64, 64
    x = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (B, H, W, 1)).astype(np.float32)
    batch = {"input": jnp.asarray(x), "target": jnp.asarray(y)}
    tx_in = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ty_in = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))
    meta = {"person_id": ["p0", "p1"], "fname": ["f0", "f1"]}

    def report(name, ours, theirs, tol=5e-4):
        ours, theirs = np.asarray(ours), np.asarray(theirs)
        diff = np.max(np.abs(ours - theirs))
        scale = max(np.max(np.abs(theirs)), 1e-6)
        good = diff / scale < tol
        print(f"{'OK ' if good else 'FAIL'} refinenet {name}: "
              f"max|diff| {diff:.3e} (rel {diff / scale:.3e})")
        return good

    def nchw(t):
        return np.transpose(t.detach().numpy(), (0, 2, 3, 1))

    def compare_outputs(tag, tout, jout, tol=5e-4):
        good = True
        good &= report(f"{tag} residual", jout["residual"],
                       nchw(tout["residual"]), tol)
        good &= report(f"{tag} prediction", jout["prediction"],
                       nchw(tout["prediction"]), tol)
        for k in ("l1_loss", "per_image_score", "score", "eds_loss"):
            good &= report(f"{tag} {k}", jout[k],
                           tout[k].detach().numpy(), tol)
        return good

    ok = True
    # ---- eval mode ----
    tnet.eval()
    with torch.no_grad():
        tout = tnet({"input": tx_in, "target": ty_in, **meta})
    jout, _ = jmodel.forward(jvars, batch, train=False)
    ok &= compare_outputs("eval", tout, jout)

    # ---- train mode (batch stats; dropout off on both sides for
    # determinism — ours passes rng=None => deterministic=True) ----
    tnet.train()
    for m in tnet.modules():
        if isinstance(m, torch.nn.Dropout):
            m.eval()
    # f64 oracle twin: 100+ chained batch-stat normalizations condition the
    # f32 forward/backward badly (each BN rescales to unit variance, so
    # reduction-order noise compounds per layer).  The torch f32 run's own
    # deviation from the f64 run is the noise floor; ours must sit within a
    # small multiple of it — that separates roundoff conditioning from a
    # semantic mismatch (which would NOT shrink in f64).
    import copy as _copy
    tnet64 = _copy.deepcopy(tnet).double()
    tout64 = tnet64({"train": {"input": tx_in.double(),
                               "target": ty_in.double(), **meta}})
    tout = tnet({"train": {"input": tx_in, "target": ty_in, **meta}})
    jout_t, _jvars_t = jmodel.forward(jvars, batch, train=True, rng=None)

    def rel_to(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12))

    tr_ok = True
    for key, jval in (("residual", jout_t["residual"]),
                      ("prediction", jout_t["prediction"]),
                      ("l1_loss", jout_t["l1_loss"]),
                      ("per_image_score", jout_t["per_image_score"]),
                      ("score", jout_t["score"]),
                      ("eds_loss", jout_t["eds_loss"])):
        t64 = tout64[key].detach().numpy()
        t32 = tout[key].detach().numpy()
        if key in ("residual", "prediction"):
            t64, t32 = np.transpose(t64, (0, 2, 3, 1)), \
                np.transpose(t32, (0, 2, 3, 1))
        floor = rel_to(t32, t64)
        dev = rel_to(jval, t64)
        good = dev <= max(5 * floor, 5e-5)
        tr_ok &= good
        print(f"{'OK ' if good else 'FAIL'} refinenet train {key}: ours vs "
              f"f64 rel {dev:.2e} (torch f32 floor {floor:.2e})")
    ok &= tr_ok

    # ---- gradients of eds_loss + one production-optimizer step ----
    lr, wd = 0.01, cfg.weight_decay
    opt_t = torch.optim.SGD(tnet.parameters(), lr=lr, weight_decay=wd,
                            momentum=0.99, nesterov=True)
    opt_t.zero_grad(set_to_none=True)
    tout["eds_loss"].backward()
    tout64["eds_loss"].backward()
    tgrads = {k: (None if p.grad is None else p.grad.detach().numpy())
              for k, p in tnet.named_parameters()}
    tgrads64 = {k: (None if p.grad is None
                    else p.grad.detach().numpy())
                for k, p in tnet64.named_parameters()}
    sd_before = {k: v.detach().numpy().copy()
                 for k, v in tnet.state_dict().items()}
    opt_t.step()
    sd_after = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    def loss_fn(params):
        out, _ = jmodel.forward({**jvars, "params": params}, batch,
                                train=True, rng=None)
        return out["eds_loss"]

    jgrads = jax.jit(jax.grad(loss_fn))(jvars["params"])
    gexp = tex.export_deeplab({**jvars, "params": jgrads})
    tnz = {k: v for k, v in tgrads.items() if v is not None}
    gmax = max(np.max(np.abs(tgrads64[k])) for k in tnz)
    worst_dev, worst_floor, wkey = -1.0, -1.0, None
    for k in tnz:
        t64 = tgrads64[k]
        denom = max(np.max(np.abs(t64)), 1e-3 * gmax, 1e-12)
        floor = float(np.max(np.abs(tnz[k] - t64)) / denom)
        dev = float(np.max(np.abs(np.asarray(gexp[k]) - t64)) / denom)
        worst_floor = max(worst_floor, floor)
        if dev > worst_dev:
            worst_dev, wkey = dev, k
    gok = worst_dev <= max(5 * worst_floor, 5e-3)
    print(f"{'OK ' if gok else 'FAIL'} refinenet grad eds_loss "
          f"({len(tnz)} params, ours-vs-f64 worst rel {worst_dev:.2e} "
          f"@ {wkey}; torch-f32-vs-f64 floor {worst_floor:.2e})")
    ok &= gok

    tx = make_optimizer(cfg, momentum=0.99)
    opt_state = tx.init(jvars["params"])
    # our factory injects the lr hyperparam; override to the test lr
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    updates, _ = tx.update(jgrads, opt_state, jvars["params"])
    new_params = optax.apply_updates(jvars["params"], updates)
    pexp = tex.export_deeplab({**jvars, "params": new_params})
    # compare the parameter UPDATES (post - pre): both optimizers start from
    # the identical converted params, so this checks the SGD algebra
    # (wd-into-grad, momentum buffer init, nesterov compose) at first-step
    # precision without the huge params masking — or amplifying — grad noise
    umax = max(np.max(np.abs(sd_after[k] - sd_before[k])) for k in tnz)
    worst_u, wkey_u = -1.0, None
    for k in tnz:
        tu = sd_after[k] - sd_before[k]
        ju = np.asarray(pexp[k]) - sd_before[k]
        rel = float(np.max(np.abs(ju - tu))
                    / max(np.max(np.abs(tu)), 1e-3 * umax, 1e-12))
        if rel > worst_u:
            worst_u, wkey_u = rel, k
    pok = worst_u <= max(5 * worst_floor, 5e-3)
    print(f"{'OK ' if pok else 'FAIL'} refinenet SGD(0.99,nesterov,wd) "
          f"update ({len(tnz)} params, worst rel {worst_u:.2e} @ {wkey_u}; "
          f"grad noise floor {worst_floor:.2e})")
    ok &= pok
    return ok


def check_training_parity(ref="/root/reference"):
    """Training-step parity: loss dicts + gradients vs the torch reference.

    Builds the reference's full Pix2PixModel (models/pix2pix_model.py) on CPU
    at a tiny config with EVERY optional loss enabled
    (l1/l2/openeds/style_w/style_feat/gram + GAN_Feat; VGG stays off — the
    fork's VGGLoss class is missing, pix2pix_model.py:37-38), converts the
    weights, and on one identical batch compares, for each gan_mode:

      * every entry of compute_generator_loss / compute_discriminator_loss
        (pix2pix_model.py:186-264) including the raw loss-log side channel
        (pix2pix_model.py:49-59 via get_loss_log), and
      * the gradients of sum(losses).mean() (trainers/pix2pix_trainer.py:30)
        w.r.t. every trainable parameter of netG/netE/netD, compared in torch
        layout via utils/torch_export (pure transposes, so exporting the
        gradient pytree is exact).

    This is the end-to-end check of the five detach sites
    (pix2pix_model.py:170,182,218 no-ops; :251-254 and loss.py:198 real) and
    of every loss actually reaching the total: a stop_gradient added or
    omitted anywhere shows up as a gradient mismatch here.
    """
    import argparse
    import copy

    import jax
    import jax.numpy as jnp
    import torch

    # Pix2PixModel does `from util.tester import MSECalculator`
    # (pix2pix_model.py:6); util/tester.py drags in h5py/data/visualizer/
    # scipy.misc, but its MSECalculator IS models.networks.loss.MSECalculator
    # re-exported through models/networks/__init__.py:10 — stub the module
    # with the identical class object (tools/_ref_compat.py).
    import models.networks as ref_networks

    from tools import _ref_compat

    _ref_compat.stub_util_tester()
    from models.pix2pix_model import Pix2PixModel

    from seg2eye_tpu.models.pix2pix import Pix2Pix
    from seg2eye_tpu.options import Options
    from seg2eye_tpu.utils import torch_convert as tc
    from seg2eye_tpu.utils import torch_export as tex

    cfg = dict(ngf=8, ndf=8, w_dim=8, crop_size=256, aspect_ratio=0.8,
               label_nc=4, num_D=2, n_layers_D=4)
    lam = dict(lambda_l2=7.0, lambda_l1=3.0, lambda_openeds=2.0,
               lambda_style_w=1.5, lambda_style_feat=0.5, lambda_gram=120.0,
               lambda_feat=10.0)
    topt = argparse.Namespace(
        isTrain=True, continue_train=False, gpu_ids=[],
        init_type="xavier", init_variance=0.02,
        no_ganFeat_loss=False, no_vgg_loss=True,
        gan_mode="hinge", style_aggr_method="mean",
        norm_G="spectralspadebatch3x3", norm_D="spectralinstance",
        norm_E="spectralinstance", semantic_nc=4, input_nc=1, output_nc=1,
        num_upsampling_layers="normal", netD_subarch="n_layer",
        **lam, **cfg)
    torch.manual_seed(123)
    tmodel = Pix2PixModel(topt)
    tmodel.train()
    nets = {"G": tmodel.netG, "E": tmodel.netE, "D": tmodel.netD}

    # Burn in the spectral-norm power iterations before snapshotting the
    # state.  The reference encodes styles in a per-sample Python loop
    # (pix2pix_model.py:285), so weight_u advances once PER SAMPLE with
    # intra-batch drift — sample b sees a (b+1)-times-iterated u — while the
    # fused (B*k) encode advances it once per step (models/pix2pix.py
    # encode_w).  That is a documented estimation-detail deviation
    # (PARITY.md "spectral u drift"): at fresh-random u it dominates the
    # tiny near-cancelling style losses (measured: gram/raw rel ~1e-1,
    # E-grad rel up to 2.5e-1) while everything downstream of the fake
    # matches (D losses 2e-7, D grads 4e-6).  After u converges to the top
    # singular vector both semantics coincide, and every loss and gradient
    # must match — the oracle then checks what it is for: the
    # loss/gradient PLUMBING (detach sites, weights, reductions).
    with torch.no_grad():
        bi = np.random.default_rng(3)
        e_in = torch.from_numpy(
            bi.uniform(-1, 1, (2, 1, 64, 64)).astype(np.float32))
        g_seg = torch.from_numpy(np.transpose(np.asarray(
            jax.nn.one_hot(bi.integers(0, 4, (2, 32, 32)), 4,
                           dtype=np.float32)), (0, 3, 1, 2)))
        g_w = torch.from_numpy(
            bi.normal(size=(2, cfg["w_dim"])).astype(np.float32))
        d_in = torch.from_numpy(
            bi.uniform(-1, 1, (2, 5, 32, 32)).astype(np.float32))
        # 300 iterations: the residual per-call u motion decays geometrically
        # with the spectral gap; at 100 iterations the slowest-gap layers
        # still moved enough to leave ~1e-2 relative noise on a few
        # spectral-conv gradients (measured); at 300 the drift is below the
        # gradient tolerance
        for _ in range(300):
            tmodel.netE(e_in)
            tmodel.netG(g_seg, g_w)
            tmodel.netD(d_in)

    sd0 = {n: copy.deepcopy(m.state_dict()) for n, m in nets.items()}

    B, K = 2, 2
    H, W = 320, 256  # crop_size / aspect_ratio x crop_size
    rng = np.random.default_rng(7)
    label = rng.integers(0, 4, (B, H, W))
    style = rng.uniform(-1, 1, (B, K, H, W, 1)).astype(np.float32)
    target = rng.uniform(-1, 1, (B, H, W, 1)).astype(np.float32)
    tdata = {
        "label": torch.from_numpy(label[:, None]).long(),
        "style_image": torch.from_numpy(
            np.transpose(style, (0, 1, 4, 2, 3))),
        "target": torch.from_numpy(np.transpose(target, (0, 3, 1, 2))),
        "filename": ["a.png", "b.png"],
    }
    batch = {"label": jnp.asarray(label),
             "style_image": jnp.asarray(style),
             "target": jnp.asarray(target)}

    def sdnp(n):
        return {k: v.detach().numpy() for k, v in sd0[n].items()}

    jopt = Options(compute_dtype="float32", isTrain=True, input_ns=K,
                   batchSize=B, no_ganFeat_loss=False,
                   style_aggr_method="mean", **lam, **cfg).finalize()
    jmodel = Pix2Pix(jopt)
    jvars = jmodel.init_variables(jax.random.PRNGKey(1))
    jvars = {
        "G": tc.convert_generator(sdnp("G"), jvars["G"]),
        "E": tc.convert_encoder(sdnp("E"), jvars["E"], w_dim=cfg["w_dim"]),
        "D": tc.convert_discriminator(sdnp("D"), jvars["D"],
                                      num_d=cfg["num_D"],
                                      n_layers=cfg["n_layers_D"]),
    }
    params0 = {n: jvars[n]["params"] for n in ("G", "E", "D")}

    def torch_step(mode, which):
        """Run one reference G or D loss from the pristine state; return
        (loss dict incl. raw log entries, {net: {param_name: grad}})."""
        for n, m in nets.items():
            m.load_state_dict(sd0[n], strict=True)
            m.zero_grad(set_to_none=True)
        tmodel.criterionGAN = ref_networks.GANLoss(
            mode, tensor=torch.FloatTensor, opt=topt)
        tmodel.reset_loss_log()
        if which == "G":
            losses, _ = tmodel(copy.copy(tdata), mode="generator")
        else:
            losses = tmodel(copy.copy(tdata), mode="discriminator")
        total = sum(losses.values()).mean()
        total.backward()
        losses = {k: v.detach().numpy() for k, v in losses.items()}
        losses.update({k: v.detach().numpy()
                       for k, v in tmodel.get_loss_log().items()})
        grads = {n: {k: (None if p.grad is None
                         else p.grad.detach().numpy())
                     for k, p in m.named_parameters()}
                 for n, m in nets.items()}
        return losses, grads

    def jax_fns(mode):
        m = Pix2Pix(Options(compute_dtype="float32", isTrain=True,
                            input_ns=K, batchSize=B, no_ganFeat_loss=False,
                            style_aggr_method="mean", gan_mode=mode,
                            **lam, **cfg).finalize())

        def gloss(p, b):
            v = {n: {**jvars[n], "params": p[n]} for n in ("G", "E", "D")}
            total, (losses, _fake, _newv) = m.generator_loss(v, b)
            return total, losses

        def dloss(p, b):
            v = {n: {**jvars[n], "params": p[n]} for n in ("G", "E", "D")}
            total, (losses, _newv) = m.discriminator_loss(v, b)
            return total, losses

        return (jax.jit(jax.value_and_grad(gloss, has_aux=True)),
                jax.jit(jax.value_and_grad(dloss, has_aux=True)))

    def export_grads(g):
        """Gradient pytrees -> torch-layout dicts (transposes only)."""
        return {
            "G": tex.export_generator({**jvars["G"], "params": g["G"]}),
            "E": tex.export_encoder({**jvars["E"], "params": g["E"]}),
            "D": tex.export_discriminator(
                {**jvars["D"], "params": g["D"]},
                num_d=cfg["num_D"], n_layers=cfg["n_layers_D"]),
        }

    compare_losses = _compare_losses
    compare_grads = _compare_grads

    ok = True
    for mode in ("hinge", "original", "ls", "w"):
        tg_losses, tg_grads = torch_step(mode, "G")
        td_losses, td_grads = torch_step(mode, "D")
        gfn, dfn = jax_fns(mode)
        (_, jg_losses), jg_grads = gfn(params0, batch)
        (_, jd_losses), jd_grads = dfn(params0, batch)
        ok &= compare_losses(f"G[{mode}]", jg_losses, tg_losses)
        ok &= compare_losses(f"D[{mode}]", jd_losses, td_losses)
        ok &= compare_grads(f"G[{mode}]", jg_grads, export_grads(jg_grads),
                            tg_grads)
        ok &= compare_grads(f"D[{mode}]", jd_grads, export_grads(jd_grads),
                            td_grads)
    return ok


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--lockstep-f64-arm":
        # subprocess entry: JAX_ENABLE_X64=1 python ... --lockstep-f64-arm
        # OUT.npz [ref] [n_steps]
        out = sys.argv[2]
        ref_arg = sys.argv[3] if len(sys.argv) > 3 else "/root/reference"
        n = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        import jax as _jax
        _jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", ".jax_cache"))
        run_lockstep_f64_arm(out, ref_arg, n)
        sys.exit(0)
    sys.exit(main(*sys.argv[1:]))
