"""Convert reference PyTorch checkpoints into seg2eye_tpu variable pytrees.

Takes state_dicts as {name: numpy array} (no torch dependency here; the CLI
in tools/convert_torch_checkpoint.py does the .pth loading) and fills a
template produced by ``Pix2Pix.init_variables`` / ``DeepLab.init``.

Layout conversions:
  * conv weights: torch OIHW -> flax HWIO (transpose 2,3,1,0)
  * linear weights: torch (out,in) -> flax (in,out)
  * encoder fc_mu/fc_var: torch flattens CHW, we flatten HWC -> the input
    axis is permuted accordingly (reference: encoder.py:70 out.view(B,-1))
  * spectral norm: weight_orig -> kernel, weight_u -> spectral/u,
    weight_v -> spectral/v (torch power-iteration state carried over)
  * SPADE param-free BN: running_mean/var -> batch_stats mean/var
"""
from __future__ import annotations

from typing import Dict

import numpy as np

GEN_BLOCKS = ("head_0", "G_middle_0", "G_middle_1",
              "up_0", "up_1", "up_2", "up_3", "up_4")

# Forward-equivalence of all converters is verified by
# tools/check_reference_parity.py (PARITY: PASS, see PARITY.md).


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):
    return np.transpose(w, (1, 0))


def _perm_v(v, w_oihw):
    """torch's spectral weight_v is indexed in (I,kh,kw) flatten order; our
    matrix flattens (kh,kw,I) — permute accordingly."""
    o, i, kh, kw = w_oihw.shape
    return np.transpose(v.reshape(i, kh, kw), (1, 2, 0)).reshape(-1)


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    old = node[path[-1]]
    assert tuple(old.shape) == tuple(value.shape), \
        (path, old.shape, value.shape)
    node[path[-1]] = value.astype(np.asarray(old).dtype)


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return np.asarray(tree)


def convert_generator(sd: Dict[str, np.ndarray], template) -> Dict:
    """torch SPADESTYLEGenerator state_dict -> {'params','spectral',
    'batch_stats'} matching SpadeStyleGenerator."""
    v = _to_mutable(template)
    # batch_stats is absent for norm_G='spectralspadeinstance*' (SPADE
    # param-free instance norm carries no running stats)
    p, sp, bs = v["params"], v["spectral"], v.get("batch_stats", {})
    _set(p, ("fc", "kernel"), _conv(sd["fc.weight"]))
    _set(p, ("fc", "bias"), sd["fc.bias"])
    _set(p, ("conv_img", "kernel"), _conv(sd["conv_img.weight"]))
    _set(p, ("conv_img", "bias"), sd["conv_img.bias"])

    for blk in GEN_BLOCKS:
        if blk not in p:
            continue
        for conv in ("conv_0", "conv_1", "conv_s"):
            key = f"{blk}.{conv}.weight_orig"
            if key not in sd:
                continue
            _set(p, (blk, conv, "kernel"), _conv(sd[key]))
            if f"{blk}.{conv}.bias" in sd:
                _set(p, (blk, conv, "bias"), sd[f"{blk}.{conv}.bias"])
            _set(sp, (blk, conv, "u"), sd[f"{blk}.{conv}.weight_u"])
            _set(sp, (blk, conv, "v"),
                 _perm_v(sd[f"{blk}.{conv}.weight_v"], sd[key]))
        for norm in ("norm_0", "norm_1", "norm_s"):
            base = f"{blk}.{norm}"
            if f"{base}.spade.mlp_shared.0.weight" not in sd:
                continue
            _set(p, (blk, norm, "spade_mlp_shared_kernel"),
                 _conv(sd[f"{base}.spade.mlp_shared.0.weight"]))
            _set(p, (blk, norm, "spade_mlp_shared_bias"),
                 sd[f"{base}.spade.mlp_shared.0.bias"])
            _set(p, (blk, norm, "spade_mlp_gamma_kernel"),
                 _conv(sd[f"{base}.spade.mlp_gamma.weight"]))
            _set(p, (blk, norm, "spade_mlp_gamma_bias"),
                 sd[f"{base}.spade.mlp_gamma.bias"])
            _set(p, (blk, norm, "spade_mlp_beta_kernel"),
                 _conv(sd[f"{base}.spade.mlp_beta.weight"]))
            _set(p, (blk, norm, "spade_mlp_beta_bias"),
                 sd[f"{base}.spade.mlp_beta.bias"])
            _set(p, (blk, norm, "adain_linear", "weight"),
                 _lin(sd[f"{base}.adain.linear.weight"]))
            _set(p, (blk, norm, "adain_linear", "bias"),
                 sd[f"{base}.adain.linear.bias"])
            if f"{base}.spade.param_free_norm.running_mean" in sd:
                _set(bs, (blk, norm, "mean"),
                     sd[f"{base}.spade.param_free_norm.running_mean"])
                _set(bs, (blk, norm, "var"),
                     sd[f"{base}.spade.param_free_norm.running_var"])
    return v


def convert_encoder(sd: Dict[str, np.ndarray], template,
                    w_dim: int) -> Dict:
    """torch ConvEncoder state_dict -> ConvEncoder variables."""
    v = _to_mutable(template)
    p, sp = v["params"], v["spectral"]
    n_layers = sum(1 for k in p if k.startswith("layer"))
    for i in range(n_layers):
        _set(p, (f"layer{i}", "kernel"), _conv(sd[f"layer{i}.0.weight_orig"]))
        _set(sp, (f"layer{i}", "u"), sd[f"layer{i}.0.weight_u"])
        _set(sp, (f"layer{i}", "v"),
             _perm_v(sd[f"layer{i}.0.weight_v"],
                     sd[f"layer{i}.0.weight_orig"]))
        if f"layer{i}.0.bias" in sd:
            # subnorm ''/none keeps the conv bias (our generalized layout;
            # the reference encoder CONSTRUCTOR crashes for these norms,
            # PARITY.md "spectralbatch variant")
            _set(p, (f"layer{i}", "bias"), sd[f"layer{i}.0.bias"])
        if f"layer{i}.1.weight" in sd:
            # batch subnorm (norm_E='spectralbatch'), see
            # convert_discriminator
            _set_bn(sd, p[f"norm{i}"], v["batch_stats"][f"norm{i}"],
                    "TorchBatchNorm_0", f"layer{i}.1")
    # fc: torch flattens (C,g,g); we flatten (g,g,C).  g is 4 for every
    # real reference checkpoint (6-layer crop>=256 path, encoder.py:36-47);
    # inferred so round-trips of our generalized small-crop encoders work.
    c = sd[f"layer{n_layers - 1}.0.weight_orig"].shape[0]
    for fc in ("fc_mu", "fc_var"):
        g = int(round((sd[f"{fc}.weight"].shape[1] // c) ** 0.5))
        assert g * g * c == sd[f"{fc}.weight"].shape[1]
        w = sd[f"{fc}.weight"].reshape(w_dim, c, g, g)
        w = np.transpose(w, (0, 2, 3, 1)).reshape(w_dim, -1)
        _set(p, (fc, "kernel"), _lin(w))
        _set(p, (fc, "bias"), sd[f"{fc}.bias"])
    return v


def convert_discriminator(sd: Dict[str, np.ndarray], template,
                          num_d: int = 2, n_layers: int = 4) -> Dict:
    """torch MultiscaleDiscriminator state_dict -> variables."""
    v = _to_mutable(template)
    p, sp = v["params"], v["spectral"]
    for k in range(num_d):
        dk = f"discriminator_{k}"
        _set(p, (dk, "model0_conv", "kernel"),
             _conv(sd[f"{dk}.model0.0.weight"]))
        _set(p, (dk, "model0_conv", "bias"), sd[f"{dk}.model0.0.bias"])
        for n in range(1, n_layers):
            # subnorm instance/batch: Sequential(spectral conv, norm) ->
            # conv at model{n}.0.0; subnorm ''/none: add_norm_layer returns
            # the conv directly (normalization.py:26-28) -> model{n}.0,
            # with the conv bias kept
            base = f"{dk}.model{n}.0.0"
            if f"{base}.weight_orig" not in sd:
                base = f"{dk}.model{n}.0"
            _set(p, (dk, f"model{n}_conv", "kernel"),
                 _conv(sd[f"{base}.weight_orig"]))
            _set(sp, (dk, f"model{n}_conv", "u"), sd[f"{base}.weight_u"])
            _set(sp, (dk, f"model{n}_conv", "v"),
                 _perm_v(sd[f"{base}.weight_v"], sd[f"{base}.weight_orig"]))
            if f"{base}.bias" in sd:
                _set(p, (dk, f"model{n}_conv", "bias"), sd[f"{base}.bias"])
            if f"{dk}.model{n}.0.1.weight" in sd:
                # batch subnorm (norm_D='spectralbatch'): the Sequential's
                # second member is an affine BatchNorm2d
                # (normalization.py:15-47) -> our SubNorm's TorchBatchNorm
                _set_bn(sd, p[dk][f"norm{n}"],
                        v["batch_stats"][dk][f"norm{n}"],
                        "TorchBatchNorm_0", f"{dk}.model{n}.0.1")
        _set(p, (dk, f"model{n_layers}_conv", "kernel"),
             _conv(sd[f"{dk}.model{n_layers}.0.weight"]))
        _set(p, (dk, f"model{n_layers}_conv", "bias"),
             sd[f"{dk}.model{n_layers}.0.bias"])
    return v


def _set_bn(sd, flax_parent_p, flax_parent_bs, name, torch_base):
    # through _set so BN leaves get the same (path, shape) assertion as
    # every converted conv/linear leaf
    _set(flax_parent_p, (name, "scale"), sd[f"{torch_base}.weight"])
    _set(flax_parent_p, (name, "bias"), sd[f"{torch_base}.bias"])
    _set(flax_parent_bs, (name, "mean"), sd[f"{torch_base}.running_mean"])
    _set(flax_parent_bs, (name, "var"), sd[f"{torch_base}.running_var"])


def _convert_resnet_into(sd: Dict[str, np.ndarray], p, bs, prefix: str = ""):
    def k(name):
        return prefix + name

    p["conv1"]["kernel"] = _conv(sd[k("conv1.weight")]).astype(np.float32)
    _set_bn(sd, p, bs, "bn1", k("bn1"))
    layers = {"layer1": 3, "layer2": 4, "layer3": 23, "layer4": 3}
    for lname, blocks in layers.items():
        for i in range(blocks):
            fblk = f"{lname}_{i}"
            if fblk not in p:
                continue
            tbase = k(f"{lname}.{i}")
            for j in (1, 2, 3):
                p[fblk][f"conv{j}"]["conv"]["kernel"] = _conv(
                    sd[f"{tbase}.conv{j}.weight"]).astype(np.float32)
                _set_bn(sd, p[fblk][f"conv{j}"], bs[fblk][f"conv{j}"],
                        "bn", f"{tbase}.bn{j}")
            if f"{tbase}.downsample.0.weight" in sd and \
                    "downsample" in p[fblk]:
                p[fblk]["downsample"]["conv"]["kernel"] = _conv(
                    sd[f"{tbase}.downsample.0.weight"]).astype(np.float32)
                _set_bn(sd, p[fblk]["downsample"], bs[fblk]["downsample"],
                        "bn", f"{tbase}.downsample.1")


def convert_resnet_backbone(sd: Dict[str, np.ndarray], template) -> Dict:
    """torchvision-style ResNet-101 state_dict (or the vendored DeepLab
    backbone's) -> ResNetBackbone variables ({'params','batch_stats'})."""
    v = _to_mutable(template)
    _convert_resnet_into(sd, v["params"], v["batch_stats"])
    return v


def _sepconv(sd, fp, fbs, torch_base: str):
    """SeparableConv2d (xception.py:17-31): conv1 (depthwise) -> bn ->
    pointwise."""
    fp["depthwise"]["kernel"] = _conv(
        sd[f"{torch_base}.conv1.weight"]).astype(np.float32)
    _set_bn(sd, fp, fbs, "bn", f"{torch_base}.bn")
    fp["pointwise"]["kernel"] = _conv(
        sd[f"{torch_base}.pointwise.weight"]).astype(np.float32)


def _convert_xception_into(sd, p, bs, prefix: str = ""):
    """AlignedXception (xception.py:94-232).  Every Block's rep Sequential
    holds 3 (relu, SeparableConv2d, BatchNorm) units — blocks 1/2 drop the
    leading relu (start_with_relu=False, xception.py:75-76), shifting the
    module indices by one."""
    def k(name):
        return prefix + name

    p["conv1"]["kernel"] = _conv(sd[k("conv1.weight")]).astype(np.float32)
    _set_bn(sd, p, bs, "bn1", k("bn1"))
    p["conv2"]["kernel"] = _conv(sd[k("conv2.weight")]).astype(np.float32)
    _set_bn(sd, p, bs, "bn2", k("bn2"))

    for b in range(1, 21):
        fb = f"block{b}"
        start_with_relu = b not in (1, 2)
        off = 0 if start_with_relu else -1
        for u in range(3):
            si = 3 * u + 1 + off
            _sepconv(sd, p[fb][f"sep{u}"], bs[fb][f"sep{u}"],
                     k(f"{fb}.rep.{si}"))
            _set_bn(sd, p[fb], bs[fb], f"sepbn{u}", k(f"{fb}.rep.{si + 1}"))
        if k(f"{fb}.skip.weight") in sd:
            p[fb]["skip"]["kernel"] = _conv(
                sd[k(f"{fb}.skip.weight")]).astype(np.float32)
            _set_bn(sd, p[fb], bs[fb], "skipbn", k(f"{fb}.skipbn"))

    for i in (3, 4, 5):
        _sepconv(sd, p[f"conv{i}"], bs[f"conv{i}"], k(f"conv{i}"))
        _set_bn(sd, p, bs, f"bn{i}", k(f"bn{i}"))


def convert_xception_backbone(sd: Dict[str, np.ndarray], template) -> Dict:
    v = _to_mutable(template)
    _convert_xception_into(sd, v["params"], v["batch_stats"])
    return v


def _convert_drn_into(sd, p, bs, prefix: str = ""):
    """DRN-D-54 (drn.py:102-234): layer0 stem + conv layers 1/2/7/8
    (Sequential [Conv, BN, ReLU] triplets) + Bottleneck layers 3-6."""
    def k(name):
        return prefix + name

    p["layer0_conv"]["kernel"] = _conv(
        sd[k("layer0.0.weight")]).astype(np.float32)
    _set_bn(sd, p, bs, "layer0_bn", k("layer0.1"))
    for lname in ("layer1", "layer2", "layer7", "layer8"):
        i = 0
        while f"{lname}_conv{i}" in p:
            p[f"{lname}_conv{i}"]["kernel"] = _conv(
                sd[k(f"{lname}.{3 * i}.weight")]).astype(np.float32)
            _set_bn(sd, p, bs, f"{lname}_bn{i}", k(f"{lname}.{3 * i + 1}"))
            i += 1
    for lname, blocks in (("layer3", 3), ("layer4", 4), ("layer5", 6),
                          ("layer6", 3)):
        for i in range(blocks):
            fb, tb = f"{lname}_{i}", k(f"{lname}.{i}")
            if fb not in p:
                continue
            for j in (1, 2, 3):
                p[fb][f"conv{j}"]["kernel"] = _conv(
                    sd[f"{tb}.conv{j}.weight"]).astype(np.float32)
                _set_bn(sd, p[fb], bs[fb], f"bn{j}", f"{tb}.bn{j}")
            if f"{tb}.downsample.0.weight" in sd and "down" in p[fb]:
                p[fb]["down"]["kernel"] = _conv(
                    sd[f"{tb}.downsample.0.weight"]).astype(np.float32)
                _set_bn(sd, p[fb], bs[fb], "down_bn", f"{tb}.downsample.1")


def convert_drn_backbone(sd: Dict[str, np.ndarray], template) -> Dict:
    v = _to_mutable(template)
    _convert_drn_into(sd, v["params"], v["batch_stats"])
    return v


def _convert_mobilenet_into(sd, p, bs, prefix: str = ""):
    """MobileNetV2 (mobilenet.py:69-131): features.0 = conv_bn stem,
    features.1..17 = InvertedResidual whose .conv Sequential is
    [dw, BN, ReLU6, pw, BN] when expand_ratio==1 (features.1 only) else
    [pw, BN, ReLU6, dw, BN, ReLU6, pw, BN]."""
    def k(name):
        return prefix + name

    p["stem"]["conv"]["kernel"] = _conv(
        sd[k("features.0.0.weight")]).astype(np.float32)
    _set_bn(sd, p["stem"], bs["stem"], "bn", k("features.0.1"))
    cfg = [(1, 1), (6, 2), (6, 3), (6, 4), (6, 3), (6, 3), (6, 1)]  # t, n
    fi = 1
    for bi, (t, n) in enumerate(cfg):
        for i in range(n):
            fb, tb = f"block{bi}_{i}", k(f"features.{fi}")
            fi += 1
            if t != 1:
                p[fb]["expand"]["conv"]["kernel"] = _conv(
                    sd[f"{tb}.conv.0.weight"]).astype(np.float32)
                _set_bn(sd, p[fb]["expand"], bs[fb]["expand"], "bn",
                        f"{tb}.conv.1")
                dwi = 3
            else:
                dwi = 0
            p[fb]["dw"]["kernel"] = _conv(
                sd[f"{tb}.conv.{dwi}.weight"]).astype(np.float32)
            _set_bn(sd, p[fb], bs[fb], "dw_bn", f"{tb}.conv.{dwi + 1}")
            p[fb]["project"]["conv"]["kernel"] = _conv(
                sd[f"{tb}.conv.{dwi + 3}.weight"]).astype(np.float32)
            _set_bn(sd, p[fb]["project"], bs[fb]["project"], "bn",
                    f"{tb}.conv.{dwi + 4}")


def convert_mobilenet_backbone(sd: Dict[str, np.ndarray], template) -> Dict:
    v = _to_mutable(template)
    _convert_mobilenet_into(sd, v["params"], v["batch_stats"])
    return v


_BACKBONE_CONVERTERS = {
    "resnet": _convert_resnet_into,
    "xception": _convert_xception_into,
    "drn": _convert_drn_into,
    "mobilenet": _convert_mobilenet_into,
}


def convert_deeplab(sd: Dict[str, np.ndarray], template,
                    backbone: str = "resnet") -> Dict:
    """Vendored-DeepLab state_dict (e.g. a trained RefineNet/segnet
    checkpoint, refinenet/core/checkpoint_manager.py) -> DeepLab variables.
    All four reference backbones supported (backbone/__init__.py:3-13)."""
    v = _to_mutable(template)
    p, bs = v["params"], v["batch_stats"]
    _BACKBONE_CONVERTERS[backbone](sd, p["backbone"], bs["backbone"],
                                   "backbone.")

    def convbn(fp, fbs, torch_conv, torch_bn):
        fp["conv"]["kernel"] = _conv(sd[torch_conv]).astype(np.float32)
        _set_bn(sd, fp, fbs, "bn", torch_bn)

    ap, abs_ = p["aspp"], bs["aspp"]
    for i in (1, 2, 3, 4):
        convbn(ap[f"aspp{i}"], abs_[f"aspp{i}"],
               f"aspp.aspp{i}.atrous_conv.weight", f"aspp.aspp{i}.bn")
    convbn(ap["global_pool"], abs_["global_pool"],
           "aspp.global_avg_pool.1.weight", "aspp.global_avg_pool.2")
    convbn(ap["proj"], abs_["proj"], "aspp.conv1.weight", "aspp.bn1")

    dp, dbs = p["decoder"], bs["decoder"]
    convbn(dp["low_proj"], dbs["low_proj"],
           "decoder.conv1.weight", "decoder.bn1")
    convbn(dp["conv1"], dbs["conv1"],
           "decoder.last_conv.0.weight", "decoder.last_conv.1")
    convbn(dp["conv2"], dbs["conv2"],
           "decoder.last_conv.4.weight", "decoder.last_conv.5")
    dp["classifier"]["kernel"] = _conv(
        sd["decoder.last_conv.8.weight"]).astype(np.float32)
    dp["classifier"]["bias"] = sd["decoder.last_conv.8.bias"].astype(
        np.float32)
    return v


def convert_vgg19(sd: Dict[str, np.ndarray], template) -> Dict:
    """torchvision ``vgg19`` (or bare ``vgg19.features``) state_dict ->
    VGG19Features variables (models/vgg.py; conv names carry the
    ``features.{i}`` index, so the mapping is mechanical)."""
    out = _to_mutable(template)
    p = out["params"]
    for name in p:
        idx = int(name.removeprefix("conv"))
        key = f"features.{idx}.weight"
        if key not in sd:                      # bare .features dump
            key = f"{idx}.weight"
        _set(p, (name, "kernel"), _conv(np.asarray(sd[key])))
        _set(p, (name, "bias"),
             np.asarray(sd[key.replace("weight", "bias")]))
    return out
