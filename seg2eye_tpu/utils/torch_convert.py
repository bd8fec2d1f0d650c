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
    p, sp, bs = v["params"], v["spectral"], v["batch_stats"]
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
    # fc: torch flattens (C,4,4); we flatten (4,4,C)
    c = sd[f"layer{n_layers - 1}.0.weight_orig"].shape[0]
    for fc in ("fc_mu", "fc_var"):
        w = sd[f"{fc}.weight"].reshape(w_dim, c, 4, 4)
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
            base = f"{dk}.model{n}.0.0"
            _set(p, (dk, f"model{n}_conv", "kernel"),
                 _conv(sd[f"{base}.weight_orig"]))
            _set(sp, (dk, f"model{n}_conv", "u"), sd[f"{base}.weight_u"])
            _set(sp, (dk, f"model{n}_conv", "v"),
                 _perm_v(sd[f"{base}.weight_v"], sd[f"{base}.weight_orig"]))
        _set(p, (dk, f"model{n_layers}_conv", "kernel"),
             _conv(sd[f"{dk}.model{n_layers}.0.weight"]))
        _set(p, (dk, f"model{n_layers}_conv", "bias"),
             sd[f"{dk}.model{n_layers}.0.bias"])
    return v


def _set_bn(sd, flax_parent_p, flax_parent_bs, name, torch_base):
    flax_parent_p[name]["scale"] = sd[f"{torch_base}.weight"].astype(
        np.float32)
    flax_parent_p[name]["bias"] = sd[f"{torch_base}.bias"].astype(np.float32)
    flax_parent_bs[name]["mean"] = sd[
        f"{torch_base}.running_mean"].astype(np.float32)
    flax_parent_bs[name]["var"] = sd[
        f"{torch_base}.running_var"].astype(np.float32)


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


def convert_deeplab(sd: Dict[str, np.ndarray], template) -> Dict:
    """Vendored-DeepLab(resnet) state_dict (e.g. a trained RefineNet/segnet
    checkpoint, refinenet/core/checkpoint_manager.py) -> DeepLab variables."""
    v = _to_mutable(template)
    p, bs = v["params"], v["batch_stats"]
    _convert_resnet_into(sd, p["backbone"], bs["backbone"], "backbone.")

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
