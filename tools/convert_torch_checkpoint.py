#!/usr/bin/env python3
"""Convert reference PyTorch checkpoints ({epoch}_net_{G,D,E}.pth) into
seg2eye_tpu .ckpt files, so users of mcbuehler/Seg2Eye can bring their
trained weights.

    python tools/convert_torch_checkpoint.py --checkpoints_dir REF_DIR \
        --name EXP --which_epoch latest --out_dir ./checkpoints/EXP \
        [--ngf 64 --ndf 64 --w_dim 16 --crop_size 256 ...]

Also converts torchvision ResNet-101 weights for the DeepLab backbone:

    python tools/convert_torch_checkpoint.py --resnet101 resnet101.pth \
        --out_dir ./pretrained
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import flax.serialization                                  # noqa: E402
import jax                                                 # noqa: E402
import numpy as np                                         # noqa: E402

from seg2eye_tpu.models.pix2pix import Pix2Pix             # noqa: E402
from seg2eye_tpu.options import Options                    # noqa: E402
from seg2eye_tpu.utils import torch_convert as tc          # noqa: E402


def load_state_dict(path):
    import torch
    sd = torch.load(path, map_location="cpu")
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoints_dir", default="")
    p.add_argument("--name", default="")
    p.add_argument("--which_epoch", default="latest")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--resnet101", default="")
    p.add_argument("--refinenet_pt", default="",
                   help="reference RefineNet/segnet step checkpoint (.pt) to "
                        "convert into a CheckpointManager ckpt")
    p.add_argument("--backbone", default="resnet",
                   choices=("resnet", "xception", "drn", "mobilenet"),
                   help="DeepLab backbone of the --refinenet_pt / "
                        "--backbone_pth checkpoint")
    p.add_argument("--backbone_pth", default="",
                   help="standalone backbone state_dict (.pth, vendored-"
                        "module naming) to convert into a backbone ckpt — "
                        "the zoo-bootstrap path for any of the four "
                        "backbones (xception.py:288, mobilenet.py:145-151, "
                        "drn.py:377, resnet.py:138-146)")
    p.add_argument("--vgg19_pth", default="",
                   help="torchvision vgg19 state_dict (.pth) to convert "
                        "into vgg19.ckpt for --no_vgg_loss=False "
                        "(--vgg_weights; SURVEY §7.3)")
    p.add_argument("--num_classes", type=int, default=1)
    for flag, dv in (("--ngf", 64), ("--ndf", 64), ("--w_dim", 16),
                     ("--crop_size", 256), ("--label_nc", 4),
                     ("--num_D", 2), ("--n_layers_D", 4)):
        p.add_argument(flag, type=int, default=dv)
    p.add_argument("--aspect_ratio", type=float, default=0.8)
    p.add_argument("--num_upsampling_layers", default="normal")
    a = p.parse_args()
    os.makedirs(a.out_dir, exist_ok=True)

    if a.refinenet_pt:
        import re

        from seg2eye_tpu.refinenet.config import RefineNetConfig
        from seg2eye_tpu.refinenet.checkpoint_manager import CheckpointManager
        from seg2eye_tpu.refinenet.model import RefineNetModel, SegNetModel
        from seg2eye_tpu.refinenet.training import Trainer

        cfg = RefineNetConfig(compute_dtype="float32", backbone=a.backbone)
        model = (RefineNetModel(cfg) if a.num_classes == 1
                 else SegNetModel(cfg, num_classes=a.num_classes))
        trainer = Trainer(model, cfg,
                          "eds_loss" if a.num_classes == 1 else "ce_loss")
        state = trainer.init_state(jax.random.PRNGKey(0))
        sd = load_state_dict(a.refinenet_pt)
        state["variables"] = tc.convert_deeplab(
            sd, jax.device_get(state["variables"]), backbone=a.backbone)
        m = re.search(r"(\d+)\.pt$", a.refinenet_pt)
        step = int(m.group(1)) if m else 0
        path = CheckpointManager(a.out_dir).save_at_step(step, state)
        print("wrote", path)
        return

    if a.vgg19_pth:
        from seg2eye_tpu.models.vgg import VGG19Features
        net = VGG19Features()
        template = jax.eval_shape(
            lambda k: net.init(k, np.zeros((1, 64, 64, 3), np.float32)),
            jax.random.PRNGKey(0))
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), template)
        v = tc.convert_vgg19(load_state_dict(a.vgg19_pth), template)
        out = os.path.join(a.out_dir, "vgg19.ckpt")
        with open(out, "wb") as f:
            f.write(flax.serialization.to_bytes(v))
        print("wrote", out)
        return

    if a.resnet101 or a.backbone_pth:
        bb = "resnet" if a.resnet101 else a.backbone
        from seg2eye_tpu.models.deeplab import (MobileNetBackbone,
                                                ResNetBackbone)
        if bb == "resnet":
            net = ResNetBackbone()
        elif bb == "mobilenet":
            net = MobileNetBackbone()
        else:
            from seg2eye_tpu.models.backbones_extra import (DRNBackbone,
                                                            XceptionBackbone)
            net = XceptionBackbone() if bb == "xception" else DRNBackbone()
        template = jax.eval_shape(
            lambda k: net.init(k, np.zeros((1, 64, 64, 3), np.float32)),
            jax.random.PRNGKey(0))
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), template)
        convert = {"resnet": tc.convert_resnet_backbone,
                   "xception": tc.convert_xception_backbone,
                   "drn": tc.convert_drn_backbone,
                   "mobilenet": tc.convert_mobilenet_backbone}[bb]
        v = convert(load_state_dict(a.resnet101 or a.backbone_pth), template)
        name = "resnet101" if bb == "resnet" else bb
        out = os.path.join(a.out_dir, f"{name}_backbone.ckpt")
        with open(out, "wb") as f:
            f.write(flax.serialization.to_bytes(v))
        print("wrote", out)
        return

    opt = Options(ngf=a.ngf, ndf=a.ndf, w_dim=a.w_dim, crop_size=a.crop_size,
                  label_nc=a.label_nc, num_D=a.num_D, n_layers_D=a.n_layers_D,
                  aspect_ratio=a.aspect_ratio,
                  num_upsampling_layers=a.num_upsampling_layers,
                  compute_dtype="float32").finalize()
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0))
    base = os.path.join(a.checkpoints_dir, a.name)

    def path(net):
        return os.path.join(base, f"{a.which_epoch}_net_{net}.pth")

    converted = {
        "G": tc.convert_generator(load_state_dict(path("G")),
                                  variables["G"]),
        "E": tc.convert_encoder(load_state_dict(path("E")), variables["E"],
                                w_dim=a.w_dim),
    }
    if os.path.exists(path("D")):
        converted["D"] = tc.convert_discriminator(
            load_state_dict(path("D")), variables["D"],
            num_d=a.num_D, n_layers=a.n_layers_D)
    for net, v in converted.items():
        out = os.path.join(a.out_dir, f"{a.which_epoch}_net_{net}.ckpt")
        with open(out, "wb") as f:
            f.write(flax.serialization.to_bytes(v))
        print("wrote", out)


if __name__ == "__main__":
    main()
