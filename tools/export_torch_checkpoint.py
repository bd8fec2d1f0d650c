#!/usr/bin/env python3
"""Export seg2eye_tpu checkpoints back into reference PyTorch .pth files —
the inverse of tools/convert_torch_checkpoint.py.  A model trained here can
then be loaded by the unmodified reference repo (util/util.py:203-221
load_network for {epoch}_net_{G,E,D}.pth; refinenet/core/
checkpoint_manager.py:60-80 for step-numbered .pt files).

    # Seg2Eye GAN: ./checkpoints/EXP/{latest}_net_{G,E,D}.ckpt -> .pth
    python tools/export_torch_checkpoint.py --checkpoints_dir ./checkpoints \
        --name EXP --which_epoch latest --out_dir REF_CKPT_DIR

    # RefineNet / segnet run dir: newest %07d.ckpt -> %07d.pt
    python tools/export_torch_checkpoint.py --refinenet_dir RUN_DIR \
        [--backbone resnet] --out_dir OUT_DIR

Layout inversions live in seg2eye_tpu/utils/torch_export.py; their mutual
consistency with the import direction is bitwise-tested
(tests/test_torch_convert.py) and torch-side strict-load verified
(tools/check_reference_parity.py "reverse export").
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.serialization                                  # noqa: E402
import numpy as np                                         # noqa: E402

from seg2eye_tpu.utils import torch_export as tex          # noqa: E402


def _restore(path):
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def _save_pth(sd, path):
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
    print("wrote", path, f"({len(sd)} tensors)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoints_dir", default="")
    p.add_argument("--name", default="")
    p.add_argument("--which_epoch", default="latest")
    p.add_argument("--refinenet_dir", default="",
                   help="RefineNet/segnet run dir holding %%07d.ckpt files")
    p.add_argument("--backbone", default="resnet",
                   choices=("resnet", "xception", "drn", "mobilenet"))
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    os.makedirs(a.out_dir, exist_ok=True)

    if a.refinenet_dir:
        ckpts = sorted(f for f in os.listdir(a.refinenet_dir)
                       if re.fullmatch(r"\d{7}\.ckpt", f))
        if not ckpts:
            raise SystemExit(f"no %07d.ckpt files in {a.refinenet_dir}")
        state = _restore(os.path.join(a.refinenet_dir, ckpts[-1]))
        variables = state["variables"] if "variables" in state else state
        sd = tex.export_deeplab(variables, backbone=a.backbone)
        _save_pth(sd, os.path.join(a.out_dir,
                                   ckpts[-1].replace(".ckpt", ".pt")))
        return

    if not (a.checkpoints_dir and a.name):
        raise SystemExit("need --checkpoints_dir/--name or --refinenet_dir")
    base = os.path.join(a.checkpoints_dir, a.name)

    def path(net):
        return os.path.join(base, f"{a.which_epoch}_net_{net}.ckpt")

    vg, ve = _restore(path("G")), _restore(path("E"))
    _save_pth(tex.export_generator(vg),
              os.path.join(a.out_dir, f"{a.which_epoch}_net_G.pth"))
    _save_pth(tex.export_encoder(ve),
              os.path.join(a.out_dir, f"{a.which_epoch}_net_E.pth"))
    if os.path.exists(path("D")):
        vd = _restore(path("D"))
        num_d = sum(1 for k in vd["params"]
                    if k.startswith("discriminator_"))
        n_layers = max(
            int(m.group(1))
            for k in vd["params"]["discriminator_0"]
            if (m := re.fullmatch(r"model(\d+)_conv", k)))
        _save_pth(tex.export_discriminator(vd, num_d=num_d,
                                           n_layers=n_layers),
                  os.path.join(a.out_dir, f"{a.which_epoch}_net_D.pth"))


if __name__ == "__main__":
    main()
