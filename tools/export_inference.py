#!/usr/bin/env python3
"""AOT-export the jitted inference function for serving.

Serializes the full inference program (k-style encode -> generator ->
640x400 [0,255] output) as a portable jax.export artifact (StableHLO), so a
serving binary can run it without the Python model code.

    python tools/export_inference.py --out model.jaxexport \
        [--checkpoints_dir DIR --name EXP --which_epoch latest] [--batch 8]

Round-trip check is performed after export (deserialize + run).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import jax                                                 # noqa: E402
import jax.numpy as jnp                                    # noqa: E402
import numpy as np                                         # noqa: E402
from jax import export as jax_export                       # noqa: E402

from seg2eye_tpu.models.pix2pix import Pix2Pix             # noqa: E402
from seg2eye_tpu.ops.image import to_255resized            # noqa: E402
from seg2eye_tpu.options import Options, parse_options     # noqa: E402
from seg2eye_tpu.train import state as state_lib           # noqa: E402
from seg2eye_tpu.utils import checkpoint                   # noqa: E402


def main():
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--out", required=True)
    pre.add_argument("--batch", type=int, default=8)
    args, rest = pre.parse_known_args()
    opt = parse_options(rest, is_train=False, save=False)

    model = Pix2Pix(opt)
    st = state_lib.create_state(model, jax.random.PRNGKey(opt.seed))
    if opt.name and checkpoint.has_checkpoint(opt, opt.which_epoch):
        st = checkpoint.load_state(st, opt, opt.which_epoch)
        print(f"loaded '{opt.which_epoch}' checkpoint")
    variables = jax.device_get(st.variables)

    def serve(label, style):
        fake = model.inference(variables, {"label": label,
                                           "style_image": style})
        return to_255resized(fake).astype(jnp.uint8)

    b, h, w = args.batch, opt.image_height, opt.image_width
    specs = (jax.ShapeDtypeStruct((b, h, w), jnp.int32),
             jax.ShapeDtypeStruct((b, opt.input_ns, h, w, 1), jnp.float32))
    exported = jax_export.export(jax.jit(serve))(*specs)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob)} bytes, "
          f"platforms={exported.platforms})")

    # round-trip: deserialize and execute
    rehydrated = jax_export.deserialize(blob)
    rng = np.random.default_rng(0)
    out = rehydrated.call(
        jnp.asarray(rng.integers(0, 4, (b, h, w)), jnp.int32),
        jnp.asarray(rng.uniform(-1, 1,
                                (b, opt.input_ns, h, w, 1)).astype(np.float32)))
    print("round-trip OK:", out.shape, out.dtype,
          "range", int(out.min()), int(out.max()))


if __name__ == "__main__":
    main()
