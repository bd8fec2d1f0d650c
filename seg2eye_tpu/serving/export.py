"""AOT serving export: a versioned, self-contained inference artifact.

The reference's "serving" story is re-running test.py inside the full
training repo (test.py:1-60).  TPU-native production serving wants an
ahead-of-time compiled artifact instead: `jax.export` serializes the traced
StableHLO program (portable across processes, JAX versions within the
compatibility window, and CPU/TPU backends), and the weights ride along as
a flax msgpack blob.  A server loads the artifact WITHOUT the model code —
no Options, no flax modules, no tracing at startup.

Artifact layout (directory):
    program.jaxexport   serialized StableHLO program, batch-polymorphic
                        (symbolic batch dim "b"; style-ref count k is baked)
    variables.msgpack   {"E": ..., "G": ...} pytree, flax serialization
    meta.json           input/output spec, opt fields the program baked in,
                        jax version, export timestamp

The exported function is the full scoring pipeline of eval/tester.py:
uint8 label map + uint8 style refs -> (fake [-1,1] f32, fake resized to the
native eval size as truncated [0,255] integer-valued f32) — i.e. in-graph
normalize, one-hot, k-style encode, generate, bilinear resize, truncating
conversion (reference: postprocessor.py:58-72, tester.py:44-47); only
integer-valued scores leave the device in the scoring path.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.serialization

from seg2eye_tpu.models.pix2pix import Pix2Pix
from seg2eye_tpu.ops.image import to_255resized

PROGRAM = "program.jaxexport"
VARIABLES = "variables.msgpack"
META = "meta.json"

FORMAT_VERSION = 1


def _serving_fn(model: Pix2Pix, native_h: int, native_w: int):
    def fn(variables: Dict, label: jax.Array, style: jax.Array
           ) -> Tuple[jax.Array, jax.Array]:
        batch = {"label": label, "style_image": style}
        fake = model.inference(variables, batch)
        return fake, to_255resized(fake, w=native_w, h=native_h)
    return fn


def export_inference(model: Pix2Pix, variables: Dict, out_dir: str,
                     native_hw: Tuple[int, int] = (640, 400),
                     platforms: Sequence[str] = ("cpu", "tpu"),
                     k: Optional[int] = None) -> "jax.export.Exported":
    """Export the scoring pipeline to ``out_dir`` (created if needed).

    The batch dimension is symbolic — one artifact serves any batch size.
    ``k`` (style references per sample, default opt.input_ns) is baked into
    the program, as is the native eval size ``native_hw`` — (H, W), the same
    convention as eval/tester.py _native_hw; OpenEDS native is (640, 400) —
    and every Options field the forward math reads.
    """
    from jax import export as jexport

    opt = model.opt
    k = int(opt.input_ns if k is None else k)
    h, w = opt.image_height, opt.image_width
    native_h, native_w = int(native_hw[0]), int(native_hw[1])

    fn = _serving_fn(model, native_h, native_w)
    (b,) = jexport.symbolic_shape("b")
    label_spec = jax.ShapeDtypeStruct((b, h, w), jnp.uint8)
    style_spec = jax.ShapeDtypeStruct((b, k, h, w, 1), jnp.uint8)
    # dtype/shape probe must not move host-resident weights to the device
    # (over a remote-TPU tunnel that is a full wasted model upload)
    var_specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        {"E": variables["E"], "G": variables["G"]})
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(
        var_specs, label_spec, style_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, PROGRAM), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, VARIABLES), "wb") as f:
        f.write(flax.serialization.to_bytes(
            {"E": variables["E"], "G": variables["G"]}))
    meta = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "inputs": {
            "label": {"shape": ["b", h, w], "dtype": "uint8",
                      "doc": "class-id segmentation map"},
            "style_image": {"shape": ["b", k, h, w, 1], "dtype": "uint8",
                            "doc": "style reference images, raw [0,255]"},
        },
        "outputs": {
            "fake": {"shape": ["b", h, w, 1], "dtype": "float32",
                     "doc": "generated image in [-1,1]"},
            "fake_255": {"shape": ["b", native_h, native_w, 1],
                         "dtype": "float32",
                         "doc": "native-size truncated [0,255] image "
                                "(integer-valued f32, as ops.image.to_255)"},
        },
        "baked_options": {
            f: getattr(opt, f)
            for f in ("ngf", "w_dim", "input_ns", "semantic_nc", "crop_size",
                      "aspect_ratio", "num_upsampling_layers", "norm_G",
                      "style_aggr_method", "compute_dtype",
                      "eval_use_running_stats")
        },
        "native_hw": [native_h, native_w],
    }
    with open(os.path.join(out_dir, META), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return exported


class ServingModel:
    """Loads an exported artifact and runs it — NO model code involved.

    The deserialized program is invoked through ``jax.jit``, so XLA compiles
    it for whatever backend this process runs on (one compile per concrete
    batch size, cached by jit as usual).
    """

    def __init__(self, art_dir: str):
        from jax import export as jexport
        with open(os.path.join(art_dir, PROGRAM), "rb") as f:
            self.exported = jexport.deserialize(f.read())
        with open(os.path.join(art_dir, VARIABLES), "rb") as f:
            self.variables = flax.serialization.msgpack_restore(f.read())
        with open(os.path.join(art_dir, META)) as f:
            self.meta = json.load(f)
        if self.meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta.get('format_version')} != "
                f"supported {FORMAT_VERSION}")
        self._call = jax.jit(self.exported.call)

    def __call__(self, label: np.ndarray, style: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        fake, fake_255 = self._call(self.variables, label, style)
        return np.asarray(fake), np.asarray(fake_255)


def load_serving(art_dir: str) -> ServingModel:
    return ServingModel(art_dir)
