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

``export_refiner`` does the same for the RefineNet system's two task
models (the challenge-winning path, reference refinenet/evaluate_
{refinenet,segnet}.py): uint8 inputs in, submission-ready uint8 outputs
out, batch-polymorphic, one artifact per trained model.
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


def export_refiner(model, variables: Dict, out_dir: str,
                   platforms: Sequence[str] = ("cpu", "tpu")
                   ) -> "jax.export.Exported":
    """Export a RefineNet or SegNet task model as a serving artifact.

    * RefineNetModel: uint8 stack (b,H,W,3) — colorized predicted mask |
      NN reference image | NN reference mask, the refinenet/dataset.py
      layout — -> (prediction f32 [-1,1] (b,H,W,1), submission uint8
      (b,H,W) via the exact clip((pred+1)*255/2) truncation of
      refinenet/evaluate_refinenet.py (reference :104-112)).
    * SegNetModel: uint8 grayscale image (b,H,W,1) -> uint8 class-id map
      (b,H,W) (argmax prediction, reference evaluate_segnet.py:107-151).

    Inference uses batch-norm running averages (train=False — the exact
    reference semantics: model.eval() at evaluate_refinenet.py:75 and
    evaluate_segnet.py:99); batch dim is symbolic.
    """
    from jax import export as jexport

    from seg2eye_tpu.refinenet.model import RefineNetModel, SegNetModel

    cfg = model.cfg
    h, w = cfg.input_height, cfg.input_width
    if isinstance(model, RefineNetModel):
        kind, in_ch = "refinenet", 3

        def fn(variables: Dict, stack: jax.Array):
            out, _ = model.forward(variables, {"input": stack}, train=False)
            pred = out["prediction"].astype(jnp.float32)
            pred_u8 = jnp.clip((pred + 1.0) * (255.0 / 2.0),
                               0, 255).astype(jnp.uint8)[..., 0]
            return pred, pred_u8

        outputs_meta = {
            "prediction": {"shape": ["b", h, w, 1], "dtype": "float32",
                           "doc": "refined image in [-1,1]"},
            "prediction_u8": {"shape": ["b", h, w], "dtype": "uint8",
                              "doc": "submission image, truncated "
                                     "clip((pred+1)*255/2)"},
        }
        input_doc = ("colorized predicted mask | NN reference image | "
                     "NN reference mask, raw [0,255]")
    elif isinstance(model, SegNetModel):
        kind, in_ch = "segnet", 1

        def fn(variables: Dict, image: jax.Array):
            out, _ = model.forward(variables, {"input": image}, train=False)
            return out["prediction"].astype(jnp.uint8)

        outputs_meta = {
            "prediction": {"shape": ["b", h, w], "dtype": "uint8",
                           "doc": "argmax class-id map (0..3)"},
        }
        input_doc = "grayscale eye image, raw [0,255]"
    else:
        raise TypeError(f"unsupported model {type(model).__name__}")

    (b,) = jexport.symbolic_shape("b")
    in_spec = jax.ShapeDtypeStruct((b, h, w, in_ch), jnp.uint8)
    var_specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        variables)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(
        var_specs, in_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, PROGRAM), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, VARIABLES), "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    meta = {
        "format_version": FORMAT_VERSION,
        "model_type": kind,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "inputs": {
            "input": {"shape": ["b", h, w, in_ch], "dtype": "uint8",
                      "doc": input_doc},
        },
        "outputs": outputs_meta,
        "baked_config": {
            f: getattr(cfg, f)
            for f in ("backbone", "output_stride", "resnet_depth",
                      "input_height", "input_width", "compute_dtype")
        },
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

    def __call__(self, *inputs: np.ndarray):
        """Run the program: Seg2Eye artifacts take (label, style) and
        return (fake, fake_255); refiner artifacts take one input and
        return their meta-declared outputs.  Tuples pass through."""
        out = self._call(self.variables, *inputs)
        if isinstance(out, (tuple, list)):
            return tuple(np.asarray(o) for o in out)
        return np.asarray(out)


def load_serving(art_dir: str) -> ServingModel:
    return ServingModel(art_dir)
