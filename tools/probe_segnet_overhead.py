"""Attribute the SegNet forward's non-conv overhead (one v5e chip).

After the one-hot CE fix the SegNet eval step still ran 25.3 ms vs the
gather-free RefineNet's 14.4 ms at identical backbone FLOPs.  This times
stripped variants of the SegNet forward to locate the rest: bare DeepLab,
+argmax, +CE, +accuracy, and the fused-logsumexp CE form.

Usage: python tools/probe_segnet_overhead.py [--bs 8]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
import numpy as np                                       # noqa: E402

from seg2eye_tpu.refinenet.config import RefineNetConfig  # noqa: E402
from seg2eye_tpu.refinenet.model import SegNetModel      # noqa: E402
from seg2eye_tpu.utils.roofline import timeit            # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    args = ap.parse_args()

    cfg = RefineNetConfig(batch_size=args.bs)
    model = SegNetModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    h, w = cfg.input_height, cfg.input_width
    img = jnp.asarray(rng.integers(0, 256, (args.bs, h, w, 1)
                                   ).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (args.bs, h, w)
                                      ).astype(np.int32))

    def logits_of(v, x):
        xin = (x.astype(jnp.float32) * (2.0 / 255.0) - 1.0
               ).astype(model.dtype)
        xin = jnp.repeat(xin, 3, axis=-1)
        return model.net.apply(v, xin, train=False,
                               deterministic=True).astype(jnp.float32)

    variants = {
        "bare logits": lambda v, x, t: logits_of(v, x),
        "+argmax": lambda v, x, t: jnp.argmax(logits_of(v, x), -1),
        "+ce (log_softmax+onehot)": lambda v, x, t: _ce_logsoftmax(
            logits_of(v, x), t),
        "+ce (fused logsumexp)": lambda v, x, t: _ce_lse(logits_of(v, x), t),
        "full forward (model.forward)": lambda v, x, t: model.forward(
            v, {"input": x, "target": t}, train=False)[0]["ce_loss"],
    }
    for name, fn in variants.items():
        jf = jax.jit(fn)
        t = timeit(jf, (variables, img, labels))
        print(f"{name:>32}: {t * 1e3:8.2f} ms")


def _ce_logsoftmax(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    oh = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    return jnp.mean(-jnp.sum(logp * oh, axis=-1))


def _ce_lse(logits, labels):
    oh = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    picked = jnp.sum(logits * oh, axis=-1)
    return jnp.mean(jax.nn.logsumexp(logits, axis=-1) - picked)


if __name__ == "__main__":
    main()
