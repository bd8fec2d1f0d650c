"""Seg2Eye-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of mcbuehler/Seg2Eye (ICCVW 2019).

Two systems, mirroring the reference (see SURVEY.md):
  * Seg2Eye proper: SPADE+Style GAN (generator/encoder/discriminator) trained
    on the H5-packed OpenEDS dataset.
  * RefineNet: DeepLabV3+-based residual refiner + segmentation network.

Everything is re-designed TPU-first: NHWC layouts, pure-functional modules,
jitted fused train steps, batch sharding over a `jax.sharding.Mesh`, bf16
mixed precision, and Pallas kernels for the hot fused ops.
"""

__version__ = "0.1.0"
