from seg2eye_tpu.ops import image, losses, metrics  # noqa: F401
