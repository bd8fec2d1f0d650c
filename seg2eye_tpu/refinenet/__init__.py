from seg2eye_tpu.refinenet.config import RefineNetConfig  # noqa: F401
