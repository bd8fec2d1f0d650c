from seg2eye_tpu.eval.tester import Tester  # noqa: F401
