from seg2eye_tpu.serving.export import (ServingModel, export_inference,
                                        load_serving)

__all__ = ["ServingModel", "export_inference", "load_serving"]
