from seg2eye_tpu.serving.export import (ServingModel, export_inference,
                                        export_refiner, load_serving)

__all__ = ["ServingModel", "export_inference", "export_refiner",
           "load_serving"]
