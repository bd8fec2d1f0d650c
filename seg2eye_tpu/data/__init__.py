from seg2eye_tpu.data.openeds import OpenEDSDataset  # noqa: F401
from seg2eye_tpu.data.loader import create_dataloader, create_inference_dataloader  # noqa: F401
