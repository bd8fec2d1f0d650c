from seg2eye_tpu.models.generator import SpadeStyleGenerator  # noqa: F401
from seg2eye_tpu.models.encoder import ConvEncoder  # noqa: F401
from seg2eye_tpu.models.discriminator import MultiscaleDiscriminator  # noqa: F401
