from seg2eye_tpu.ops.pallas.spade_style import (fused_spade_style,  # noqa: F401
                                                spade_style_reference,
                                                pallas_eligible)
