from sisr_tpu.ops.pallas.fused_upscale import fused_conv_shuffle_prelu  # noqa: F401
from sisr_tpu.ops.pallas.bicubic import bicubic_clamp_pallas  # noqa: F401
