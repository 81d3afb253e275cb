from sisr_tpu.ops.resize import (  # noqa: F401
    bicubic_resize,
    bicubic_weight_matrix,
    lr_from_hr,
)
