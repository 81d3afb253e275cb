from sisr_tpu.nn.layers import (  # noqa: F401
    conv2d_init,
    conv2d_apply,
    linear_init,
    linear_apply,
    batchnorm_init,
    batchnorm_apply,
    prelu_init,
    prelu_apply,
    leaky_relu,
    pixel_shuffle,
)
from sisr_tpu.nn.spectral_norm import sn_init, sn_normalize  # noqa: F401
from sisr_tpu.nn.pytree import (  # noqa: F401
    flatten_with_paths,
    unflatten_from_paths,
    tree_paths,
    count_params,
)
