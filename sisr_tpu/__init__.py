"""sisr_tpu — a TPU-native single-image super-resolution framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
keyber/Single-Image-Super-Resolution (SRGAN training + inference):

- functional-core / imperative-shell: pure jitted step functions over explicit
  pytree state; no stateful modules, no import-time side effects
  (contrast: reference config.py:334-346 executes the whole experiment setup
  at import time).
- NHWC layout, bfloat16 matmul path onto the MXU, fp32 state.
- data parallelism via jax.sharding.Mesh + jit shardings (replacing
  nn.DataParallel, reference config.py:114-118).
- checkpoint transplant as a first-class pytree-surgery API (replacing
  load_state_dict(strict=False), reference model_generator.py:65-84).
"""

__version__ = "0.1.0"

from sisr_tpu import config as config  # noqa: F401
