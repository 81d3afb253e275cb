from sisr_tpu.models.generator import (  # noqa: F401
    generator_init,
    generator_apply,
    grow_suffix,
    generator_freeze_prefixes,
)
from sisr_tpu.models.discriminator import (  # noqa: F401
    discriminator_init,
    discriminator_apply,
)
from sisr_tpu.models.vgg import (  # noqa: F401
    VGGConfig,
    vgg_init,
    vgg_apply,
    vgg_feature_size,
)
