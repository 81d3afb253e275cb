from sisr_tpu.train.losses import bce_with_logits, content_loss  # noqa: F401
from sisr_tpu.train.optim import make_lr_schedule, trainable_mask, adam_update  # noqa: F401
from sisr_tpu.train.replay import ReplayBuffer  # noqa: F401
from sisr_tpu.train.step import TrainState, init_train_state, make_train_step  # noqa: F401
from sisr_tpu.train.loop import train, assemble_state, effective_generator_cfg  # noqa: F401
