from sisr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    batch_sharded,
    shard_infer_fn,
    shard_train_step,
    shard_batch,
)
