from .mesh import make_mesh, shard_batch_sharding, replicated_sharding  # noqa: F401
from .train import (  # noqa: F401
    TrainState,
    make_optimizer,
    make_train_step,
    trainable_mask,
)
