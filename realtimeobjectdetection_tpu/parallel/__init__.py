from .mesh import (make_mesh, replicated, batch_sharding,  # noqa: F401
                   shard_train_step, shard_detect_fn)
