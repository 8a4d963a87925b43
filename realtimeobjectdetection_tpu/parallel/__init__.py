from .mesh import (make_mesh, replicated, batch_sharding,  # noqa: F401
                   shard_train_step, shard_detect_fn)
from .checkpoint import save_sharded, restore_sharded  # noqa: F401
from .pipeline import (PipelinedForward, PipelinedForwardV5,  # noqa: F401
                       balance_cuts, balance_cuts_v5)
