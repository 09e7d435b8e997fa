from cuahn_vio.parallel.mesh import (  # noqa: F401
    make_mesh,
    psum_metrics,
    replicate,
    shard_batch,
)
from cuahn_vio.parallel.sharded_eval import (  # noqa: F401
    aggregate_rmse,
    batched_run_sequences,
)
