from cuahn_vio.parallel.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    psum_metrics,
    replicate,
    shard_batch,
)
from cuahn_vio.parallel.pose_graph import (  # noqa: F401
    PoseGraph,
    chain_graph_from_trajectory,
    optimize,
)
from cuahn_vio.parallel.pose_graph_sharded import (  # noqa: F401
    optimize_sharded,
    partition_graph,
    reassemble,
)
from cuahn_vio.parallel.sharded_eval import (  # noqa: F401
    aggregate_rmse,
    batched_run_sequences,
)
