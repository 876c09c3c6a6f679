from sagnn_tpu.parallel.mesh import make_mesh
from sagnn_tpu.parallel.sharding import (
    ShardingRules, batch_shardings, graph_shardings, param_shardings,
)
