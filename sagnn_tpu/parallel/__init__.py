from sagnn_tpu.parallel.mesh import make_mesh
from sagnn_tpu.parallel.serving import (
    pad_catalog, shard_catalog, sharded_recommend_top_k, sharded_topk,
)
from sagnn_tpu.parallel.sharding import (
    ShardingRules, batch_shardings, graph_shardings, param_shardings,
)
