from x2gnn_tpu.parallel.mesh import make_mesh, device_count  # noqa: F401
from x2gnn_tpu.parallel.data_parallel import (  # noqa: F401
    stack_batches, shard_batches, make_dp_train_step, make_dp_eval_step)
from x2gnn_tpu.parallel.edge_partition import (  # noqa: F401
    make_ep_blocked_attention)
from x2gnn_tpu.parallel.ep_model import (  # noqa: F401
    EPBatch, make_ep_batch, shard_ep_batch, make_ep_forward,
    make_ep_train_step)
from x2gnn_tpu.parallel.hybrid import (  # noqa: F401
    make_hybrid_mesh, stack_ep_batches, shard_hybrid_batch,
    make_hybrid_forward, make_hybrid_train_step, make_hybrid_eval_step)
