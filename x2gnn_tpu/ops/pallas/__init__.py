from x2gnn_tpu.ops.pallas.blocked_attn import (  # noqa: F401
    expand_block_diagonal,
    pallas_blocked_attention,
)
