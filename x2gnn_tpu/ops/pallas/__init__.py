from x2gnn_tpu.ops.pallas.blocked_attn import (  # noqa: F401
    pallas_blocked_attention)
