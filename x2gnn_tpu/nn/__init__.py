from x2gnn_tpu.nn.init import (  # noqa: F401
    glorot_orthogonal, torch_linear_kernel_init, torch_linear_bias_init)
from x2gnn_tpu.nn.layers import (  # noqa: F401
    Dense, ResidualLayer, EmbeddingBlock, MLPHead, RadialBasisLayer)
from x2gnn_tpu.nn.norm import GraphLayerNorm  # noqa: F401
from x2gnn_tpu.nn.conv import EdgeAttentionConv  # noqa: F401
from x2gnn_tpu.nn.readout import AtomWiseReadout, MolWiseReadout  # noqa: F401
