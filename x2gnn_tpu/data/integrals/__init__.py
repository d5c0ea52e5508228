from x2gnn_tpu.data.integrals.engine import one_electron_matrices  # noqa: F401
from x2gnn_tpu.data.integrals.basis import (  # noqa: F401
    Shell, BasisSet, fallback_basis)
