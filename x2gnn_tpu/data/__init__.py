from x2gnn_tpu.data.molecule import Molecule, read_xyz, read_xyz_allprop  # noqa: F401
from x2gnn_tpu.data.graphs import (  # noqa: F401
    pairwise_distances,
    radius_graph,
    line_graph,
    MolGraph,
    build_mol_graph,
)
from x2gnn_tpu.data.batching import (  # noqa: F401
    GraphBatch,
    pad_graphs,
    pad_budget_for,
    batch_iterator,
)
