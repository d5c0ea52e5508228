from x2gnn_tpu.models.x2gnn import X2GNN, make_model  # noqa: F401
