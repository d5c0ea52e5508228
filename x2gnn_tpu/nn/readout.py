"""Hierarchical readouts: edges -> atoms (-> molecules) -> scalar.

AtomWise (readout.py:7-43): gate edge features with a radial-basis filter,
scatter-add into source atoms, 3-layer SiLU MLP to a per-atom scalar —
used for extensive targets; the model sums atoms -> molecules at the end
(model.py:53).

MolWise (readout.py:45-76): same, then pools atoms -> molecules
(scatter_mean or scatter_add) BEFORE the MLP — intensive targets.
"""

from __future__ import annotations

import flax.linen as nn

from x2gnn_tpu.nn.layers import Dense, MLPHead
from x2gnn_tpu.ops.segment import segment_sum, segment_mean


class AtomWiseReadout(nn.Module):
    channels: int
    num_target: int = 1
    mlp_depth: int = 3

    @nn.compact
    def __call__(self, x, rbf, edge_src, num_atoms: int, edge_mask=None,
                 aggregate=None):
        """x: (E, C) edge features; rbf: (E, K); edge_src: (E,) source atom
        of each atom-graph edge (the reference scatters over edge_index[0],
        readout.py:37). Returns (num_atoms, num_target).

        `aggregate`: optional callable (E, C) -> (num_atoms, C) replacing
        the edges->atoms segment_sum. The blocked layout passes a
        scatter-free out-table gather + dense row sum (exactly equivalent:
        each real edge occupies exactly one out-slot of its source atom)."""
        gate = Dense(self.channels, name="lin_rbf")(rbf)
        out = gate * x
        if aggregate is not None:
            out = aggregate(out)
        else:
            out = segment_sum(out, edge_src, num_atoms, mask=edge_mask)
        return MLPHead(self.channels, self.num_target, self.mlp_depth,
                       name="mlp")(out)


class MolWiseReadout(nn.Module):
    channels: int
    num_target: int = 1
    mlp_depth: int = 3
    pool: str = "mean"        # 'mean' | 'add' (readout.py:55)

    @nn.compact
    def __call__(self, x, rbf, edge_src, atom_gid, num_atoms: int,
                 num_graphs: int, edge_mask=None, node_mask=None,
                 aggregate=None):
        assert self.pool in ("mean", "add"), "unsupported pooling option"
        gate = Dense(self.channels, name="lin_rbf")(rbf)
        out = gate * x
        if aggregate is not None:
            out = aggregate(out)
        else:
            out = segment_sum(out, edge_src, num_atoms, mask=edge_mask)
        if self.pool == "mean":
            out = segment_mean(out, atom_gid, num_graphs, mask=node_mask)
        else:
            out = segment_sum(out, atom_gid, num_graphs, mask=node_mask)
        # MolWise.reset_parameters forgets its MLP -> torch-default init
        # (readout.py:62-64); replicated via torch_default_init=True.
        return MLPHead(self.channels, self.num_target, self.mlp_depth,
                       torch_default_init=True, name="mlp")(out)
