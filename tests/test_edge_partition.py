"""Edge-partitioned attention on the 8-device CPU mesh must equal the
single-device blocked attention."""

import numpy as np
import jax
import jax.numpy as jnp

from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for, Budgets
from x2gnn_tpu.ops.attention import blocked_attention
from x2gnn_tpu.ops.basis import legendre_cos_harmonics
from x2gnn_tpu.parallel.mesh import make_mesh
from x2gnn_tpu.parallel.edge_partition import make_ep_blocked_attention

H, C, L = 4, 8, 3


def test_ep_matches_single_device(make_molecule, rng):
    n_dev = 4
    gs = []
    for i in range(8):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 10)))
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=8)
        gs.append(g)
    n, e, t, d = pad_budget_for(gs, 8)[:4]
    # pad atom and edge budgets to multiples of n_dev for clean shards
    n = ((n + n_dev - 1) // n_dev) * n_dev
    e = ((e + n_dev - 1) // n_dev) * n_dev
    b = pad_graphs(gs, Budgets(n, e, t, d))
    E = b.edge_src.shape[0]
    N, D = b.in_edges.shape

    q = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    e_atom = jnp.asarray(rng.normal(size=(N, H, C)), jnp.float32)
    G = jnp.asarray(rng.normal(size=(E, L, H, C)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, C)), jnp.float32)

    pos = b.positions
    in_src = b.edge_src[b.in_edges]
    out_dst = b.edge_dst[b.out_edges]
    ji = pos[in_src] - pos[:, None, :]
    jk = pos[out_dst] - pos[:, None, :]
    theta = np.arctan2(
        np.sqrt(np.maximum(
            (np.cross(ji[:, :, None, :], jk[:, None, :, :]) ** 2).sum(-1),
            1e-24)),
        np.einsum("nid,nkd->nik", ji, jk))
    cbf = jnp.asarray(legendre_cos_harmonics(jnp.asarray(theta), L),
                      jnp.float32)
    pair_mask = jnp.asarray(
        b.in_mask[:, :, None] & b.out_mask[:, None, :]
        & (in_src[:, :, None] != out_dst[:, None, :]))

    # single-device reference (E-layout)
    ref = blocked_attention(q, k, v, e_atom, G, bias, cbf,
                            jnp.asarray(b.in_edges),
                            jnp.asarray(b.out_edges),
                            pair_mask, jnp.asarray(b.edge_inpos))

    mesh = make_mesh(n_dev)
    ep = make_ep_blocked_attention(mesh, heads=H)
    out_blk = ep(q, k, v, e_atom, G, bias, cbf,
                 jnp.asarray(b.in_edges), jnp.asarray(b.out_edges),
                 pair_mask)
    got = np.asarray(out_blk).reshape(N * D, H, C)[b.edge_inpos]
    em = b.edge_mask
    np.testing.assert_allclose(got[em], np.asarray(ref)[em],
                               rtol=3e-4, atol=3e-5)
