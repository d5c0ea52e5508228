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


def test_exchange_custom_vjp_matches_dense(make_molecule, rng):
    """Round-4 scatter-free exchange (ep_model._make_exchange): forward
    gathers rows through out2in, backward gathers cotangents through
    the inverse in2out — values AND input gradients must match a dense
    jnp reference, in both allgather and ring modes, on an 8-shard
    mesh."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from x2gnn_tpu.parallel.ep_model import (
        EPBatch, make_ep_batch, _make_exchange)
    from x2gnn_tpu.data.batching import pad_graphs

    n_dev = 8
    gs = []
    for i in range(6):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 10)))
        gs.append(build_mol_graph(numbers, pos, y=np.array([0.0]),
                                  edge_feat_dim=8))
    b = pad_graphs(gs, pad_budget_for(gs, 6))
    epb = make_ep_batch(b, n_dev)
    N, D = epb.in_mask.shape
    Cf = 16
    x = jnp.asarray(rng.normal(size=(N * D, Cf)), jnp.float32)

    # dense reference: rows out2in of x, zeroed at masked out-slots
    def ref_fn(x):
        out = x[jnp.asarray(epb.out2in)]
        return jnp.where(jnp.asarray(epb.out_mask)[..., None], out, 0.0)

    cot = jnp.asarray(rng.normal(size=(N, D, Cf)), jnp.float32)
    ref, ref_vjp = jax.vjp(ref_fn, x)
    ref_dx = ref_vjp(cot)[0]
    # zero the pad in-slots: the dense reference scatters cot for slot-0
    # references from pad rows; the exchange masks them by design
    ref_dx = jnp.where(jnp.asarray(epb.in_mask).reshape(-1)[:, None],
                       ref_dx, 0.0)

    mesh = make_mesh(n_dev)
    for mode in ("allgather", "ring"):
        ex = _make_exchange(mode)

        def local(xl, o2i, i2o, om, im):
            return ex(xl, o2i, i2o, om, im)

        sharded = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P("data"),) * 5, out_specs=P("data"),
            check_vma=False))
        args = (x, jnp.asarray(epb.out2in), jnp.asarray(epb.in2out),
                jnp.asarray(epb.out_mask), jnp.asarray(epb.in_mask))
        got = sharded(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"fwd mode={mode}")

        def loss(x):
            return (sharded(x, *args[1:]) * cot).sum()

        dx = jax.grad(loss)(x)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"bwd mode={mode}")
