"""Bisect where the EP-on-TPU step time goes (round-4 diagnosis tool)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from jax.sharding import PartitionSpec as P
from jax import shard_map

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.data.synthetic import synthetic_dataset
from x2gnn_tpu.models import X2GNN
from x2gnn_tpu.parallel import make_mesh, make_ep_batch, shard_ep_batch
from x2gnn_tpu.parallel import ep_model as epm


def timeit(f, *a, iters=20):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B = 32
    graphs = synthetic_dataset(B, mean_atoms=13, seed=5)
    batch = pad_graphs(graphs, pad_budget_for(graphs, B))
    cfg = ModelConfig(attention_layout="blocked")
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    mesh = make_mesh(1)
    epb = make_ep_batch(batch, 1)
    epbs = shard_ep_batch(epb, mesh)
    Nl, D = epb.in_mask.shape
    print(f"N={Nl} D={D}", flush=True)

    spec = epm.EPBatch(**{
        f: (P() if f in ("y", "graph_mask") else P("data"))
        for f in epm.EPBatch.__annotations__})

    # 1. full forward only
    fwd = jax.jit(shard_map(
        lambda p, b: epm._ep_forward_local(p, b, cfg=cfg,
                                           num_atoms_global=Nl),
        mesh=mesh, in_specs=(P(), spec), out_specs=P(), check_vma=False))
    print("fwd_ms", timeit(fwd, params, epbs), flush=True)

    # 2. forward WITHOUT shard_map (plain jit, collectives absent):
    #    rebuild the same math with the plain blocked model for reference
    fwd_blocked = jax.jit(lambda p, b: model.apply(p, b))
    print("blocked_fwd_ms", timeit(fwd_blocked, params, batch), flush=True)

    # 3. exchange alone (fwd)
    def ex_only(b):
        ex = epm._make_exchange("allgather")
        x = b.feat_blk.reshape(Nl * D, -1).astype(jnp.float32)
        return ex(x, b.out2in, b.in2out, b.out_mask, b.in_mask).sum()
    ex_j = jax.jit(shard_map(ex_only, mesh=mesh, in_specs=(spec,),
                             out_specs=P(), check_vma=False))
    print("exchange_ms", timeit(ex_j, epbs), flush=True)

    # 4. one-hot norm alone
    def norm_only(b):
        x = b.feat_blk.reshape(Nl * D, -1).astype(jnp.float32)[:, :128]
        return epm._graph_layer_norm(
            x, b.edge_gid_blk.reshape(-1), b.in_mask.reshape(-1),
            32).sum()
    nm_j = jax.jit(shard_map(norm_only, mesh=mesh, in_specs=(spec,),
                             out_specs=P(), check_vma=False))
    print("norm_ms", timeit(nm_j, epbs), flush=True)

    # 5. pallas kernel alone on EP shapes (full D, no tier split)
    from x2gnn_tpu.ops.pallas import (
        expand_block_diagonal, pallas_blocked_attention)
    rng = np.random.default_rng(0)
    HC, H, L, K = 128, 16, 7, 6
    f32 = jnp.float32
    q = jnp.asarray(rng.normal(size=(Nl, D, HC)), f32)
    ea = jnp.asarray(rng.normal(size=(Nl, HC)), f32)
    rbf = jnp.asarray(rng.normal(size=(Nl, D, L * K)), f32)
    w_bd = expand_block_diagonal(
        jnp.asarray(rng.normal(size=(L * K, HC)), f32), L, K, HC)
    bias = jnp.asarray(rng.normal(size=(1, HC)), f32)
    z = jnp.asarray(rng.uniform(-1, 1, size=(Nl, D, D)), f32)
    a_ids = jnp.asarray(epb.edge_src_blk)
    b_ids = jnp.asarray(epb.out_dst_blk)

    def kern(q):
        return pallas_blocked_attention(q, q, q, ea, rbf, w_bd, bias, z,
                                        a_ids, b_ids, heads=H,
                                        num_radial=K).sum()
    print("kernel_fullD_ms", timeit(jax.jit(kern), q), flush=True)

    # 6. geometry block alone (pos gathers + angles)
    def geom_only(b):
        pos_g = jax.lax.all_gather(b.positions, "data", axis=0, tiled=True)
        own = b.positions[:, None, :]
        ji = pos_g[b.edge_src_blk] - own
        d = jnp.sqrt(jnp.maximum((ji * ji).sum(-1), 1e-24))
        jk = pos_g[b.out_dst_blk] - own
        cos_a = jnp.einsum("nid,nkd->nik", ji, jk)
        d_out = jnp.sqrt(jnp.maximum((jk * jk).sum(-1), 1e-24))
        norm = jnp.maximum(d[:, :, None] * d_out[:, None, :], 1e-12)
        return jnp.clip(cos_a / norm, -1.0, 1.0).sum()
    gm_j = jax.jit(shard_map(geom_only, mesh=mesh, in_specs=(spec,),
                             out_specs=P(), check_vma=False))
    print("geom_ms", timeit(gm_j, epbs), flush=True)

    # 7. embedding block alone
    def emb_only(b):
        return epm._embedding_block(
            params["params"]["emb_block"], b.numbers).sum()
    em_j = jax.jit(shard_map(emb_only, mesh=mesh, in_specs=(spec,),
                             out_specs=P(), check_vma=False))
    print("emb_ms", timeit(em_j, epbs), flush=True)


if __name__ == "__main__":
    main()
