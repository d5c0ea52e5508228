import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.data.synthetic import synthetic_dataset
from x2gnn_tpu.ops.pallas import expand_block_diagonal, pallas_blocked_attention

def timeit(f, *a, iters=30):
    r = jax.block_until_ready(f(*a)); t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/iters*1e3

H, C = 16, 8; HC = 128; K = 6
bs = 128
graphs = synthetic_dataset(bs, mean_atoms=18, seed=7)
batch = pad_graphs(graphs, pad_budget_for(graphs, bs))
N, D = batch.in_edges.shape
n_hi, d_lo = batch.n_hi, batch.d_lo
rng = np.random.default_rng(1)
f32 = jnp.float32
in_src = batch.edge_src[batch.in_edges]
out_dst = batch.edge_dst[batch.out_edges]
a_j = jnp.asarray(np.where(batch.in_mask, in_src, -1).astype(np.int32))
b_j = jnp.asarray(np.where(batch.out_mask, out_dst, -2).astype(np.int32))
z = jnp.asarray(rng.uniform(-1, 1, size=(N, D, D)), f32)
e_atom = jnp.asarray(rng.normal(size=(N, HC)), f32)
q = jnp.asarray(rng.normal(size=(N, D, HC)), f32)
kk = jnp.asarray(rng.normal(size=(N, D, HC)), f32)
v = jnp.asarray(rng.normal(size=(N, D, HC)), f32)
real_T = int(batch.trip_mask.sum())
print(f"N={N} D={D} n_hi={n_hi} d_lo={d_lo} realT={real_T}")
for L in (1, 3, 7):
    W = jnp.asarray(rng.normal(size=(L*K, HC)), f32)*0.3
    bias = jnp.asarray(rng.normal(size=(1, HC)), f32)
    rbf = jnp.asarray(rng.normal(size=(N, D, L*K)), f32)
    w_bd = expand_block_diagonal(W, L, K, HC)
    def loss(q, kk, v, rbf=rbf, w_bd=w_bd, bias=bias):
        o_hi = pallas_blocked_attention(q[:n_hi], kk[:n_hi], v[:n_hi], e_atom[:n_hi],
            rbf[:n_hi], w_bd, bias, z[:n_hi], a_j[:n_hi], b_j[:n_hi], heads=H, num_radial=K)
        o_lo = pallas_blocked_attention(q[n_hi:, :d_lo], kk[n_hi:, :d_lo], v[n_hi:, :d_lo],
            e_atom[n_hi:], rbf[n_hi:, :d_lo], w_bd, bias, z[n_hi:, :d_lo, :d_lo],
            a_j[n_hi:, :d_lo], b_j[n_hi:, :d_lo], heads=H, num_radial=K)
        return (o_hi**2).sum() + (o_lo**2).sum()
    f = jax.jit(loss)
    g = jax.jit(jax.grad(loss, argnums=(0,1,2)))
    print(f"L={L}: fwd {timeit(f, q, kk, v):.3f} ms  fwd+bwd {timeit(g, q, kk, v):.3f} ms", flush=True)
