"""Pallas fused blocked-attention kernel vs the XLA blocked path —
values and gradients, on real graph batches (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.ops.attention import blocked_attention
from x2gnn_tpu.ops.basis import legendre_cos_harmonics
from x2gnn_tpu.ops.pallas.blocked_attn import (
    expand_block_diagonal, pallas_blocked_attention)

H, C = 4, 8
HC = H * C
L, K = 7, 6


def _problem(make_molecule, rng, k=4):
    gs = []
    for i in range(k):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 11)))
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=8)
        gs.append(g)
    b = pad_graphs(gs, pad_budget_for(gs, k))
    E = b.edge_src.shape[0]
    q = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    k_ = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    e_atom = jnp.asarray(rng.normal(size=(b.in_edges.shape[0], H, C)),
                         jnp.float32)
    rbf = jnp.asarray(rng.normal(size=(E, L, K)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(L * K, HC)), jnp.float32) * 0.3
    bias = jnp.asarray(rng.normal(size=(H, C)), jnp.float32)
    # geometry
    pos = b.positions
    in_src = b.edge_src[b.in_edges]
    out_dst = b.edge_dst[b.out_edges]
    ji = pos[in_src] - pos[:, None, :]
    jk = pos[out_dst] - pos[:, None, :]
    cos_a = np.einsum("nid,nkd->nik", ji, jk)
    cross = np.cross(ji[:, :, None, :], jk[:, None, :, :])
    sin_a = np.sqrt(np.maximum((cross ** 2).sum(-1), 1e-24))
    theta = np.arctan2(sin_a, cos_a)
    norm = np.maximum(np.linalg.norm(ji, axis=-1)[:, :, None]
                      * np.linalg.norm(jk, axis=-1)[:, None, :], 1e-12)
    z = np.clip(cos_a / norm, -1.0, 1.0)
    pair_mask = (b.in_mask[:, :, None] & b.out_mask[:, None, :]
                 & (in_src[:, :, None] != out_dst[:, None, :]))
    cbf = np.asarray(legendre_cos_harmonics(jnp.asarray(theta), L))
    a_ids = np.where(b.in_mask, in_src, -1).astype(np.int32)
    b_ids = np.where(b.out_mask, out_dst, -2).astype(np.int32)
    return b, (q, k_, v, e_atom, W, bias), (z, cbf, pair_mask, a_ids, b_ids,
                                            rbf)


def _xla_out(b, tensors, geom):
    q, k, v, e_atom, W, bias = tensors
    _, cbf, pair_mask, _, _, rbf = geom
    G = jnp.einsum("elk,lkf->elf", rbf, W.reshape(L, K, HC))
    return blocked_attention(
        q, k, v, e_atom, G.reshape(-1, L, H, C), bias, jnp.asarray(cbf),
        jnp.asarray(b.in_edges), jnp.asarray(b.out_edges),
        jnp.asarray(pair_mask), jnp.asarray(b.edge_inpos))


def _pallas_out(b, tensors, geom, i_chunk=None):
    q, k, v, e_atom, W, bias = tensors
    z, _, _, a_ids, b_ids, rbf = geom
    in_e = jnp.asarray(b.in_edges)
    out_e = jnp.asarray(b.out_edges)
    N, D = b.in_edges.shape
    w_bd = expand_block_diagonal(W, L, K, HC)
    out_blk = pallas_blocked_attention(
        q.reshape(-1, HC)[in_e],
        k.reshape(-1, HC)[out_e],
        v.reshape(-1, HC)[out_e],
        e_atom.reshape(-1, HC),
        rbf.reshape(-1, L * K)[out_e],
        w_bd,
        bias.reshape(1, HC),
        jnp.asarray(z, jnp.float32),
        jnp.asarray(a_ids), jnp.asarray(b_ids),
        heads=H, num_radial=K, interpret=True, i_chunk=i_chunk)
    out_e_layout = out_blk.reshape(N * D, HC)[jnp.asarray(b.edge_inpos)]
    return out_e_layout.reshape(-1, H, C)


def test_pallas_forward_matches_xla(make_molecule, rng):
    b, tensors, geom = _problem(make_molecule, rng)
    ref = np.asarray(_xla_out(b, tensors, geom))
    got = np.asarray(_pallas_out(b, tensors, geom))
    em = b.edge_mask
    np.testing.assert_allclose(got[em], ref[em], rtol=3e-4, atol=3e-5)


def test_expand_block_diagonal():
    W = jnp.arange(L * K * 4, dtype=jnp.float32).reshape(L * K, 4)
    bd = np.asarray(expand_block_diagonal(W, L, K, 4))
    for l in range(L):
        for n in range(K):
            row = bd[l * K + n].reshape(L, 4)
            np.testing.assert_array_equal(row[l],
                                          np.asarray(W[l * K + n]))
            mask = np.ones(L, bool)
            mask[l] = False
            assert (row[mask] == 0).all()


def test_pallas_model_matches_segment(make_molecule, rng):
    """Full model with the fused kernel (interpret mode) vs segment."""
    import dataclasses
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.models import X2GNN
    cfg = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                      heads=4, sbf_dim=3, rbf_dim=4, edge_feat_dim=8)
    gs = []
    for i in range(3):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 10)))
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=8)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(
            np.float32)
        gs.append(g)
    b = pad_graphs(gs, pad_budget_for(gs, 3))
    model_seg = X2GNN(dataclasses.replace(cfg, attention_layout="segment"))
    model_pal = X2GNN(dataclasses.replace(
        cfg, attention_layout="blocked", use_pallas=True))
    params = model_seg.init(jax.random.PRNGKey(0), b)
    out_seg = np.asarray(model_seg.apply(params, b))
    out_pal = np.asarray(model_pal.apply(params, b))
    np.testing.assert_allclose(out_pal, out_seg, rtol=1e-3, atol=1e-4)


def test_pallas_ichunk_forward_matches_xla(make_molecule, rng):
    """The i-chunked kernel (large-degree path) on a small-D problem."""
    b, tensors, geom = _problem(make_molecule, rng)
    D = b.in_edges.shape[1]
    ic = 8 if D % 8 == 0 else D
    ref = np.asarray(_xla_out(b, tensors, geom))
    got = np.asarray(_pallas_out(b, tensors, geom, i_chunk=ic))
    em = b.edge_mask
    np.testing.assert_allclose(got[em], ref[em], rtol=3e-4, atol=3e-5)


def test_pallas_ichunk_gradients_match_xla(make_molecule, rng):
    b, tensors, geom = _problem(make_molecule, rng)
    D = b.in_edges.shape[1]
    ic = 8 if D % 8 == 0 else D
    em = jnp.asarray(b.edge_mask)

    def loss_xla(*t):
        out = _xla_out(b, t, geom)
        return jnp.where(em[:, None, None], out + out ** 2, 0.0).sum()

    def loss_pal(*t):
        out = _pallas_out(b, t, geom, i_chunk=ic)
        return jnp.where(em[:, None, None], out + out ** 2, 0.0).sum()

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5))(*tensors)
    g_got = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5))(*tensors)
    for name, a, c in zip(["q", "k", "v", "e_atom", "W", "bias"],
                          g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=3e-3, atol=3e-4,
            err_msg=f"grad mismatch for {name}")


def test_pallas_large_degree_auto_chunks(rng):
    """A dense 44-atom near-complete graph gives D > 40, which must
    auto-dispatch to the i-chunked kernel (the one-shot kernel's
    temporaries would exceed VMEM on hardware)."""
    from tests.conftest import random_molecule
    numbers, pos = random_molecule(rng, n_atoms=44, box=1.4, min_dist=0.7)
    g = build_mol_graph(numbers, pos, y=np.array([0.0]), edge_feat_dim=8)
    b = pad_graphs([g], pad_budget_for([g], 1))
    D = b.in_edges.shape[1]
    assert D > 40, f"test setup: expected dense graph, got D={D}"
    E = b.edge_src.shape[0]
    q = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    k_ = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    e_atom = jnp.asarray(rng.normal(size=(b.in_edges.shape[0], H, C)),
                         jnp.float32)
    rbf = jnp.asarray(rng.normal(size=(E, L, K)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(L * K, HC)), jnp.float32) * 0.3
    bias = jnp.asarray(rng.normal(size=(H, C)), jnp.float32)
    posb = b.positions
    in_src = b.edge_src[b.in_edges]
    out_dst = b.edge_dst[b.out_edges]
    ji = posb[in_src] - posb[:, None, :]
    jk = posb[out_dst] - posb[:, None, :]
    cos_a = np.einsum("nid,nkd->nik", ji, jk)
    cross = np.cross(ji[:, :, None, :], jk[:, None, :, :])
    sin_a = np.sqrt(np.maximum((cross ** 2).sum(-1), 1e-24))
    theta = np.arctan2(sin_a, cos_a)
    norm = np.maximum(np.linalg.norm(ji, axis=-1)[:, :, None]
                      * np.linalg.norm(jk, axis=-1)[:, None, :], 1e-12)
    z = np.clip(cos_a / norm, -1.0, 1.0)
    pair_mask = (b.in_mask[:, :, None] & b.out_mask[:, None, :]
                 & (in_src[:, :, None] != out_dst[:, None, :]))
    cbf = np.asarray(legendre_cos_harmonics(jnp.asarray(theta), L))
    a_ids = np.where(b.in_mask, in_src, -1).astype(np.int32)
    b_ids = np.where(b.out_mask, out_dst, -2).astype(np.int32)
    tensors = (q, k_, v, e_atom, W, bias)
    geom = (z, cbf, pair_mask, a_ids, b_ids, rbf)
    ref = np.asarray(_xla_out(b, tensors, geom))
    got = np.asarray(_pallas_out(b, tensors, geom))   # i_chunk auto (D>40)
    em = b.edge_mask
    np.testing.assert_allclose(got[em], ref[em], rtol=3e-4, atol=3e-5)


def test_pallas_gradients_match_xla(make_molecule, rng):
    b, tensors, geom = _problem(make_molecule, rng)
    em = jnp.asarray(b.edge_mask)

    def loss_xla(q, k, v, e_atom, W, bias):
        out = _xla_out(b, (q, k, v, e_atom, W, bias), geom)
        return jnp.where(em[:, None, None], out + out ** 2, 0.0).sum()

    def loss_pal(q, k, v, e_atom, W, bias):
        out = _pallas_out(b, (q, k, v, e_atom, W, bias), geom)
        return jnp.where(em[:, None, None], out + out ** 2, 0.0).sum()

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5))(*tensors)
    g_got = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5))(*tensors)
    names = ["q", "k", "v", "e_atom", "W", "bias"]
    for name, a, c in zip(names, g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=3e-3, atol=3e-4,
            err_msg=f"grad mismatch for {name}")


@pytest.mark.parametrize("chunked", [False, True])
def test_pallas_kernel_under_jit_remat(make_molecule, rng, chunked):
    """jax.checkpoint around the fused kernel under jit: the custom_vjp
    must not close over tracers (regression: cfg.remat on the pallas path
    raised UnexpectedTracerError). Gradients match the uncheckpointed
    kernel."""
    b, tensors, geom = _problem(make_molecule, rng)
    D = b.in_edges.shape[1]
    ic = (8 if D % 8 == 0 else D) if chunked else None
    em = jnp.asarray(b.edge_mask)

    def loss(*t):
        out = _pallas_out(b, t, geom, i_chunk=ic)
        return jnp.where(em[:, None, None], out + out ** 2, 0.0).sum()

    g_plain = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))(*tensors)
    loss_ckpt = jax.checkpoint(loss)
    g_ckpt = jax.jit(jax.grad(loss_ckpt,
                              argnums=(0, 1, 2, 3, 4, 5)))(*tensors)
    for name, a, c in zip(["q", "k", "v", "e_atom", "W", "bias"],
                          g_plain, g_ckpt):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=f"remat grad mismatch for {name}")


# ---------------------------------------------------------------------------
# Round-3: dropout mask + attention weights INSIDE the fused kernel
# (VERDICT #5 — dropout>0 / return_attention_weights keep the Pallas path)
# ---------------------------------------------------------------------------

def _xla_core_out(b, tensors, geom, drop=None, return_alpha=False):
    """blocked_attention_core on (N, D, ...) tables — the XLA path the
    conv uses when use_pallas=False; supports the pair dropout mask."""
    from x2gnn_tpu.ops.attention import blocked_attention_core
    q, k, v, e_atom, W, bias = tensors
    _, cbf, pair_mask, _, _, rbf = geom
    in_e = jnp.asarray(b.in_edges)
    out_e = jnp.asarray(b.out_edges)
    N, D = b.in_edges.shape
    G = jnp.einsum("elk,lkf->elf", rbf, W.reshape(L, K, HC))
    return blocked_attention_core(
        q.reshape(-1, HC)[in_e].reshape(N, D, H, C),
        k.reshape(-1, HC)[out_e].reshape(N, D, H, C),
        v.reshape(-1, HC)[out_e].reshape(N, D, H, C),
        e_atom.reshape(-1, H, C),
        G.reshape(-1, L * HC)[out_e].reshape(N, D, L, H, C),
        bias, jnp.asarray(cbf), jnp.asarray(pair_mask),
        dropout_mask=drop, return_alpha=return_alpha)


def _pallas_blk_out(b, tensors, geom, i_chunk=None, drop=None,
                    return_alpha=False):
    """pallas_blocked_attention returning the raw (N, D, HC) block (plus
    alpha when requested)."""
    q, k, v, e_atom, W, bias = tensors
    z, _, _, a_ids, b_ids, rbf = geom
    in_e = jnp.asarray(b.in_edges)
    out_e = jnp.asarray(b.out_edges)
    w_bd = expand_block_diagonal(W, L, K, HC)
    return pallas_blocked_attention(
        q.reshape(-1, HC)[in_e],
        k.reshape(-1, HC)[out_e],
        v.reshape(-1, HC)[out_e],
        e_atom.reshape(-1, HC),
        rbf.reshape(-1, L * K)[out_e],
        w_bd,
        bias.reshape(1, HC),
        jnp.asarray(z, jnp.float32),
        jnp.asarray(a_ids), jnp.asarray(b_ids),
        heads=H, num_radial=K, interpret=True, i_chunk=i_chunk,
        dropout_mask=drop, return_alpha=return_alpha)


@pytest.mark.parametrize("chunked", [False, True])
def test_pallas_dropout_matches_xla_core(make_molecule, rng, chunked):
    from x2gnn_tpu.ops.attention import pair_dropout_mask
    b, tensors, geom = _problem(make_molecule, rng)
    N, D = b.in_edges.shape
    ic = (8 if D % 8 == 0 else D) if chunked else None
    drop = pair_dropout_mask(jax.random.PRNGKey(7), 0.35, N, D, H)
    ref = np.asarray(_xla_core_out(b, tensors, geom, drop=drop))
    got = np.asarray(_pallas_blk_out(b, tensors, geom, i_chunk=ic,
                                     drop=drop))
    got_e = got.reshape(N * D, HC)[b.edge_inpos].reshape(-1, H, C)
    ref_e = ref.reshape(N * D, HC)[b.edge_inpos].reshape(-1, H, C)
    em = b.edge_mask
    np.testing.assert_allclose(got_e[em], ref_e[em], rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("chunked", [False, True])
def test_pallas_return_alpha_matches_xla_core(make_molecule, rng, chunked):
    from x2gnn_tpu.ops.attention import pair_dropout_mask
    b, tensors, geom = _problem(make_molecule, rng)
    N, D = b.in_edges.shape
    ic = (8 if D % 8 == 0 else D) if chunked else None
    drop = pair_dropout_mask(jax.random.PRNGKey(3), 0.25, N, D, H)
    ref_out, ref_alpha = _xla_core_out(b, tensors, geom, drop=drop,
                                       return_alpha=True)
    got_out, got_alpha = _pallas_blk_out(b, tensors, geom, i_chunk=ic,
                                         drop=drop, return_alpha=True)
    pm = np.asarray(geom[2])
    # alpha is the PRE-dropout softmax in both implementations
    np.testing.assert_allclose(np.asarray(got_alpha)[pm],
                               np.asarray(ref_alpha)[pm],
                               rtol=3e-4, atol=3e-5)
    em = b.edge_mask
    got_e = np.asarray(got_out).reshape(N * D, HC)[b.edge_inpos]
    ref_e = np.asarray(ref_out).reshape(N * D, HC)[b.edge_inpos]
    np.testing.assert_allclose(got_e[em], ref_e[em], rtol=3e-4, atol=3e-5)


def test_pallas_dropout_gradients_match_xla_core(make_molecule, rng):
    from x2gnn_tpu.ops.attention import pair_dropout_mask
    b, tensors, geom = _problem(make_molecule, rng)
    N, D = b.in_edges.shape
    drop = pair_dropout_mask(jax.random.PRNGKey(11), 0.3, N, D, H)
    em_blk = jnp.asarray(
        (np.arange(N * D).reshape(N, D) >= 0)
        & np.asarray(b.in_mask))[..., None]

    def loss_core(q, k, v, W, bias):
        out = _xla_core_out(b, (q, k, v, tensors[3], W, bias), geom,
                            drop=drop)
        out = out.reshape(N, D, HC)
        return jnp.where(em_blk, out + out ** 2, 0.0).sum()

    def loss_pal(q, k, v, W, bias):
        out = _pallas_blk_out(b, (q, k, v, tensors[3], W, bias), geom,
                              drop=drop)
        return jnp.where(em_blk, out + out ** 2, 0.0).sum()

    args = (tensors[0], tensors[1], tensors[2], tensors[4], tensors[5])
    g_ref = jax.grad(loss_core, argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(*args)
    for a, r in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-3, atol=2e-4)


def test_blocked_conv_dropout_keeps_pallas_and_matches(make_molecule, rng):
    """Full model: dropout training with use_pallas=True equals the XLA
    core under the same 'dropout' rng — the two paths share the
    pair-space mask stream."""
    import dataclasses
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.models import X2GNN
    cfg = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                      heads=4, sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                      dropout=0.4, attention_layout="blocked")
    gs = []
    for i in range(3):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 10)))
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=8)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(
            np.float32)
        gs.append(g)
    b = pad_graphs(gs, pad_budget_for(gs, 3))
    model_pal = X2GNN(dataclasses.replace(cfg, use_pallas=True))
    model_xla = X2GNN(dataclasses.replace(cfg, use_pallas=False))
    params = model_xla.init(jax.random.PRNGKey(0), b)
    rngs = {"dropout": jax.random.PRNGKey(42)}
    out_pal = np.asarray(model_pal.apply(params, b, deterministic=False,
                                         rngs=rngs))
    out_xla = np.asarray(model_xla.apply(params, b, deterministic=False,
                                         rngs=rngs))
    np.testing.assert_allclose(out_pal, out_xla, rtol=1e-3, atol=1e-4)
    # and dropout actually does something vs deterministic
    out_det = np.asarray(model_pal.apply(params, b))
    assert np.abs(out_pal - out_det).max() > 1e-6


def test_rectangular_window_matches_square(make_molecule, rng):
    """Round-5 rectangular windows: an exact-DI x rounded-DK kernel call
    over rows whose degree fits the window must equal the square full-
    window result on those rows (slots >= degree are masked)."""
    b, tensors, geom = _problem(make_molecule, rng)
    q, k, v, e_atom, W, bias = tensors
    z, _, _, a_ids, b_ids, rbf = geom
    in_e = jnp.asarray(b.in_edges)
    out_e = jnp.asarray(b.out_edges)
    N, D = b.in_edges.shape
    w_bd = expand_block_diagonal(W, L, K, HC)
    deg = np.maximum(b.in_mask.sum(1), b.out_mask.sum(1))

    def call(DI, DK, rows):
        return pallas_blocked_attention(
            q.reshape(-1, HC)[in_e][rows, :DI],
            k.reshape(-1, HC)[out_e][rows, :DK],
            v.reshape(-1, HC)[out_e][rows, :DK],
            e_atom.reshape(-1, HC)[rows],
            rbf.reshape(-1, L * K)[out_e][rows, :DK],
            w_bd, bias.reshape(1, HC),
            jnp.asarray(z[rows, :DI, :DK], jnp.float32),
            jnp.asarray(a_ids[rows, :DI]), jnp.asarray(b_ids[rows, :DK]),
            heads=H, num_radial=K, interpret=True)

    all_rows = np.arange(N)
    full = np.asarray(call(D, D, all_rows))
    # rectangular window sized to the actual max degree: DI exact,
    # DK rounded to 8 — every real slot is inside the window
    di = int(deg.max())
    dk = ((di + 7) // 8) * 8
    if dk >= D:
        dk = D
    rect = np.asarray(call(di, min(dk, D), all_rows))
    im = np.asarray(b.in_mask)[:, :di]
    np.testing.assert_allclose(rect[im], full[:, :di][im],
                               rtol=1e-5, atol=1e-6)

    # gradients through the rectangular window match the square ones
    def loss(fn_args, DI, DK):
        qq, kk, vv = fn_args
        out = pallas_blocked_attention(
            qq[:, :DI], kk[:, :DK], vv[:, :DK],
            e_atom.reshape(-1, HC),
            rbf.reshape(-1, L * K)[out_e][:, :DK],
            w_bd, bias.reshape(1, HC),
            jnp.asarray(z[:, :DI, :DK], jnp.float32),
            jnp.asarray(a_ids[:, :DI]), jnp.asarray(b_ids[:, :DK]),
            heads=H, num_radial=K, interpret=True)
        m = jnp.asarray(b.in_mask)[:, :DI, None]
        return jnp.where(m, out + out ** 2, 0.0).sum()

    q_in = q.reshape(-1, HC)[in_e]
    k_out = k.reshape(-1, HC)[out_e]
    v_out = v.reshape(-1, HC)[out_e]
    g_sq = jax.grad(lambda *a: loss(a, D, D), argnums=(0, 1, 2))(
        q_in, k_out, v_out)
    g_rc = jax.grad(lambda *a: loss(a, di, min(dk, D)),
                    argnums=(0, 1, 2))(q_in, k_out, v_out)
    for a, r in zip(g_rc, g_sq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)


def test_tiered_model_matches_untied_pallas(make_molecule, rng):
    """batch.tiers drives the multi-tier kernel loop in the model; the
    forward must be bitwise-identical to the square one-window path."""
    import dataclasses
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.models import X2GNN
    cfg = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                      heads=4, sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                      attention_layout="blocked", use_pallas=True)
    gs = []
    for i in range(4):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 12)))
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=8)
        gs.append(g)
    bud = pad_budget_for(gs, 4)
    if not bud.tiers:
        pytest.skip("tier planner found no split for this composition")
    b_tier = pad_graphs(gs, bud)
    b_sq = dataclasses.replace(b_tier, tiers=(), n_hi=0, d_lo=0)
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), b_sq)
    out_t = np.asarray(model.apply(params, b_tier))
    out_s = np.asarray(model.apply(params, b_sq))
    np.testing.assert_allclose(out_t, out_s, rtol=1e-6, atol=1e-7)
