"""Plain-PyTorch transcription of the reference forward — the numerics
oracle for BASELINE's per-layer parity north star.

The reference stack (xgnn.py:38-75 -> model.py:38-54 ->
sbftransformer_conv.py:93-162 -> readout.py:34-43) is re-written here in
torch using only core ops (index_select / index_add_ / scatter_reduce
play the torch-scatter & PyG-softmax roles), with weights transplanted
from the flax parameter tree via `utils.parity.export_params_flat`.
`tests/test_torch_oracle.py` asserts per-layer agreement between this
torch forward and the JAX model on the same batch — a genuine
cross-framework check of every exp/softmax/norm/basis formula (PyG and
the original torch-scatter CUDA kernels are not installable here; this
transcription follows the reference sources cited above line by line).

Forward only (the JAX side owns training); runs on CPU torch.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

from x2gnn_tpu.ops.basis import bessel_zeros_and_norms


def torch_forward(flat_params: Dict[str, np.ndarray], batch, cfg,
                  collect: bool = True, requires_grad: bool = False):
    """Run the reference forward in torch. `flat_params` from
    export_params_flat(model.init(...)); `batch`: a GraphBatch of numpy
    arrays (segment layout fields are used); `cfg`: ModelConfig
    (readout='atomwise'|'molwise_mean'|'molwise_add', variant 'v1').

    Returns (output (G,) tensor, {name: activation} dict). With
    `requires_grad=True` the param tensors are autograd leaves (and a
    third return value, the {name: tensor} dict, is appended) so a caller
    can backprop through the whole reference math — the gradient
    cross-check the forward-only parity harness lacked. NOTE on
    scale_grad_by_freq (atom_embedding.py:14): this transcription embeds
    the renormed table directly, so its table gradient is the UNSCALED
    scatter; the JAX side divides each row by its batch frequency — a
    caller comparing gradients must multiply the JAX table grad by the
    per-row counts (see tests/test_parity_fixtures.py).
    """
    import torch

    P = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
         flat_params.items()}
    if requires_grad:
        for v in P.values():
            v.requires_grad_(True)
    acts: Dict[str, np.ndarray] = {}

    def rec(name, x):
        if collect:
            acts[name] = x.detach().numpy()
        return x

    def lin(prefix, x, bias=True):
        w = P[f"{prefix}/Dense_0/kernel"]
        y = x @ w
        if bias and f"{prefix}/Dense_0/bias" in P:
            y = y + P[f"{prefix}/Dense_0/bias"]
        return y

    def silu(x):
        return torch.nn.functional.silu(x)

    t = lambda a, dt=torch.float32: torch.from_numpy(
        np.asarray(a)).to(dt)
    pos = t(batch.positions)
    numbers = torch.from_numpy(np.asarray(batch.numbers)).long()
    edge_src = torch.from_numpy(np.asarray(batch.edge_src)).long()
    edge_dst = torch.from_numpy(np.asarray(batch.edge_dst)).long()
    edge_mask = torch.from_numpy(np.asarray(batch.edge_mask))
    trip_mask = torch.from_numpy(np.asarray(batch.trip_mask))
    trip_src = torch.from_numpy(np.asarray(batch.trip_src_edge)).long()
    trip_dst = torch.from_numpy(np.asarray(batch.trip_dst_edge)).long()
    trip_i = torch.from_numpy(np.asarray(batch.trip_i)).long()
    trip_j = torch.from_numpy(np.asarray(batch.trip_j)).long()
    trip_k = torch.from_numpy(np.asarray(batch.trip_k)).long()
    atom_gid = torch.from_numpy(np.asarray(batch.atom_gid)).long()
    edge_gid = torch.from_numpy(np.asarray(batch.edge_gid)).long()
    node_mask = torch.from_numpy(np.asarray(batch.node_mask))
    E = edge_src.shape[0]
    N = numbers.shape[0]
    G = np.asarray(batch.y).shape[0]
    L, K = cfg.sbf_dim, cfg.rbf_dim
    HC = cfg.in_channels
    H = cfg.heads
    C = HC // H
    NEG = -1e30

    def seg_sum(data, ids, num, mask=None):
        if mask is not None:
            shape = mask.shape + (1,) * (data.dim() - mask.dim())
            data = torch.where(mask.reshape(shape), data,
                               torch.zeros((), dtype=data.dtype))
        out = torch.zeros((num,) + data.shape[1:], dtype=data.dtype)
        return out.index_add_(0, ids, data)

    def seg_softmax(scores, ids, num, mask):
        shape = mask.shape + (1,) * (scores.dim() - mask.dim())
        scores = torch.where(mask.reshape(shape), scores,
                             torch.full((), NEG))
        seg_max = torch.full((num,) + scores.shape[1:], NEG)
        seg_max = seg_max.scatter_reduce(
            0, ids[:, None].expand_as(scores), scores, "amax")
        seg_max = torch.clamp(seg_max, min=NEG / 2)
        expd = torch.exp(scores - seg_max[ids])
        expd = torch.where(mask.reshape(shape), expd,
                           torch.zeros(()))
        denom = torch.clamp(seg_sum(expd, ids, num), min=1e-16)
        return expd / denom[ids]

    # ---- geometry + envelope (xgnn.py:39,49-50; envelop.py:8-18) ----
    diff = pos[edge_src] - pos[edge_dst]
    d = torch.sqrt(torch.clamp((diff * diff).sum(-1), min=1e-24))
    d_safe = torch.where(edge_mask, d, torch.ones(()))
    p = cfg.envelope_exponent + 1
    a_c = -(p + 1) * (p + 2) / 2.0
    b_c = float(p * (p + 2))
    c_c = -p * (p + 1) / 2.0
    x = d_safe / cfg.cutoff
    env = 1.0 / x + x ** (p - 1) * (a_c + x * (b_c + x * c_c))
    env = torch.where(edge_mask, env, torch.zeros(()))[:, None]
    rec("env", env)

    # ---- featurization (xgnn.py:54-58,68-70) ----
    neo_x = silu(lin("mat_trans", t(batch.edge_feat) * env))
    neo_x = silu(lin("emb_trans", neo_x))
    rec("neo_x", neo_x)

    table = P["emb_block/embedding"]
    norms = torch.sqrt((table * table).sum(-1, keepdim=True) + 1e-24)
    table = table * torch.clamp(3.0 / norms, max=1.0)
    atom_emb = silu(lin("emb_block/lin", table[numbers]))
    rec("atom_emb", atom_emb)

    freqs = P["rbf_layer/frequencies"]
    node_rbf = torch.sin(freqs * (d_safe / cfg.cutoff)[:, None]) * env
    rec("node_rbf", node_rbf)

    # ---- per-triplet 2D basis (angular_basis_layer.py:80-93) ----
    ji = pos[trip_i] - pos[trip_j]
    jk = pos[trip_k] - pos[trip_j]
    cos_a = (ji * jk).sum(-1)
    sin_a = torch.sqrt(torch.clamp(
        (torch.linalg.cross(ji, jk) ** 2).sum(-1), min=1e-24))
    theta = torch.atan2(sin_a, cos_a)
    zeros, bnorms = bessel_zeros_and_norms(L, K)
    xx = (d_safe / cfg.cutoff)[:, None, None] * t(zeros)     # (E, L, K)
    inv = 1.0 / xx
    sj = [torch.sin(xx) * inv]
    if L > 1:
        sj.append((torch.sin(xx) * inv - torch.cos(xx)) * inv)
    for ll in range(2, L):
        sj.append((2 * ll - 1) * inv * sj[ll - 1] - sj[ll - 2])
    jl = torch.stack([sj[ll][:, ll, :] for ll in range(L)], dim=1)
    rbf_env = jl * t(bnorms) * env[:, :, None]
    rbf_env = torch.where(edge_mask[:, None, None], rbf_env,
                          torch.zeros(())).reshape(E, L * K)
    zc = torch.cos(theta)
    pl_ = [torch.ones_like(zc)]
    if L > 1:
        pl_.append(zc)
    for ll in range(2, L):
        pl_.append(((2 * ll - 1) * zc * pl_[ll - 1]
                    - (ll - 1) * pl_[ll - 2]) / ll)
    pref = np.sqrt((2 * np.arange(L) + 1) / (4 * np.pi))
    cbf = torch.stack(pl_, dim=-1) * t(pref.astype(np.float32))
    sbf = rbf_env[trip_src] * cbf.repeat_interleave(K, dim=-1)
    rec("sbf", sbf)

    edge_attr = lin("edgenn_1", silu(lin("edgenn_0", atom_emb)))[trip_j]

    def conv(i, xx):
        pre = f"conv_{i}"
        rbf_filter = node_rbf @ P[f"{pre}/lin_rbf/kernel"]
        x_src = xx * rbf_filter
        q = lin(f"{pre}/lin_query", xx).reshape(E, H, C)
        k = lin(f"{pre}/lin_key", x_src).reshape(E, H, C)
        v = lin(f"{pre}/lin_value", x_src).reshape(E, H, C)
        e = (edge_attr @ P[f"{pre}/lin_edge/Dense_0/kernel"]
             ).reshape(-1, H, C)
        s = (sbf @ P[f"{pre}/lin_sbf/kernel"]
             + P[f"{pre}/lin_sbf/bias"]).reshape(-1, H, C)
        q_i = q[trip_dst]
        k_j = k[trip_src] + e
        alpha = (q_i * k_j).sum(-1) / math.sqrt(C)           # (T, H)
        alpha = seg_softmax(alpha, trip_dst, E, trip_mask)
        msg = (v[trip_src] + e) * s * alpha[..., None]
        out = seg_sum(msg, trip_dst, E, trip_mask).reshape(E, HC)
        return out + lin(f"{pre}/lin_skip", xx)

    def graph_norm(xx):
        feat = xx.shape[-1]
        ones = torch.ones(E)
        cnt = torch.clamp(seg_sum(ones, edge_gid, G, edge_mask) * feat,
                          min=1.0)
        mean = seg_sum(xx.sum(-1), edge_gid, G, edge_mask) / cnt
        centered = xx - mean[edge_gid][:, None]
        cm = torch.where(edge_mask[:, None], centered, torch.zeros(()))
        var = seg_sum((cm * cm).sum(-1), edge_gid, G, edge_mask) / cnt
        out = centered / torch.sqrt(var + 1e-8)[edge_gid][:, None]
        return torch.where(edge_mask[:, None], out, torch.zeros(()))

    def residual(prefix, xx):
        h = silu(lin(f"{prefix}/lin0", xx))
        h = silu(lin(f"{prefix}/lin1", h))
        return h + xx

    def readout(i, xx):
        pre = f"readout_{i}"
        gate = lin(f"{pre}/lin_rbf", node_rbf)
        out = seg_sum(gate * xx, edge_src, N, edge_mask)
        if cfg.readout != "atomwise":
            pooled = seg_sum(out, atom_gid, G, node_mask)
            if cfg.readout == "molwise_mean":
                cnt = torch.clamp(seg_sum(torch.ones(N), atom_gid, G,
                                          node_mask), min=1.0)
                pooled = pooled / cnt[:, None]
            out = pooled
        for j in range(cfg.mlp_depth - 1):
            out = silu(lin(f"{pre}/mlp/mlp_{j}", out))
        return lin(f"{pre}/mlp/mlp_out", out)

    out = neo_x
    results = rec("readout_0", readout(0, out))
    for i in range(cfg.conv_layers):
        res0 = out
        out = rec(f"conv_{i}", conv(i, out))
        out = rec(f"norm_{i}", graph_norm(out))
        out = residual(f"bf_skip_{i}", out)
        out = silu(lin(f"dense_bf_skip_{i}", out))
        out = out + res0
        out = residual(f"af_skip_{i}_0", out)
        out = rec(f"block_{i}", residual(f"af_skip_{i}_1", out))
        results = results + readout(i + 1, out)
    if cfg.readout == "atomwise":
        results = seg_sum(results, atom_gid, G, node_mask)
    out = rec("output", results.reshape(-1))
    if requires_grad:
        return out, acts, P
    return out, acts
