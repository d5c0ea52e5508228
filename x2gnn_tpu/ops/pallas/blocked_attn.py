"""Fused Pallas kernel for atom-blocked attention (forward + custom VJP).

Fuses, per atom block: score SDDMM, masked softmax, Legendre angular
basis (computed in-register from cos(theta)), the factored spherical-basis
modulation s = sum_l pref_l P_l(z) G_l + b, and the output reduction —
one VMEM-resident pass instead of ~10 XLA HBM round trips. The backward
kernel recomputes the softmax (flash-attention style) and produces
gradients for q/k/v/e/G/b only (geometry z and index tables are data).

Mosaic-specific formulation: the TPU vector layout cannot split the
128-lane dimension, so per-head reductions/broadcasts over the packed
(H*C = 128) channel axis are expressed as matmuls against a constant
(HC, H) head-indicator matrix (sum C lanes per head) and its transpose
(broadcast H values to C lanes each) — both MXU-friendly. The L=7 basis
blocks of G live in 128-aligned lane slices of a (D, L*HC) ref.

Inputs are pre-gathered into the blocked layout by XLA (row gathers are
cheap relative to the fused math):
    q_blk/k_blk/v_blk: (N, D, HC)   per-atom in/out edge projections
    e_atom:            (N, HC)      media-atom edge_attr projection
    G_blk:             (N, D, L*HC) factored sbf radial projection
    s_bias:            (1, HC)      lin_sbf bias
    z:                 (N, D, D)    cos(angle) between in/out edge pairs
    a_ids/b_ids:       (N, D) int32 atom ids (-1/-2 for padding) used to
                       mask invalid and backtracking (i == k) pairs
Returns out_blk (N, D, HC).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _head_indicator(H: int, C: int):
    """(H*C, H) block indicator: M[h*C + c, h] = 1. Built from iota so it
    is generated in-kernel (Pallas forbids captured array constants)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (H * C, H), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H * C, H), 1)
    return (row // C == col).astype(jnp.float32)


def _legendre_stack(z, L: int):
    """pref_l * P_l(z), l = 0..L-1 (same math as
    ops.basis.legendre_cos_harmonics)."""
    p = [jnp.ones_like(z)]
    if L > 1:
        p.append(z)
    for l in range(2, L):
        p.append(((2 * l - 1) * z * p[l - 1] - (l - 1) * p[l - 2]) / l)
    pref = np.sqrt((2 * np.arange(L) + 1) / (4 * np.pi)).astype(np.float32)
    return [p[l] * pref[l] for l in range(L)]


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _heads_sum(x_flat, Mind):
    """(R, HC) -> (R, H): sum C lanes per head via matmul."""
    return _mm(x_flat, Mind)


def _heads_bcast(x_h, Mind):
    """(R, H) -> (R, HC): broadcast each head value to its C lanes."""
    return _mm(x_h, Mind.T)


def _attention_core(q, k, v, z, valid, G_flat, s_bias, Mind, D, H, C, L):
    """Forward math for one atom. q/k/v: (D, HC); z/valid: (D, D) with
    valid as a 0/1 float mask (Mosaic cannot insert minor dims on i1
    vectors); G_flat: (D, L*HC). Returns (alpha (D,D,H),
    alpha_rep (D,D,HC), s (D,D,HC), out (D,HC))."""
    HC = H * C
    validf = valid[:, :, None]                           # (Di, Dk, 1) f32
    prod = q[:, None, :] * k[None, :, :]                 # (Di, Dk, HC)
    scores = _heads_sum(prod.reshape(D * D, HC), Mind)   # (Di*Dk, H)
    scores = scores.reshape(D, D, H) / float(np.sqrt(C))
    scores = scores * validf + (1.0 - validf) * _NEG
    smax = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), _NEG / 2)
    ex = jnp.exp(scores - smax)
    ex = ex * validf
    denom = jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-16)
    alpha = ex / denom                                   # (Di, Dk, H)
    alpha_rep = _heads_bcast(alpha.reshape(D * D, H), Mind)
    alpha_rep = alpha_rep.reshape(D, D, HC)

    P = _legendre_stack(z, L)                            # list (Di, Dk)
    s = jnp.broadcast_to(s_bias[None, None, :], (D, D, HC))
    for l in range(L):
        s = s + P[l][:, :, None] * G_flat[:, l * HC:(l + 1) * HC][None]
    msg = v[None, :, :] * s * alpha_rep
    out = msg.sum(axis=1)                                # (Di, HC)
    return alpha, alpha_rep, s, out


def _fwd_kernel(q_ref, k_ref, v_ref, e_ref, G_ref, b_ref, z_ref,
                a_ref, b_ids_ref, out_ref, *, BA, D, H, C, L):
    Mind = _head_indicator(H, C)
    bias = b_ref[0, :]

    # fori_loop (not a python unroll) so each atom's (D, D, HC)
    # temporaries are reused instead of all BA copies being live at once
    def body(a, _):
        q = q_ref[a]
        k = k_ref[a] + e_ref[a, 0][None, :]
        v = v_ref[a] + e_ref[a, 0][None, :]
        z = z_ref[a]
        aid = a_ref[a, 0]
        bid = b_ids_ref[a, 0]
        valid = ((aid[:, None] != bid[None, :])
                 & (aid[:, None] >= 0)
                 & (bid[None, :] >= 0)).astype(jnp.float32)
        _, _, _, out = _attention_core(
            q, k, v, z, valid, G_ref[a], bias, Mind, D, H, C, L)
        out_ref[a] = out
        return 0

    jax.lax.fori_loop(0, BA, body, 0)


def _bwd_kernel(q_ref, k_ref, v_ref, e_ref, G_ref, b_ref, z_ref,
                a_ref, b_ids_ref, g_ref,
                dq_ref, dk_ref, dv_ref, de_ref, dG_ref, db_ref,
                *, BA, D, H, C, L):
    HC = H * C
    Mind = _head_indicator(H, C)
    bias = b_ref[0, :]
    prog = pl.program_id(0)

    @pl.when(prog == 0)
    def _():
        db_ref[:] = jnp.zeros((1, HC), jnp.float32)

    def body(a, db_acc):
        q = q_ref[a]
        k = k_ref[a] + e_ref[a, 0][None, :]
        v = v_ref[a] + e_ref[a, 0][None, :]
        z = z_ref[a]
        aid = a_ref[a, 0]
        bid = b_ids_ref[a, 0]
        valid = ((aid[:, None] != bid[None, :])
                 & (aid[:, None] >= 0)
                 & (bid[None, :] >= 0)).astype(jnp.float32)
        G_flat = G_ref[a]
        alpha, alpha_rep, s, _ = _attention_core(
            q, k, v, z, valid, G_flat, bias, Mind, D, H, C, L)
        g = g_ref[a]                                     # (Di, HC)

        # msg = v_k * s_ik * alpha_ik (broadcast over i)
        ds = g[:, None, :] * v[None, :, :] * alpha_rep   # (Di, Dk, HC)
        dv_from_msg = (g[:, None, :] * s * alpha_rep).sum(axis=0)
        dalpha_rep = g[:, None, :] * v[None, :, :] * s   # (Di, Dk, HC)
        dalpha = _heads_sum(dalpha_rep.reshape(D * D, HC), Mind)
        dalpha = dalpha.reshape(D, D, H)
        # softmax backward over the k axis
        inner = (alpha * dalpha).sum(axis=1, keepdims=True)
        dscores = alpha * (dalpha - inner) / float(np.sqrt(C))
        dscores = dscores * valid[:, :, None]
        dsc_rep = _heads_bcast(dscores.reshape(D * D, H), Mind)
        dsc_rep = dsc_rep.reshape(D, D, HC)
        dq = (dsc_rep * k[None, :, :]).sum(axis=1)       # (Di, HC)
        dk = (dsc_rep * q[:, None, :]).sum(axis=0)       # (Dk, HC)

        # s = bias + sum_l P_l G_l
        P = _legendre_stack(z, L)
        for l in range(L):
            dG_ref[a, :, l * HC:(l + 1) * HC] = (
                P[l][:, :, None] * ds).sum(axis=0)
        db_acc = db_acc + ds.sum(axis=(0, 1))[None, :]

        dq_ref[a] = dq
        dk_ref[a] = dk
        dv_ref[a] = dv_from_msg
        de_ref[a, 0] = (dk + dv_from_msg).sum(axis=0)
        return db_acc

    db_acc = jax.lax.fori_loop(0, BA, body,
                               jnp.zeros((1, HC), jnp.float32))
    db_ref[:] = db_ref[:] + db_acc


def pallas_blocked_attention(q_blk, k_blk, v_blk, e_atom, G_blk, s_bias,
                             z, a_ids, b_ids, heads: int,
                             block_atoms: int | None = None,
                             interpret: bool | None = None):
    """Fused blocked attention; differentiable in q/k/v/e/G/bias.

    block_atoms: atoms per grid program (the in-kernel fori_loop reuses
    one atom's (D, D, HC) temporaries across iterations, so VMEM usage is
    ~inputs + one atom's scratch regardless of BA)."""
    N, D, HC = q_blk.shape
    L = G_blk.shape[-1] // HC
    H = heads
    C = HC // H
    if block_atoms is None:
        # large-degree batches: smaller input blocks keep the program under
        # the 16MB VMEM scoped budget (temps are one atom's regardless)
        block_atoms = 8 if D <= 40 else 2
    BA = block_atoms
    assert N % BA == 0, f"N={N} must be a multiple of block_atoms={BA}"
    n_blocks = N // BA
    interp = (jax.default_backend() != "tpu"
              if interpret is None else interpret)

    # 2D per-atom arrays are lifted to (N, 1, X) so the block's last two
    # dims satisfy TPU tiling for any BA (unit dim == array dim)
    e_atom = e_atom.reshape(N, 1, HC)
    a_ids = a_ids.reshape(N, 1, D)
    b_ids = b_ids.reshape(N, 1, D)
    specs = dict(
        q=pl.BlockSpec((BA, D, HC), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
        e=pl.BlockSpec((BA, 1, HC), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
        G=pl.BlockSpec((BA, D, L * HC), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
        b=pl.BlockSpec((1, HC), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
        z=pl.BlockSpec((BA, D, D), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
        ids=pl.BlockSpec((BA, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
    )

    def _run_fwd(q_blk, k_blk, v_blk, e_atom, G_blk, s_bias):
        kern = functools.partial(_fwd_kernel, BA=BA, D=D, H=H, C=C, L=L)
        return pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[specs["q"], specs["q"], specs["q"], specs["e"],
                      specs["G"], specs["b"], specs["z"], specs["ids"],
                      specs["ids"]],
            out_specs=specs["q"],
            out_shape=jax.ShapeDtypeStruct((N, D, HC), jnp.float32),
            interpret=interp,
        )(q_blk, k_blk, v_blk, e_atom, G_blk, s_bias, z, a_ids, b_ids)

    @jax.custom_vjp
    def run(q_blk, k_blk, v_blk, e_atom, G_blk, s_bias):
        return _run_fwd(q_blk, k_blk, v_blk, e_atom, G_blk, s_bias)

    def fwd(q_blk, k_blk, v_blk, e_atom, G_blk, s_bias):
        out = _run_fwd(q_blk, k_blk, v_blk, e_atom, G_blk, s_bias)
        return out, (q_blk, k_blk, v_blk, e_atom, G_blk, s_bias)

    def bwd(res, g):
        q_blk, k_blk, v_blk, e_atom, G_blk, s_bias = res
        kern = functools.partial(_bwd_kernel, BA=BA, D=D, H=H, C=C, L=L)
        dq, dk, dv, de, dG, db = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[specs["q"], specs["q"], specs["q"], specs["e"],
                      specs["G"], specs["b"], specs["z"], specs["ids"],
                      specs["ids"], specs["q"]],
            out_specs=(specs["q"], specs["q"], specs["q"], specs["e"],
                       specs["G"], specs["b"]),
            out_shape=(
                jax.ShapeDtypeStruct((N, D, HC), jnp.float32),
                jax.ShapeDtypeStruct((N, D, HC), jnp.float32),
                jax.ShapeDtypeStruct((N, D, HC), jnp.float32),
                jax.ShapeDtypeStruct((N, 1, HC), jnp.float32),
                jax.ShapeDtypeStruct((N, D, L * HC), jnp.float32),
                jax.ShapeDtypeStruct((1, HC), jnp.float32),
            ),
            interpret=interp,
        )(q_blk, k_blk, v_blk, e_atom, G_blk, s_bias, z, a_ids, b_ids, g)
        return dq, dk, dv, de.reshape(N, HC), dG, db

    run.defvjp(fwd, bwd)
    return run(q_blk, k_blk, v_blk, e_atom, G_blk, s_bias)
