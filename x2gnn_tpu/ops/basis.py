"""Closed-form basis math: envelope, radial sines, spherical Bessel x
spherical-harmonic 2D basis.

The reference generates sympy formulas at module init and evaluates them as
7 x rbf_dim separate Python closures per forward (angular_basis_layer.py:
68-78, basis_func.py:32-155). Here only the Bessel-function *zeros* are
computed on host with scipy at build time; everything else is evaluated as
plain jnp recurrences that trace into one fused XLA kernel.

Numerics are identical: the sympy closed forms for j_l are exactly the
upward recurrence unrolled, and Y_l^0(theta) is the Legendre recurrence in
cos(theta) with the (2l+1)/(4 pi) prefactor (basis_func.py:74-107).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Smooth polynomial cutoff envelope (envelop.py:5-21)
# ---------------------------------------------------------------------------

def poly_envelope(d, cutoff: float = 5.0, exponent: int = 5):
    """DimeNet-style smooth cutoff u(d), with x = d/cutoff, p = exponent+1:

        u = 1/x + a x^(p-1) + b x^p + c x^(p+1)
        a = -(p+1)(p+2)/2, b = p(p+2), c = -p(p+1)/2

    Matches envelop.py:8-18. Like the reference, there is NO d > cutoff
    guard (envelop.py:20 comments it out) — the graph builder guarantees
    d < cutoff; padded entries must be masked by the caller.
    """
    p = exponent + 1
    a = -(p + 1) * (p + 2) / 2.0
    b = float(p * (p + 2))
    c = -p * (p + 1) / 2.0
    x = d * (1.0 / cutoff)
    x_p_minus1 = x ** (p - 1)
    return 1.0 / x + x_p_minus1 * (a + x * (b + x * c))


# ---------------------------------------------------------------------------
# Radial sine basis (radial_basis_layer.py:26-40)
# ---------------------------------------------------------------------------

def radial_basis(d, frequencies, cutoff: float = 5.0):
    """sin(freq_n * d / cutoff) per edge; `frequencies` is the (rbf_dim,)
    trainable vector initialised to n*pi (radial_basis_layer.py:32)."""
    d_scaled = d * (1.0 / cutoff)
    return jnp.sin(frequencies * d_scaled[..., None])


def radial_frequencies_init(rbf_dim: int) -> np.ndarray:
    return np.pi * np.arange(1, rbf_dim + 1, dtype=np.float32)


# ---------------------------------------------------------------------------
# Spherical Bessel functions and their zeros (basis_func.py:7-71)
# ---------------------------------------------------------------------------

def _jn_numpy(r: np.ndarray, n: int) -> np.ndarray:
    from scipy import special as sp
    return np.sqrt(np.pi / (2 * r)) * sp.jv(n + 0.5, r)


@functools.lru_cache(maxsize=8)
def bessel_zeros_and_norms(
    num_spherical: int, num_radial: int
) -> Tuple[np.ndarray, np.ndarray]:
    """First `num_radial` positive zeros z_{l,n} of j_l for l < num_spherical
    plus normalizers N_{l,n} = 1/sqrt(0.5 * j_{l+1}(z_{l,n})^2).

    Host-side scipy root finding, cached per (L, K) — mirrors Jn_zeros /
    bessel_basis normalisation (basis_func.py:14-71).
    """
    from scipy.optimize import brentq

    n, k = num_spherical, num_radial
    zeros = np.zeros((n, k), dtype=np.float64)
    zeros[0] = np.arange(1, k + 1) * np.pi
    points = np.arange(1, k + n) * np.pi
    racines = np.zeros(k + n - 1, dtype=np.float64)
    for i in range(1, n):
        for j in range(k + n - 1 - i):
            racines[j] = brentq(_jn_numpy, points[j], points[j + 1], (i,))
        points = racines.copy()
        zeros[i][:k] = racines[:k]

    norms = 1.0 / np.sqrt(
        0.5 * _jn_numpy(zeros, np.arange(n)[:, None] + 1) ** 2
    )
    return zeros, norms


def spherical_bessel(x, num_spherical: int):
    """j_l(x) for l = 0..num_spherical-1, stacked on the last axis.

    Upward recurrence j_{l+1} = (2l+1)/x * j_l - j_{l-1} — exactly the sympy
    closed forms of spherical_bessel_formulas (basis_func.py:32-45) unrolled.
    Caller must keep x away from 0 (real bond distances are >= ~0.9 A; padded
    rows are clamped then masked).
    """
    inv_x = 1.0 / x
    sin_x = jnp.sin(x)
    cos_x = jnp.cos(x)
    j = [sin_x * inv_x]
    if num_spherical > 1:
        j.append((sin_x * inv_x - cos_x) * inv_x)
    for l in range(2, num_spherical):
        j.append((2 * l - 1) * inv_x * j[l - 1] - j[l - 2])
    return jnp.stack(j, axis=-1)


def legendre_cos_harmonics(theta, num_spherical: int):
    """Real spherical harmonics Y_l^0(theta) for l = 0..L-1, last axis.

    Y_l^0 = sqrt((2l+1)/(4 pi)) * P_l(cos theta), with P_l by the Legendre
    recurrence (basis_func.py:84-107 with zero_m_only=True). Note l=0 is the
    constant sqrt(1/4pi) — the reference special-cases it as a constant fn
    (angular_basis_layer.py:71-74); here it falls out of the recurrence.
    """
    z = jnp.cos(theta)
    p = [jnp.ones_like(z)]
    if num_spherical > 1:
        p.append(z)
    for l in range(2, num_spherical):
        p.append(((2 * l - 1) * z * p[l - 1] - (l - 1) * p[l - 2]) / l)
    pref = np.sqrt((2 * np.arange(num_spherical) + 1) / (4 * np.pi))
    return jnp.stack(p, axis=-1) * jnp.asarray(pref, dtype=z.dtype)


# ---------------------------------------------------------------------------
# 2D Fourier-Bessel basis over (edge length, triplet angle)
# ---------------------------------------------------------------------------

def sbf_radial_part(
    distances,
    num_spherical: int,
    num_radial: int,
    cutoff: float = 5.0,
    envelope_exponent: int = 5,
    edge_mask=None,
):
    """Envelope-damped radial factor of the 2D basis, per edge:
    rbf_env[e, l, n] = env(d_e) * N_{l,n} * j_l(z_{l,n} d_e / cutoff).
    The full 2D basis factorizes as sbf[t, l*K+n] = rbf_env[jk_t, l, n] *
    Y_l(theta_t) — the blocked attention path contracts the two factors
    inside the kernel instead of materializing (T, L*K)."""
    zeros, norms = bessel_zeros_and_norms(num_spherical, num_radial)
    zeros_j = jnp.asarray(zeros, dtype=distances.dtype)
    norms_j = jnp.asarray(norms, dtype=distances.dtype)
    d_scaled = distances * (1.0 / cutoff)
    x = d_scaled[:, None, None] * zeros_j                   # (E, L, K)
    jl = []
    for l in range(num_spherical):
        jl.append(spherical_bessel(x[:, l, :], l + 1)[..., l])
    rbf = jnp.stack(jl, axis=1) * norms_j
    env = poly_envelope(distances, cutoff, envelope_exponent)[:, None, None]
    rbf_env = rbf * env
    if edge_mask is not None:
        rbf_env = jnp.where(edge_mask[:, None, None], rbf_env, 0.0)
    return rbf_env


def sbf_2d(
    distances,
    theta,
    src_edge_ids,
    num_spherical: int,
    num_radial: int,
    cutoff: float = 5.0,
    envelope_exponent: int = 5,
    edge_mask=None,
):
    """Per-triplet spherical-Bessel x spherical-harmonic features.

    Equivalent to F_B_2D.forward (angular_basis_layer.py:80-93):
      rbf[e, l*K + n] = env(d_e) * N_{l,n} * j_l(z_{l,n} * d_e / cutoff)
      out[t, l*K + n] = rbf[src_edge_ids[t], l*K + n] * Y_l^0(theta_t)

    distances: (E,) per atom-graph edge; theta: (T,) per triplet;
    src_edge_ids: (T,) jk edge id of each triplet (the reference indexes rbf
    by `edge_index_1`, angular_basis_layer.py:87).
    Returns (T, L*K). Padded edges should be pre-clamped to d ~ 1.0 and
    masked via `edge_mask` so the 1/x terms stay finite.
    """
    rbf_env = sbf_radial_part(distances, num_spherical, num_radial, cutoff,
                              envelope_exponent, edge_mask)
    rbf_env = rbf_env.reshape(rbf_env.shape[0], num_spherical * num_radial)

    cbf = legendre_cos_harmonics(theta, num_spherical)      # (T, L)
    cbf = jnp.repeat(cbf, num_radial, axis=-1)              # (T, L*K)
    return rbf_env[src_edge_ids] * cbf
