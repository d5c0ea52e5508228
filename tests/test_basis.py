"""Basis math tests vs scipy oracles (spherical_jn, eval_legendre) —
independent of both the reference's sympy codegen and our jnp recurrences."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import spherical_jn, eval_legendre

from x2gnn_tpu.ops.basis import (
    poly_envelope, radial_basis, radial_frequencies_init,
    bessel_zeros_and_norms, spherical_bessel, legendre_cos_harmonics, sbf_2d)


def test_poly_envelope_formula():
    d = np.linspace(0.5, 4.9, 40)
    x = d / 5.0
    p = 6
    a = -(p + 1) * (p + 2) / 2
    b = p * (p + 2)
    c = -p * (p + 1) / 2
    expect = 1 / x + a * x ** (p - 1) + b * x ** p + c * x ** (p + 1)
    got = np.asarray(poly_envelope(jnp.asarray(d, dtype=jnp.float64)))
    # Horner form vs direct powers: tiny cancellation near the cutoff zero
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-14)


def test_poly_envelope_smooth_at_cutoff():
    # u(cutoff) = 0 and u'(cutoff) = 0 by construction
    eps = 1e-6
    u = poly_envelope(jnp.asarray([5.0 - eps, 5.0]), cutoff=5.0)
    np.testing.assert_allclose(np.asarray(u), [0.0, 0.0], atol=1e-4)


def test_radial_basis():
    d = np.linspace(0.8, 4.5, 17).astype(np.float32)
    freqs = radial_frequencies_init(6)
    got = np.asarray(radial_basis(jnp.asarray(d), jnp.asarray(freqs)))
    for n in range(6):
        np.testing.assert_allclose(
            got[:, n], np.sin((n + 1) * np.pi * d / 5.0), rtol=1e-4,
            atol=1e-6)


def test_spherical_bessel_vs_scipy():
    # The upward recurrence (identical arithmetic to the reference's sympy
    # closed forms) loses relative accuracy only where j_l(x) is vanishingly
    # small (x << l); absolute accuracy stays ~1e-10 everywhere. The model
    # only evaluates j_l at x >= z_{l,1}*d_min/cutoff, where it is accurate.
    x = np.linspace(0.3, 25.0, 200)
    got = np.asarray(spherical_bessel(jnp.asarray(x, dtype=jnp.float64), 7))
    for l in range(7):
        np.testing.assert_allclose(got[:, l], spherical_jn(l, x), atol=1e-9)
        big = np.abs(spherical_jn(l, x)) > 1e-4
        np.testing.assert_allclose(got[big, l], spherical_jn(l, x[big]),
                                   rtol=1e-8)


def test_bessel_zeros_are_roots():
    zeros, norms = bessel_zeros_and_norms(7, 6)
    for l in range(7):
        np.testing.assert_allclose(spherical_jn(l, zeros[l]), 0.0, atol=1e-9)
        # zeros strictly increasing
        assert (np.diff(zeros[l]) > 0).all()
    assert np.isfinite(norms).all() and (norms > 0).all()


def test_legendre_harmonics_vs_scipy():
    theta = np.linspace(0.0, np.pi, 50)
    got = np.asarray(legendre_cos_harmonics(
        jnp.asarray(theta, dtype=jnp.float64), 7))
    for l in range(7):
        expect = np.sqrt((2 * l + 1) / (4 * np.pi)) * eval_legendre(
            l, np.cos(theta))
        np.testing.assert_allclose(got[:, l], expect, rtol=1e-8, atol=1e-10)


def test_sbf_2d_vs_scipy_oracle(rng):
    L, K, cutoff = 7, 6, 5.0
    E, T = 11, 23
    d = rng.uniform(0.9, 4.9, size=E)
    theta = rng.uniform(0, np.pi, size=T)
    src = rng.integers(0, E, size=T)

    got = np.asarray(sbf_2d(
        jnp.asarray(d, dtype=jnp.float64),
        jnp.asarray(theta, dtype=jnp.float64),
        jnp.asarray(src), L, K, cutoff))

    zeros, norms = bessel_zeros_and_norms(L, K)
    x = d / cutoff
    p = 6
    a, b, c = -(p + 1) * (p + 2) / 2, p * (p + 2), -p * (p + 1) / 2
    env = 1 / x + a * x ** (p - 1) + b * x ** p + c * x ** (p + 1)
    expect = np.zeros((T, L * K))
    for t in range(T):
        e = src[t]
        for l in range(L):
            y = np.sqrt((2 * l + 1) / (4 * np.pi)) * eval_legendre(
                l, np.cos(theta[t]))
            for n in range(K):
                rbf = norms[l, n] * spherical_jn(l, zeros[l, n] * x[e])
                expect[t, l * K + n] = env[e] * rbf * y
    np.testing.assert_allclose(got, expect, rtol=1e-7, atol=1e-9)


def test_sbf_2d_shape_and_mask(rng):
    E, T = 8, 12
    d = jnp.asarray(np.full(E, 1.0), dtype=jnp.float32)
    theta = jnp.zeros(T, dtype=jnp.float32)
    src = jnp.zeros(T, dtype=jnp.int32)
    mask = jnp.zeros(E, dtype=bool)  # everything masked
    out = sbf_2d(d, theta, src, 7, 6, edge_mask=mask)
    assert out.shape == (T, 42)
    np.testing.assert_allclose(np.asarray(out), 0.0)
