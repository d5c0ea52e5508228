"""Native integral engine tests: analytic oracles, quadrature, rotation
invariance, and C++-vs-numpy agreement."""

import numpy as np
import pytest

from x2gnn_tpu.data.integrals.basis import (
    BasisSet, Shell, fallback_basis, ANGSTROM_TO_BOHR)
from x2gnn_tpu.data.integrals.md import (
    one_electron_matrices_numpy, solid_harmonic_coeffs, cart_monomials,
    boys, primitive_ST)
from x2gnn_tpu.data.integrals.engine import (
    native_available, one_electron_matrices_cpp, one_electron_matrices)

BOHR = 1.0 / ANGSTROM_TO_BOHR  # one bohr expressed in Angstrom


def _s_basis(exp_h=1.3):
    return BasisSet({1: [Shell(0, [exp_h], [1.0])]})


def test_overlap_two_s_gaussians_analytic():
    a = b = 1.3
    R_bohr = 1.7
    basis = _s_basis(a)
    S, _, _ = one_electron_matrices_numpy(
        np.array([1, 1]), np.array([[0, 0, 0], [R_bohr * BOHR, 0, 0]]),
        basis)
    q = a * b / (a + b)
    expect = (4 * a * b / (a + b) ** 2) ** 0.75 * np.exp(-q * R_bohr ** 2)
    assert S[0, 1] == pytest.approx(expect, rel=1e-10)
    np.testing.assert_allclose(np.diag(S), 1.0, rtol=1e-12)


def test_kinetic_s_gaussian_analytic():
    # <T> = 3a/2 for a normalized s Gaussian; extract T from hcore*nelec - V
    a = 0.9
    basis = _s_basis(a)
    # single H atom: hcore = T + V, nelec = 1
    S, h, _ = one_electron_matrices_numpy(
        np.array([1]), np.zeros((1, 3)), basis)
    # V for same-center s: -Z * 2 sqrt(2a/pi)
    v_expect = -2.0 * np.sqrt(2 * a / np.pi)
    t_expect = 1.5 * a
    assert h[0, 0] == pytest.approx(t_expect + v_expect, rel=1e-10)


def test_boys_function_values():
    # F_0(T) = sqrt(pi/(4T)) erf(sqrt(T))
    from scipy.special import erf
    for T in [1e-14, 0.1, 1.0, 5.0, 30.0, 50.0]:
        F = boys(4, T)
        if T < 1e-12:
            assert F[0] == pytest.approx(1.0)
        else:
            expect = np.sqrt(np.pi / (4 * T)) * erf(np.sqrt(T))
            assert F[0] == pytest.approx(expect, rel=1e-10)
        # downward consistency: F_m' = -F_{m+1} <-> recurrence
        for m in range(4):
            lhs = (2 * T * F[m + 1] + np.exp(-T)) / (2 * m + 1)
            assert F[m] == pytest.approx(lhs, rel=1e-9)


def test_solid_harmonics_are_harmonic():
    """Each row must be a harmonic polynomial (Laplacian == 0) and rows of
    a shell must be mutually orthogonal on the sphere (numerically)."""
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(4000, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    for l in range(4):
        C = solid_harmonic_coeffs(l)
        mons = cart_monomials(l)

        def poly(coef, xyz):
            out = np.zeros(len(xyz))
            for c, (i, j, k) in zip(coef, mons):
                out += c * xyz[:, 0] ** i * xyz[:, 1] ** j * xyz[:, 2] ** k
            return out

        # Laplacian via symbolic differentiation with sympy
        import sympy as sym
        x, y, z = sym.symbols("x y z")
        for row in C:
            expr = sum(
                c * x ** i * y ** j * z ** k
                for c, (i, j, k) in zip(row, mons) if c != 0)
            lap = sym.diff(expr, x, 2) + sym.diff(expr, y, 2) + sym.diff(
                expr, z, 2)
            assert sym.simplify(lap) == 0, f"l={l} row not harmonic"
        # orthogonality on the sphere (Monte Carlo, loose tolerance)
        vals = np.stack([poly(row, pts) for row in C])
        gram = vals @ vals.T / len(pts)
        off = gram - np.diag(np.diag(gram))
        assert np.abs(off).max() < 0.05 * np.diag(gram).max()


def test_overlap_matches_quadrature_high_l():
    """Primitive cartesian overlap (up to f) vs brute-force grid sum."""
    rng = np.random.default_rng(1)
    a, b = 0.8, 1.1
    A = np.array([0.1, -0.2, 0.3])
    B = np.array([-0.4, 0.5, 0.1])
    for la, lb in [(1, 2), (2, 3), (3, 3)]:
        S, _ = primitive_ST(la, lb, a, b, A, B)
        xs = np.linspace(-7, 7, 141)
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        dV = (xs[1] - xs[0]) ** 3
        rA2 = (X - A[0]) ** 2 + (Y - A[1]) ** 2 + (Z - A[2]) ** 2
        rB2 = (X - B[0]) ** 2 + (Y - B[1]) ** 2 + (Z - B[2]) ** 2
        gA = np.exp(-a * rA2)
        gB = np.exp(-b * rB2)
        ma = cart_monomials(la)[0]   # spot-check leading monomial pair
        mb = cart_monomials(lb)[-1]
        fa = (X - A[0]) ** ma[0] * (Y - A[1]) ** ma[1] * (Z - A[2]) ** ma[2]
        fb = (X - B[0]) ** mb[0] * (Y - B[1]) ** mb[1] * (Z - B[2]) ** mb[2]
        quad = float((fa * gA * fb * gB).sum() * dV)
        assert S[0, -1] == pytest.approx(quad, rel=2e-3, abs=1e-8)


def test_rotation_invariance():
    """Eigenvalues of S and hcore must be invariant under rigid rotation —
    exercises the full cart->sph pipeline for all l."""
    numbers = np.array([8, 1, 1])
    pos = np.array([[0.0, 0.0, 0.0], [0.95, 0.0, 0.0], [-0.25, 0.92, 0.0]])
    S1, h1, _ = one_electron_matrices_numpy(numbers, pos)
    # random rotation
    rng = np.random.default_rng(3)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    S2, h2, _ = one_electron_matrices_numpy(numbers, pos @ Q.T)
    np.testing.assert_allclose(np.sort(np.linalg.eigvalsh(S1)),
                               np.sort(np.linalg.eigvalsh(S2)),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.sort(np.linalg.eigvalsh(h1)),
                               np.sort(np.linalg.eigvalsh(h2)),
                               rtol=1e-7, atol=1e-9)


def test_matrices_symmetric_and_finite():
    numbers = np.array([6, 1, 8])
    pos = np.array([[0.0, 0, 0], [1.1, 0, 0], [-1.2, 0.1, 0]])
    S, h, ao = one_electron_matrices_numpy(numbers, pos)
    assert S.shape == (39 + 9 + 39,) * 2
    np.testing.assert_allclose(S, S.T, atol=1e-12)
    np.testing.assert_allclose(h, h.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(S), 1.0, rtol=1e-12)
    assert np.isfinite(h).all()
    np.testing.assert_array_equal(ao, [[0, 39], [39, 48], [48, 87]])


@pytest.mark.skipif(not native_available(), reason="C++ engine not built")
def test_cpp_matches_numpy():
    numbers = np.array([8, 1, 1, 6])
    rng = np.random.default_rng(5)
    pos = np.array([[0.0, 0, 0], [0.95, 0, 0], [-0.3, 0.9, 0],
                    [0.4, -1.2, 0.8]])
    S1, h1, ao1 = one_electron_matrices_numpy(numbers, pos)
    S2, h2, ao2 = one_electron_matrices_cpp(numbers, pos)
    np.testing.assert_allclose(S2, S1, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(h2, h1, rtol=1e-8, atol=1e-10)
    np.testing.assert_array_equal(ao1, ao2)


@pytest.mark.skipif(not native_available(), reason="C++ engine not built")
def test_edge_features_native_backend():
    from x2gnn_tpu.data.molecule import Molecule
    from x2gnn_tpu.data.graphs import radius_graph
    from x2gnn_tpu.data.featurize import edge_features
    mol = Molecule([8, 1, 1],
                   [[0.0, 0, 0], [0.95, 0, 0], [-0.3, 0.9, 0]], [0.0])
    edge_index, _ = radius_graph(mol.positions, 5.0)
    feats = edge_features(mol, edge_index, backend="native")
    assert feats.shape == (edge_index.shape[1], 338)
    assert np.isfinite(feats).all()
    assert np.abs(feats).max() > 0


def test_contracted_shell_matches_analytic_overlap():
    """Multi-primitive contraction: coefficients weight UNIT-NORMALIZED
    primitives (the Gaussian94 convention). Regression for the missing
    primitive norms — with raw ca*cb weights the contracted radial shape
    is wrong and this analytic overlap fails badly."""
    exps = np.array([8.0, 0.5])
    coefs = np.array([0.4, 0.7])
    basis = BasisSet({1: [Shell(0, exps, coefs)]})
    R = 1.9  # bohr
    S, _, _ = one_electron_matrices_numpy(
        np.array([1, 1]), np.array([[0, 0, 0], [R * BOHR, 0, 0]]), basis)

    def n1s(a):
        return (2 * a / np.pi) ** 0.75

    def s_prim(a, b, r):
        return (np.pi / (a + b)) ** 1.5 * np.exp(-a * b * r * r / (a + b))

    def pair_sum(r):
        tot = 0.0
        for ca, aa in zip(coefs, exps):
            for cb, ab in zip(coefs, exps):
                tot += ca * cb * n1s(aa) * n1s(ab) * s_prim(aa, ab, r)
        return tot

    expect = pair_sum(R) / pair_sum(0.0)      # diag(S)=1 normalization
    assert S[0, 1] == pytest.approx(expect, rel=1e-10)
    if native_available():
        S2, _, _ = one_electron_matrices_cpp(
            np.array([1, 1]), np.array([[0, 0, 0], [R * BOHR, 0, 0]]),
            basis)
        assert S2[0, 1] == pytest.approx(expect, rel=1e-10)


def test_parse_gaussian94_sorts_and_scales():
    """SP shells split and l-grouped (the 39-AO feature frame assumes
    s...p...d...f order); the shell scale factor multiplies exponents
    squared."""
    from x2gnn_tpu.data.integrals.basis import parse_gaussian94

    text = """
C     0
S   2   1.00
      100.0   0.3
       20.0   0.8
SP   1   2.00
        1.5   1.0   0.9
D   1   1.00
        0.8   1.0
****
"""
    bs = parse_gaussian94(text)
    shells = bs.shells_for(6)
    assert [s.l for s in shells] == [0, 0, 1, 2]   # l-grouped
    # scale factor 2.00 -> exponents x 4 for the SP shell only
    sp_s = shells[1]
    assert sp_s.exponents[0] == pytest.approx(1.5 * 4.0)
    assert shells[2].exponents[0] == pytest.approx(1.5 * 4.0)
    assert shells[0].exponents[0] == pytest.approx(100.0)
    assert shells[3].exponents[0] == pytest.approx(0.8)


@pytest.mark.skipif(not native_available(), reason="C++ engine not built")
def test_cpp_screening_distant_clusters():
    """Primitive screening (integrals.cpp majorant skip) must be inert on
    the numbers: two clusters 14 A apart plus tight-core pairs at a few
    bohr exercise the skip path hard; parity vs the unscreened numpy
    oracle stays at f64 noise."""
    numbers = np.array([8, 6, 1, 8, 6, 1])
    pos = np.array([[0.0, 0, 0], [1.2, 0.2, 0], [-0.6, 0.8, 0.2],
                    [14.0, 0, 0], [15.2, 0.2, 0], [13.4, 0.8, 0.2]])
    S1, h1, ao1 = one_electron_matrices_numpy(numbers, pos)
    S2, h2, ao2 = one_electron_matrices_cpp(numbers, pos)
    np.testing.assert_allclose(S2, S1, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(h2, h1, rtol=1e-8, atol=1e-10)
    # far cross-block overlaps are tiny but NOT hard-zeroed wholesale:
    # the majorant only skips primitive pairs below 1e-16
    n_half = int(ao1[2, 1])   # ao_slices: end of cluster-1's AOs
    assert np.abs(S2[:n_half, n_half:]).max() < 1e-3


# ---------------------------------------------------------------------------
# Embedded 6-311+G(3df,2p) basis (round-3: real published data replaces
# the x2sv stand-in as the default native basis — scf.py:31)
# ---------------------------------------------------------------------------

def test_pople_basis_ao_structure():
    from x2gnn_tpu.data.integrals.basis import get_basis
    b = get_basis("6-311+g(3df,2p)")
    assert b.nao(1) == 9   # 3s + 2p
    for z in (6, 7, 8, 9):
        assert b.nao(z) == 39  # 5s + 4p + 3d + 1f
        ls = [s.l for s in b.shells_for(z)]
        # l-grouped (PySCF layout the SA compression slices assume)
        assert ls == sorted(ls)
        assert ls.count(0) == 5 and ls.count(1) == 4
        assert ls.count(2) == 3 and ls.count(3) == 1
        # the three d exponents follow the Frisch-1984 x4/x1/x0.25 split
        d = sorted(float(s.exponents[0]) for s in b.shells_for(z)
                   if s.l == 2)
        np.testing.assert_allclose([d[1] / d[0], d[2] / d[1]], [4.0, 4.0])


def test_pople_basis_hydrogen_atom_energy():
    """One electron in the H s-block: the generalized eigenproblem
    h c = E S c reproduces the literature 6-311G H-atom HF energy
    -0.499810 Eh — a strong end-to-end check that the embedded
    exponents/coefficients are the real published values."""
    import scipy.linalg as sla
    from x2gnn_tpu.data.integrals.basis import get_basis
    S, h, _ = one_electron_matrices(
        np.array([1]), np.zeros((1, 3)),
        basis=get_basis("6-311+g(3df,2p)"))
    e0 = sla.eigh(h, S, eigvals_only=True)[0]
    np.testing.assert_allclose(e0, -0.499810, atol=2e-6)


def test_pople_basis_hydrogenic_ion_energies():
    """C^5+ / O^7+ one-electron ions: lowest eigenvalue of Z*(h/Z) vs the
    exact -Z^2/2 — the 6-311 core contraction must get within ~0.1%."""
    import scipy.linalg as sla
    from x2gnn_tpu.data.integrals.basis import get_basis
    b = get_basis("6-311+g(3df,2p)")
    for z in (6, 8):
        S, h, _ = one_electron_matrices(
            np.array([z]), np.zeros((1, 3)), basis=b)
        e0 = sla.eigh(h * z, S, eigvals_only=True)[0]  # engine /= nelec
        assert abs(e0 - (-z * z / 2)) / (z * z / 2) < 2e-3


@pytest.mark.skipif(not native_available(), reason="C++ engine not built")
def test_pople_basis_cpp_matches_numpy_and_screening():
    """The contracted Pople basis exercises 6-primitive contractions the
    x2sv stand-in never does: C++ (screened) must match numpy
    (unscreened) on a real multi-element geometry."""
    from x2gnn_tpu.data.integrals.basis import get_basis
    b = get_basis("6-311+g(3df,2p)")
    numbers = np.array([8, 1, 1, 7, 9])
    pos = np.array([[0.0, 0, 0], [0.95, 0, 0], [-0.3, 0.9, 0],
                    [0.4, -1.2, 0.8], [3.4, 1.2, -0.8]])
    S1, h1, ao1 = one_electron_matrices_numpy(numbers, pos, b)
    S2, h2, ao2 = one_electron_matrices_cpp(numbers, pos, basis=b)
    np.testing.assert_allclose(S2, S1, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(h2, h1, rtol=1e-7, atol=1e-10)
    np.testing.assert_array_equal(ao1, ao2)


def test_native6311_backend_features_and_provenance():
    from x2gnn_tpu.data.molecule import Molecule
    from x2gnn_tpu.data.graphs import radius_graph
    from x2gnn_tpu.data.featurize import (edge_features, basis_provenance,
                                          resolve_backend)
    mol = Molecule([8, 1, 1],
                   [[0.0, 0, 0], [0.95, 0, 0], [-0.3, 0.9, 0]], [0.0])
    edge_index, _ = radius_graph(mol.positions, 5.0)
    f_pople = edge_features(mol, edge_index, backend="native6311")
    f_x2sv = edge_features(mol, edge_index, backend="native")
    assert f_pople.shape == (edge_index.shape[1], 338)
    assert np.isfinite(f_pople).all()
    # different bases -> genuinely different features
    assert np.abs(f_pople - f_x2sv).max() > 1e-3
    assert basis_provenance("native6311") == "6-311+g(3df,2p)-native"
    assert resolve_backend("auto") in ("pyscf", "native6311")
