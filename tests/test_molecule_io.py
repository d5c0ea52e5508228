"""xyz reader tests: round-trip a synthetic concatenated xyz file, and read
the real AID eval set shipped with the reference (read-only)."""

import os

import numpy as np
import pytest

from x2gnn_tpu.data.molecule import (
    Molecule, read_xyz, read_xyz_allprop, atomization_target,
    report_calibration, HARTREE_TO_EV, EV_TO_KCALMOL)

AID_PATH = "/root/reference/raw/AID_kcal.xyz"


def _write_concat_xyz(path, mols, n_props):
    with open(path, "wt") as f:
        for m in mols:
            f.write(f"{m.num_atoms}\n")
            f.write("\t".join(str(v) for v in m.labels) + "\n")
            for z, p in zip(m.numbers, m.positions):
                sym = {1: "H", 6: "C", 7: "N", 8: "O", 9: "F"}[int(z)]
                f.write(f"{sym}\t{p[0]}\t{p[1]}\t{p[2]}\n")


def _random_mols(rng, k, n_props):
    mols = []
    for i in range(k):
        n = int(rng.integers(2, 9))
        mols.append(Molecule(
            numbers=rng.choice([1, 6, 7, 8, 9], size=n),
            positions=rng.normal(size=(n, 3)),
            labels=rng.normal(size=n_props),
            index=i))
    return mols


def test_read_xyz_allprop_roundtrip(tmp_path, rng):
    mols = _random_mols(rng, 5, 12)
    path = str(tmp_path / "mols.xyz")
    _write_concat_xyz(path, mols, 12)
    back = read_xyz_allprop(path)
    assert len(back) == 5
    for a, b in zip(mols, back):
        np.testing.assert_array_equal(a.numbers, b.numbers)
        np.testing.assert_allclose(a.positions, b.positions, rtol=1e-12)
        np.testing.assert_allclose(a.labels, b.labels, rtol=1e-12)


def test_read_xyz_single_label_roundtrip(tmp_path, rng):
    mols = _random_mols(rng, 3, 1)
    path = str(tmp_path / "single.xyz")
    _write_concat_xyz(path, mols, 1)
    back = read_xyz(path)
    assert len(back) == 3
    np.testing.assert_allclose(back[1].labels, mols[1].labels)


def test_read_xyz_scientific_notation_fixup(tmp_path):
    # QM9 uses '*^' exponents; datapre.ipynb rewrites them to 'E'
    with open(tmp_path / "sci.xyz", "wt") as f:
        f.write("2\n1.5*^-3\nH\t0\t0\t0\nC\t1.0\t0\t0\n")
    mols = read_xyz(str(tmp_path / "sci.xyz"))
    assert mols[0].labels[0] == pytest.approx(1.5e-3)


@pytest.mark.skipif(not os.path.exists(AID_PATH), reason="no reference data")
def test_read_aid_dataset():
    mols = read_xyz(AID_PATH)
    assert len(mols) == 451
    m = mols[0]
    assert m.num_atoms == 77
    assert m.labels[0] == pytest.approx(-8127.788044736607)
    assert set(np.unique(m.numbers)).issubset({1, 6, 7, 8, 9})
    assert all(mol.num_atoms == mol.positions.shape[0] for mol in mols)


def test_atomization_target_u0():
    numbers = [np.array([1, 1, 8], dtype=np.int32)]  # water
    labels = np.zeros((1, 12))
    labels[0, 7] = -76.4  # Hartree
    y = atomization_target(numbers, labels, target=7)
    expect_ha = -76.4 - (2 * -0.500273 + -75.064579)
    assert y[0] == pytest.approx(expect_ha * HARTREE_TO_EV)
    assert report_calibration(7) == pytest.approx(EV_TO_KCALMOL)
    assert report_calibration(0) == 1.0


def test_atomization_target_non_energy():
    numbers = [np.array([1, 6], dtype=np.int32)]
    labels = np.zeros((1, 12))
    labels[0, 0] = 2.5  # dipole: no refs, no unit conversion
    y = atomization_target(numbers, labels, target=0)
    assert y[0] == pytest.approx(2.5)


def test_geometry_string():
    m = Molecule(numbers=[8, 1], positions=[[0, 0, 0], [1, 0, 0]],
                 labels=[0.0])
    s = m.geometry_string()
    assert s.startswith("O 0.0") and "\nH 1.0" in s


def test_fit_linear_atomref_recovers_planted_coefficients():
    """On labels that ARE a linear function of composition, the fitted
    atomref must recover it exactly and leave zero residual; the fit
    uses train indices only."""
    import numpy as np
    from x2gnn_tpu.data.molecule import fit_linear_atomref

    rng = np.random.default_rng(123)
    true = {1: -13.6, 6: -1030.0, 8: -2043.5}
    mols, y = [], []
    for _ in range(30):
        nums = rng.choice([1, 6, 8], size=rng.integers(2, 9))
        mols.append(nums)
        y.append(sum(true[int(z)] for z in nums) + 7.5)
    y = np.array(y)
    train_idx = np.arange(20)
    pred, table = fit_linear_atomref(mols, y, train_idx)
    np.testing.assert_allclose(pred, y, rtol=0, atol=1e-6)
    assert table[6] == pytest.approx(true[6], abs=1e-6)
    assert table["intercept"] == pytest.approx(7.5, abs=1e-5)
    # held-out molecules (not in train_idx) predicted exactly too
    np.testing.assert_allclose(pred[20:], y[20:], atol=1e-6)
