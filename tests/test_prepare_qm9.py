"""prepare_qm9 repack logic on a synthetic mini QM9 tree (VERDICT: the
only dataset-builder path with no test — the real download is
network-gated, so the repack contract is pinned here instead).

Reference behavior being reproduced: datapre.ipynb downloads the 133,885
per-molecule `dsgdb9nsd_NNNNNN.xyz` files and repacks them into ONE
concatenated xyz with a 12-value property header per molecule
(`split()[5:]` of the QM9 comment line) and the `*^` -> `E` float fixup
— the exact layout read_xyz_allprop expects (qm9_allprop.py:6).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from prepare_qm9 import repack  # noqa: E402

from x2gnn_tpu.data.molecule import read_xyz_allprop  # noqa: E402


# One real-format QM9 entry (values shortened): natoms / comment line
# (gdb tag, index, 3 rotational constants, then the 15 scalar properties
# of which [5:] = mu..Cv are the 12 we keep) / atom lines with a 5th
# Mulliken-charge column / frequencies / SMILES / InChI trailer lines.
def _qm9_file(n_atoms, index, props16, atoms):
    lines = [f"{n_atoms}"]
    lines.append("gdb " + str(index) + "\t" + "\t".join(props16))
    lines += atoms
    lines.append("100.0\t200.0\t300.0")      # frequencies
    lines.append("C\tC")                     # SMILES
    lines.append("InChI=1S/C\tInChI=1S/C")   # InChI
    return "\n".join(lines) + "\n"


def test_repack_roundtrip(tmp_path):
    xyz_dir = tmp_path / "dsgdb9nsd_xyz"
    xyz_dir.mkdir()
    # molecule 1: CH4-like, scientific-notation position with QM9's *^
    # exponent quirk and a Mulliken 5th column that must be dropped
    props1 = [f"{100 + k:.4f}" for k in range(15)]
    atoms1 = [
        "C\t-0.012698\t1.085804\t0.008001\t-0.535689",
        "H\t0.002150\t-0.006031\t0.001976\t0.133921",
        "H\t1.011731\t1.463751\t0.000277\t0.133922",
        "H\t-0.540815\t1.447527\t-0.876644\t0.133923",
        "H\t-0.523814\t1.437933\t0.906397\t0.133923",
    ]
    (xyz_dir / "dsgdb9nsd_000001.xyz").write_text(
        _qm9_file(5, 1, props1, atoms1))
    # molecule 2: N2-ish with a *^ float in both properties and positions
    props2 = [f"{k:.3f}" for k in range(13)] + ["1.2*^-5", "2.5*^-6"]
    atoms2 = [
        "N\t0.0\t0.0\t5.975*^-3\t-0.3",
        "N\t0.0\t0.0\t1.1\t0.3",
    ]
    (xyz_dir / "dsgdb9nsd_000002.xyz").write_text(
        _qm9_file(2, 2, props2, atoms2))

    out = str(tmp_path / "qm9_origin.xyz")
    repack(str(xyz_dir), out, count=2)

    mols = read_xyz_allprop(out)
    assert len(mols) == 2
    # properties = comment-line split()[5:] -> the 12 after gdb/idx/A/B/C:
    # props16 tokens are [A, B, C, p0..p11]; kept = p0..p11
    np.testing.assert_allclose(mols[0].labels,
                               [float(p) for p in props1[3:]])
    # *^ fixup applies to properties AND positions
    np.testing.assert_allclose(mols[1].labels[-2:], [1.2e-5, 2.5e-6])
    assert mols[1].positions[0, 2] == pytest.approx(5.975e-3)
    # geometry: Mulliken column dropped, coordinates preserved
    assert mols[0].num_atoms == 5
    assert mols[0].numbers.tolist() == [6, 1, 1, 1, 1]
    np.testing.assert_allclose(mols[0].positions[1],
                               [0.002150, -0.006031, 0.001976])
    # trailer lines (frequencies/SMILES/InChI) must not leak into the pack
    with open(out) as f:
        content = f.read()
    assert "InChI" not in content and "200.0" not in content


def test_repack_missing_file_raises(tmp_path):
    xyz_dir = tmp_path / "dsgdb9nsd_xyz"
    xyz_dir.mkdir()
    with pytest.raises(FileNotFoundError):
        repack(str(xyz_dir), str(tmp_path / "out.xyz"), count=1)
