"""SA-compression semantics tests: shell-group norms, H-block alignment,
and the deliberately-fixed (9,39) reference bug."""

import numpy as np
import pytest

from x2gnn_tpu.data.featurize import (
    sa_compress, SA_DIM, EDGE_FEAT_DIM, _pad_block)


def test_sa_dims():
    assert SA_DIM == 13
    assert EDGE_FEAT_DIM == 338


def test_sa_compress_heavy_heavy(rng):
    """Row/col compression: 5 s rows kept, shell groups L2-normed."""
    nao = 78
    S = rng.normal(size=(nao, nao))
    S = S + S.T
    H = rng.normal(size=(nao, nao))
    H = H + H.T
    ao = np.array([[0, 39], [39, 78]])
    edge_index = np.array([[0], [1]])
    feats = sa_compress(S, H, ao, edge_index)
    assert feats.shape == (1, 338)
    blk = S[0:39, 39:78]
    # element [0, 0]: s-s entry passes through
    got = feats[0].reshape(2, 13, 13)
    assert got[0, 0, 0] == pytest.approx(blk[0, 0], rel=1e-6)
    # element [0, 5]: norm over columns 5:8 of row 0
    assert got[0, 0, 5] == pytest.approx(
        np.linalg.norm(blk[0, 5:8]), rel=1e-6)
    # element [5, 5]: norm over the (5:8, 5:8) subblock (rows after cols)
    sub = np.sqrt((blk[5:8, 5:8] ** 2).sum())
    assert got[0, 5, 5] == pytest.approx(sub, rel=1e-5)


def test_h_block_alignment():
    """H atoms' 9 AOs sit at offset 2 in the 39-frame."""
    blk = np.arange(9 * 39, dtype=float).reshape(9, 39)
    out = _pad_block(blk, replicate_reference_bug=False)
    np.testing.assert_array_equal(out[2:11, :], blk)
    assert (out[:2] == 0).all() and (out[11:] == 0).all()
    out_t = _pad_block(blk.T, replicate_reference_bug=False)
    np.testing.assert_array_equal(out_t[:, 2:11], blk.T)


def test_reference_bug_flag():
    """(9, 39) blocks: fixed version aligns rows at 2:11; bug replication
    pads top-left (scf.py:69's broken size comparison)."""
    blk = np.ones((9, 39))
    fixed = _pad_block(blk, replicate_reference_bug=False)
    buggy = _pad_block(blk, replicate_reference_bug=True)
    assert (fixed[2:11] == 1).all() and (fixed[:2] == 0).all()
    assert (buggy[:9] == 1).all() and (buggy[9:] == 0).all()
    # (39, 9) and (9, 9) blocks are unaffected by the flag
    for shape in [(39, 9), (9, 9)]:
        a = np.ones(shape)
        np.testing.assert_array_equal(
            _pad_block(a, False), _pad_block(a, True))


def test_basis_provenance_tags_and_compatibility(tmp_path):
    from x2gnn_tpu.data.dataset import (
        save_graph_cache, read_cache_basis, load_graph_cache)
    from x2gnn_tpu.data.featurize import (
        BACKEND_BASIS, check_basis_compatible)
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    import pytest as _pytest
    import warnings

    gs = synthetic_dataset(3, mean_atoms=6, seed=1)
    path = str(tmp_path / "c.npz")
    save_graph_cache(path, gs, basis=BACKEND_BASIS["native"])
    assert read_cache_basis(path) == "x2sv"
    assert len(load_graph_cache(path)) == 3    # meta key does not break load
    # untagged cache reads as unknown
    path2 = str(tmp_path / "c2.npz")
    save_graph_cache(path2, gs)
    assert read_cache_basis(path2) == "unknown"

    # known-known mismatch refuses; allow downgrades to a warning
    with _pytest.raises(ValueError, match="basis mismatch"):
        check_basis_compatible("6-311+g(3df,2p)", "x2sv")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        check_basis_compatible("6-311+g(3df,2p)", "x2sv", allow=True)
    assert len(w) == 1
    # unknown / None / equal tags pass silently
    check_basis_compatible("unknown", "x2sv")
    check_basis_compatible(None, "x2sv")
    check_basis_compatible("x2sv", "unknown")
    check_basis_compatible("x2sv", "x2sv")
