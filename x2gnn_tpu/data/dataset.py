"""Dataset pipeline: xyz -> featurized MolGraphs, cached on disk.

Replaces the reference's PyG InMemoryDataset + torch.save flow
(qm9_allprop.py:29-59) with an npz shard cache of concatenated ragged
arrays. Featurization fans out over a process pool like the reference
(qm9_allprop.py:21-27) but without its fork-pickler workarounds.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from x2gnn_tpu.data.graphs import MolGraph, build_mol_graph
from x2gnn_tpu.data.molecule import (
    Molecule, read_xyz, read_xyz_allprop, atomization_target)
from x2gnn_tpu.data.featurize import edge_features, EDGE_FEAT_DIM

_FEAT_STATE = {}


def _featurize_one(args):
    idx, numbers, positions, labels, cutoff, backend, replicate_bug = args
    mol = Molecule(numbers, positions, labels, idx)
    g = build_mol_graph(numbers, positions, labels, cutoff=cutoff,
                        edge_feat_dim=EDGE_FEAT_DIM, index=idx)
    if backend != "zero":
        g.edge_feat[:] = edge_features(
            mol, g.edge_index, backend=backend,
            replicate_reference_bug=replicate_bug)
    return g


def featurize_molecules(
    mols: Sequence[Molecule],
    cutoff: float = 5.0,
    backend: str = "zero",
    num_workers: Optional[int] = None,
    replicate_reference_bug: bool = False,
) -> List[MolGraph]:
    """Build MolGraphs (graphs + integral features) for all molecules,
    fanning out over processes when a quantum backend is active."""
    jobs = [(m.index, m.numbers, m.positions, m.labels, cutoff, backend,
             replicate_reference_bug) for m in mols]
    if backend == "zero" or (num_workers is not None and num_workers <= 1):
        return [_featurize_one(j) for j in jobs]
    from multiprocessing import Pool
    workers = num_workers or os.cpu_count()
    with Pool(processes=workers) as pool:
        return pool.map(_featurize_one, jobs, chunksize=16)


def save_graph_cache(path: str, graphs: Sequence[MolGraph],
                     basis: Optional[str] = None) -> None:
    """Concatenated ragged arrays + offsets in one npz.

    `basis` tags the featurization provenance ('6-311+g(3df,2p)' for
    pyscf, 'x2sv' for the native engine — featurize.BACKEND_BASIS);
    evaluate.py / Predictor check it against the training run's tag."""
    payload = {
        "basis": np.array(basis if basis is not None else "unknown"),
        "numbers": np.concatenate([g.numbers for g in graphs]),
        "positions": np.concatenate([g.positions for g in graphs]),
        "edge_index": np.concatenate(
            [g.edge_index for g in graphs], axis=1),
        "edge_feat": np.concatenate([g.edge_feat for g in graphs]),
        "triplet_index": np.concatenate(
            [g.triplet_index for g in graphs], axis=1),
        "atom_j": np.concatenate([g.atom_j for g in graphs]),
        "atom_i": np.concatenate([g.atom_i for g in graphs]),
        "atom_k": np.concatenate([g.atom_k for g in graphs]),
        "y": np.stack([g.y for g in graphs]),
        "n_atoms": np.array([g.num_atoms for g in graphs]),
        "n_edges": np.array([g.num_edges for g in graphs]),
        "n_trips": np.array([g.num_triplets for g in graphs]),
        "index": np.array([g.index for g in graphs]),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # uncompressed: compression made per-array reads decompress the whole
    # file and cost minutes on large caches. Atomic write: a crash
    # mid-save must not leave a truncated npz that exists-checks (the
    # resumable featurizer, load_dataset) would trust as complete.
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def read_cache_basis(path: str) -> str:
    """Featurization-basis tag of a graph cache ('unknown' for caches
    written before provenance tagging)."""
    with np.load(path) as zf:
        if "basis" in zf.files:
            return str(zf["basis"])
    return "unknown"


def load_graph_cache(path: str) -> List[MolGraph]:
    with np.load(path) as zf:
        # materialize every array ONCE — indexing a lazy NpzFile member
        # re-decompresses the full array per access
        z = {k: np.asarray(zf[k]) for k in zf.files}
    n_off = np.concatenate([[0], np.cumsum(z["n_atoms"])])
    e_off = np.concatenate([[0], np.cumsum(z["n_edges"])])
    t_off = np.concatenate([[0], np.cumsum(z["n_trips"])])
    graphs = []
    for m in range(len(z["n_atoms"])):  # noqa: E501 — z is a plain dict now
        a0, a1 = n_off[m], n_off[m + 1]
        e0, e1 = e_off[m], e_off[m + 1]
        t0, t1 = t_off[m], t_off[m + 1]
        graphs.append(MolGraph(
            numbers=z["numbers"][a0:a1],
            positions=z["positions"][a0:a1],
            edge_index=z["edge_index"][:, e0:e1],
            edge_feat=z["edge_feat"][e0:e1],
            triplet_index=z["triplet_index"][:, t0:t1],
            atom_j=z["atom_j"][t0:t1],
            atom_i=z["atom_i"][t0:t1],
            atom_k=z["atom_k"][t0:t1],
            y=z["y"][m],
            index=int(z["index"][m]),
        ))
    return graphs


def load_dataset(
    xyz_path: str,
    cache_dir: str = "./processed",
    cutoff: float = 5.0,
    backend: str = "auto",
    multi_property: Optional[bool] = None,
    limit: Optional[int] = None,
    num_workers: Optional[int] = None,
) -> List[MolGraph]:
    """xyz file -> cached featurized MolGraphs (labels kept raw; apply
    `prepare_targets` for training targets)."""
    name = os.path.splitext(os.path.basename(xyz_path))[0]
    # tag with the RESOLVED backend: an 'auto' tag would silently mix
    # pyscf- and native-basis features across machines (not interchangeable)
    from x2gnn_tpu.data.featurize import resolve_backend
    backend = resolve_backend(backend)
    tag = f"{name}_{backend}_c{cutoff:g}" + (f"_n{limit}" if limit else "")
    cache = os.path.join(cache_dir, tag + ".npz")
    if os.path.exists(cache):
        return load_graph_cache(cache)
    if multi_property is None:
        probe = read_xyz(xyz_path)  # generic reader handles both layouts
        multi_property = probe and probe[0].labels.shape[0] == 12
        mols = probe
    else:
        mols = (read_xyz_allprop if multi_property else read_xyz)(xyz_path)
    if limit:
        mols = mols[:limit]
    graphs = featurize_molecules(mols, cutoff=cutoff, backend=backend,
                                 num_workers=num_workers)
    from x2gnn_tpu.data.featurize import basis_provenance
    save_graph_cache(cache, graphs, basis=basis_provenance(backend))
    return graphs


def prepare_targets(graphs: Sequence[MolGraph], target: int) -> np.ndarray:
    """Atomization-reference subtraction + unit conversion for QM9-style
    multi-property labels (train_ema.py:28-38)."""
    numbers = [g.numbers for g in graphs]
    labels = np.stack([g.y for g in graphs])
    if labels.shape[1] == 1:
        return labels[:, 0].astype(np.float32)
    if labels.shape[1] == 2:
        # synthetic [IP energy Hartree, HOMO-LUMO gap eV] pair
        # (synthetic.synthetic_labeled_graph gap_label=True): extensive
        # QM9 target ids train the energy, intensive ids the gap —
        # preserving the reference's target->model-family dispatch
        # (train_ema.py:41-44) without pretending 12 QM9 properties.
        from x2gnn_tpu.data.molecule import EXTENSIVE_TARGETS
        col = 0 if target in EXTENSIVE_TARGETS else 1
        return labels[:, col].astype(np.float32)
    return atomization_target(numbers, labels, target).astype(np.float32)
