"""Graph construction tests: radius graph + line graph vs brute-force
oracles (the reference ships no tests; oracle = independent O(N^3) loops)."""

import numpy as np
import pytest

from x2gnn_tpu.data.graphs import (
    pairwise_distances, radius_graph, line_graph, build_mol_graph)


def brute_force_edges(pos, cutoff):
    n = len(pos)
    edges = []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = np.linalg.norm(pos[i] - pos[j])
            if 0.0 < d < cutoff:
                edges.append((i, j))
    return set(edges)


def brute_force_triplets(edge_index):
    """All (e2=(j,k), e1=(i,j)) pairs with k != i."""
    edges = list(zip(edge_index[0].tolist(), edge_index[1].tolist()))
    trips = set()
    for e1, (i, j) in enumerate(edges):
        for e2, (jj, k) in enumerate(edges):
            if jj == j and k != i:
                trips.add((e2, e1))
    return trips


def test_pairwise_distances(make_molecule):
    _, pos = make_molecule(n_atoms=9)
    d = pairwise_distances(pos)
    for i in range(9):
        for j in range(9):
            assert d[i, j] == pytest.approx(np.linalg.norm(pos[i] - pos[j]))


def test_radius_graph_matches_bruteforce(make_molecule):
    for _ in range(5):
        _, pos = make_molecule()
        edge_index, dist = radius_graph(pos, cutoff=5.0)
        got = set(zip(edge_index[0].tolist(), edge_index[1].tolist()))
        assert got == brute_force_edges(pos, 5.0)
        # distances match and are within cutoff
        for e in range(edge_index.shape[1]):
            i, j = edge_index[0, e], edge_index[1, e]
            assert dist[e] == pytest.approx(np.linalg.norm(pos[i] - pos[j]))
        assert (dist < 5.0).all() and (dist > 0).all()


def test_radius_graph_bidirected(make_molecule):
    _, pos = make_molecule()
    edge_index, _ = radius_graph(pos, cutoff=5.0)
    pairs = set(zip(edge_index[0].tolist(), edge_index[1].tolist()))
    assert all((j, i) in pairs for (i, j) in pairs)


def test_line_graph_matches_bruteforce(make_molecule):
    for _ in range(5):
        _, pos = make_molecule()
        edge_index, _ = radius_graph(pos, cutoff=5.0)
        trip, atom_j, atom_i, atom_k = line_graph(edge_index, len(pos))
        got = set(zip(trip[0].tolist(), trip[1].tolist()))
        assert got == brute_force_triplets(edge_index)
        # atom identities: dst edge is (i->j), src edge is (j->k)
        src, dst = edge_index
        np.testing.assert_array_equal(atom_i, src[trip[1]])
        np.testing.assert_array_equal(atom_j, dst[trip[1]])
        np.testing.assert_array_equal(atom_j, src[trip[0]])
        np.testing.assert_array_equal(atom_k, dst[trip[0]])
        # no backtracking triplets
        assert (atom_i != atom_k).all()


def test_line_graph_dst_sorted(make_molecule):
    _, pos = make_molecule(n_atoms=12)
    edge_index, _ = radius_graph(pos, cutoff=5.0)
    trip, *_ = line_graph(edge_index, len(pos))
    assert (np.diff(trip[1]) >= 0).all(), "triplets must be dst-edge sorted"


def test_line_graph_empty():
    edge_index = np.zeros((2, 0), dtype=np.int32)
    trip, aj, ai, ak = line_graph(edge_index, 3)
    assert trip.shape == (2, 0) and len(aj) == len(ai) == len(ak) == 0


def test_build_mol_graph(make_molecule):
    numbers, pos = make_molecule(n_atoms=7)
    g = build_mol_graph(numbers, pos, y=np.array([1.5]), cutoff=5.0)
    assert g.num_atoms == 7
    assert g.edge_feat.shape == (g.num_edges, 338)
    assert g.triplet_index.shape[1] == g.num_triplets
    assert g.y[0] == pytest.approx(1.5)
