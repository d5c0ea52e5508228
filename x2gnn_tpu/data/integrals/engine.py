"""Integral engine dispatch: C++ (ctypes) when built, numpy otherwise.

The C++ engine (csrc/integrals.cpp) implements the same McMurchie-Davidson
scheme as md.py with OpenMP shell-pair parallelism; build it with
`python -m x2gnn_tpu.data.integrals.build` (uses g++, no external deps).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from x2gnn_tpu.data.integrals.basis import (
    ANGSTROM_TO_BOHR, BasisSet, fallback_basis)
from x2gnn_tpu.data.integrals.md import one_electron_matrices_numpy

_LIB_PATH = os.path.join(os.path.dirname(__file__), "csrc",
                         "libx2integrals.so")
_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # built on another machine (-march=native) or missing libgomp:
        # fall back to the numpy engine instead of crashing the
        # native_available() predicate
        return None
    lib.x2_one_electron.restype = ctypes.c_int
    lib.x2_one_electron.argtypes = [
        ctypes.c_int,                                      # natoms
        np.ctypeslib.ndpointer(np.int64, flags="C"),       # Z
        np.ctypeslib.ndpointer(np.float64, flags="C"),     # xyz (bohr)
        ctypes.c_int,                                      # nshells
        np.ctypeslib.ndpointer(np.int64, flags="C"),       # shell_atom
        np.ctypeslib.ndpointer(np.int64, flags="C"),       # shell_l
        np.ctypeslib.ndpointer(np.int64, flags="C"),       # prim_offset
        np.ctypeslib.ndpointer(np.int64, flags="C"),       # prim_count
        np.ctypeslib.ndpointer(np.float64, flags="C"),     # exps
        np.ctypeslib.ndpointer(np.float64, flags="C"),     # coefs
        ctypes.c_int,                                      # nao
        np.ctypeslib.ndpointer(np.float64, flags="C"),     # S out
        np.ctypeslib.ndpointer(np.float64, flags="C"),     # T out
        np.ctypeslib.ndpointer(np.float64, flags="C"),     # V out
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


def _flatten_basis(numbers: np.ndarray, basis: BasisSet):
    shell_atom, shell_l, prim_off, prim_cnt = [], [], [], []
    exps, coefs = [], []
    nao = 0
    ao_slices = np.zeros((len(numbers), 2), dtype=np.int64)
    for ia, z in enumerate(numbers):
        ao_slices[ia, 0] = nao
        for sh in basis.shells_for(int(z)):
            shell_atom.append(ia)
            shell_l.append(sh.l)
            prim_off.append(len(exps))
            prim_cnt.append(len(sh.exponents))
            exps.extend(sh.exponents.tolist())
            # primitive norms folded in (Shell.weighted_coefficients) so
            # the C++ loop's plain ca*cb contraction is correct for
            # multi-primitive shells
            coefs.extend(sh.weighted_coefficients.tolist())
            nao += sh.num_sph
        ao_slices[ia, 1] = nao
    return (np.asarray(shell_atom, np.int64), np.asarray(shell_l, np.int64),
            np.asarray(prim_off, np.int64), np.asarray(prim_cnt, np.int64),
            np.asarray(exps, np.float64), np.asarray(coefs, np.float64),
            nao, ao_slices)


def one_electron_matrices_cpp(
    numbers: np.ndarray,
    positions_angstrom: np.ndarray,
    basis: Optional[BasisSet] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load_library()
    assert lib is not None, "native integral library not built"
    basis = basis or fallback_basis()
    numbers = np.ascontiguousarray(numbers, dtype=np.int64)
    xyz = np.ascontiguousarray(
        np.asarray(positions_angstrom, np.float64) * ANGSTROM_TO_BOHR)
    (shell_atom, shell_l, prim_off, prim_cnt, exps, coefs, nao,
     ao_slices) = _flatten_basis(numbers, basis)
    S = np.zeros((nao, nao))
    T = np.zeros((nao, nao))
    V = np.zeros((nao, nao))
    rc = lib.x2_one_electron(
        len(numbers), numbers, xyz, len(shell_atom), shell_atom, shell_l,
        prim_off, prim_cnt, exps, coefs, nao, S, T, V)
    if rc != 0:
        raise RuntimeError(f"native integral engine failed: rc={rc}")
    norm = 1.0 / np.sqrt(np.diag(S))
    S = S * norm[:, None] * norm[None, :]
    H = (T + V) * norm[:, None] * norm[None, :]
    nelec = int(numbers.sum())
    return S, H / max(nelec, 1), ao_slices


def one_electron_matrices(
    numbers: np.ndarray,
    positions_angstrom: np.ndarray,
    basis: Optional[BasisSet] = None,
    force_numpy: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(S, Hcore/nelec, ao_slices); prefers the C++ engine when built."""
    if not force_numpy and native_available():
        return one_electron_matrices_cpp(numbers, positions_angstrom, basis)
    return one_electron_matrices_numpy(numbers, positions_angstrom,
                                       basis or fallback_basis())
