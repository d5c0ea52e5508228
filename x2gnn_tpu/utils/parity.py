"""Per-layer parity harness.

BASELINE.md's numerics north star is per-layer activation agreement with
the PyTorch/PyG reference. This module dumps every submodule's
intermediate outputs for a fixed batch to an npz; a reference-side dump
(run where torch 1.12 + PyG 2.1 are installed, using the same molecules
and weights transplanted via `export_params_torch_naming`) can then be
compared entry-by-entry with `compare_dumps`.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def dump_activations(model, params, batch, path: str) -> Dict[str, tuple]:
    """Run `model.apply` capturing every submodule output; save to npz.

    Returns {flat_name: shape} for quick inspection.
    """
    out, state = model.apply(params, batch,
                             capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]
    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}.{i}" if len(tree) > 1 else prefix)
        else:
            flat[prefix] = np.asarray(tree)

    walk(inter, "")
    flat["__output__"] = np.asarray(out)
    np.savez(path, **flat)
    return {k: v.shape for k, v in flat.items()}


def compare_dumps(path_a: str, path_b: str, rtol=1e-4, atol=1e-5):
    """Compare two activation dumps; returns a list of (name, max_abs_err,
    ok) for every key present in both."""
    a = np.load(path_a)
    b = np.load(path_b)
    report = []
    for key in sorted(set(a.files) & set(b.files)):
        x, y = a[key], b[key]
        if x.shape != y.shape:
            report.append((key, float("inf"), False))
            continue
        err = float(np.max(np.abs(x - y))) if x.size else 0.0
        ok = np.allclose(x, y, rtol=rtol, atol=atol)
        report.append((key, err, ok))
    return report


def export_params_flat(params) -> Dict[str, np.ndarray]:
    """Flatten a flax param tree to {path: array} for transplanting into
    a reference implementation (kernel matrices are (in, out); torch
    Linear weights are their transpose)."""
    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(tree)

    walk(params.get("params", params), "")
    return flat
