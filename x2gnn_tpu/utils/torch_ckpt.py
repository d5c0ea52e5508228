"""Reference-checkpoint bridge: import a zfwangDP/X2-GNN PyTorch
checkpoint (.pth) into this framework's parameter tree, and export back.

The reference saves `{"model": model.state_dict(), "optimizer": ...,
"scheduler": ..., "epoch": ...}` (trainer.py:98-105). Its module tree
(xgnn.py:20-34, model.py:16-22, sbftransformer_conv.py:50-73,
readout.py:15-22, atom_embedding.py:14-15, residual_layer.py:8-9,
radial_basis_layer.py:32) maps 1:1 onto this framework's flax tree —
the readout MLP interleaves SiLU modules (readout.py:15-20), so torch
Linear j lives at `mlp.{2j}`; torch Linear weights are (out, in) and
transpose to flax (in, out) kernels; the embedding table and the RBF
frequencies carry over untransposed.

Keys the reference checkpoint has that this framework deliberately does
NOT reproduce are reported, not errored: `rbf_trans.*` (dead parameters
— defined at xgnn.py:30-32, never used in any forward; documented in
DECISIONS.md).

Usage:
    python scripts/import_torch_ckpt.py --pth ckpt/U0_ckpt.pth \
        --config config.json --out runs/imported
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

# reference parameters that are intentionally absent here
_KNOWN_DEAD = ("rbf_trans.",)


def _ref_key(path: str) -> str:
    """Our flat param path -> the reference state_dict key."""
    parts = [p for p in path.split("/") if p != "Dense_0"]
    leaf = parts[-1]
    mods = parts[:-1]
    name = ".".join(mods)

    # module-path translations (ours -> reference)
    if name == "emb_block" and leaf == "embedding":
        return "emb_block.embedding.weight"
    m = re.match(r"^edgenn_(\d+)_(\d+)$", name)          # v2 per-layer MLPs
    if m:
        name = f"fin_model.edgenn.{m.group(1)}.{2 * int(m.group(2))}"
    else:
        m = re.match(r"^edgenn_(\d+)$", name)            # v1 shared MLP
        if m:
            name = f"fin_model.edgenn.{2 * int(m.group(1))}"
    name = re.sub(r"^conv_(\d+)\.", r"fin_model.convs.\1.", name)
    name = re.sub(r"^readout_(\d+)\.", r"fin_model.readouts.\1.", name)
    m = re.match(r"^(fin_model\.readouts\.\d+)\.mlp\.mlp_(\d+)$", name)
    if m:
        name = f"{m.group(1)}.mlp.{2 * int(m.group(2))}"
    m = re.match(r"^(fin_model\.readouts\.\d+)\.mlp\.mlp_out$", name)
    if m:
        name = f"{m.group(1)}.mlp.__OUT__"              # resolved later
    name = re.sub(r"^bf_skip_(\d+)\.", r"fin_model.bf_skip.\1.", name)
    name = re.sub(r"^af_skip_(\d+)_(\d+)\.", r"fin_model.af_skip.\1.\2.",
                  name)
    name = re.sub(r"^dense_bf_skip_(\d+)$", r"fin_model.dense_bf_skip.\1",
                  name)
    m = re.match(r"^norm_(\d+)", name)
    if m:  # PyG LayerNorm(affine=False) has no params; defensive
        name = f"fin_model.norms.{m.group(1)}"

    if name == "rbf_layer" and leaf == "frequencies":
        return "rbf_layer.frequencies"
    suffix = {"kernel": "weight", "bias": "bias"}.get(leaf, leaf)
    return f"{name}.{suffix}"


def name_map(params, mlp_depth: int = 3) -> Dict[str, str]:
    """{our flat path: reference state_dict key} for every leaf."""
    from x2gnn_tpu.utils.parity import export_params_flat

    out_idx = 2 * (mlp_depth - 1)
    mapping = {}
    for path in export_params_flat(params):
        key = _ref_key(path)
        mapping[path] = key.replace("mlp.__OUT__", f"mlp.{out_idx}")
    return mapping


def _needs_transpose(path: str, arr: np.ndarray) -> bool:
    # 2D Linear kernels transpose; the embedding table does not
    return path.endswith("/kernel") and arr.ndim == 2


def export_torch_state_dict(params, mlp_depth: int = 3
                            ) -> Dict[str, np.ndarray]:
    """Our param tree -> a reference-named state_dict (numpy values).
    The exact inverse of import_torch_state_dict — lets reference
    tooling load weights trained here."""
    from x2gnn_tpu.utils.parity import export_params_flat

    flat = export_params_flat(params)
    mapping = name_map(params, mlp_depth)
    sd = {}
    for path, arr in flat.items():
        a = np.asarray(arr)
        sd[mapping[path]] = a.T.copy() if _needs_transpose(path, a) else a
    return sd


def import_torch_state_dict(state_dict: Dict[str, Any], params,
                            mlp_depth: int = 3
                            ) -> Tuple[Any, Dict[str, list]]:
    """Fill our param tree from a reference state_dict.

    `state_dict`: {name: tensor/ndarray} — the checkpoint's "model"
    entry (an AveragedModel 'module.' prefix and its 'n_averaged' are
    handled). `params`: a template tree from model.init (shapes/dtypes).

    Returns (new params tree, report) with report keys:
      'missing'   — our leaves the checkpoint lacks (kept at template),
      'unused'    — checkpoint keys we did not consume,
      'dead'      — reference-only dead params (expected leftovers).
    """
    import jax

    sd = {}
    for k, v in state_dict.items():
        k = k[len("module."):] if k.startswith("module.") else k
        if k == "n_averaged":
            continue
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)()
                           if hasattr(v, "numpy") else v)

    mapping = name_map(params, mlp_depth)
    used, missing = set(), []

    def fill(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: fill(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        path = prefix
        key = mapping.get(path)
        if key is None or key not in sd:
            missing.append(path)
            return tree
        used.add(key)
        arr = sd[key]
        if path.endswith("/kernel") and arr.ndim == 2:
            arr = arr.T               # torch (out, in) -> flax (in, out)
        want = np.asarray(tree)
        if arr.shape != want.shape:
            raise ValueError(
                f"shape mismatch for {path} <- {key}: checkpoint "
                f"{arr.shape}, model {want.shape} — config mismatch?")
        return jax.numpy.asarray(arr.astype(want.dtype))

    inner = params.get("params", params) if isinstance(params, dict) \
        else params
    new_inner = fill(inner)
    new_params = (dict(params, params=new_inner)
                  if isinstance(params, dict) and "params" in params
                  else new_inner)
    leftovers = [k for k in sd if k not in used]
    dead = [k for k in leftovers
            if any(k.startswith(d) for d in _KNOWN_DEAD)]
    unused = [k for k in leftovers if k not in dead]
    return new_params, {"missing": missing, "unused": unused,
                        "dead": dead}
