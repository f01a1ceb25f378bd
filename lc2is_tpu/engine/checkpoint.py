"""Checkpointing: native (npz, full train state incl. optimizer + step) and
reference-compatible torch ``.pt`` export/import.

The reference saves bare ``model.state_dict()`` every save_step with no
resume path (``engine.py:186-190``, SURVEY.md §5.4).  We keep that export for
interop and add what it lacks: optimizer/step state and step-indexed resume.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from lc2is_tpu.core.pt_io import load_pt, save_pt
from lc2is_tpu.core.torch_import import params_to_state_dict, state_dict_to_params

SEP = "|"


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}{SEP}"))
        if len(tree) == 0:
            out[prefix + "#empty"] = np.zeros((0,))
    elif tree is None:
        out[prefix + "#none"] = np.zeros((0,))
    else:
        out[prefix.rstrip(SEP)] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    # reconstruct nested dict/list structure from path keys
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        last = parts[-1]
        if last == "#none":
            node["#none"] = None
        elif last == "#empty":
            node["#empty"] = ()
        else:
            node[last] = val

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        if set(node.keys()) == {"#none"}:
            return None
        if set(node.keys()) == {"#empty"}:
            return ()
        if all(k.startswith("#") for k in node.keys()) and node:
            items = sorted(node.items(), key=lambda kv: int(kv[0][1:]))
            return tuple(rebuild(v) for _, v in items)
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)


def save_checkpoint(path: str, state: Dict, step: int, metadata: Optional[Dict] = None) -> str:
    """state: pytree of params/opt_state/etc.  Writes {path}/step-{N}.npz."""
    os.makedirs(path, exist_ok=True)
    host_state = jax.device_get(state)
    flat = _flatten(host_state)
    fname = os.path.join(path, f"step-{step}.npz")
    np.savez(fname, **flat)
    meta = dict(step=step, **(metadata or {}))
    with open(os.path.join(path, f"step-{step}.json"), "w") as f:
        json.dump(meta, f)
    return fname


def load_checkpoint(fname: str) -> Tuple[Any, Dict]:
    with np.load(fname, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    state = _unflatten(flat)
    meta_path = fname.replace(".npz", ".json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    return state, meta


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    steps = []
    for f in os.listdir(path):
        if f.startswith("step-") and f.endswith(".npz"):
            steps.append(int(f[len("step-"):-len(".npz")]))
    if not steps:
        return None
    return os.path.join(path, f"step-{max(steps)}.npz")


def export_reference_pt(params: Dict, path: str) -> None:
    """Write params as a torch-zip state_dict readable by the reference
    (``torch.load`` + ``load_state_dict``)."""
    sd = params_to_state_dict(jax.device_get(params))
    save_pt({k: np.asarray(v) for k, v in sd.items()}, path)


def import_reference_pt(path: str, rename=None) -> Dict:
    """Read a reference checkpoint ``.pt`` into a flax params tree."""
    sd = load_pt(path)
    return state_dict_to_params(sd, rename=rename)
