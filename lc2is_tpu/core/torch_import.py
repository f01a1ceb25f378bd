"""Convert torch ``state_dict``s (as numpy arrays from core.pt_io.load_pt)
into flax params trees for this framework's modules.

Because nn/layers keeps torch parameter layout and names, the conversion is
a name walk: ``a.b.weight`` → params["a"]["b"]["weight"].  Structural
differences handled here:

- list-of-submodules: torch ``layers.0`` ↔ flax ``layers_0``
- SR reduction: torch keeps ``sr``/``norm`` directly on the layer
  (``model/decoder.py:117-118``); flax nests them in ``sr_reduce``
- name remaps passed per-model (e.g. HF CLIP/Swin naming → our modules)
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Mapping, Optional

import numpy as np


def _set_nested(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_key_to_flax_path(key: str):
    """Default key translation: digits merge into the previous segment."""
    parts = key.split(".")
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


_SR_FIX = re.compile(r"(^|\.)(sr|norm)\.(weight|bias)$")


def _sr_prefixes(keys) -> set:
    """Prefixes owning a torch SR reduction (identified by a ``sr.weight``
    sibling) — only their ``sr``/``norm`` params move into ``sr_reduce``;
    other bare ``norm``s (e.g. swin PatchMerging) stay put."""
    out = set()
    for k in keys:
        if k.endswith("sr.weight"):
            out.add(k[: -len("sr.weight")])
    return out


def fix_sr_names(key: str, sr_prefixes: Optional[set] = None) -> str:
    """Map a torch SR layer's direct ``sr``/``norm`` params into the flax
    ``sr_reduce`` submodule.  Only bare ``norm`` (not norm1/2/3) matches."""
    m = _SR_FIX.search(key)
    if m:
        prefix = key[: m.start()] + m.group(1)
        if sr_prefixes is not None and prefix not in sr_prefixes:
            return key
        return f"{prefix}sr_reduce.{m.group(2)}.{m.group(3)}"
    return key


def state_dict_to_params(
    state_dict: Mapping[str, np.ndarray],
    rename: Optional[Callable[[str], Optional[str]]] = None,
    sr_fix: bool = True,
) -> Dict:
    """Build a flax params dict.  ``rename`` may return None to drop a key."""
    tree: Dict = {}
    renamed = {}
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked") or key.endswith("position_ids"):
            continue
        k = key
        if rename is not None:
            k2 = rename(k)
            if k2 is None:
                continue
            k = k2
        renamed[k] = val
    srp = _sr_prefixes(renamed.keys()) if sr_fix else None
    for k, val in renamed.items():
        if sr_fix:
            k = fix_sr_names(k, srp)
        _set_nested(tree, torch_key_to_flax_path(k), np.asarray(val))
    return tree


def params_to_state_dict(params: Mapping, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten flax params back into torch state_dict naming (the export
    direction: our checkpoints readable by reference tooling)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in params.items():
        # undo the digit merge: layers_0 -> layers.0
        m = re.fullmatch(r"(.*)_(\d+)", k)
        name = f"{m.group(1)}.{m.group(2)}" if m else k
        if name.startswith("sr_reduce"):
            name = name[len("sr_reduce.") :] if name != "sr_reduce" else ""
            full = f"{prefix}{name}" if name else prefix.rstrip(".")
        else:
            full = f"{prefix}{name}"
        if isinstance(v, Mapping):
            out.update(params_to_state_dict(v, prefix=full + "."))
        else:
            out[full] = np.asarray(v)
    return out
