"""Tensor-parallel parameter sharding rules (GSPMD-style).

The reference has no parallelism at all (SURVEY.md §2.3); the rebuild's
communication backend is the mesh + NamedSharding layer.  DP shards the
batch over the ``data`` axis; this module adds the TP half: megatron-style
placement of the transformer weights over the ``model`` axis, leaving XLA's
GSPMD to insert all_gather/reduce_scatter on ICI.

Rules (torch layout, weight = (out, in)):
- column-parallel (shard out): attention q/k/v projections (head split),
  MLP up-projections (linear1 / fc1 / intermediate.dense / c_fc)
- row-parallel (shard in): attention out_proj, MLP down-projections
  (linear2 / fc2 / output.dense / c_proj)
- everything else (norms, embeddings, biases, tables): replicated
"""

from __future__ import annotations

import re
from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lc2is_tpu.core.mesh import MODEL_AXIS

_COLUMN = re.compile(
    r"(in_proj_weight|q_proj|k_proj|v_proj|q_proj_weight|k_proj_weight|v_proj_weight"
    r"|linear1|fc1|c_fc|intermediate|query|key|value)"
)
_ROW = re.compile(r"(out_proj|linear2|fc2|c_proj|output)")


def _path_str(path) -> str:
    return ".".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)


def infer_param_specs(params, mesh: Mesh) -> Dict:
    """PartitionSpec pytree for the params tree. Only 2-D weights whose
    relevant dim divides the model-axis size get sharded."""
    m = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        name = _path_str(path)
        if m > 1 and hasattr(leaf, "ndim") and leaf.ndim == 2 and name.endswith("weight"):
            if _COLUMN.search(name) and leaf.shape[0] % m == 0:
                return P(MODEL_AXIS, None)
            if _ROW.search(name) and leaf.shape[1] % m == 0:
                return P(None, MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def spec_census(params, mesh: Mesh) -> Dict[str, list]:
    """Which rule matched which param — makes regex drift visible instead of
    silent (mis)sharding.  Returns {"column": [...], "row": [...],
    "replicated_2d_weight": [...]} of dotted param paths; the third bucket
    lists 2-D ``*weight`` leaves NO rule matched (candidates for review)."""
    census: Dict[str, list] = {"column": [], "row": [], "replicated_2d_weight": []}
    specs = infer_param_specs(params, mesh)

    def visit(path, leaf, spec):
        name = _path_str(path)
        if spec == P(MODEL_AXIS, None):
            census["column"].append(name)
        elif spec == P(None, MODEL_AXIS):
            census["row"].append(name)
        elif hasattr(leaf, "ndim") and leaf.ndim == 2 and name.endswith("weight"):
            census["replicated_2d_weight"].append(name)

    jax.tree_util.tree_map_with_path(visit, params, specs)
    return census


def shard_params(params, mesh: Mesh):
    specs = infer_param_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    ), specs
