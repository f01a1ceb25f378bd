"""Tensor-parallel parameter sharding rules (GSPMD-style).

The reference has no parallelism at all (SURVEY.md §2.3); the rebuild's
communication backend is the mesh + NamedSharding layer.  DP shards the
batch over the ``data`` axis; this module adds the TP half: megatron-style
placement of the transformer weights over the ``model`` axis, leaving XLA's
GSPMD to insert all_gather/reduce_scatter on ICI.

Rules (torch layout, weight = (out, in)):
- column-parallel (shard out): attention q/k/v projections (head split),
  MLP up-projections (linear1 / fc1 / intermediate.dense / c_fc), feature
  up/entry projections (memory_proj / text_proj / linear_stage_* /
  patch-merging reduction / aux_linear)
- row-parallel (shard in): attention out_proj, MLP down-projections
  (linear2 / fc2 / output.dense / c_proj), DenseCLIP attention ``.proj``
- embed-dim sharded: ``token_embedding.weight`` (49408×512 — the largest
  single tensor) gets P(None, model): the vocab dim stays local so the
  ``jnp.take`` lookup is shard-local (no cross-shard gather); each device
  holds 1/m of the feature lanes and GSPMD all-gathers the tiny
  (K, n_ctx, width/m) activation at the next op.  Vocab-dim sharding would
  instead turn every lookup into a masked-select + psum.
- everything else (norms, biases, tables, indivisible dims): replicated.
  Known replicated-by-design 2-D weights are listed in JUSTIFIED_REPLICATED
  (census shows the reason instead of flagging them).
"""

from __future__ import annotations

import re
from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lc2is_tpu.core.mesh import MODEL_AXIS

_COLUMN = re.compile(
    r"(in_proj_weight|q_proj|k_proj|v_proj|q_proj_weight|k_proj_weight|v_proj_weight"
    r"|linear1|fc1|c_fc|intermediate|query|key|value"
    r"|(self_attn|cross_attn)\.(q|k|v)\.weight$"
    r"|memory_proj|text_proj|linear_stage|reduction|aux_linear)"
)
_ROW = re.compile(
    r"(out_proj|linear2|fc2|c_proj|output|(self_attn|cross_attn)\.proj\.weight$)"
)
_EMBED = re.compile(r"token_embedding")

# 2-D weights intentionally replicated: pattern -> one-line justification
# (spec_census reports these as "justified" instead of "unmatched").
JUSTIFIED_REPLICATED = {
    re.compile(r"text_projection$"):
        "CLIP pooled-text head: applied once per class set (K×width), "
        "activation smaller than one collective would cost",
    re.compile(r"(gamma|logit_scale)$"):
        "scalar/vector modulation parameters",
}


def _path_str(path) -> str:
    return ".".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)


def infer_param_specs(params, mesh: Mesh) -> Dict:
    """PartitionSpec pytree for the params tree. Only 2-D weights whose
    relevant dim divides the model-axis size get sharded."""
    m = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        name = _path_str(path)
        if m > 1 and hasattr(leaf, "ndim") and leaf.ndim == 2 and name.endswith("weight"):
            if _EMBED.search(name) and leaf.shape[1] % m == 0:
                return P(None, MODEL_AXIS)  # embed-dim shard (see module doc)
            if _COLUMN.search(name) and leaf.shape[0] % m == 0:
                return P(MODEL_AXIS, None)
            if _ROW.search(name) and leaf.shape[1] % m == 0:
                return P(None, MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def spec_census(params, mesh: Mesh) -> Dict[str, list]:
    """Which rule matched which param — makes regex drift visible instead of
    silent (mis)sharding.  Returns {"column": [...], "row": [...],
    "justified": [(name, reason), ...], "replicated_2d_weight": [...]} of
    dotted param paths; the last bucket lists 2-D ``*weight`` leaves NO rule
    matched and no justification covers (candidates for review)."""
    census: Dict[str, list] = {"column": [], "row": [], "justified": [],
                               "replicated_2d_weight": []}
    specs = infer_param_specs(params, mesh)

    def visit(path, leaf, spec):
        name = _path_str(path)
        if spec == P(MODEL_AXIS, None):
            census["column"].append(name)
        elif spec == P(None, MODEL_AXIS):
            census["row"].append(name)
        elif hasattr(leaf, "ndim") and leaf.ndim == 2 and name.endswith("weight"):
            for pat, why in JUSTIFIED_REPLICATED.items():
                if pat.search(name):
                    census["justified"].append((name, why))
                    break
            else:
                census["replicated_2d_weight"].append(name)

    jax.tree_util.tree_map_with_path(visit, params, specs)
    return census


def shard_params(params, mesh: Mesh):
    specs = infer_param_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    ), specs


def infer_opt_specs(opt_state, params, param_specs):
    """PartitionSpec pytree for an optax state: moment buffers inherit their
    parameter's spec (AdamW's mu/nu have the same shape as the param — a
    TP-sharded weight keeps TP-sharded moments, so the optimizer update runs
    shard-local with zero resharding), everything else (step counters,
    schedule state) is replicated.

    Matching is structural: any opt-state leaf whose tree path ENDS WITH a
    parameter's full path (optax nests the param tree under NamedTuple fields
    like ``ScaleByAdamState.mu``) and whose shape equals that parameter's
    shape gets the parameter's spec.
    """
    by_path = {}

    def record(path, leaf, spec):
        by_path[_path_str(path)] = (getattr(leaf, "shape", None), spec)

    jax.tree_util.tree_map_with_path(record, params, param_specs)

    def spec(path, leaf):
        keys = [str(k.key) if hasattr(k, "key") else getattr(k, "name", None) or str(getattr(k, "idx", k))
                for k in path]
        shape = getattr(leaf, "shape", None)
        # try successively shorter suffixes of the opt leaf's path
        for start in range(len(keys)):
            cand = ".".join(keys[start:])
            hit = by_path.get(cand)
            if hit is not None and hit[0] == shape:
                return hit[1]
        return P()

    return jax.tree_util.tree_map_with_path(spec, opt_state)
