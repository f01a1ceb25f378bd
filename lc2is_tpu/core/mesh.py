"""Device mesh + sharding helpers.

The reference has no distributed layer at all (SURVEY.md §2.3/§5.8 — single
process, single CUDA device, ``engine.py:17,31``).  This module is the
TPU-native communication backend that replaces it: one `jax.sharding.Mesh`
with a ``data`` axis (DP) and a ``model`` axis (TP), `NamedSharding`-placed
batches/params, and XLA collectives inserted by GSPMD.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devs).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of batch arrays with the batch axis over DATA_AXIS."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def local_mesh_for_testing(n: int = 8) -> Mesh:
    """Mesh over however many devices exist (e.g. 8 virtual CPU devices when
    XLA_FLAGS=--xla_force_host_platform_device_count=8)."""
    return make_mesh(data=-1, model=1, devices=jax.devices()[:n])
