"""TP PartitionSpec inference + mesh helpers."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lc2is_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, make_mesh, shard_batch
from lc2is_tpu.parallel.sharding import infer_param_specs, shard_params


def test_infer_specs_rules():
    mesh = make_mesh(data=4, model=2)
    params = {
        "self_attn": {"in_proj_weight": np.zeros((96, 32)), "in_proj_bias": np.zeros((96,))},
        "linear1": {"weight": np.zeros((128, 32)), "bias": np.zeros((128,))},
        "linear2": {"weight": np.zeros((32, 128))},
        "norm1": {"weight": np.zeros((32,))},
        "odd": {"weight": np.zeros((33, 32))},  # not divisible by model axis
    }
    specs = infer_param_specs(params, mesh)
    assert specs["self_attn"]["in_proj_weight"] == P(MODEL_AXIS, None)  # column
    assert specs["linear1"]["weight"] == P(MODEL_AXIS, None)  # column (up-proj)
    assert specs["linear2"]["weight"] == P(None, MODEL_AXIS)  # row (down-proj)
    assert specs["norm1"]["weight"] == P()  # replicated
    assert specs["self_attn"]["in_proj_bias"] == P()
    assert specs["odd"]["weight"] == P()  # indivisible -> replicated


def test_shard_params_places_leaves():
    mesh = make_mesh(data=4, model=2)
    params = {"linear1": {"weight": jnp.zeros((16, 8))}, "norm": {"weight": jnp.zeros((8,))}}
    sharded, specs = shard_params(params, mesh)
    w = sharded["linear1"]["weight"]
    assert w.sharding.spec == P(MODEL_AXIS, None)
    # column-parallel: each model-axis shard holds 16/2 rows
    assert w.addressable_shards[0].data.shape == (8, 8)


def test_shard_batch_over_data_axis():
    mesh = make_mesh()  # 8 devices, data axis
    batch = {"pixel_values": jnp.zeros((8, 3, 4, 4)), "label": jnp.zeros((8, 4, 4))}
    placed = shard_batch(mesh, batch)
    assert placed["pixel_values"].sharding.spec == P(DATA_AXIS)
    assert placed["pixel_values"].addressable_shards[0].data.shape == (1, 3, 4, 4)


def test_model_axis1_all_replicated():
    mesh = make_mesh(data=-1, model=1)
    params = {"linear1": {"weight": np.zeros((16, 8))}}
    specs = infer_param_specs(params, mesh)
    assert specs["linear1"]["weight"] == P()
