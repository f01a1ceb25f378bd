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


class _TinyDecModel:
    """2 decoder layers + linear head; exercises the TP rules on the real
    attention/MLP parameter names (in_proj_weight, linear1/2, out_proj)."""

    def __init__(self):
        import flax.linen as fnn
        from lc2is_tpu.nn.layers import Linear, TransformerDecoderLayer

        class M(fnn.Module):
            @fnn.compact
            def __call__(self, x, mem):
                for i in range(2):
                    x = TransformerDecoderLayer(
                        d_model=32, nhead=4, d_kv=16, dim_feedforward=64, dropout=0.0
                    )(x, mem)
                return Linear(8)(x)

        self.module = M()

    def init(self, key, x, mem):
        return self.module.init(key, x, mem)

    def apply(self, p, x, mem):
        return self.module.apply(p, x, mem)


def _train_step_on_mesh(mesh, model, params0, batch):
    """One train step jitted with DP batch + inferred TP param specs.

    SGD (not Adam) so updated params stay proportional to gradients — Adam's
    1/sqrt(v)+eps rescaling amplifies float-noise gradient differences on
    near-zero-grad params to ~1e-4, masking what we want to measure."""
    import optax
    from jax.sharding import NamedSharding

    x, mem, y = batch
    tx = optax.sgd(1e-2)
    specs = infer_param_specs(params0, mesh)
    shardings = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)
    params = jax.tree_util.tree_map(jax.device_put, params0, shardings)
    opt_state = jax.device_put(tx.init(params0), NamedSharding(mesh, P()))
    bspec = NamedSharding(mesh, P(DATA_AXIS))
    x, mem, y = (jax.device_put(t, bspec) for t in (x, mem, y))

    def step(p, o, x, mem, y):
        def loss_fn(pp):
            logits = model.apply(pp, x, mem)
            return jnp.mean((logits - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), loss

    jstep = jax.jit(
        step,
        in_shardings=(shardings, NamedSharding(mesh, P()), bspec, bspec, bspec),
        out_shardings=(shardings, NamedSharding(mesh, P())),
    )
    p2, loss = jstep(params, opt_state, x, mem, y)
    return jax.tree_util.tree_map(np.asarray, p2), float(loss)


def test_tp_meshes_reproduce_dp_numerics():
    """(4,2) and (2,4) meshes must give the same loss and updated params as
    the pure-DP (8,1) mesh — TP is a layout choice, not a numerics choice."""
    model = _TinyDecModel()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 12, 32), jnp.float32)
    mem = jnp.asarray(rng.randn(8, 6, 16), jnp.float32)
    y = jnp.asarray(rng.randn(8, 12, 8), jnp.float32)
    params0 = model.init(jax.random.PRNGKey(0), x, mem)

    results = {}
    for data, m in [(8, 1), (4, 2), (2, 4)]:
        mesh = make_mesh(data=data, model=m)
        results[(data, m)] = _train_step_on_mesh(mesh, model, params0, (x, mem, y))

    p_ref, loss_ref = results[(8, 1)]
    for key in [(4, 2), (2, 4)]:
        p_tp, loss_tp = results[key]
        assert abs(loss_tp - loss_ref) < 1e-6, (key, loss_tp, loss_ref)
        flat_ref = jax.tree_util.tree_leaves(p_ref)
        flat_tp = jax.tree_util.tree_leaves(p_tp)
        for a, b in zip(flat_ref, flat_tp):
            np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)
    # sanity: the TP meshes actually sharded something (rules matched names)
    mesh42 = make_mesh(data=4, model=2)
    specs = infer_param_specs(params0, mesh42)
    assert any(s != P() for s in jax.tree_util.tree_leaves(specs))


def test_infer_opt_specs_moments_inherit_param_specs():
    """AdamW moment buffers get their parameter's PartitionSpec; counters and
    non-matching leaves replicate (engine TP placement — VERDICT r4 #6)."""
    from lc2is_tpu.engine.optim import make_optimizer
    from lc2is_tpu.parallel.sharding import infer_opt_specs

    params = {"dec": {"linear1": {"weight": jnp.zeros((128, 64)), "bias": jnp.zeros((128,))},
                      "out_proj": {"weight": jnp.zeros((64, 128))}},
              "norm": {"weight": jnp.zeros((64,))}}
    mesh = make_mesh(data=4, model=2)
    specs = infer_param_specs(params, mesh)
    tx = make_optimizer(params, lr=1e-4, total_steps=10)
    ospecs = infer_opt_specs(tx.init(params), params, specs)

    got = {jax.tree_util.keystr(k): v for k, v in
           jax.tree_util.tree_leaves_with_path(ospecs, is_leaf=lambda x: isinstance(x, P))}
    for moment in ("mu", "nu"):
        assert any(f"{moment}['dec']['linear1']['weight']" in k and v == P("model", None)
                   for k, v in got.items()), got
        assert any(f"{moment}['dec']['out_proj']['weight']" in k and v == P(None, "model")
                   for k, v in got.items()), got
    assert all(v == P() for k, v in got.items() if "count" in k)
    assert all(v == P() for k, v in got.items() if "bias" in k or "norm" in k)
