"""fused_flat_adamw == optax.adamw numerics (bitwise-close), frozen handling.

The fused transform (engine/optim.py) replaces the tree-shaped per-leaf
AdamW with one flat f32 moment buffer per dtype; the math must match optax
exactly (same bias correction, eps placement, schedule step indexing) so the
default flip is numerics-neutral for training (engine.py:134 path, matching
the reference's torch AdamW at all_args.sh:14-16).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lc2is_tpu.engine.optim import frozen_mask, fused_flat_adamw, make_optimizer


def _tree(seed=0):
    r = np.random.RandomState(seed)
    return {
        "a": {"w": jnp.asarray(r.randn(8, 16), jnp.float32),
              "b": jnp.asarray(r.randn(16), jnp.float32)},
        "frozen_t": {"w": jnp.asarray(r.randn(4, 4), jnp.float32)},
        "c": jnp.asarray(r.randn(3, 5, 2), jnp.float32),
    }


def _grads(seed=1):
    r = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(r.randn(*p.shape).astype(np.float32)), _tree())


@pytest.mark.parametrize("schedule", ["constant", "cosine"])
@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_fused_flat_adamw_matches_optax(schedule, wd):
    params = _tree()
    sched = (1e-3 if schedule == "constant"
             else optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10))
    ref_tx = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    new_tx = fused_flat_adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                              weight_decay=wd)

    p_ref, p_new = params, params
    s_ref, s_new = ref_tx.init(p_ref), new_tx.init(p_new)
    for step in range(4):
        g = _grads(step)
        u_ref, s_ref = ref_tx.update(g, s_ref, p_ref)
        u_new, s_new = new_tx.update(g, s_new, p_new)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=1e-7),
            u_ref, u_new)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_new = optax.apply_updates(p_new, u_new)


def test_fused_flat_adamw_frozen_leaves():
    params = _tree()
    mask = frozen_mask(params, ["frozen_t"])
    tx = fused_flat_adamw(1e-3, mask=mask)
    state = tx.init(params)
    # state sized for TRAINABLE leaves only
    n_trainable = sum(int(np.prod(l.shape))
                      for l, t in zip(jax.tree_util.tree_leaves(params),
                                      jax.tree_util.tree_leaves(mask)) if t)
    assert state["m"]["float32"].shape == (n_trainable,)
    u, state = tx.update(_grads(), state, params)
    assert np.all(np.asarray(u["frozen_t"]["w"]) == 0.0)
    assert np.any(np.asarray(u["a"]["w"]) != 0.0)
    p2 = optax.apply_updates(params, u)
    np.testing.assert_array_equal(p2["frozen_t"]["w"], params["frozen_t"]["w"])


def test_make_optimizer_routes_to_fused(monkeypatch):
    params = _tree()
    monkeypatch.setenv("LC2IS_FUSED_OPT", "1")
    tx = make_optimizer(params, lr=1e-3, frozen_prefixes=["frozen_t"])
    state = tx.init(params)
    leaves = jax.tree_util.tree_leaves(state)
    # flat moments present (two (N,) buffers + count), not per-leaf moments
    flat = [l for l in leaves if getattr(l, "ndim", None) == 1 and l.shape[0] > 100]
    assert len(flat) == 2
    u, _ = tx.update(_grads(), state, params)
    assert np.all(np.asarray(u["frozen_t"]["w"]) == 0.0)

    # parity against the tree-shaped route on the same numbers
    monkeypatch.setenv("LC2IS_FUSED_OPT", "0")
    tx_ref = make_optimizer(params, lr=1e-3, frozen_prefixes=["frozen_t"])
    u_ref, _ = tx_ref.update(_grads(), tx_ref.init(params), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=1e-7),
        u_ref, u)
