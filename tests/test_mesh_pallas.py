"""Pallas kernels under the 8-device mesh (VERDICT r3 #3).

Every other mesh test runs ``attn_impl="auto"`` on CPU, which dispatches to
the XLA fallback — so a GSPMD-partitioning failure of the custom-VJP Pallas
calls would be invisible to the suite.  Here ``LC2IS_PALLAS_INTERPRET=1``
forces the fused kernels (swin canvas block, fused window block, fused MLP,
attention block) in interpret mode INSIDE jitted, sharded train/eval steps,
and asserts the sharded result equals the single-device result.

The jaxpr is additionally checked for ``pallas_call`` so the assertion can
never silently pass through the XLA fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
from jax.sharding import NamedSharding, PartitionSpec as P

from lc2is_tpu.core.mesh import DATA_AXIS, make_mesh
from lc2is_tpu.nn.swin import SwinModel
from lc2is_tpu.parallel.sharding import infer_param_specs

TINY_SWIN = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window=4)


@pytest.fixture()
def force_pallas(monkeypatch):
    monkeypatch.setenv("LC2IS_PALLAS_INTERPRET", "1")


def _assert_pallas_on_path(fn, *args):
    jaxpr = str(jax.make_jaxpr(fn)(*args))
    assert "pallas_call" in jaxpr, "Pallas kernels not on the traced path"


def _tree_allclose(a, b, **tol):
    fa = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(a)}
    fb = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   err_msg=k, **tol)


@pytest.mark.parametrize("mode", ["canvas", "windowed"])
def test_dp_swin_train_step_with_pallas_kernels(force_pallas, monkeypatch, mode):
    """DP-sharded value_and_grad through the interpret-mode swin kernels
    (canvas-direct and fused-window variants) == single-device."""
    if mode == "windowed":
        # disable the canvas path so fused_window_block partitioning is the
        # code under test (tiny dims are all <= the canvas C-gate otherwise)
        monkeypatch.setenv("LC2IS_SWIN_CANVAS", "0")
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(8, 3, 32, 32), jnp.float32)
    model = SwinModel(attn_impl="auto", drop_path_rate=0.0, **TINY_SWIN)
    params = model.init(jax.random.PRNGKey(0), x[:1])

    def step(p, xb):
        def loss_fn(pp):
            return sum((h.astype(jnp.float32) ** 2).mean()
                       for h in model.apply(pp, xb))
        return jax.value_and_grad(loss_fn)(p)

    _assert_pallas_on_path(step, params, x[:1])

    loss_1dev, grads_1dev = jax.jit(step)(params, x)

    mesh = make_mesh(data=8, model=1)
    bspec = NamedSharding(mesh, P(DATA_AXIS))
    rspec = NamedSharding(mesh, P())
    xs = jax.device_put(x, bspec)
    ps = jax.tree_util.tree_map(lambda t: jax.device_put(t, rspec), params)
    loss_dp, grads_dp = jax.jit(
        step, in_shardings=(rspec, bspec), out_shardings=(rspec, rspec)
    )(ps, xs)

    np.testing.assert_allclose(float(loss_dp), float(loss_1dev), rtol=1e-6)
    _tree_allclose(grads_dp, grads_1dev, rtol=1e-5, atol=1e-6)


def test_tp_decoder_layer_with_pallas_kernels(force_pallas):
    """TP-sharded weights feeding the fused attention-block kernel: the
    (4 data, 2 model) mesh must reproduce the single-device numerics —
    GSPMD has to partition (or replicate) the pallas_call operands
    correctly when q/k/v and MLP weights carry model-axis shardings."""
    from lc2is_tpu.nn.layers import TransformerDecoderLayer

    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(8, 36, 64), jnp.float32)
    mem = jnp.asarray(r.randn(8, 7, 64), jnp.float32)
    layer = TransformerDecoderLayer(d_model=64, nhead=4, dim_feedforward=128,
                                    dropout=0.0, attn_impl="auto")
    params = layer.init(jax.random.PRNGKey(0), x[:1], mem[:1])

    def step(p, xb, mb):
        def loss_fn(pp):
            return (layer.apply(pp, xb, mb).astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss_fn)(p)

    _assert_pallas_on_path(step, params, x[:1], mem[:1])

    loss_1dev, grads_1dev = jax.jit(step)(params, x, mem)

    mesh = make_mesh(data=4, model=2)
    specs = infer_param_specs(params, mesh)
    assert any(s != P() for s in jax.tree_util.tree_leaves(specs)), \
        "TP rules matched nothing — test would only cover replication"
    pshard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)
    bspec = NamedSharding(mesh, P(DATA_AXIS))
    rspec = NamedSharding(mesh, P())
    ps = jax.tree_util.tree_map(jax.device_put, params, pshard)
    xs, ms = jax.device_put(x, bspec), jax.device_put(mem, bspec)
    loss_tp, grads_tp = jax.jit(
        step, in_shardings=(pshard, bspec, bspec),
        out_shardings=(rspec, rspec),
    )(ps, xs, ms)

    np.testing.assert_allclose(float(loss_tp), float(loss_1dev), rtol=1e-5)
    _tree_allclose(grads_tp, grads_1dev, rtol=1e-4, atol=1e-6)
