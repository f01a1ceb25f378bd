"""The fused Pallas module paths (LC2IS_PALLAS_INTERPRET=1) must reproduce
the XLA module composition — same params, same numerics, full modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lc2is_tpu.nn.layers import TransformerDecoderLayer, TransformerEncoderLayer
from lc2is_tpu.nn.swin import SwinModel

TINY_SWIN = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window=4)


@pytest.fixture()
def force_pallas(monkeypatch):
    monkeypatch.setenv("LC2IS_PALLAS_INTERPRET", "1")


def test_swin_fused_matches_xla(force_pallas):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 3, 64, 64), jnp.float32)
    xla = SwinModel(attn_impl="xla", drop_path_rate=0.0, **TINY_SWIN)
    fused = SwinModel(attn_impl="auto", drop_path_rate=0.0, **TINY_SWIN)
    params = xla.init(jax.random.PRNGKey(0), x)
    a = xla.apply(params, x)
    b = fused.apply(params, x)
    for ha, hb in zip(a, b):
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("norm_first", [False, True])
def test_decoder_layer_fused_matches_xla(force_pallas, norm_first):
    r = np.random.RandomState(1)
    tgt = jnp.asarray(r.randn(2, 36, 64), jnp.float32)
    mem = jnp.asarray(r.randn(2, 7, 64), jnp.float32)
    kw = dict(d_model=64, nhead=4, dim_feedforward=128, dropout=0.0,
              norm_first=norm_first)
    xla = TransformerDecoderLayer(attn_impl="xla", **kw)
    fused = TransformerDecoderLayer(attn_impl="auto", **kw)
    params = xla.init(jax.random.PRNGKey(0), tgt, mem)
    a = xla.apply(params, tgt, mem)
    b = fused.apply(params, tgt, mem)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_encoder_layer_fused_matches_xla(force_pallas):
    r = np.random.RandomState(2)
    src = jnp.asarray(r.randn(2, 50, 64), jnp.float32)
    kw = dict(d_model=64, nhead=4, dim_feedforward=256, dropout=0.0)
    xla = TransformerEncoderLayer(attn_impl="xla", **kw)
    fused = TransformerEncoderLayer(attn_impl="auto", **kw)
    params = xla.init(jax.random.PRNGKey(0), src)
    a = xla.apply(params, src)
    b = fused.apply(params, src)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_fused_gate_keeps_param_tree_identical(force_pallas):
    """init through the fused path must create the same param tree as the
    XLA path (torch-name import depends on it)."""
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(1, 3, 32, 32), jnp.float32)
    fused = SwinModel(attn_impl="auto", drop_path_rate=0.0, **TINY_SWIN)
    xla = SwinModel(attn_impl="xla", drop_path_rate=0.0, **TINY_SWIN)
    pf = jax.tree_util.tree_structure(fused.init(jax.random.PRNGKey(0), x))
    px = jax.tree_util.tree_structure(xla.init(jax.random.PRNGKey(0), x))
    assert pf == px


def test_decoder_layer_fused_grads_match_xla(force_pallas):
    """Training path: grads through the fused kernels (pallas backward for
    attention blocks + XLA-recompute for the rest) == XLA composition."""
    r = np.random.RandomState(5)
    tgt = jnp.asarray(r.randn(2, 64, 64), jnp.float32)
    mem = jnp.asarray(r.randn(2, 7, 64), jnp.float32)
    kw = dict(d_model=64, nhead=4, dim_feedforward=128, dropout=0.0)
    xla = TransformerDecoderLayer(attn_impl="xla", **kw)
    fused = TransformerDecoderLayer(attn_impl="auto", **kw)
    params = xla.init(jax.random.PRNGKey(0), tgt, mem)

    def loss(mod, p):
        return (mod.apply(p, tgt, mem) ** 2).sum()

    ga = jax.grad(lambda p: loss(xla, p))(params)
    gb = jax.grad(lambda p: loss(fused, p))(params)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gb)}
    for k, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=5e-3, atol=5e-3,
                                   err_msg=jax.tree_util.keystr(k))


@pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
def test_swin_fused_grads_match_xla(force_pallas):
    r = np.random.RandomState(6)
    x = jnp.asarray(r.randn(1, 3, 32, 32), jnp.float32)
    xla = SwinModel(attn_impl="xla", drop_path_rate=0.0, **TINY_SWIN)
    fused = SwinModel(attn_impl="auto", drop_path_rate=0.0, **TINY_SWIN)
    params = xla.init(jax.random.PRNGKey(0), x)

    def loss(mod, p):
        return sum((h ** 2).sum() for h in mod.apply(p, x))

    ga = jax.grad(lambda p: loss(xla, p))(params)
    gb = jax.grad(lambda p: loss(fused, p))(params)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gb)}
    for k, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=5e-3, atol=5e-3,
                                   err_msg=jax.tree_util.keystr(k))


def test_decoder_layer_fused_asymmetric_dkv(force_pallas):
    """The asymmetric-kdim/vdim cross-attention (reference model/decoder.py:13)
    now rides the fused block too — fwd + grads vs the XLA composition."""
    r = np.random.RandomState(3)
    tgt = jnp.asarray(r.randn(2, 36, 64), jnp.float32)
    mem = jnp.asarray(r.randn(2, 7, 48), jnp.float32)
    kw = dict(d_model=64, nhead=4, d_kv=48, dim_feedforward=128, dropout=0.0,
              norm_first=False)
    xla = TransformerDecoderLayer(attn_impl="xla", **kw)
    fused = TransformerDecoderLayer(attn_impl="auto", **kw)
    params = xla.init(jax.random.PRNGKey(0), tgt, mem)
    a = xla.apply(params, tgt, mem)
    b = fused.apply(params, tgt, mem)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

    ga = jax.grad(lambda p: (xla.apply(p, tgt, mem) ** 2).sum())(params)
    gb = jax.grad(lambda p: (fused.apply(p, tgt, mem) ** 2).sum())(params)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = jax.tree_util.tree_leaves_with_path(gb)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(pa))


@pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
def test_swin_fused_drop_path_training_matches_xla(force_pallas):
    """Stochastic depth must NOT force the unfused path (train-perf critical):
    with drop_path>0 and deterministic=False the fused kernels run with
    residual=False and the per-sample mask applies outside — same math and
    same rng draw order as the XLA composition, so outputs AND grads match."""
    r = np.random.RandomState(7)
    x = jnp.asarray(r.randn(4, 3, 32, 32), jnp.float32)
    xla = SwinModel(attn_impl="xla", drop_path_rate=0.3, **TINY_SWIN)
    fused = SwinModel(attn_impl="auto", drop_path_rate=0.3, **TINY_SWIN)
    params = xla.init(jax.random.PRNGKey(0), x)
    rngs = {"dropout": jax.random.PRNGKey(42)}

    a = xla.apply(params, x, deterministic=False, rngs=rngs)
    b = fused.apply(params, x, deterministic=False, rngs=rngs)
    for ha, hb in zip(a, b):
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), rtol=2e-4, atol=2e-4)

    def loss(mod, p):
        return sum((h ** 2).sum()
                   for h in mod.apply(p, x, deterministic=False, rngs=rngs))

    ga = jax.grad(lambda p: loss(xla, p))(params)
    gb = jax.grad(lambda p: loss(fused, p))(params)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gb)}
    for k, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=5e-3, atol=5e-3,
                                   err_msg=jax.tree_util.keystr(k))
