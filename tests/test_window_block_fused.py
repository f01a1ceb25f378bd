"""Fused window-block kernels (LN+QKV+attn+proj[+MLP]) vs the XLA module
composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lc2is_tpu.ops.window_attention import (
    fused_window_block, _xla_block_reference)


def _mk(n, p, c, heads, seed=0, with_regions=False):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(n, p, c).astype(np.float32))
    lw = jnp.asarray(1 + 0.1 * rs.randn(c), jnp.float32)
    lb = jnp.asarray(0.1 * rs.randn(c), jnp.float32)
    wqkv = jnp.asarray(rs.randn(3 * c, c).astype(np.float32) / np.sqrt(c))
    bqkv = jnp.asarray(0.1 * rs.randn(3 * c).astype(np.float32))
    wo = jnp.asarray(rs.randn(c, c).astype(np.float32) / np.sqrt(c))
    bo = jnp.asarray(0.1 * rs.randn(c).astype(np.float32))
    bias = jnp.asarray(rs.randn(heads, p, p).astype(np.float32) * 0.1)
    regions = jnp.asarray(rs.randint(0, 3, (n, p)), jnp.int32) if with_regions else None
    return x, lw, lb, wqkv, bqkv, wo, bo, bias, regions


@pytest.mark.parametrize("n,p,c,heads,with_regions",
                         [(12, 49, 32, 2, False), (18, 49, 64, 4, True), (8, 16, 32, 4, False)])
def test_fused_window_block_parity(n, p, c, heads, with_regions):
    x, lw, lb, wqkv, bqkv, wo, bo, bias, regions = _mk(n, p, c, heads,
                                                       with_regions=with_regions)
    got = fused_window_block(x, lw, lb, wqkv, bqkv, wo, bo, bias, regions, heads,
                             interpret=True, block_windows=8)
    want = _xla_block_reference(x, lw, lb, wqkv, bqkv, wo, bo, regions, bias,
                                heads, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("with_regions", [False, True])
def test_fused_window_block_grad(with_regions):
    """Pallas backward vs XLA reference — incl. the shifted-window (regions)
    path the training step exercises on every odd swin block."""
    x, lw, lb, wqkv, bqkv, wo, bo, bias, regions = _mk(8, 16, 32, 4, seed=1,
                                                       with_regions=with_regions)
    g1 = jax.grad(lambda v: fused_window_block(v, lw, lb, wqkv, bqkv, wo, bo,
                                               bias, regions, 4, interpret=True).sum())(x)
    g2 = jax.grad(lambda v: _xla_block_reference(v, lw, lb, wqkv, bqkv, wo, bo,
                                                 regions, bias, 4, 1e-5, True).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("with_regions", [False, True])
def test_fused_window_block_weight_grads(with_regions):
    """dwqkv/dbias/dwo/dbo from the fused Pallas backward vs XLA reference."""
    x, lw, lb, wqkv, bqkv, wo, bo, bias, regions = _mk(8, 16, 32, 4, seed=6,
                                                       with_regions=with_regions)

    def run(fn):
        return jax.grad(
            lambda wq, bi, w_o: fn(wq, bi, w_o).sum(), argnums=(0, 1, 2)
        )(wqkv, bias, wo)

    g1 = run(lambda wq, bi, w_o: fused_window_block(
        x, lw, lb, wq, bqkv, w_o, bo, bi, regions, 4, interpret=True))
    g2 = run(lambda wq, bi, w_o: _xla_block_reference(
        x, lw, lb, wq, bqkv, w_o, bo, regions, bi, 4, 1e-5, True))
    for a, b, name in zip(g1, g2, ("dwqkv", "dbias", "dwo")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_swin_pad_after_ln_parity_nonzero_ln_bias():
    """HF pads the canvas AFTER layernorm_before; the fused kernels run LN
    inside and must re-zero pad tokens.  Catches the silent deviation that
    only shows with nonzero LN biases (any trained checkpoint) at
    window-non-divisible grids — fresh-init goldens have LN bias == 0."""
    import os

    import flax  # noqa: F401
    from lc2is_tpu.nn.swin import SwinModel

    cfg = dict(embed_dim=16, depths=(2, 2, 2, 2), num_heads=(1, 2, 4, 8),
               window=4, drop_path_rate=0.0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 60, 60), jnp.float32)
    m = SwinModel(attn_impl="xla", **cfg)
    params = dict(m.init(jax.random.PRNGKey(0), x))
    rs = np.random.RandomState(1)

    def perturb(tree, path=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                perturb(v, path + k + "/")
            elif k == "bias" and "layernorm_before" in path:
                tree[k] = jnp.asarray(rs.randn(*v.shape) * 0.5, v.dtype)

    perturb(params["params"] if "params" in params else params)
    out_x = m.apply(params, x)
    os.environ["LC2IS_PALLAS_INTERPRET"] = "1"
    try:
        out_p = SwinModel(attn_impl="auto", **cfg).apply(params, x)
    finally:
        os.environ.pop("LC2IS_PALLAS_INTERPRET", None)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("with_regions", [False, True])
def test_fused_window_block_pad_mask_grad(with_regions):
    """Pallas backward with a pad mask vs the XLA reference."""
    x, lw, lb, wqkv, bqkv, wo, bo, bias, regions = _mk(8, 16, 32, 4, seed=9,
                                                       with_regions=with_regions)
    lb = lb + 0.5  # nonzero LN bias so pad handling actually matters
    rs = np.random.RandomState(10)
    pad = jnp.asarray(rs.randint(0, 2, (8, 16)), jnp.int32)

    from lc2is_tpu.ops.window_attention import _xla_block_reference as xref

    g1 = jax.grad(lambda v: fused_window_block(
        v, lw, lb, wqkv, bqkv, wo, bo, bias, regions, 4,
        interpret=True, pad_mask=pad).sum())(x)
    g2 = jax.grad(lambda v: xref(
        v, lw, lb, wqkv, bqkv, wo, bo, regions, bias, 4, 1e-5, True,
        pad=pad).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_fused_window_block_grad_stage4_width():
    """C=768/24-head (swin-small stage 4) now takes the Pallas backward —
    grad parity at the real channel width, reduced window count."""
    x, lw, lb, wqkv, bqkv, wo, bo, bias, _ = _mk(2, 16, 768, 24, seed=11)
    g1 = jax.grad(lambda v: fused_window_block(v, lw, lb, wqkv, bqkv, wo, bo,
                                               bias, None, 24, interpret=True).sum())(x)
    g2 = jax.grad(lambda v: _xla_block_reference(v, lw, lb, wqkv, bqkv, wo, bo,
                                                 None, bias, 24, 1e-5, True).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-4)


def test_fused_window_block_quant_close():
    """int8 serving path (QKV/proj on the int8 MXU): bounded deviation from
    the f32 composition, regions + pad-mask exercised."""
    x, lw, lb, wqkv, bqkv, wo, bo, bias, regions = _mk(12, 49, 64, 4, seed=5,
                                                       with_regions=True)
    want = np.asarray(_xla_block_reference(x, lw, lb, wqkv, bqkv, wo, bo,
                                           regions, bias, 4, 1e-5, True))
    got = np.asarray(fused_window_block(x, lw, lb, wqkv, bqkv, wo, bo, bias,
                                        regions, 4, interpret=True, quant=True))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.05
