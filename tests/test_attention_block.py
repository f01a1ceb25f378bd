"""Direct kernel tests for ops/attention_block.py, including the big-L
Pallas backward enabled for the decoder's SR self-attention (L·C·12 up to
40 MB — previously XLA-recompute, which materialised (B,H,P,L) f32 logits)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc2is_tpu.ops.attention_block import _xla_reference, fused_attn_block

HEADS = 4


def _mk(b, p, l, c, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(b, p, c).astype(np.float32) * 0.5)
    k = jnp.asarray(r.randn(b, l, c).astype(np.float32) * 0.5)
    v = jnp.asarray(r.randn(b, l, c).astype(np.float32) * 0.5)
    wq = jnp.asarray(r.randn(c, c).astype(np.float32) * 0.05)
    bq = jnp.asarray(r.randn(c).astype(np.float32) * 0.02)
    wo = jnp.asarray(r.randn(c, c).astype(np.float32) * 0.05)
    bo = jnp.asarray(r.randn(c).astype(np.float32) * 0.02)
    lw = jnp.asarray(1.0 + 0.1 * r.randn(c).astype(np.float32))
    lb = jnp.asarray(0.1 * r.randn(c).astype(np.float32))
    return x, k, v, wq, bq, wo, bo, lw, lb


@pytest.mark.parametrize("l", [151, 1024])
def test_fused_attn_block_fwd_parity(l):
    args = _mk(2, 256, l, 128)
    want = _xla_reference(*args, HEADS, 1e-5, True)
    got = fused_attn_block(*args, HEADS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_attn_block_grad_big_l():
    """L·C·12 = 12 MB — above the old 8 MB gate, inside the new 40 MB one:
    the Pallas backward (f32 dk/dv accumulators) must match the XLA vjp."""
    args = _mk(1, 256, 4096, 256, seed=1)

    def loss_fused(*a):
        return (fused_attn_block(*a, HEADS, interpret=True) ** 2).sum()

    def loss_xla(*a):
        return (_xla_reference(*a, HEADS, 1e-5, True) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    gx = jax.grad(loss_xla, argnums=tuple(range(9)))(*args)
    names = ["x", "k", "v", "wq", "bq", "wo", "bo", "ln_w", "ln_b"]
    for n, a, b in zip(names, gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                                   err_msg=n)


def test_fused_attn_block_quant_close():
    """int8 serving path: bounded deviation from the f32 block."""
    args = _mk(2, 256, 151, 128, seed=2)
    want = np.asarray(_xla_reference(*args, HEADS, 1e-5, True))
    got = np.asarray(fused_attn_block(*args, HEADS, interpret=True, quant=True))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.05
