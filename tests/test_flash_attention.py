"""Flash-attention kernel vs the XLA einsum reference (interpret mode on
CPU; the same kernel compiles natively on TPU — exercised by bench/verify)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lc2is_tpu.ops import flash_attention as fa


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


@pytest.mark.parametrize("lq,lk", [(128, 128), (256, 64), (100, 77), (384, 130)])
def test_matches_reference(rng, lq, lk):
    q = _rand(rng, 2, 4, lq, 64)
    k = _rand(rng, 2, 4, lk, 64)
    v = _rand(rng, 2, 4, lk, 64)
    ref = fa._reference(q, k, v, None)
    out = fa._flash_forward(q, k, v, None, block_q=128, block_k=128, interpret=True)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-5


def test_key_padding_mask(rng):
    q = _rand(rng, 2, 2, 64, 64)
    k = _rand(rng, 2, 2, 70, 64)
    v = _rand(rng, 2, 2, 70, 64)
    mask = np.zeros((2, 70), dtype=bool)
    mask[0, 50:] = True
    mask[1, 10:] = True
    ref = fa._reference(q, k, v, jnp.asarray(mask))
    out = fa._flash_forward(q, k, v, jnp.asarray(mask), block_q=64, block_k=64, interpret=True)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-5


def test_bf16(rng):
    q = _rand(rng, 1, 2, 128, 64).astype(jnp.bfloat16)
    k = _rand(rng, 1, 2, 128, 64).astype(jnp.bfloat16)
    v = _rand(rng, 1, 2, 128, 64).astype(jnp.bfloat16)
    ref = fa._reference(q, k, v, None)
    out = fa._flash_forward(q, k, v, None, block_q=128, block_k=128, interpret=True)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    assert d < 0.02
    assert out.dtype == jnp.bfloat16


def test_grad_flows(rng):
    """custom_vjp backward (recompute path) matches the reference grad."""
    q = _rand(rng, 1, 2, 64, 64)
    k = _rand(rng, 1, 2, 64, 64)
    v = _rand(rng, 1, 2, 64, 64)

    def f_ref(q, k, v):
        return fa._reference(q, k, v, None).sum()

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)

    # interpret-mode flash fwd inside grad
    import functools
    def f_flash(q, k, v):
        out = fa._flash_forward(q, k, v, None, interpret=True)
        return out.sum()

    # exercise the public custom_vjp path on CPU via interpret monkeypatch
    orig = fa._flash_forward
    fa_interp = functools.partial(orig, interpret=True)
    try:
        fa._flash_forward = fa_interp
        g = jax.grad(lambda a, b, c: fa.flash_attention(a, b, c).sum(), argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._flash_forward = orig
    for a, b in zip(g, g_ref):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 2e-5


@pytest.mark.parametrize("lq,lk,mask_frac", [(256, 256, None), (100, 77, None),
                                             (128, 130, 0.3), (384, 64, None)])
def test_pallas_backward_parity(rng, lq, lk, mask_frac):
    """Fused Pallas backward (dQ + dK/dV kernels, saved-LSE recompute) vs the
    XLA reference grads, incl. ragged shapes and key-padding masks."""
    q = _rand(rng, 2, 2, lq, 64)
    k = _rand(rng, 2, 2, lk, 64)
    v = _rand(rng, 2, 2, lk, 64)
    mask = None
    if mask_frac is not None:
        m = np.zeros((2, lk), dtype=bool)
        m[:, int(lk * (1 - mask_frac)):] = True
        mask = jnp.asarray(m)
    g = _rand(rng, 2, 2, lq, 64)

    out, lse = fa._flash_forward(q, k, v, mask, block_q=128, block_k=128,
                                 with_stats=True, interpret=True)
    dq, dk, dv = fa._flash_backward(q, k, v, mask, out, lse, g,
                                    block_q=128, block_k=128, interpret=True)

    _, vjp = jax.vjp(lambda a, b, c: fa._reference(a, b, c, mask), q, k, v)
    rq, rk, rv = vjp(g)
    for got, want, name in ((dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_pallas_backward_bf16(rng):
    q = _rand(rng, 1, 2, 256, 64).astype(jnp.bfloat16)
    k = _rand(rng, 1, 2, 128, 64).astype(jnp.bfloat16)
    v = _rand(rng, 1, 2, 128, 64).astype(jnp.bfloat16)
    g = _rand(rng, 1, 2, 256, 64).astype(jnp.bfloat16)
    out, lse = fa._flash_forward(q, k, v, None, block_q=128, block_k=128,
                                 with_stats=True, interpret=True)
    dq, dk, dv = fa._flash_backward(q, k, v, None, out, lse, g,
                                    block_q=128, block_k=128, interpret=True)
    _, vjp = jax.vjp(lambda a, b, c: fa._reference(a, b, c, None), q, k, v)
    ref = vjp(g)
    for got, want in zip((dq, dk, dv), ref):
        d = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
        scale = np.abs(np.asarray(want, np.float32)).max()
        assert d.max() < 0.05 * max(scale, 1.0)
