"""Window-attention custom VJP vs autodiff of the XLA reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import lc2is_tpu.ops.window_attention as wa


def test_grad_matches_reference(rng, monkeypatch):
    # force the pallas forward through interpret mode on CPU
    orig = wa._window_attention_fwd_impl
    monkeypatch.setattr(
        wa, "_window_attention_fwd_impl",
        lambda *a, **k: orig(*a[:-1], True) if False else orig(a[0], a[1], a[2], a[3], a[4], a[5], a[6], True),
    )
    p, heads, c = 16, 2, 32
    regions = wa.region_labels(2, 8, 8, 4, 2)
    n = regions.shape[0]
    q = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    k = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    v = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, p, p).astype(np.float32))

    def f_kernel(q, k, v, bias):
        return wa.window_attention(q, k, v, bias, regions, heads).sum()

    def f_ref(q, k, v, bias):
        return wa._xla_window_attention(q, k, v, bias, regions, heads).sum()

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 2e-5
