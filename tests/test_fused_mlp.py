"""Fused LN+MLP kernel vs the unfused module composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lc2is_tpu.ops.fused_mlp import fused_mlp, _xla_reference


def _make(t, c, f, dtype, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(2, t, c), dtype)
    ln_w = jnp.asarray(1.0 + 0.1 * r.randn(c), jnp.float32)
    ln_b = jnp.asarray(0.1 * r.randn(c), jnp.float32)
    w1 = jnp.asarray(r.randn(f, c) / np.sqrt(c), jnp.float32)
    b1 = jnp.asarray(0.1 * r.randn(f), jnp.float32)
    w2 = jnp.asarray(r.randn(c, f) / np.sqrt(f), jnp.float32)
    b2 = jnp.asarray(0.1 * r.randn(c), jnp.float32)
    return x, ln_w, ln_b, w1, b1, w2, b2


@pytest.mark.parametrize("pre,act", [(True, "gelu"), (False, "relu")])
def test_fused_mlp_parity_f32(pre, act):
    args = _make(49, 96, 384, jnp.float32)
    pos = "pre" if pre else "post"
    got = fused_mlp(*args, activation=act, ln_position=pos, interpret=True,
                    block_tokens=64)
    want = _xla_reference(*args, act=act, pre=pre, residual=True, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_mlp_parity_bf16():
    args = _make(100, 128, 512, jnp.bfloat16, seed=1)
    got = fused_mlp(*args, activation="gelu", ln_position="pre", interpret=True)
    want = _xla_reference(*args, act="gelu", pre=True, residual=True, eps=1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=0.05, atol=0.05
    )


def test_fused_mlp_no_residual():
    args = _make(32, 64, 256, jnp.float32, seed=2)
    got = fused_mlp(*args, activation="relu", ln_position="post", residual=False,
                    interpret=True)
    want = _xla_reference(*args, act="relu", pre=False, residual=False, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_mlp_grad_matches_reference():
    args = _make(40, 64, 256, jnp.float32, seed=3)

    def loss_fused(x, *w):
        return fused_mlp(x, *w, activation="gelu", ln_position="pre",
                         interpret=True).sum()

    def loss_ref(x, *w):
        return _xla_reference(x, *w, act="gelu", pre=True, residual=True,
                              eps=1e-5).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 3, 5))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 3, 5))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_gelu_poly_matches_exact():
    """Fast-gelu routing policy: AUTO (default) picks the division-free
    polynomial for bf16 compute (its 4.1e-4 error is under bf16 rounding)
    and the 2e-5-tight rational erf for f32; LC2IS_FAST_GELU=1/0 forces
    poly/exact regardless of dtype.  Pinned accuracy bound 5e-4 abs."""
    from lc2is_tpu.ops.fused_mlp import _act_fn, _gelu_exact_f32, _gelu_poly_f32

    x = jnp.asarray(np.linspace(-12.0, 12.0, 200001), jnp.float32)
    err = np.abs(np.asarray(_gelu_poly_f32(x)) - np.asarray(_gelu_exact_f32(x)))
    assert err.max() < 5e-4

    import os

    os.environ["LC2IS_FAST_GELU"] = "1"
    try:
        assert _act_fn("gelu") is _gelu_poly_f32
        assert _act_fn("gelu", jnp.float32) is _gelu_poly_f32
    finally:
        del os.environ["LC2IS_FAST_GELU"]
    # auto: dtype decides
    assert _act_fn("gelu") is _gelu_exact_f32
    assert _act_fn("gelu", jnp.float32) is _gelu_exact_f32
    assert _act_fn("gelu", jnp.bfloat16) is _gelu_poly_f32
    os.environ["LC2IS_FAST_GELU"] = "0"
    try:
        assert _act_fn("gelu", jnp.bfloat16) is _gelu_exact_f32
    finally:
        del os.environ["LC2IS_FAST_GELU"]


def test_fused_mlp_fast_gelu_kernel_parity():
    """The kernel under LC2IS_FAST_GELU stays within the poly's error bound
    of the exact-gelu XLA composition (loose 2e-3 — includes amplification
    through W2)."""
    import os

    args = _make(49, 96, 384, jnp.float32, seed=2)
    os.environ["LC2IS_FAST_GELU"] = "1"
    try:
        got = fused_mlp(*args, activation="gelu", ln_position="pre",
                        interpret=True, block_tokens=64)
    finally:
        del os.environ["LC2IS_FAST_GELU"]
    want = _xla_reference(*args, act="gelu", pre=True, residual=True, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
