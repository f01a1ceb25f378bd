"""Int8 serving-path quantization tests (ops/quant.py) — interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc2is_tpu.ops.quant import fused_mlp_q, qdot, quant_act, quantize_weight


def test_quantize_weight_error_bound(rng):
    w = jnp.asarray((rng.randn(64, 128) * rng.uniform(0.1, 3.0, (64, 1))).astype(np.float32))
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * s.reshape(-1, 1)
    # symmetric round-to-nearest: error <= half a quantization step per row
    step = np.asarray(s.reshape(-1, 1))
    assert (np.abs(np.asarray(back - w)) <= 0.5 * step + 1e-8).all()


def test_quant_act_per_token(rng):
    h = jnp.asarray((rng.randn(32, 128) * rng.uniform(0.01, 10.0, (32, 1))).astype(np.float32))
    hi, s = quant_act(h)
    assert hi.dtype == jnp.int8 and s.shape == (32, 1)
    assert int(jnp.max(jnp.abs(hi.astype(jnp.int32)))) <= 127
    back = hi.astype(jnp.float32) * s
    assert (np.abs(np.asarray(back - h)) <= 0.5 * np.asarray(s) + 1e-8).all()


def test_qdot_close_to_f32(rng):
    h = jnp.asarray(rng.randn(64, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32) * 0.05)
    wq, ws = quantize_weight(w)
    got = np.asarray(qdot(h, wq, ws))
    want = np.asarray(h @ w.T)
    # int8×int8 with per-token/per-channel scales: ~1% relative of the row norm
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.02


@pytest.mark.parametrize("ln_position,act", [("pre", "gelu"), ("post", "relu")])
def test_fused_mlp_q_matches_f32(rng, ln_position, act):
    from lc2is_tpu.ops.fused_mlp import _xla_reference

    t, c, f = 200, 128, 256
    x = jnp.asarray(rng.randn(2, t // 2, c).astype(np.float32))
    ln_w = jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    w1 = jnp.asarray((rng.randn(f, c) * 0.08).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.randn(f).astype(np.float32))
    w2 = jnp.asarray((rng.randn(c, f) * 0.08).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))

    want = np.asarray(_xla_reference(x, ln_w, ln_b, w1, b1, w2, b2,
                                     act=act, pre=ln_position == "pre",
                                     residual=True, eps=1e-5))
    got = np.asarray(fused_mlp_q(x, ln_w, ln_b, w1, b1, w2, b2,
                                 activation=act, ln_position=ln_position,
                                 interpret=True))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.03, np.abs(got - want).max() / denom
