"""Fused window-attention kernel vs the XLA reference (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lc2is_tpu.ops.window_attention import (
    _np_region_labels,
    region_labels,
    window_attention,
)


def _xla_reference(q, k, v, bias, regions, num_heads):
    n, p, c = q.shape
    dh = c // num_heads

    def heads(t):
        return t.reshape(n, p, num_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    scale = 1.0 / np.sqrt(dh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale + bias[None]
    if regions is not None:
        neq = regions[:, None, :, None] != regions[:, None, None, :]
        logits = jnp.where(neq, -1e30, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(n, p, c)


@pytest.mark.parametrize("n,heads,c", [(8, 2, 32), (12, 3, 96)])
def test_kernel_matches_reference(rng, n, heads, c):
    p = 49
    q = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    k = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    v = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, p, p).astype(np.float32))
    out = window_attention(q, k, v, bias, None, heads, block_windows=4, interpret=True)
    ref = _xla_reference(q, k, v, bias, None, heads)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-5


def test_kernel_with_regions(rng):
    p = 16  # window 4
    labels = _np_region_labels(8, 8, 4, 2)  # (4 windows, 16)
    n = labels.shape[0] * 2  # batch 2
    regions = region_labels(2, 8, 8, 4, 2)
    heads, c = 2, 32
    q = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    k = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    v = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, p, p).astype(np.float32))
    out = window_attention(q, k, v, bias, regions, heads, block_windows=4, interpret=True)
    ref = _xla_reference(q, k, v, bias, regions, heads)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-5


def test_kernel_padding(rng):
    """N not divisible by block_windows: padded windows must not leak."""
    p, heads, c = 49, 2, 64
    n = 5
    q = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    k = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    v = jnp.asarray(rng.randn(n, p, c).astype(np.float32))
    bias = jnp.zeros((heads, p, p), jnp.float32)
    out = window_attention(q, k, v, bias, None, heads, block_windows=4, interpret=True)
    ref = _xla_reference(q, k, v, bias, None, heads)
    assert out.shape == (n, p, c)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-5


def test_region_labels_match_mask(rng):
    """Labels reproduce the dense mask semantics: neq <=> -100 entries."""
    from lc2is_tpu.nn.swin import _shift_attn_mask

    hp = wp = 12
    win, shift = 4, 2
    dense = np.asarray(_shift_attn_mask(hp, wp, win, shift))
    labels = _np_region_labels(hp, wp, win, shift)
    neq = labels[:, :, None] != labels[:, None, :]
    assert np.array_equal(neq, dense != 0)
