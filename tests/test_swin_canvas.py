"""Canvas-direct swin kernel vs the windowed HF-semantics reference.

The offset-window construction must be numerically identical to HF's
pad → roll → partition → 9-region-mask pipeline for every (H, W, shift)
combination — including non-window-divisible canvases and nonzero LN biases
(the pad-after-LN subtlety)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lc2is_tpu.ops.swin_canvas import _xla_canvas_reference, swin_canvas_block


def _mk(b, h, w, c, heads, win, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    lw = jnp.asarray(1 + 0.1 * rs.randn(c), jnp.float32)
    lb = jnp.asarray(0.5 * rs.randn(c), jnp.float32)  # nonzero: pad-after-LN
    wqkv = jnp.asarray(rs.randn(3 * c, c).astype(np.float32) / np.sqrt(c))
    bqkv = jnp.asarray(0.1 * rs.randn(3 * c).astype(np.float32))
    wo = jnp.asarray(rs.randn(c, c).astype(np.float32) / np.sqrt(c))
    bo = jnp.asarray(0.1 * rs.randn(c).astype(np.float32))
    bias = jnp.asarray(rs.randn(heads, win * win, win * win).astype(np.float32) * 0.1)
    return x, lw, lb, wqkv, bqkv, wo, bo, bias


CASES = [
    # (H, W, C, heads, win, shift)
    (18, 18, 32, 2, 7, 0),    # non-divisible, unshifted (HF pad keys)
    (18, 18, 32, 2, 7, 3),    # non-divisible, shifted (offset windows + wrap)
    (14, 14, 32, 4, 7, 3),    # divisible, shifted
    (14, 21, 16, 2, 7, 0),    # rectangular
    (16, 16, 64, 4, 7, 3),    # stage-4-like grid
    (12, 12, 32, 2, 4, 2),    # window 4 (tiny test cfg)
]


@pytest.mark.parametrize("h,w,c,heads,win,shift", CASES)
def test_canvas_kernel_parity(h, w, c, heads, win, shift):
    x, lw, lb, wqkv, bqkv, wo, bo, bias = _mk(2, h, w, c, heads, win)
    got = swin_canvas_block(x, lw, lb, wqkv, bqkv, wo, bo, bias, heads,
                            win, shift, interpret=True)
    want = _xla_canvas_reference(x, lw, lb, wqkv, bqkv, wo, bo, bias, heads,
                                 win, shift, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bwd", ["pallas", "windowed"])
@pytest.mark.parametrize("shift", [0, 3])
def test_canvas_kernel_grad(shift, bwd, monkeypatch):
    """Canvas VJP (Pallas canvas-direct backward, and the windowed
    reconstruction fallback) vs direct autodiff of the XLA reference —
    EVERY gradient: x, LN, packed qkv, out-proj, relative-position bias.
    A tiny IPG budget forces 2 grid steps so the cross-step f32 weight-grad
    accumulation (init at step 0) is exercised."""
    monkeypatch.setenv("LC2IS_CANVAS_BWD", bwd)
    monkeypatch.setenv("LC2IS_CANVAS_IPG_MB", "1")
    args = _mk(2, 18, 18, 32, 2, 7, seed=3)

    def weigh(out):  # non-uniform cotangent: catches transposed grads
        w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape) * 1e-3
        return (out * w).sum()

    g1 = jax.grad(lambda *a: weigh(swin_canvas_block(
        *a, 2, 7, shift, interpret=True)), argnums=tuple(range(8)))(*args)
    g2 = jax.grad(lambda *a: weigh(_xla_canvas_reference(
        *a, 2, 7, shift, 1e-5)), argnums=tuple(range(8)))(*args)
    for got, want in zip(g1, g2):
        w = np.asarray(want)
        # atol scales with the grad magnitude (the indexed cotangent makes
        # weight grads O(1e3); a fixed 2e-4 atol is below f32 noise there)
        np.testing.assert_allclose(np.asarray(got), w, rtol=2e-4,
                                   atol=2e-4 * max(1.0, float(np.abs(w).max())))


def test_canvas_kernel_grad_noresidual():
    """Drop-path training shape: residual=False branch-only output."""
    import os

    os.environ["LC2IS_CANVAS_BWD"] = "pallas"
    try:
        args = _mk(1, 14, 14, 32, 2, 7, seed=5)
        g1 = jax.grad(lambda v: swin_canvas_block(
            v, *args[1:], 2, 7, 3, interpret=True, residual=False).sum())(args[0])
        ref = jax.grad(lambda v: (_xla_canvas_reference(
            v, *args[1:], 2, 7, 3, 1e-5) - v).sum())(args[0])
        np.testing.assert_allclose(np.asarray(g1), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
    finally:
        os.environ.pop("LC2IS_CANVAS_BWD", None)


def test_canvas_matches_hf_swin_layer():
    """End-to-end: the canvas kernel slotted into SwinBlock must reproduce
    the attn_impl='xla' SwinBlock (HF semantics) output."""
    import os

    from lc2is_tpu.nn.swin import SwinModel

    cfg = dict(embed_dim=16, depths=(2, 2), num_heads=(2, 4), window=4,
               drop_path_rate=0.0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 44, 44), jnp.float32)
    m = SwinModel(attn_impl="xla", **cfg)
    params = m.init(jax.random.PRNGKey(0), x)
    out_x = m.apply(params, x)
    os.environ["LC2IS_PALLAS_INTERPRET"] = "1"
    os.environ["LC2IS_SWIN_CANVAS"] = "1"
    try:
        out_p = SwinModel(attn_impl="auto", **cfg).apply(params, x)
    finally:
        os.environ.pop("LC2IS_PALLAS_INTERPRET", None)
        os.environ.pop("LC2IS_SWIN_CANVAS", None)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("shift", [0, 3])
def test_canvas_kernel_bf16_lean_ln(shift):
    """bf16 compute takes the lean-LN branch (stats in f32, normalise/affine
    in bf16, no f32 canvas) — parity vs the bf16 XLA reference within bf16
    rounding.  The f32 branch is pinned bit-tight by test_canvas_kernel_parity;
    this pins the branch the serving pipeline actually runs."""
    x, lw, lb, wqkv, bqkv, wo, bo, bias = _mk(2, 18, 18, 32, 2, 7)
    xb = x.astype(jnp.bfloat16)
    args = (lw, lb, wqkv, bqkv, wo, bo, bias)
    got = swin_canvas_block(xb, *args, 2, 7, shift, interpret=True)
    want = _xla_canvas_reference(xb, *args, 2, 7, shift, 1e-5)
    g = np.asarray(got, np.float32)
    wv = np.asarray(want, np.float32)
    # bf16 noise on O(1) activations: |x| up to ~6 after residual; 3 bf16
    # roundings in the lean path vs 1 in the reference's f32-accum chain
    np.testing.assert_allclose(g, wv, rtol=0, atol=0.12)
    assert np.abs(g - wv).mean() < 0.02
