"""Pallas channels-last upsample kernel vs the matrix path (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lc2is_tpu.ops.upsample import upsample_tokens, _xla_reference


@pytest.mark.parametrize("h,w,c,r", [(8, 8, 16, 2), (16, 8, 32, 2), (4, 4, 8, 4),
                                     (32, 32, 24, 2), (6, 6, 8, 2)])
def test_upsample_kernel_parity(h, w, c, r):
    rs = np.random.RandomState(h * w + c + r)
    x = jnp.asarray(rs.randn(2, h * w, c).astype(np.float32))
    got = np.asarray(upsample_tokens(x, (h, w), r, interpret=True))
    want = np.asarray(_xla_reference(x, (h, w), r))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_kernel_grad_is_linear_transpose():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 64, 8).astype(np.float32))
    g = jnp.asarray(rs.randn(1, 256, 8).astype(np.float32))
    _, vjp = jax.vjp(lambda v: upsample_tokens(v, (8, 8), 2, interpret=True), x)
    _, vjp_ref = jax.vjp(lambda v: _xla_reference(v, (8, 8), 2), x)
    np.testing.assert_allclose(np.asarray(vjp(g)[0]), np.asarray(vjp_ref(g)[0]),
                               rtol=1e-5, atol=1e-5)


def test_resize_tokens_routes_to_kernel(monkeypatch):
    monkeypatch.setenv("LC2IS_PALLAS_INTERPRET", "1")
    from lc2is_tpu.ops.resize import resize_tokens

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 64, 8).astype(np.float32))
    got = np.asarray(resize_tokens(x, (8, 8), scale_factor=2, method="bilinear"))
    want = np.asarray(_xla_reference(x, (8, 8), 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_argmax_matches_resize_argmax():
    import jax.numpy as jnp
    from lc2is_tpu.ops.resize import resize
    from lc2is_tpu.ops.upsample_argmax import upsample_argmax

    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(2, 151, 16, 16).astype(np.float32))
    got = np.asarray(upsample_argmax(x, r=4, interpret=True))
    want = np.asarray(jnp.argmax(resize(x, scale_factor=4, method="bilinear"), axis=1))
    assert (got == want).all()


def test_score_upsample_argmax_matches_unfused_chain():
    """The fully fused serving head (normalise + cosine scores + x4 bilinear
    + argmax in one kernel) equals the unfused chain _score_map -> resize ->
    argmax, including the score map's intermediate dtype rounding."""
    import jax.numpy as jnp
    from lc2is_tpu.models.zoo import _norm, _score_map
    from lc2is_tpu.ops.resize import resize
    from lc2is_tpu.ops.upsample_argmax import score_upsample_argmax

    rs = np.random.RandomState(11)
    for grid, k, c in ((16, 151, 64), (8, 7, 32)):
        v = jnp.asarray(rs.randn(2, grid * grid, c).astype(np.float32))
        t = jnp.asarray(rs.randn(2, k, c).astype(np.float32))
        got = np.asarray(score_upsample_argmax(v, _norm(t, axis=2), grid,
                                               r=4, interpret=True))
        want = np.asarray(jnp.argmax(
            resize(_score_map(v, t, grid), scale_factor=4, method="bilinear"),
            axis=1))
        assert (got == want).all(), (grid, k, c)


def test_score_upsample_argmax_batched_matmul_branch():
    """grid 128 takes the one-matmul-per-slab branch (w % 128 == 0) — the
    shape served at 512²; small c/k keep interpret mode fast."""
    import jax.numpy as jnp
    from lc2is_tpu.models.zoo import _norm, _score_map
    from lc2is_tpu.ops.resize import resize
    from lc2is_tpu.ops.upsample_argmax import score_upsample_argmax

    rs = np.random.RandomState(3)
    grid, k, c = 128, 5, 16
    v = jnp.asarray(rs.randn(1, grid * grid, c).astype(np.float32))
    t = jnp.asarray(rs.randn(1, k, c).astype(np.float32))
    got = np.asarray(score_upsample_argmax(v, _norm(t, axis=2), grid,
                                           r=4, interpret=True))
    want = np.asarray(jnp.argmax(
        resize(_score_map(v, t, grid), scale_factor=4, method="bilinear"),
        axis=1))
    assert (got == want).all()


@pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
def test_predict_masks_path(monkeypatch):
    """predict_masks=True returns int32 masks equal to argmax of the full map."""
    monkeypatch.setenv("LC2IS_PALLAS_INTERPRET", "1")
    import jax
    import jax.numpy as jnp
    from lc2is_tpu.models import zoo

    tiny = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window=4)
    names = tuple(f"c{i}" for i in range(7))
    kw = dict(class_names=names, swin_cfg=tiny, dec_dim=32, nhead=2)
    m_map = zoo.BaseCrossA(**kw)
    m_mask = zoo.BaseCrossA(**kw, predict_masks=True)
    rs = np.random.RandomState(0)
    x = {"pixel_values": jnp.asarray(rs.randn(1, 3, 64, 64).astype(np.float32))}
    params = m_map.init(jax.random.PRNGKey(0), x)
    full = m_map.apply(params, x)["outputs"]
    masks = m_mask.apply(params, x)["outputs"]
    assert masks.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(jnp.argmax(full, axis=1)))


def test_upsample_adjoint_kernel_matches_xla_vjp():
    from lc2is_tpu.ops.upsample import upsample_tokens, _xla_reference

    rs = np.random.RandomState(3)
    for (h, w, c) in ((8, 8, 16), (6, 10, 8)):
        x = jnp.asarray(rs.randn(2, h * w, c).astype(np.float32))
        g = jnp.asarray(rs.randn(2, 4 * h * w, c).astype(np.float32))
        _, vjp_p = jax.vjp(lambda v: upsample_tokens(v, (h, w), 2, interpret=True), x)
        _, vjp_r = jax.vjp(lambda v: _xla_reference(v, (h, w), 2), x)
        np.testing.assert_allclose(np.asarray(vjp_p(g)[0]), np.asarray(vjp_r(g)[0]),
                                   rtol=1e-5, atol=1e-5)
