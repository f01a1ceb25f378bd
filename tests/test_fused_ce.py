"""Fused upsample+cross-entropy vs CE(resize(...)) — value and gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lc2is_tpu.nn.losses import cross_entropy
from lc2is_tpu.ops.fused_ce import upsampled_cross_entropy
from lc2is_tpu.ops.resize import resize


@pytest.mark.parametrize("b,k,h,w,r,ign", [
    (2, 7, 8, 8, 4, None),
    (1, 23, 8, 8, 4, 0),
    (2, 5, 8, 8, 2, None),
    (1, 9, 2, 2, 16, 0),
])
def test_fused_ce_matches_resize_ce(b, k, h, w, r, ign):
    rs = np.random.RandomState(b * k + h + r)
    x = jnp.asarray(rs.randn(b, k, h, w).astype(np.float32))
    y = jnp.asarray(rs.randint(0, k, size=(b, r * h, r * w)), jnp.int32)

    def ref(v):
        return cross_entropy(resize(v, scale_factor=r, method="bilinear"), y,
                             ignore_index=ign)

    def fused(v):
        return upsampled_cross_entropy(v, y, r, ignore_index=ign, interpret=True)

    np.testing.assert_allclose(float(fused(x)), float(ref(x)), rtol=1e-5, atol=1e-5)
    gr, gf = jax.grad(ref)(x), jax.grad(fused)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-6)


def test_fused_ce_r1_falls_back_to_plain_ce():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 5, 8, 8).astype(np.float32))
    y = jnp.asarray(rs.randint(0, 5, size=(2, 8, 8)), jnp.int32)
    np.testing.assert_allclose(
        float(upsampled_cross_entropy(x, y, 1)), float(cross_entropy(x, y)),
        rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
def test_return_score_map_training_equivalence(monkeypatch):
    """model(return_score_map) + fused CE == CE on the model's full outputs."""
    monkeypatch.setenv("LC2IS_PALLAS_INTERPRET", "1")
    from lc2is_tpu.models import zoo

    tiny = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window=4)
    names = tuple(f"c{i}" for i in range(7))
    kw = dict(class_names=names, swin_cfg=tiny, dec_dim=32, nhead=2)
    full = zoo.BaseCrossA(**kw)
    lowres = zoo.BaseCrossA(**kw, return_score_map=True)
    rs = np.random.RandomState(0)
    x = {"pixel_values": jnp.asarray(rs.randn(1, 3, 64, 64).astype(np.float32))}
    y = jnp.asarray(rs.randint(0, 7, size=(1, 64, 64)), jnp.int32)
    params = full.init(jax.random.PRNGKey(0), x)

    def loss_full(p):
        return cross_entropy(full.apply(p, x)["outputs"], y)

    def loss_fused(p):
        sm = lowres.apply(p, x)["outputs"]  # (1, 7, 16, 16)
        return upsampled_cross_entropy(sm, y, 4, interpret=True)

    np.testing.assert_allclose(float(loss_fused(params)), float(loss_full(params)),
                               rtol=1e-5, atol=1e-5)
    ga = jax.grad(loss_full)(params)
    gb = jax.grad(loss_fused)(params)
    for (ka, va), (kb, vb) in zip(jax.tree_util.tree_leaves_with_path(ga),
                                  jax.tree_util.tree_leaves_with_path(gb)):
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va), rtol=5e-3,
                                   atol=1e-6, err_msg=jax.tree_util.keystr(ka))
