"""Loss parity vs torch (CE semantics incl. ignore_index; auxiliary resize)."""

import numpy as np
import pytest
import jax.numpy as jnp

from lc2is_tpu.nn.losses import auxiliary_loss, contrastive_loss, cross_entropy, npair_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(2, 7, 8, 8).astype(np.float32)
    labels = rng.randint(0, 7, size=(2, 8, 8)).astype(np.int64)
    mine = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(TF.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels)))
    assert abs(mine - ref) < 1e-5


def test_cross_entropy_ignore_index(rng):
    logits = rng.randn(2, 7, 8, 8).astype(np.float32)
    labels = rng.randint(0, 7, size=(2, 8, 8)).astype(np.int64)
    labels[:, :4] = 0
    mine = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ignore_index=0))
    ref = float(TF.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels), ignore_index=0))
    assert abs(mine - ref) < 1e-5


def test_cross_entropy_label_smoothing(rng):
    logits = rng.randn(3, 5).astype(np.float32)[:, :, None, None]
    labels = rng.randint(0, 5, size=(3,)).astype(np.int64)[:, None, None]
    mine = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), label_smoothing=0.1))
    ref = float(TF.cross_entropy(torch.from_numpy(logits[:, :, 0, 0]),
                                 torch.from_numpy(labels[:, 0, 0]), label_smoothing=0.1))
    assert abs(mine - ref) < 1e-5


def test_auxiliary_loss_matches_torch(rng):
    """AuxiliaryLoss (loss.py:12-21): bilinear resize logits to label H, CE."""
    low = rng.randn(2, 7, 8, 8).astype(np.float32)
    labels = rng.randint(0, 7, size=(2, 32, 32)).astype(np.int64)
    mine = float(auxiliary_loss(jnp.asarray(low), jnp.asarray(labels)))
    up = TF.interpolate(torch.from_numpy(low), size=32, mode="bilinear")
    ref = float(TF.cross_entropy(up, torch.from_numpy(labels)))
    assert abs(mine - ref) < 1e-5


def test_npair_loss_matches_torch():
    rng = np.random.RandomState(42)  # local: ratio loss is tolerance-sensitive
    x = rng.randn(4, 16).astype(np.float32)
    pos = rng.randn(4, 16).astype(np.float32)
    neg = rng.randn(5, 16).astype(np.float32)
    mine = float(npair_loss(jnp.asarray(x), jnp.asarray(pos), jnp.asarray(neg)))
    tp = torch.from_numpy(x) @ torch.from_numpy(pos).T
    tn = (torch.from_numpy(x) @ torch.from_numpy(neg).T).sum(-1, keepdim=True)
    ref = float(((tp / (tp + tn)).sum(-1)).mean())
    assert abs(mine - ref) < 1e-4 * max(abs(ref), 1.0)


def test_contrastive_loss_runs(rng):
    out = rng.randn(2, 16, 151).astype(np.float32)
    labels = rng.randint(0, 151, size=(2, 4, 4)).astype(np.int64)
    mean, vis, txt = contrastive_loss(jnp.asarray(out), jnp.asarray(labels))
    assert np.isfinite(float(mean)) and np.isfinite(float(vis)) and np.isfinite(float(txt))
    assert float(mean) == pytest.approx((float(vis) + float(txt)) / 2, rel=1e-6)
