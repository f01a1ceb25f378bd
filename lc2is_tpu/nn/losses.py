"""Losses with torch-CE semantics (``model/loss.py``, ``engine.py``)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lc2is_tpu.ops.resize import resize


def cross_entropy(
    logits: jnp.ndarray,  # (B, K, *spatial) — torch layout, classes at dim 1
    target: jnp.ndarray,  # (B, *spatial) int
    ignore_index: Optional[int] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """torch ``nn.CrossEntropyLoss`` (mean reduction): softmax over dim 1,
    NLL of the target class, averaged over non-ignored elements."""
    k = logits.shape[1]
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=1)
    tgt = jnp.clip(target, 0, k - 1)
    picked = jnp.take_along_axis(logits.astype(jnp.float32), tgt[:, None], axis=1)[:, 0]
    nll = lse - picked
    if label_smoothing > 0.0:
        smooth = lse - logits.astype(jnp.float32).mean(axis=1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    if ignore_index is None:
        return nll.mean()
    valid = target != ignore_index
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, nll, 0.0).sum() / denom


def auxiliary_loss(
    low_score_map: jnp.ndarray,  # (B, K, h, w)
    target: jnp.ndarray,  # (B, H, W)
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    """``AuxiliaryLoss`` (``model/loss.py:12-21``): bilinear-resize logits to
    the label's H (square, as the reference does ``size=H``), then CE.
    The 0.4 weight is applied by the engine (``engine.py:86,98``), not here."""
    h = target.shape[-2]
    up = resize(low_score_map, size=(h, h), method="bilinear")
    return cross_entropy(up, target, ignore_index=ignore_index)


def npair_loss(x: jnp.ndarray, x_pos: jnp.ndarray, x_neg: jnp.ndarray, reduce_mean: bool = True):
    """``NPairLoss`` (``model/loss.py:23-37``): pos/(pos+sum(neg)) ratio."""
    pos = x @ x_pos.T
    neg = (x @ x_neg.T).sum(-1, keepdims=True)
    res = (pos / (pos + neg)).sum(-1)
    return res.mean() if reduce_mean else res


def contrastive_loss(
    outputs: jnp.ndarray,  # (B, P, K) patch-class logits
    labels: jnp.ndarray,  # (B, H, W) with H*W == P
    num_classes: int = 151,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``ContrastiveLoss`` (``model/loss.py:39-64``): bidirectional CE over
    the patch-text logit matrix; returns (mean, visual, textual).

    The reference's textual branch feeds (B,H,W,C) logits with (B,H,W,K)
    one-hot targets into torch CE, which only type-checks when H == K — a
    latent bug in an engine-unused loss.  We implement the documented intent:
    visual = CE over classes per pixel; textual = CE with the one-hot class
    distribution as soft target (identical pixel grouping, num_classes=151
    hardcoded as at ``model/loss.py:55``)."""
    b, p, k = outputs.shape
    h = int(round(p ** 0.5))
    logits = outputs.reshape(b, h, h, k).transpose(0, 3, 1, 2)  # (B, K, H, W)
    loss_visual = cross_entropy(logits, labels)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # (B,H,W,K)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    loss_textual = -(onehot.transpose(0, 3, 1, 2) * logp).sum(axis=1).mean()
    return (loss_textual + loss_visual) / 2.0, loss_visual, loss_textual
