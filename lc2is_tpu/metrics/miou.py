"""Segmentation metrics: per-image present-class mIoU, reference-exact,
plus an on-device confusion-matrix accumulator with psum for multi-chip eval.

Reference semantics (``metrics.py:45-102``, SURVEY.md §9 item 1):
- logits bicubic-upsampled ×4 (label path, ``metrics.py:89``) or to the
  original size (GT path, ``metrics.py:67``); labels nearest-upsampled ×4;
- softmax → argmax (softmax is monotonic per-pixel so argmax is unchanged —
  kept for documentation, skipped in compute);
- per image: JaccardIndex(num_classes, average="none") then mean over ONLY
  the classes present in that image's label, excluding ignore_index=0;
- final mean over images (NOT a dataset-level confusion matrix).

TPU-first: each image's (K,K) confusion matrix comes from one bincount-style
scatter-add over pred*K+label; everything is jit-able with static shapes, and
``psum_confusion`` reduces per-chip matrices over the data axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lc2is_tpu.ops.resize import resize


def confusion_matrix(pred: jnp.ndarray, label: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(...,) int preds/labels -> (K, K) confusion counts [pred, label]."""
    idx = pred.reshape(-1) * num_classes + label.reshape(-1)
    flat = jnp.zeros((num_classes * num_classes,), dtype=jnp.int32)
    flat = flat.at[idx].add(1)
    return flat.reshape(num_classes, num_classes)


def iou_from_confusion(cm: jnp.ndarray) -> jnp.ndarray:
    """Per-class IoU; absent classes (union 0) get 0 (torchmetrics
    ``absent_score`` default)."""
    inter = jnp.diagonal(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)


def per_image_miou(
    logits: jnp.ndarray,  # (B, K, h, w)
    labels: jnp.ndarray,  # (B, H, W) int
    num_classes: int = 151,
    ignore_index: Optional[int] = 0,
    upsample_logits_to_label: bool = True,
    reduce: bool = True,
) -> jnp.ndarray:
    """Vectorised reference ``compute_mIOU``: mean over images of the mean
    IoU over classes present in each image's (4x-nearest-upsampled) label.
    ``reduce=False`` returns the per-image values (B,) instead of their mean
    (the DP sliding eval psums sums/counts across chips before dividing)."""
    k = logits.shape[1]
    if upsample_logits_to_label:
        logits = resize(logits, scale_factor=4, method="bicubic")
        labels = resize(labels[:, None].astype(jnp.float32), scale_factor=4,
                        method="nearest")[:, 0].astype(labels.dtype)
    pred = jnp.argmax(logits, axis=1)

    def one(p, l):
        cm = confusion_matrix(p, l, num_classes)
        iou = iou_from_confusion(cm)
        present = cm.sum(0) > 0  # classes in the label
        if ignore_index is not None:
            present = present & (jnp.arange(num_classes) != ignore_index)
        n = jnp.maximum(present.sum(), 1)
        return jnp.where(present, iou, 0.0).sum() / n

    vals = jax.vmap(one)(pred, labels)
    return vals.mean() if reduce else vals


def pixel_accuracy(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: Optional[int] = 0
) -> jnp.ndarray:
    pred = jnp.argmax(logits, axis=1)
    if labels.shape[-2:] != pred.shape[-2:]:
        labels = resize(labels[:, None].astype(jnp.float32), size=pred.shape[-2:],
                        method="nearest")[:, 0].astype(labels.dtype)
    correct = pred == labels
    if ignore_index is None:
        return correct.mean()
    valid = labels != ignore_index
    return jnp.where(valid, correct, False).sum() / jnp.maximum(valid.sum(), 1)


def batch_confusion(
    logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int = 151
) -> jnp.ndarray:
    """Dataset-level (K,K) confusion accumulator (the TPU-native metric path:
    accumulate on device across steps, psum across chips, finalize on host)."""
    pred = jnp.argmax(logits, axis=1)
    if labels.shape[-2:] != pred.shape[-2:]:
        labels = resize(labels[:, None].astype(jnp.float32), size=pred.shape[-2:],
                        method="nearest")[:, 0].astype(labels.dtype)
    return confusion_matrix(pred, labels, num_classes)


def psum_confusion(cm: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """Cross-chip reduction of the confusion accumulator (BASELINE north
    star: on-device psum'd mIoU)."""
    return jax.lax.psum(cm, axis_name)


def dataset_miou(cm: jnp.ndarray, ignore_index: Optional[int] = 0) -> jnp.ndarray:
    iou = iou_from_confusion(cm)
    present = (cm.sum(0) + cm.sum(1)) > 0
    if ignore_index is not None:
        present = present & (jnp.arange(cm.shape[0]) != ignore_index)
    return jnp.where(present, iou, 0.0).sum() / jnp.maximum(present.sum(), 1)
