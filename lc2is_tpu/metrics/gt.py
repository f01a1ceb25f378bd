"""Ground-truth-resolution mIoU (``compute_gt_mIOU``, ``metrics.py:61-79``):
per-image bicubic resize of the logits to each image's ORIGINAL size, then
present-class mIoU.

Original sizes are dynamic — the anti-pattern for one jit graph (SURVEY.md
§7 hard-part 6).  Two strategies, both reference-exact:

- default: group images by exact size, one jitted (resize + confusion)
  computation per distinct size — ADE20K-val has a few hundred distinct
  sizes, and the grouped kernel amortises compilation across same-size
  images;
- ``bucket=N``: one compile per *bucket canvas* (sizes rounded up to
  multiples of N).  The resize weight matrix is built from the TRACED true
  target size on a static canvas (rows past the true size are zero) and the
  GT is padded with a sentinel class that is dropped from the confusion
  matrix, so the per-image IoU is bit-identical to the exact path while the
  compile count is bounded by the number of canvases."""

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


def _dynamic_resize_matrix(in_size: int, canvas: int, out_size, method: str):
    """[canvas, in] bicubic/bilinear weight matrix for a TRACED target size.

    Same half-pixel exact-integer coordinate math as
    ``ops.resize._src_coords_exact`` but with ``out_size`` a traced int32
    scalar; rows >= out_size are zeroed.  Lets one compiled graph serve every
    true size that fits the static canvas."""
    i = jnp.arange(canvas, dtype=jnp.int32)
    num = (2 * i + 1) * in_size - out_size  # src = num / (2*out)
    den = 2 * out_size
    i0 = jnp.where(num >= 0, num // den, -((-num + den - 1) // den))
    frac = (num - i0 * den).astype(jnp.float32) / den
    i0 = i0.astype(jnp.float32)
    cols = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    if method == "bilinear":
        taps = ((i0, 1.0 - frac), (i0 + 1.0, frac))
    elif method == "bicubic":
        def cubic(x, a=-0.75):
            ax = jnp.abs(x)
            return jnp.where(
                ax <= 1.0, (a + 2.0) * ax ** 3 - (a + 3.0) * ax ** 2 + 1.0,
                jnp.where(ax < 2.0, a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a, 0.0),
            )

        taps = tuple((i0 + k, cubic(k - frac)) for k in range(-1, 3))
    else:
        raise ValueError(method)
    W = jnp.zeros((canvas, in_size), dtype=jnp.float32)
    for tap, wt in taps:
        idx = jnp.clip(tap, 0.0, in_size - 1.0)
        W = W + (cols == idx[:, None]) * wt[:, None]
    return W * (i < out_size)[:, None]


@functools.partial(jax.jit, static_argnames=("canvas", "num_classes", "ignore_index"))
def _gt_miou_bucketed(
    logits: jnp.ndarray,  # (N, K, h, w)
    gts: jnp.ndarray,  # (N, Hc, Wc) padded with sentinel num_classes
    hws: jnp.ndarray,  # (N, 2) true sizes
    canvas: Tuple[int, int],
    num_classes: int,
    ignore_index: Optional[int],
) -> jnp.ndarray:
    ch, cw = canvas

    def one(lg, gt, hw):
        wh = _dynamic_resize_matrix(lg.shape[-2], ch, hw[0], "bicubic")
        ww = _dynamic_resize_matrix(lg.shape[-1], cw, hw[1], "bicubic")
        up = jnp.einsum("oh,khw->kow", wh, lg.astype(jnp.float32), precision="highest")
        up = jnp.einsum("pw,kow->kop", ww, up, precision="highest")
        pred = jnp.argmax(up, axis=0)
        # sentinel class num_classes marks padding; its row+column are
        # dropped, so padded pixels vanish from every class's inter/union
        cm = confusion_matrix(pred, gt, num_classes + 1)[:num_classes, :num_classes]
        iou = iou_from_confusion(cm)
        present = cm.sum(0) > 0
        if ignore_index is not None:
            present = present & (jnp.arange(num_classes) != ignore_index)
        return jnp.where(present, iou, 0.0).sum() / jnp.maximum(present.sum(), 1)

    return jax.vmap(one)(logits, gts, hws)


def compute_gt_miou(
    logits: np.ndarray,  # (N, K, h, w)
    gt_list: Sequence[np.ndarray],  # per-image (H_i, W_i) int labels
    sizes: Sequence[Tuple[int, int]],
    num_classes: int = 151,
    ignore_index: Optional[int] = 0,
    bucket: Optional[int] = None,
) -> Dict[str, float]:
    """Reference-exact ``compute_gt_mIOU``: mean over images of present-class
    IoU at each image's original resolution.  ``bucket=N`` bounds compilation
    to one graph per N-multiple canvas (same numerics, see module docstring)."""
    per_image = np.zeros((len(sizes),), dtype=np.float64)
    if bucket is not None:
        up = lambda v: int(-(-int(v) // bucket) * bucket)
        groups: Dict[Tuple[int, int], List[int]] = defaultdict(list)
        for i, s in enumerate(sizes):
            groups[(up(s[0]), up(s[1]))].append(i)
        for canvas, idxs in groups.items():
            ch, cw = canvas
            gts = np.full((len(idxs), ch, cw), num_classes, dtype=np.int32)
            hws = np.zeros((len(idxs), 2), dtype=np.int32)
            for j, i in enumerate(idxs):
                g = np.asarray(gt_list[i])
                gts[j, : g.shape[0], : g.shape[1]] = g
                hws[j] = g.shape
            vals = np.asarray(_gt_miou_bucketed(
                jnp.asarray(np.stack([logits[i] for i in idxs])), jnp.asarray(gts),
                jnp.asarray(hws), canvas, num_classes, ignore_index,
            ))
            for j, i in enumerate(idxs):
                per_image[i] = vals[j]
        return dict(mIOU_gt=float(per_image.mean()))

    groups = defaultdict(list)
    for i, s in enumerate(sizes):
        groups[tuple(int(x) for x in s)].append(i)
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
    bucket: Optional[int] = None,
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
        out.update(compute_gt_miou(np.asarray(outputs), gt_list, sizes, n_clas, ignore_index,
                                   bucket=bucket))
    return out
