"""On-device jit-compiled preprocessing stage (BASELINE.json north star:
"the collator resize/normalize/label-remap becomes a compiled stage").

Host-side the loader ships raw decoded uint8 images; on device this stage —
fused by XLA into a handful of matmuls and elementwise ops — performs:
- shortest-edge antialiased bicubic resize + center crop (PIL semantics,
  matching the HF CLIPFeatureExtractor path within float rounding)
- scale 1/255 + CLIP- or ImageNet-stat normalization
- label nearest resize to label_size with the ``x255 -> long``-equivalent
  integer path (``collator.py:89-91``)
- optional batch-level class-id compaction (``OldCollator.change_ids``)

Static-shape note: inputs must share one (H, W) per compiled variant; the
host loader buckets by aspect/size (square bucket by default).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from lc2is_tpu.data.ade20k import CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD
from lc2is_tpu.ops.resize import resize


def _shortest_edge_dims(h: int, w: int, size: int) -> Tuple[int, int]:
    if h < w:
        return size, max(1, int(round(w * size / h)))
    return max(1, int(round(h * size / w))), size


@functools.partial(jax.jit, static_argnames=("img_size", "label_size", "stats"))
def preprocess_batch(
    images: jnp.ndarray,  # (B, 3, H, W) uint8 or float [0,255]
    labels: jnp.ndarray,  # (B, H, W) int
    img_size: int = 512,
    label_size: int = 128,
    stats: str = "clip",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, c, h, w = images.shape
    nh, nw = _shortest_edge_dims(h, w, img_size)
    x = resize(images.astype(jnp.float32), size=(nh, nw), method="bicubic", semantics="pil")
    top = (nh - img_size) // 2
    left = (nw - img_size) // 2
    x = jax.lax.dynamic_slice(
        x, (0, 0, top, left), (b, c, img_size, img_size)
    )
    x = x / 255.0
    if stats == "clip":
        mean, std = jnp.asarray(CLIP_MEAN), jnp.asarray(CLIP_STD)
    else:
        mean, std = jnp.asarray(IMAGENET_MEAN), jnp.asarray(IMAGENET_STD)
    x = (x - mean[None, :, None, None]) / std[None, :, None, None]

    lh, lw = _shortest_edge_dims(h, w, label_size)
    y = resize(labels[:, None].astype(jnp.float32), size=(lh, lw), method="nearest", semantics="pil")
    ltop = (lh - label_size) // 2
    lleft = (lw - label_size) // 2
    y = jax.lax.dynamic_slice(y, (0, 0, ltop, lleft), (b, 1, label_size, label_size))
    return x, y[:, 0].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def compact_ids(labels: jnp.ndarray, num_classes: int = 151):
    """On-device OldCollator-style id compaction: map the batch's present
    class ids onto [0, n_present) and return the (K,) old-id table whose
    row i is the original id of compact id i (putback = table[label])."""
    present = jnp.zeros((num_classes,), jnp.int32).at[labels.reshape(-1)].set(1)
    new_of_old = jnp.cumsum(present) - 1  # old id -> compact id
    remapped = new_of_old[labels]
    order = jnp.argsort(jnp.where(present == 1, jnp.arange(num_classes), num_classes))
    old_of_new = order  # first n_present entries are the original ids
    return remapped, old_of_new, present.sum()
