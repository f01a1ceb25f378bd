"""Root tensor utilities (reference ``utils.py:6-56``), jnp-native."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lc2is_tpu.ops.resize import resize


def count_params(params, trainable_mask=None) -> float:
    """Parameter count in millions (``utils.py:6-13``).  ``trainable_mask``
    (a bool pytree, True=trainable) restricts to trainable leaves."""
    leaves = jax.tree_util.tree_leaves(params)
    if trainable_mask is None:
        total = sum(int(np.prod(l.shape)) for l in leaves)
    else:
        masks = jax.tree_util.tree_leaves(trainable_mask)
        total = sum(int(np.prod(l.shape)) for l, m in zip(leaves, masks) if m)
    return total / 1e6


def generate_masks(preds: jnp.ndarray, sizes: Sequence[Tuple[int, int]]) -> List[jnp.ndarray]:
    """Bicubic-resize each logit map to its original size then argmax
    (``utils.py:15-22``)."""
    masks = []
    for pred, size in zip(preds, sizes):
        up = resize(pred[None], size=tuple(int(s) for s in size), method="bicubic")[0]
        masks.append(jnp.argmax(up, axis=0))
    return masks


def apply_color(mask: jnp.ndarray, colors: jnp.ndarray) -> jnp.ndarray:
    """Colorize an (H, W) id mask with a (N, 4) [class_id, r, g, b] table
    (``utils.py:24-34`` mask-trick, vectorised as one gather)."""
    num = int(colors[:, 0].max()) + 1
    lut = jnp.zeros((num, 3), dtype=colors.dtype)
    lut = lut.at[colors[:, 0]].set(colors[:, 1:])
    mapped = jnp.take(lut, jnp.clip(mask, 0, num - 1), axis=0)  # (H, W, 3)
    covered = jnp.isin(mask, colors[:, 0])
    # uncovered ids keep their raw value on all three channels (reference behavior)
    fallback = jnp.broadcast_to(mask[..., None], mapped.shape).astype(mapped.dtype)
    return jnp.where(covered[..., None], mapped, fallback).transpose(2, 0, 1)


def original_size_interpolate(tensor: jnp.ndarray, ori_sizes) -> List[jnp.ndarray]:
    """``utils.py:36-44``: per-image bicubic resize to original sizes."""
    return [
        resize(t[None], size=tuple(int(x) for x in s), method="bicubic")[0]
        for t, s in zip(tensor, ori_sizes)
    ]


def pad_and_concat(tensor_list: List[jnp.ndarray], ori_sizes, pad: str = "max", value: int = 0) -> jnp.ndarray:
    """``utils.py:46-56``: right/bottom-pad to the max size and stack."""
    sizes = np.asarray([[int(x) for x in s] for s in ori_sizes])
    if pad == "max":
        max_h, max_w = sizes.max(0)
    else:
        max_h = max_w = 1024
    padded = []
    for t, (h, w) in zip(tensor_list, sizes):
        spec = [(0, 0)] * (t.ndim - 2) + [(0, int(max_h - h)), (0, int(max_w - w))]
        padded.append(jnp.pad(t, spec, constant_values=value)[None])
    return jnp.concatenate(padded, axis=0)


def unpad(tensor: jnp.ndarray, sizes) -> List[jnp.ndarray]:
    """``metrics.py:158-164``."""
    return [t[: int(s[0]), : int(s[1])] for t, s in zip(tensor, sizes)]


def save_img(file: str, img, size=None) -> None:
    """Tensor -> PNG (``data/utils.py:32-36``)."""
    from PIL import Image

    arr = np.asarray(img)
    if size is not None:
        arr = arr[..., : int(size[0]), : int(size[1])]
    if arr.ndim == 3:  # (C, H, W) -> (H, W, C)
        arr = arr.transpose(1, 2, 0)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.0 else arr, 0, 255).astype(np.uint8)
    Image.fromarray(arr.squeeze()).save(file)
