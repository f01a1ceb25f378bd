"""Multi-scale sliding-window inference (BASELINE.json config #5: the
"hierarchical variant @ 640² multi-scale sliding-window eval").

Not present in the reference (no sliding-window code exists — SURVEY.md
§5.7); built TPU-natively: all windows of one scale are batched into a
single jitted forward (static shapes, one compile per scale), logits are
scatter-added back with an overlap-count normaliser, and scales are averaged
after bilinear-resize to the base resolution.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp

from lc2is_tpu.ops.resize import resize


def _window_origins(size: int, crop: int, stride: int) -> List[int]:
    if size <= crop:
        return [0]
    last = size - crop
    xs = list(range(0, last + 1, stride))
    if xs[-1] != last:
        xs.append(last)
    return xs


def sliding_window_logits(
    forward: Callable[[jnp.ndarray], jnp.ndarray],  # (N,3,c,c) -> (N,K,c,c)
    image: jnp.ndarray,  # (B, 3, H, W)
    crop: int = 512,
    stride: int = 341,
) -> jnp.ndarray:
    """Average-of-overlaps sliding window at one scale. Returns (B,K,H,W)."""
    b, c, h, w = image.shape
    ys = _window_origins(h, crop, stride)
    xs = _window_origins(w, crop, stride)
    tiles = []
    for y in ys:
        for x in xs:
            tiles.append(image[:, :, y : y + crop, x : x + crop])
    batch_tiles = jnp.concatenate(tiles, axis=0)  # (B*nw, 3, c, c)
    logits_tiles = forward(batch_tiles)  # (B*nw, K, c, c)
    k = logits_tiles.shape[1]

    acc = jnp.zeros((b, k, h, w), dtype=jnp.float32)
    cnt = jnp.zeros((1, 1, h, w), dtype=jnp.float32)
    i = 0
    for y in ys:
        for x in xs:
            tile = logits_tiles[i * b : (i + 1) * b].astype(jnp.float32)
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (0, 0, y, x), (b, k, crop, crop)) + tile,
                (0, 0, y, x),
            )
            cnt = jax.lax.dynamic_update_slice(
                cnt, jax.lax.dynamic_slice(cnt, (0, 0, y, x), (1, 1, crop, crop)) + 1.0,
                (0, 0, y, x),
            )
            i += 1
    return acc / cnt


def multi_scale_sliding_eval(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,  # (B, 3, H, W) base resolution (e.g. 640²)
    scales: Sequence[float] = (0.75, 1.0, 1.25),
    crop: int = 512,
    stride: int = 341,
    flip: bool = True,
) -> jnp.ndarray:
    """Average softmax over scales (and optional horizontal flip); returns
    (B, K, H, W) probabilities at the base resolution."""
    b, c, h, w = image.shape
    total = None
    for s in scales:
        sh, sw = int(round(h * s)), int(round(w * s))
        scaled = resize(image, size=(sh, sw), method="bilinear")
        if flip:
            # fold the flipped copies into the SAME tile batch so the model
            # appears once per scale in the compiled graph (keeps the graph
            # small enough for payload-limited remote compilation, and the
            # bigger batch utilises the chip better)
            both = jnp.concatenate([scaled, scaled[:, :, :, ::-1]], axis=0)
            logits2 = sliding_window_logits(forward, both, crop=min(crop, sh, sw), stride=stride)
            logits = (logits2[:b] + logits2[b:, :, :, ::-1]) / 2.0
        else:
            logits = sliding_window_logits(forward, scaled, crop=min(crop, sh, sw), stride=stride)
        probs = jax.nn.softmax(logits, axis=1)
        probs = resize(probs, size=(h, w), method="bilinear")
        total = probs if total is None else total + probs
    return total / len(scales)


def dp_sliding_miou(
    apply_fn: Callable[..., jnp.ndarray],  # (params, (N,3,c,c)) -> (N,K,c,c)
    params,
    images: jnp.ndarray,  # (B, 3, H, W), B divisible by the data axis
    labels: jnp.ndarray,  # (B, H, W) int
    mesh,
    num_classes: int = 151,
    scales: Sequence[float] = (0.75, 1.0, 1.25),
    crop: int = 512,
    stride: int = 341,
    flip: bool = True,
) -> jnp.ndarray:
    """Data-parallel multi-scale sliding eval (BASELINE.json config #5 as
    written: the 640² hierarchical sliding eval *and* DP over the chip mesh
    in one path): the image batch is sharded over the ``data`` axis via
    shard_map, each chip slides its shard, and the per-image mIoU
    (reference semantics, metrics/miou.py) is psum-reduced on device —
    only the final scalar leaves the mesh.  Numerically identical to the
    single-device eval (sum-of-per-image-values / count commutes with the
    shard split); asserted in tests/test_sliding_utils.py and
    __graft_entry__.dryrun_multichip."""
    from jax.sharding import PartitionSpec as P

    from lc2is_tpu.core.mesh import DATA_AXIS
    from lc2is_tpu.metrics.miou import per_image_miou

    def shard_fn(p, img, lab):
        probs = multi_scale_sliding_eval(
            lambda x: apply_fn(p, x), img,
            scales=scales, crop=crop, stride=stride, flip=flip)
        vals = per_image_miou(probs, lab, num_classes=num_classes,
                              upsample_logits_to_label=False, reduce=False)
        s = jax.lax.psum(vals.sum(), DATA_AXIS)
        n = jax.lax.psum(jnp.asarray(vals.shape[0], jnp.float32), DATA_AXIS)
        return s / n

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                       out_specs=P())
    return jax.jit(fn)(params, images, labels)
