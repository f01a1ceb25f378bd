"""Optimizers + schedulers (optax), with frozen-subtree masking.

The reference trains with torch AdamW-style settings (lr 1e-5, wd 0 —
``all_args.sh:14-16``) and freezes text encoders via requires_grad=False
(e.g. ``final.py:97-99``); here freezing is an optax mask keyed by the zoo's
FROZEN_PREFIXES.  The lr scheduler steps per optimizer step
(``engine.py:103-104``), which is optax's native behavior.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import optax


def frozen_mask(params, frozen_prefixes: Sequence[str]):
    """True = trainable.  Prefixes are dotted paths into params."""

    def path_of(p) -> str:
        return ".".join(str(k.key) if hasattr(k, "key") else str(k) for k in p)

    def is_trainable(path, _):
        s = path_of(path)
        return not any(s == fp or s.startswith(fp + ".") for fp in frozen_prefixes)

    return jax.tree_util.tree_map_with_path(is_trainable, params)


def make_schedule(kind: str, lr: float, total_steps: int, warmup: int = 0):
    if kind == "constant":
        return optax.constant_schedule(lr)
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(total_steps, 1))
    if kind == "linear":
        return optax.linear_schedule(lr, 0.0, max(total_steps - warmup, 1), warmup)
    raise ValueError(kind)


def fused_flat_adamw(
    schedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mask=None,
):
    """AdamW whose moments live in ONE flat f32 buffer per parameter dtype.

    The tree-shaped ``optax.adamw`` emits ~6 small fused kernels per leaf —
    at the flagship tree (~700 leaves) the per-leaf launch overhead is most
    of the measured 14.5 ms optstep (r3 dissection).  Here the moment/update
    math runs as a single fused elementwise kernel over the concatenated
    trainable leaves; only the unavoidable ravel/concat of grads and the
    slice/reshape of updates touch per-leaf data, and XLA fuses those into
    two bulk copies.  ``optax.flatten`` was measured 2.4× WORSE because it
    flattens params/updates across the *transform boundary* every step
    (ravel + unravel + flat re-concat of the whole tree); this keeps the
    boundary tree-shaped and flattens only the STATE.

    Frozen leaves (``mask`` False) get constant-zero updates (XLA folds the
    ``p + 0`` in apply_updates away) and carry NO optimizer state — unlike
    ``multi_transform(set_to_zero)`` there is no per-leaf zero kernel.

    Numerics are exactly optax.adamw's (same bias correction, eps inside the
    sqrt denominator ordering, decoupled weight decay — wd applies only to
    trainable leaves, matching the multi_transform-masked reference path);
    asserted against optax in tests/test_optim.py.
    """
    import jax.numpy as jnp
    import numpy as np_

    def _trainable_flags(params):
        if mask is None:
            return [True] * len(jax.tree_util.tree_leaves(params))
        return jax.tree_util.tree_leaves(mask)

    def init_fn(params):
        leaves = jax.tree_util.tree_leaves(params)
        flags = _trainable_flags(params)
        sizes = {}
        for leaf, tr in zip(leaves, flags):
            if tr:
                sizes[leaf.dtype] = sizes.get(leaf.dtype, 0) + int(np_.prod(leaf.shape))
        return {
            "count": jnp.zeros((), jnp.int32),
            "m": {str(dt): jnp.zeros((n,), jnp.float32) for dt, n in sizes.items()},
            "v": {str(dt): jnp.zeros((n,), jnp.float32) for dt, n in sizes.items()},
        }

    def update_fn(grads, state, params=None):
        if weight_decay and params is None:
            raise ValueError("fused_flat_adamw: weight_decay != 0 needs params "
                             "(optax.adamw semantics: decoupled decay)")
        p_leaves = (jax.tree_util.tree_leaves(params)
                    if weight_decay else None)
        g_leaves, treedef = jax.tree_util.tree_flatten(grads)
        flags = _trainable_flags(grads)
        count = state["count"] + 1
        lr = schedule(state["count"]) if callable(schedule) else schedule
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        # bucket trainable leaves by dtype, preserving traversal order
        buckets = {}
        for i, (g, tr) in enumerate(zip(g_leaves, flags)):
            if tr:
                buckets.setdefault(str(g.dtype), []).append(i)

        upd_leaves = [None] * len(g_leaves)
        new_m, new_v = {}, {}
        for key, idxs in buckets.items():
            g_flat = jnp.concatenate(
                [g_leaves[i].ravel().astype(jnp.float32) for i in idxs])
            m = state["m"][key] * b1 + g_flat * (1.0 - b1)
            v = state["v"][key] * b2 + jnp.square(g_flat) * (1.0 - b2)
            upd = (m / c1) / (jnp.sqrt(v / c2) + eps)
            if weight_decay:  # decoupled (optax.adamw: update += wd · p)
                p_flat = jnp.concatenate(
                    [p_leaves[i].ravel().astype(jnp.float32) for i in idxs])
                upd = upd + weight_decay * p_flat
            upd = (-lr) * upd
            new_m[key], new_v[key] = m, v
            off = 0
            for i in idxs:
                n = int(np_.prod(g_leaves[i].shape))
                # static-bound lax.slice (not dynamic_slice): XLA folds the
                # split into views instead of materialised gathers
                upd_leaves[i] = jax.lax.slice(upd, (off,), (off + n,)).reshape(
                    g_leaves[i].shape).astype(g_leaves[i].dtype)
                off += n
        for i, g in enumerate(g_leaves):  # frozen: constant zeros (folded away)
            if upd_leaves[i] is None:
                upd_leaves[i] = jnp.zeros_like(g)

        updates = jax.tree_util.tree_unflatten(treedef, upd_leaves)
        return updates, {"count": count, "m": new_m, "v": new_v}

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    params,
    lr: float = 1e-5,
    weight_decay: float = 0.0,
    schedule: str = "constant",
    total_steps: int = 100,
    warmup: int = 0,
    frozen_prefixes: Sequence[str] = (),
    grad_clip: Optional[float] = None,
):
    import os

    sched = make_schedule(schedule, lr, total_steps, warmup)
    mask = frozen_mask(params, frozen_prefixes) if frozen_prefixes else None
    # flat-state fused AdamW (see fused_flat_adamw).  Opt-in
    # (LC2IS_FUSED_OPT=1): the ~700-slice update graph was observed to blow
    # the remote train-step compile past 15 min in r3 (baseline ~5 min);
    # standalone it compiles FASTER than tree adamw (9.4 s vs 31.2 s CPU) —
    # full-train-step compile re-measurement tracked in STATUS.md.
    if os.environ.get("LC2IS_FUSED_OPT", "0") == "1":
        chain = []
        if grad_clip:
            chain.append(optax.clip_by_global_norm(grad_clip))
        chain.append(fused_flat_adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                                      weight_decay=weight_decay, mask=mask))
        return optax.chain(*chain)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    # optax.flatten (one update over a raveled vector) was measured a 2.4×
    # LOSS on v5e (optstep 14.5 ms / 5.6 GB → 35.4 ms / 23.5 GB at the
    # flagship tree): the ravel/unravel copies and the flat re-concat each
    # step cost far more than the per-leaf kernel overhead they remove.
    # Off by default; LC2IS_FLAT_OPT=1 re-enables for experimentation.
    dtypes = {l.dtype for l in jax.tree_util.tree_leaves(params)}
    if len(dtypes) == 1 and os.environ.get("LC2IS_FLAT_OPT", "0") == "1":
        tx = optax.flatten(tx)
    if frozen_prefixes:
        mask = frozen_mask(params, frozen_prefixes)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask),
        )
    return tx
