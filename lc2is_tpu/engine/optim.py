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


# A flat-state fused AdamW (one f32 moment buffer per dtype, per-leaf
# lax.slice views of a single fused update) was built, optax-parity tested,
# and DELETED after measurement (win-or-delete): tree-shaped optax.adamw is
# already at the HBM roof on the flagship tree (optstep 6.49 ms moving
# 5.62 GB at 867 GB/s, v5e), while the fused version's ravel/concat of
# grads and slice/copy of updates tripled the bytes (26.59 ms, 18.69 GB at
# 703 GB/s).  The optimizer is bytes-bound, not launch-bound — the r3
# "14.5 ms optstep" attribution that motivated it no longer reproduces.
# (optax.flatten was separately measured 2.4x worse — same reason.)


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
