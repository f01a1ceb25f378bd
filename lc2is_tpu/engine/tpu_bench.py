"""Honest TPU timing through the axon tunnel.

Empirical facts (see memory/axon-tpu-environment.md):
- ``block_until_ready`` on tunnel results returns before execution finishes;
  only a host fetch forces completion;
- XLA CSEs/DCEs benchmark bodies without real data dependencies;
- the remote-compile relay rejects large payloads (HTTP 413), so wrapping a
  big model in ``lax.scan`` to build one mega-graph is not an option.

Protocol: chain ``n`` separately-jitted executions through a tiny device
scalar (each call's input is perturbed by a data-dependent epsilon from the
previous output — sequential, no CSE, payload = one model graph + one scalar
reducer), then host-fetch once.  Dispatch overhead stays on the host side of
the tunnel and is excluded from device execution by the chip-side queueing.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _tree_mean(tree) -> jnp.ndarray:
    leaves = [l.astype(jnp.float32).mean() for l in jax.tree_util.tree_leaves(tree)]
    total = leaves[0]
    for l in leaves[1:]:
        total = total + l
    return total / len(leaves)


def bench_steps(
    fn: Callable,  # x -> pytree
    x: jnp.ndarray,
    n: int = 8,
    warmup: bool = True,
) -> Tuple[float, float]:
    """Returns (seconds_per_step, total_seconds) for ``fn`` on input ``x``."""

    @jax.jit
    def step(x0, eps):
        out = fn(x0 + eps.astype(x0.dtype))
        return _tree_mean(out) * jnp.asarray(1e-8, jnp.float32)

    def chain():
        eps = jnp.asarray(0.0, jnp.float32)
        for _ in range(n):
            eps = step(x, eps)
        return float(eps)  # host fetch forces the whole dependency chain

    if warmup:
        chain()  # compile + one full run
    t0 = time.perf_counter()
    chain()
    total = time.perf_counter() - t0
    return total / n, total
