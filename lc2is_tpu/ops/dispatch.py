"""Kernel-dispatch policy shared by the nn modules.

``attn_impl="auto"`` means: use the Pallas kernels (flash/window attention,
fused MLP) on TPU backends, XLA composition on CPU/tests.  Setting
``LC2IS_PALLAS_INTERPRET=1`` forces the Pallas path in interpreter mode on
CPU — used by tests to exercise the fused code paths without a chip.
"""

from __future__ import annotations

import os

import jax


def pallas_enabled(attn_impl: str) -> bool:
    if attn_impl == "xla":
        return False
    if jax.default_backend() != "cpu":
        return True
    return os.environ.get("LC2IS_PALLAS_INTERPRET") == "1"


def pallas_interpret() -> bool:
    return jax.default_backend() == "cpu"
