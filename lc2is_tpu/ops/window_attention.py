"""Fused Swin window-attention Pallas kernel.

Measured on v5e at 512²/batch 16: the XLA window-attention path costs ~37 ms
of swin-small's 73 ms forward — dominated by HBM round-trips for the
(B·nW, heads, 49, 49) logits/probs and the broadcasted bias/mask adds.  This
kernel keeps everything for a G-window block in VMEM:

  head-split → q·kᵀ (batched per head) → ·scale + rel-pos bias
  + shifted-region mask → softmax (fp32) → ·v → head-merge

HBM traffic becomes qkv+out only.  The shifted-window mask is NOT passed as
a dense (nW, 49, 49) tensor: each token carries an int32 region label
(9-region trick computed from iota) and the kernel masks ``region_q !=
region_k`` pairs — 2 bytes/token instead of 2.4 KB/window.

Used by nn/swin.py on TPU backends; the lazy-broadcast XLA path remains for
CPU/tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, reg_ref, bias_ref, o_ref, *, num_heads, scale):
    g, p, c = q_ref.shape
    dh = c // num_heads
    reg = reg_ref[...]  # (G, p) int32
    # (G, p, p) True where query/key tokens belong to different shift regions
    neq = reg[:, :, None] != reg[:, None, :]

    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q_ref[:, :, sl]  # (G, p, dh)
        kh = k_ref[:, :, sl]
        vh = v_ref[:, :, sl]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (G, p, p)
        logits = logits * scale + bias_ref[h][None]
        logits = jnp.where(neq, NEG, logits)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            probs.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def _xla_window_attention(q, k, v, bias, regions, num_heads):
    """Reference implementation (autodiff path for the custom VJP)."""
    n, p, c = q.shape
    dh = c // num_heads

    def heads(t):
        return t.reshape(n, p, num_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    scale = 1.0 / np.sqrt(dh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale + bias[None]
    if regions is not None:
        neq = regions[:, None, :, None] != regions[:, None, None, :]
        logits = jnp.where(neq, NEG, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(n, p, c)


def window_attention(
    q: jnp.ndarray,  # (N, p, C) — N = B·nW windows, heads packed in C
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (heads, p, p) relative-position bias, f32
    regions: Optional[jnp.ndarray],  # (N, p) int32 shift-region labels or None
    num_heads: int,
    block_windows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable wrapper: Pallas forward, XLA-recompute backward."""
    if regions is None:
        dummy = jnp.zeros((q.shape[0], q.shape[1]), jnp.int32)
        return _window_attention_vjp(q, k, v, bias, False, num_heads, block_windows,
                                     interpret, dummy)
    return _window_attention_vjp(q, k, v, bias, True, num_heads, block_windows,
                                 interpret, regions)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _window_attention_vjp(q, k, v, bias, has_regions, num_heads, block_windows,
                          interpret, regions):
    return _window_attention_fwd_impl(
        q, k, v, bias, regions if has_regions else None, num_heads, block_windows, interpret
    )


def _wa_fwd(q, k, v, bias, has_regions, num_heads, block_windows, interpret, regions):
    out = _window_attention_vjp(q, k, v, bias, has_regions, num_heads,
                                block_windows, interpret, regions)
    return out, (q, k, v, bias, regions)


def _wa_bwd(has_regions, num_heads, block_windows, interpret, res, g):
    q, k, v, bias, regions = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _xla_window_attention(
            q_, k_, v_, b_, regions if has_regions else None, num_heads
        ),
        q, k, v, bias,
    )
    dq, dk, dv, db = vjp(g)
    return dq, dk, dv, db, None


_window_attention_vjp.defvjp(_wa_fwd, _wa_bwd)


def _window_attention_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    regions: Optional[jnp.ndarray],
    num_heads: int,
    block_windows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    n, p, c = q.shape
    dh = c // num_heads
    scale = 1.0 / np.sqrt(dh)

    if block_windows is not None:
        g = min(block_windows, n)
    else:
        # adapt windows-per-step to VMEM: qkv+out (4·g·p·c·2B) + logits
        # (g·p·p·4B) within ~6 MB leaves room for double buffering
        # conservative: Mosaic double-buffers the 4 data blocks and the
        # per-head logits/exp/probs intermediates all live at once
        budget = 1536 * 1024
        per_window = 4 * p * c * 2 + p * p * 4
        g = min(max(8, min(32, budget // per_window)), n)
        g = max(8, (g // 8) * 8)  # regions block is (g, p): sublane dim % 8
    n_pad = ((n + g - 1) // g) * g
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    if regions is None:
        regions = jnp.zeros((n_pad, p), jnp.int32)
    elif regions.shape[0] != n_pad:
        regions = jnp.pad(regions, ((0, n_pad - regions.shape[0]), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, scale=scale),
        grid=(n_pad // g,),
        in_specs=[
            pl.BlockSpec((g, p, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, p, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, p, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, p), lambda i: (i, 0)),
            pl.BlockSpec((num_heads, p, p), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, p, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, p, c), q.dtype),
        interpret=interpret,
    )(q, k, v, regions, bias.astype(jnp.float32))
    return out[:n]


@functools.lru_cache(maxsize=64)
def _np_region_labels(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Per-token 9-region labels after window partition: (nW, p) int32."""
    def region(n, idx):
        return (idx >= n - window).astype(np.int32) + (idx >= n - shift).astype(np.int32)

    hh = region(hp, np.arange(hp))
    ww = region(wp, np.arange(wp))
    img = hh[:, None] * 3 + ww[None, :]
    m = img.reshape(hp // window, window, wp // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    return m.astype(np.int32)


def region_labels(batch: int, hp: int, wp: int, window: int, shift: int) -> Optional[jnp.ndarray]:
    """(B·nW, p) labels for the shifted case; None when shift == 0."""
    if shift == 0:
        return None
    m = jnp.asarray(_np_region_labels(hp, wp, window, shift))  # (nW, p) small
    return jnp.tile(m, (batch, 1))
