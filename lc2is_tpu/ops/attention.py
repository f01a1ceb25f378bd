"""Multi-head attention cores with torch ``F.multi_head_attention_forward``
semantics, TPU-first.

The reference leans on ``nn.MultiheadAttention`` everywhere — including the
asymmetric kdim/vdim cross-attention (``model/decoder.py:13,28``) and
key-padding masks (``model/model.py:38``).  Here the projection math lives in
the nn layer; this module owns the scaled-dot-product core with two
implementations behind one signature:

- ``impl="xla"``: einsum softmax — XLA fuses this well at the reference's
  sizes; always available, used in tests and as the autodiff reference.
- ``impl="flash"``: Pallas flash-attention kernel (ops/flash_attention.py),
  used on TPU for the long-sequence self-attention paths (ViT 1024 tokens at
  512², hierarchical decoder stages up to 16k tokens).

Masks: ``key_padding_mask`` is boolean (B, S) with True = IGNORE, matching
torch polarity (the reference inverts its HF attention_mask at
``model/model.py:38`` — that inversion happens in the model, not here).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def scaled_dot_product_attention(
    q: jnp.ndarray,  # (B, H, Lq, Dh)
    k: jnp.ndarray,  # (B, H, Lk, Dh)
    v: jnp.ndarray,  # (B, H, Lk, Dh)
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Lk) True=ignore
    attn_mask: Optional[jnp.ndarray] = None,  # additive (Lq, Lk) or bool
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Returns (B, H, Lq, Dh). Computes softmax in fp32 for bf16 inputs.

    impl="auto": the Pallas flash kernel on TPU backends when the call is
    flash-eligible (no dropout, no dense attn_mask) AND the logits are big
    enough to be HBM-bound (Lq*Lk >= 2^20 — the SR decoder's 4096x1024
    self-attention, ViT's 1025² at 512² input).  Small attentions stay on
    XLA: their materialised logits are cheap, and every extra Pallas
    instantiation inflates the compile payload (axon relay 413 limit).
    """
    if impl == "auto":
        big = q.shape[2] * k.shape[2] >= (1 << 20)
        impl = "flash" if (big and jax.default_backend() not in ("cpu",)) else "xla"
    if impl == "flash" and dropout_rate == 0.0 and attn_mask is None:
        from lc2is_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, key_padding_mask=key_padding_mask)

    orig_dtype = q.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], dtype=jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            logits = jnp.where(attn_mask, -jnp.inf, logits)
        else:
            logits = logits + attn_mask.astype(logits.dtype)
    if key_padding_mask is not None:
        neg = jnp.asarray(-jnp.inf, dtype=logits.dtype)
        logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    # torch semantics: a fully-masked query row yields NaN; the reference
    # never produces one (attention_mask always has >=2 valid tokens), and we
    # keep NaN-propagation identical rather than silently zeroing.
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(orig_dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, e = x.shape
    return x.reshape(b, l, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)
