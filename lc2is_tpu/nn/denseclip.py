"""DenseCLIP-style prompt modules, reconstructed from the reference's usage
contract (the vendored ``model/DenseCLIP`` package is ABSENT from the
reference tree — SURVEY.md §2.2 "external dependency to reimplement").

Contract observed at ``model/final.py:91-130`` / ``model/new.py:15-50``:
- ``CLIPTextContextEncoder(**cfg["text_encoder"])`` — a CLIP text transformer
  whose input is tokenized class names of ``cfg["context_length"]`` tokens
  concatenated (after the SOT token) with learned context embeddings filling
  the remaining ``text_encoder.context_length`` positions; produces (K, C)
  class embeddings via the EOT hidden state @ text_projection.
  cfg keys: context_length, vocab_size, transformer_width, transformer_heads,
  transformer_layers, embed_dim.
- ``ContextDecoder(**cfg["context_decoder"], visual_dim=..., dropout=0.0)``
  — pre-LN transformer decoder: text queries over projected visual-token
  memory → per-class diff.  cfg keys: transformer_width, transformer_heads,
  transformer_layers, visual_dim, dropout.
  NOTE the reference passes ``visual_dim=384`` (Swin stage 3) while the text
  stream is 512-d; the public DenseCLIP projects both through LayerNorm+Linear
  sized by one ``visual_dim`` and would shape-error here.  We take an explicit
  ``text_dim`` so the reference configuration actually runs (deviation
  documented, behavior otherwise DenseCLIP-shaped).
- ``tokenize(name, context_length=N)`` — CLIP BPE, see ops/bpe.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lc2is_tpu.nn import init as tinit
from lc2is_tpu.nn.clip import Embedding, quick_gelu
from lc2is_tpu.nn.layers import Dropout, LayerNorm, Linear
from lc2is_tpu.ops.attention import merge_heads, scaled_dot_product_attention, split_heads


class ResidualAttentionBlock(nn.Module):
    """CLIP-style pre-LN block (QuickGELU MLP), packed-qkv attention —
    matches OpenAI CLIP's text transformer structure for ViT-B-16.pt import."""

    width: int
    heads: int
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(param_dtype=self.param_dtype)
        from lc2is_tpu.nn.layers import MultiheadAttention

        self.attn = MultiheadAttention(embed_dim=self.width, num_heads=self.heads,
                                       attn_impl=self.attn_impl, **kw)
        self.ln_1 = LayerNorm(**kw)
        self.ln_2 = LayerNorm(**kw)
        self.c_fc = Linear(self.width * 4, **kw)
        self.c_proj = Linear(self.width, **kw)

    def __call__(self, x, attn_mask=None):
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, attn_mask=attn_mask)
        x = x + self.c_proj(quick_gelu(self.c_fc(self.ln_2(x))))
        return x


class CLIPTextContextEncoder(nn.Module):
    context_length: int = 13
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    embed_dim: int = 512
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.token_embedding = Embedding(self.vocab_size, self.transformer_width,
                                         param_dtype=self.param_dtype)
        self.positional_embedding = self.param(
            "positional_embedding", tinit.normal(0.01),
            (self.context_length, self.transformer_width), self.param_dtype,
        )
        self.resblocks = [
            ResidualAttentionBlock(self.transformer_width, self.transformer_heads,
                                   attn_impl=self.attn_impl, param_dtype=self.param_dtype,
                                   name=f"resblocks_{i}")
            for i in range(self.transformer_layers)
        ]
        self.ln_final = LayerNorm(param_dtype=self.param_dtype)
        self.text_projection = self.param(
            "text_projection", tinit.normal(self.transformer_width ** -0.5),
            (self.transformer_width, self.embed_dim), self.param_dtype,
        )

    def __call__(self, text: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        """text: (K, n1) token ids; context: (1, n2, C) learned prompts.
        Returns (K, embed_dim) class embeddings (the reference then expands
        over batch, final.py:325)."""
        k, n1 = text.shape
        _, n2, c = context.shape
        x_text = self.token_embedding(text)  # (K, n1, C)
        eot = jnp.argmax(text, axis=-1) + n2  # EOT shifts right by context len
        ctx = jnp.broadcast_to(context.astype(x_text.dtype), (k, n2, c))
        x = jnp.concatenate([x_text[:, :1], ctx, x_text[:, 1:]], axis=1)  # (K, n1+n2, C)
        x = x + self.positional_embedding.astype(x.dtype)[None, : x.shape[1]]
        # public DenseCLIP builds the CLIP causal mask (build_attention_mask:
        # -inf above the diagonal) for the text transformer; without it the
        # EOT pooling sees future tokens and imported checkpoints silently
        # produce wrong class embeddings
        ln = x.shape[1]
        causal = jnp.triu(jnp.full((ln, ln), -jnp.inf, dtype=jnp.float32), k=1)
        for blk in self.resblocks:
            x = blk(x, attn_mask=causal)
        x = self.ln_final(x)
        pooled = x[jnp.arange(k), eot]
        return pooled @ self.text_projection.astype(x.dtype)


class _PreLNAttention(nn.Module):
    """timm-style attention with separate q/k/v/proj linears (DenseCLIP's
    ``Attention``)."""

    dim: int
    heads: int
    dropout: float = 0.0
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(param_dtype=self.param_dtype)
        # public DenseCLIP's Attention defaults qkv_bias=False (only the out
        # proj carries a bias) — bias'd q/k/v here would leave random params
        # an imported checkpoint never fills
        self.q = Linear(self.dim, use_bias=False, **kw)
        self.k = Linear(self.dim, use_bias=False, **kw)
        self.v = Linear(self.dim, use_bias=False, **kw)
        self.proj = Linear(self.dim, **kw)
        self.drop = Dropout(self.dropout)

    def __call__(self, q, k, v, deterministic: bool = True):
        qh = split_heads(self.q(q), self.heads)
        kh = split_heads(self.k(k), self.heads)
        vh = split_heads(self.v(v), self.heads)
        out = scaled_dot_product_attention(qh, kh, vh, impl=self.attn_impl)
        return self.drop(self.proj(merge_heads(out)), deterministic)


class _ContextDecoderLayer(nn.Module):
    dim: int
    heads: int
    dropout: float = 0.0
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(param_dtype=self.param_dtype)
        a = dict(dim=self.dim, heads=self.heads, dropout=self.dropout,
                 attn_impl=self.attn_impl, param_dtype=self.param_dtype)
        self.self_attn = _PreLNAttention(**a)
        self.cross_attn = _PreLNAttention(**a)
        self.norm1 = LayerNorm(**kw)
        self.norm2 = LayerNorm(**kw)
        self.norm3 = LayerNorm(**kw)
        self.fc1 = Linear(self.dim * 4, **kw)
        self.fc2 = Linear(self.dim, **kw)
        self.drop = Dropout(self.dropout)

    def __call__(self, x, mem, deterministic: bool = True):
        y = self.norm1(x)
        x = x + self.self_attn(y, y, y, deterministic)
        x = x + self.cross_attn(self.norm2(x), mem, mem, deterministic)
        h = self.fc2(self.drop(jax.nn.gelu(self.fc1(self.norm3(x)), approximate=False), deterministic))
        return x + self.drop(h, deterministic)


class ContextDecoder(nn.Module):
    transformer_width: int = 256
    transformer_heads: int = 4
    transformer_layers: int = 3
    visual_dim: int = 512
    text_dim: int = 512  # deviation: explicit text dim (see module docstring)
    dropout: float = 0.1
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(param_dtype=self.param_dtype)
        self.memory_norm_in = LayerNorm(**kw)
        self.memory_proj = Linear(self.transformer_width, **kw)
        self.memory_norm_out = LayerNorm(**kw)
        self.text_norm_in = LayerNorm(**kw)
        self.text_proj = Linear(self.transformer_width, **kw)
        self.decoder = [
            _ContextDecoderLayer(self.transformer_width, self.transformer_heads,
                                 dropout=self.dropout, attn_impl=self.attn_impl,
                                 param_dtype=self.param_dtype, name=f"decoder_{i}")
            for i in range(self.transformer_layers)
        ]
        self.out_norm = LayerNorm(**kw)
        self.out_proj = Linear(self.text_dim, **kw)

    def __call__(self, text: jnp.ndarray, visual: jnp.ndarray, deterministic: bool = True):
        """text: (B, K, text_dim); visual: (B, N, visual_dim).
        Returns text_diff (B, K, text_dim) (``final.py:328``)."""
        mem = self.memory_norm_out(self.memory_proj(self.memory_norm_in(visual)))
        x = self.text_proj(self.text_norm_in(text))
        for layer in self.decoder:
            x = layer(x, mem, deterministic)
        return self.out_proj(self.out_norm(x))
