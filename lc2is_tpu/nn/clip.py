"""CLIP ViT-B/16 vision + text transformers in flax, HF-weight-compatible.

Rebuilds the behavior of HF ``CLIPVisionModel``/``CLIPTextModel`` as used by
the reference encoders (``model/encoder.py:11-119``):

- vision: patch conv (no bias) + CLS + learned position embeddings,
  pre-layernorm ("pre_layrnorm" in HF — typo preserved in import naming),
  12 pre-LN blocks with quick-GELU MLP; ``last_hidden_state`` is NOT
  post-layernormed (HF applies post_layernorm to the CLS pooled output only).
- position-embedding bicubic interpolation for in_size != 224 with the CLS
  row preserved (``model/encoder.py:32-44``) — done at weight-load time via
  ``interpolate_position_embedding``.
- text: token+position embeddings, causal mask combined with the padding
  mask, final_layer_norm; ``pooler_output`` = hidden state at the EOT token
  (``input_ids.argmax(-1)``) as in HF.

Parameter names mirror HF so state-dict import is the default name walk
(core/torch_import.py).  Internally everything is channels-last and the
attention core is ops/attention (Pallas-flash switchable).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lc2is_tpu.nn import init as tinit
from lc2is_tpu.nn.layers import LayerNorm, Linear
from lc2is_tpu.ops.attention import merge_heads, scaled_dot_product_attention, split_heads
from lc2is_tpu.ops.resize import resize


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class Embedding(nn.Module):
    num_embeddings: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        w = self.param("weight", tinit.normal(1.0), (self.num_embeddings, self.features), self.param_dtype)
        return jnp.take(w, ids, axis=0)


class CLIPAttention(nn.Module):
    """HF CLIPAttention: separate q/k/v/out Linears."""

    embed_dim: int
    num_heads: int
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(param_dtype=self.param_dtype)
        self.q_proj = Linear(self.embed_dim, **kw)
        self.k_proj = Linear(self.embed_dim, **kw)
        self.v_proj = Linear(self.embed_dim, **kw)
        self.out_proj = Linear(self.embed_dim, **kw)

    def __call__(self, x, attn_mask=None, key_padding_mask=None):
        q = split_heads(self.q_proj(x), self.num_heads)
        k = split_heads(self.k_proj(x), self.num_heads)
        v = split_heads(self.v_proj(x), self.num_heads)
        out = scaled_dot_product_attention(
            q, k, v, key_padding_mask=key_padding_mask, attn_mask=attn_mask, impl=self.attn_impl
        )
        return self.out_proj(merge_heads(out))


class CLIPMLP(nn.Module):
    hidden_dim: int
    out_dim: int
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.fc1 = Linear(self.hidden_dim, param_dtype=self.param_dtype)
        self.fc2 = Linear(self.out_dim, param_dtype=self.param_dtype)

    def __call__(self, x):
        return self.fc2(quick_gelu(self.fc1(x)))


class CLIPEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_dim: int
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(param_dtype=self.param_dtype)
        self.self_attn = CLIPAttention(self.embed_dim, self.num_heads, attn_impl=self.attn_impl, **kw)
        self.layer_norm1 = LayerNorm(**kw)
        self.layer_norm2 = LayerNorm(**kw)
        self.mlp = CLIPMLP(self.mlp_dim, self.embed_dim, **kw)

    def __call__(self, x, attn_mask=None, key_padding_mask=None):
        x = x + self.self_attn(self.layer_norm1(x), attn_mask=attn_mask, key_padding_mask=key_padding_mask)
        x = x + self.mlp(self.layer_norm2(x))
        return x


class CLIPVisionTransformer(nn.Module):
    """HF ``CLIPVisionModel.vision_model`` for ViT-B/16 (openai defaults)."""

    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        grid = self.image_size // self.patch_size
        self.num_positions = grid * grid + 1
        self.embeddings = CLIPVisionEmbeddings(
            image_size=self.image_size,
            patch_size=self.patch_size,
            hidden_size=self.hidden_size,
            param_dtype=self.param_dtype,
        )
        self.pre_layrnorm = LayerNorm(param_dtype=self.param_dtype)  # HF typo kept
        self.layers = [
            CLIPEncoderLayer(
                self.hidden_size, self.num_heads, self.mlp_dim,
                attn_impl=self.attn_impl, param_dtype=self.param_dtype,
                name=f"encoder_layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.post_layernorm = LayerNorm(param_dtype=self.param_dtype)

    def __call__(self, pixel_values) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixel_values: (B, 3, H, W) torch layout. Returns
        (last_hidden_state (B, 1+P, C), pooled CLS (B, C))."""
        x = self.embeddings(pixel_values.astype(self.dtype))
        x = self.pre_layrnorm(x)
        for layer in self.layers:
            x = layer(x)
        pooled = self.post_layernorm(x[:, 0, :])
        return x, pooled


class CLIPVisionEmbeddings(nn.Module):
    image_size: int
    patch_size: int
    hidden_size: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):  # (B, 3, H, W)
        e = self.hidden_size
        grid = self.image_size // self.patch_size
        num_pos = grid * grid + 1
        cls = self.param("class_embedding", tinit.normal(0.02), (e,), self.param_dtype)
        pos = self.param("position_embedding", tinit.normal(0.02), (num_pos, e), self.param_dtype)
        w = self.param(
            "patch_embedding",
            tinit.torch_conv_weight,
            (e, 3, self.patch_size, self.patch_size),
            self.param_dtype,
        )
        x = jnp.moveaxis(pixel_values, 1, -1)  # NHWC
        # stride==kernel conv as space-to-depth + matmul (same math, pure
        # MXU in forward and backward)
        p = self.patch_size
        b, hh, www, cin = x.shape
        oh, ow = hh // p, www // p
        patches = x.reshape(b, oh, p, ow, p, cin)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, oh * ow, p * p * cin)
        wm = w.transpose(2, 3, 1, 0).reshape(p * p * cin, e)
        patches = patches @ wm.astype(x.dtype)
        cls_tok = jnp.broadcast_to(cls.astype(x.dtype), (b, 1, e))
        tokens = jnp.concatenate([cls_tok, patches], axis=1)
        return tokens + pos.astype(x.dtype)[None]


class CLIPTextTransformer(nn.Module):
    """HF ``CLIPTextModel.text_model`` (openai/clip-vit-base-patch16)."""

    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    mlp_dim: int = 2048
    max_positions: int = 77
    eos_token_id: int = 49407
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.token_embedding = Embedding(self.vocab_size, self.hidden_size, param_dtype=self.param_dtype)
        self.position_embedding = Embedding(self.max_positions, self.hidden_size, param_dtype=self.param_dtype)
        self.layers = [
            CLIPEncoderLayer(
                self.hidden_size, self.num_heads, self.mlp_dim,
                attn_impl=self.attn_impl, param_dtype=self.param_dtype,
                name=f"encoder_layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.final_layer_norm = LayerNorm(param_dtype=self.param_dtype)

    def __call__(self, input_ids, attention_mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (last_hidden_state (B, L, C), pooler_output (B, C))."""
        b, l = input_ids.shape
        x = self.token_embedding(input_ids)
        x = x + self.position_embedding(jnp.arange(l))[None]
        causal = jnp.triu(jnp.full((l, l), -jnp.inf, dtype=jnp.float32), k=1)
        kpm = None
        if attention_mask is not None:
            kpm = attention_mask == 0  # HF mask: 1=keep -> True=ignore
        for layer in self.layers:
            x = layer(x, attn_mask=causal, key_padding_mask=kpm)
        x = self.final_layer_norm(x)
        # HF: pooled at the first EOT token.  Legacy configs (eos_token_id=2)
        # fall back to argmax over ids; modern CLIP searches for the id.
        if self.eos_token_id == 2:
            eot = jnp.argmax(input_ids, axis=-1)
        else:
            eot = jnp.argmax((input_ids == self.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(b), eot]
        return x, pooled


def interpolate_position_embedding(pos: np.ndarray, patch_size: int, new_size: int) -> np.ndarray:
    """Bicubic 2-D interpolation of ViT position embeddings, CLS row
    preserved — exact port of the reference procedure
    (``model/encoder.py:32-44``, F.interpolate mode=bicubic to tgt_size)."""
    old_grid = int(round(np.sqrt(pos.shape[0] - 1)))
    new_grid = new_size // patch_size
    if new_grid == old_grid:
        return pos
    cls_row = pos[:1]
    grid_part = pos[1:].reshape(1, old_grid, old_grid, -1)
    grid_part = jnp.moveaxis(jnp.asarray(grid_part), -1, 1)  # (1, C, H, W)
    new = resize(grid_part, size=(new_grid, new_grid), method="bicubic")
    new = np.asarray(jnp.moveaxis(new, 1, -1)).reshape(new_grid * new_grid, -1)
    return np.concatenate([cls_row, new], axis=0)
