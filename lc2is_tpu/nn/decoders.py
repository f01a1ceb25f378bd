"""Decoder stacks of the reference, rebuilt as flax modules.

Covers every decoder family (SURVEY.md §2.1):
- ``DecoderBlock`` / ``PromptDecoder``: plain torch TransformerDecoder stacks
  over the reference's asymmetric-kdim/vdim layers (``model/decoder.py:9-33``)
- ``FTNDecoder`` + ``FTNBlock``: 4-stage top-down pyramid fusion with
  SR-attention cross-decoders and per-block x2 bilinear upsampling
  (``model/decoder.py:36-111``)
- ``HierarchicalSelfA`` / ``HierarchicalCrossA`` with ``SelfABlock`` /
  ``CrossABlock`` (``model/hierarchical.py:9-172``), preserving the
  weight-tying quirk (``hierarchical.py:137,157``: all ``depth`` layers in a
  block share one weight set) behind ``tie_block_weights``
- ``FTNDecoderV2`` (+ ``RepeatTransformer``): model/ftn.py's ``Decoder`` and
  ``Transformer`` (``model/ftn.py:67-157``)
- ``TextToPatch`` (``model/text_patch.py:4-18``)

All token tensors are (B, P, C) channels-last; upsampling goes through
ops.resize.resize_tokens (bilinear, torch semantics).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from lc2is_tpu.nn.layers import (
    Linear,
    SRTransformerDecoderLayer,
    SRTransformerEncoderLayer,
    TransformerDecoderLayer,
)
from lc2is_tpu.ops.resize import resize_tokens


def _grid(p: int) -> int:
    h = int(round(p ** 0.5))
    assert h * h == p, p
    return h


class DecoderBlock(nn.Module):
    """torch ``nn.TransformerDecoder`` over ``DecoderLayer``s — the v1 fusion
    block (``model/decoder.py:15-21``).  Layer params under ``layers_{i}``."""

    d_model: int
    nhead: int
    num_layers: int
    d_kv: Optional[int] = None
    dropout: float = 0.0
    norm_first: bool = False
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            TransformerDecoderLayer(
                d_model=self.d_model, nhead=self.nhead, d_kv=self.d_kv,
                dropout=self.dropout, norm_first=self.norm_first,
                attn_impl=self.attn_impl, param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(self, tgt, memory, memory_key_padding_mask=None, deterministic: bool = True):
        x = tgt
        for layer in self.layers:
            x = layer(x, memory, memory_key_padding_mask=memory_key_padding_mask,
                      deterministic=deterministic)
        return x


# PromptLayer/PromptDecoder are the same computation with dropout default 0.1
# (model/decoder.py:24-33); alias kept for zoo readability.
PromptDecoder = DecoderBlock


class FTNBlock(nn.Module):
    """SR-attention decoder layer then x2 bilinear upsample
    (``model/decoder.py:96-111``)."""

    d_model: int
    nhead: int = 8
    sr_ratio: int = 2
    dropout: float = 0.1
    upsample: int = 2
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.attention_block = SRTransformerDecoderLayer(
            d_model=self.d_model, nhead=self.nhead, sr_ratio=self.sr_ratio,
            dropout=self.dropout, attn_impl=self.attn_impl, param_dtype=self.param_dtype,
        )

    def __call__(self, tgt, memory, deterministic: bool = True):
        h = _grid(tgt.shape[1])
        x = self.attention_block(tgt, memory, deterministic=deterministic)
        if self.upsample == 1:
            return x
        return resize_tokens(x, (h, h), scale_factor=self.upsample, method="bilinear", impl=self.attn_impl)


class FTNDecoder(nn.Module):
    """4-stage top-down pyramid fusion (``model/decoder.py:36-94``)."""

    in_dims: Sequence[int]
    dim: int
    dropout: float = 0.1
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(param_dtype=self.param_dtype)
        self.linear_stage_2 = Linear(self.in_dims[1], **kw)
        self.linear_stage_3 = Linear(self.in_dims[2], **kw)
        self.linear2_stage_1 = Linear(self.dim, **kw)
        self.linear2_stage_2 = Linear(self.dim, **kw)
        self.linear2_stage_3 = Linear(self.dim, **kw)
        self.linear2_stage_4 = Linear(self.dim, **kw)
        blk = dict(d_model=self.dim, nhead=8, sr_ratio=2, dropout=self.dropout,
                   attn_impl=self.attn_impl, **kw)
        # final x2 of each stream deferred past the sum (see _HierarchicalBase)
        self.attention_stage_2 = [FTNBlock(**blk, upsample=1, name="attention_stage_2_0")]
        self.attention_stage_3 = [FTNBlock(**blk, upsample=1 if i == 1 else 2,
                                           name=f"attention_stage_3_{i}") for i in range(2)]
        self.attention_stage_4 = [FTNBlock(**blk, upsample=1 if i == 2 else 2,
                                           name=f"attention_stage_4_{i}") for i in range(3)]

    def __call__(self, visual: List[jnp.ndarray], textual: jnp.ndarray, deterministic: bool = True):
        hs = [_grid(t.shape[1]) for t in visual]

        top_down_4 = visual[3]
        top_down_3 = resize_tokens(top_down_4, (hs[3], hs[3]), scale_factor=2, method="bilinear", impl=self.attn_impl)
        top_down_3 = self.linear_stage_3(top_down_3)
        top_down_2 = resize_tokens(top_down_3, (hs[2], hs[2]), scale_factor=2, method="bilinear", impl=self.attn_impl)
        top_down_2 = self.linear_stage_2(top_down_2)
        top_down_1 = visual[0]

        top_down_4 = self.linear2_stage_4(top_down_4)
        top_down_3 = self.linear2_stage_3(top_down_3)
        top_down_2 = self.linear2_stage_2(top_down_2)
        top_down_1 = self.linear2_stage_1(top_down_1)

        for mod in self.attention_stage_4:
            top_down_4 = mod(top_down_4, textual, deterministic)
        for mod in self.attention_stage_3:
            top_down_3 = mod(top_down_3, textual, deterministic)
        for mod in self.attention_stage_2:
            top_down_2 = mod(top_down_2, textual, deterministic)

        s = top_down_2 + top_down_3 + top_down_4
        h = _grid(s.shape[1])
        return top_down_1 + resize_tokens(s, (h, h), scale_factor=2, method="bilinear", impl=self.attn_impl)


class SelfABlock(nn.Module):
    """depth x SR self-attention then x2 bilinear upsample
    (``model/hierarchical.py:133-152``).  ``tie_weights=True`` reproduces the
    reference's shared-instance ModuleList."""

    d_model: int
    nhead: int
    depth: int = 1
    sr_ratio: int = 2
    dropout: float = 0.1
    upsample: int = 2
    tie_weights: bool = True
    attn_impl: str = "auto"
    quant: bool = False
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(d_model=self.d_model, nhead=self.nhead, sr_ratio=self.sr_ratio,
                  dropout=self.dropout, attn_impl=self.attn_impl, quant=self.quant,
                  param_dtype=self.param_dtype)
        n_distinct = 1 if self.tie_weights else self.depth
        self.layers = [SRTransformerEncoderLayer(**kw, name=f"layers_{i}") for i in range(n_distinct)]

    def __call__(self, src, deterministic: bool = True):
        h = _grid(src.shape[1])
        x = src
        for i in range(self.depth):
            layer = self.layers[0] if self.tie_weights else self.layers[i]
            x = layer(x, deterministic=deterministic)
        if self.upsample == 1:
            return x
        return resize_tokens(x, (h, h), scale_factor=self.upsample, method="bilinear", impl=self.attn_impl)


class CrossABlock(nn.Module):
    """depth x SR cross-attention decoder then x2 upsample
    (``model/hierarchical.py:154-172``)."""

    d_model: int
    nhead: int
    depth: int = 1
    sr_ratio: int = 2
    dropout: float = 0.1
    upsample: int = 2
    tie_weights: bool = True
    attn_impl: str = "auto"
    quant: bool = False
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(d_model=self.d_model, nhead=self.nhead, sr_ratio=self.sr_ratio,
                  dropout=self.dropout, attn_impl=self.attn_impl, quant=self.quant,
                  param_dtype=self.param_dtype)
        n_distinct = 1 if self.tie_weights else self.depth
        self.layers = [SRTransformerDecoderLayer(**kw, name=f"layers_{i}") for i in range(n_distinct)]

    def __call__(self, tgt, memory, deterministic: bool = True):
        h = _grid(tgt.shape[1])
        x = tgt
        for i in range(self.depth):
            layer = self.layers[0] if self.tie_weights else self.layers[i]
            x = layer(x, memory, deterministic=deterministic)
        if self.upsample == 1:
            return x
        return resize_tokens(x, (h, h), scale_factor=self.upsample, method="bilinear", impl=self.attn_impl)


class _HierarchicalBase(nn.Module):
    in_dims: Sequence[int]
    depth: Sequence[int]
    dim: int
    nhead: int = 8
    dropout: float = 0.1
    tie_block_weights: bool = True
    attn_impl: str = "auto"
    quant: bool = False  # int8 serving matmuls in the SR layers (ops/quant.py)
    param_dtype: jnp.dtype = jnp.float32

    _block_cls = None  # set by subclasses

    def setup(self):
        assert len(self.in_dims) == 4
        kw = dict(param_dtype=self.param_dtype)
        self.linear_stage_2 = Linear(self.in_dims[1], **kw)
        self.linear_stage_3 = Linear(self.in_dims[2], **kw)
        self.linear2_stage_1 = Linear(self.dim, **kw)
        self.linear2_stage_2 = Linear(self.dim, **kw)
        self.linear2_stage_3 = Linear(self.dim, **kw)
        self.linear2_stage_4 = Linear(self.dim, **kw)
        blk = dict(d_model=self.dim, nhead=self.nhead, sr_ratio=2,
                   dropout=self.dropout, tie_weights=self.tie_block_weights,
                   attn_impl=self.attn_impl, quant=self.quant, **kw)
        cls = type(self)._block_cls
        # TPU optimisation: every stream's LAST block upsamples to the same
        # stage-1 resolution, and the upsample is linear — so the final x2 is
        # deferred past the stream sum (3 big upsamples -> 1; pure fp
        # reassociation, parity-tested).  Last block gets upsample=1.
        self.attention_stage_2 = [cls(**blk, depth=self.depth[0], upsample=1,
                                      name="attention_stage_2_0")]
        self.attention_stage_3 = [cls(**blk, depth=self.depth[1],
                                      upsample=1 if i == 1 else 2,
                                      name=f"attention_stage_3_{i}") for i in range(2)]
        self.attention_stage_4 = [cls(**blk, depth=self.depth[2],
                                      upsample=1 if i == 2 else 2,
                                      name=f"attention_stage_4_{i}") for i in range(3)]

    def _top_down(self, visual):
        hs = [_grid(t.shape[1]) for t in visual]
        top_down_4 = visual[3]
        top_down_3 = resize_tokens(top_down_4, (hs[3], hs[3]), scale_factor=2, method="bilinear", impl=self.attn_impl)
        top_down_3 = self.linear_stage_3(top_down_3)
        top_down_2 = resize_tokens(top_down_3, (hs[2], hs[2]), scale_factor=2, method="bilinear", impl=self.attn_impl)
        top_down_2 = self.linear_stage_2(top_down_2)
        top_down_1 = visual[0]
        return (
            self.linear2_stage_1(top_down_1),
            self.linear2_stage_2(top_down_2),
            self.linear2_stage_3(top_down_3),
            self.linear2_stage_4(top_down_4),
        )


class HierarchicalSelfA(_HierarchicalBase):
    """``model/hierarchical.py:9-69`` — vision-only pyramid decoder."""

    _block_cls = SelfABlock

    def __call__(self, visual: List[jnp.ndarray], deterministic: bool = True):
        t1, t2, t3, t4 = self._top_down(visual)
        for mod in self.attention_stage_4:
            t4 = mod(t4, deterministic)
        for mod in self.attention_stage_3:
            t3 = mod(t3, deterministic)
        for mod in self.attention_stage_2:
            t2 = mod(t2, deterministic)
        # streams summed at stage-2 resolution, single deferred x2 (linear)
        s = t2 + t3 + t4
        h = _grid(s.shape[1])
        return t1 + resize_tokens(s, (h, h), scale_factor=2, method="bilinear", impl=self.attn_impl)


class HierarchicalCrossA(_HierarchicalBase):
    """``model/hierarchical.py:71-131`` — every stage cross-attends to text."""

    _block_cls = CrossABlock

    def __call__(self, visual: List[jnp.ndarray], textual: jnp.ndarray, deterministic: bool = True):
        t1, t2, t3, t4 = self._top_down(visual)
        for mod in self.attention_stage_4:
            t4 = mod(t4, textual, deterministic)
        for mod in self.attention_stage_3:
            t3 = mod(t3, textual, deterministic)
        for mod in self.attention_stage_2:
            t2 = mod(t2, textual, deterministic)
        # streams summed at stage-2 resolution, single deferred x2 (linear)
        s = t2 + t3 + t4
        h = _grid(s.shape[1])
        return t1 + resize_tokens(s, (h, h), scale_factor=2, method="bilinear", impl=self.attn_impl)


class RepeatTransformer(nn.Module):
    """model/ftn.py's ``Transformer`` (``:131-157``): memory = SR(x) computed
    once, then ``repeat`` single-layer TransformerDecoders with optional x2
    upsample after each."""

    dim: int
    repeat: int
    sr_ratio: int
    nhead: int = 8
    upsample: bool = True
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        from lc2is_tpu.nn.layers import Conv2d, LayerNorm

        self.trans = [
            TransformerDecoderLayer(
                d_model=self.dim, nhead=self.nhead, dropout=0.1,
                attn_impl=self.attn_impl, param_dtype=self.param_dtype,
                name=f"trans_{i}_layers_0",
            )
            for i in range(self.repeat)
        ]
        if self.sr_ratio > 1:
            self.sr = Conv2d(self.dim, kernel_size=self.sr_ratio, stride=self.sr_ratio,
                             param_dtype=self.param_dtype)
            self.norm = LayerNorm(param_dtype=self.param_dtype)

    def __call__(self, x, h: int, deterministic: bool = True):
        if self.sr_ratio > 1:
            b, p, c = x.shape
            mem = self.sr(x.reshape(b, h, h, c)).reshape(b, -1, c)
            mem = self.norm(mem)
        else:
            mem = x
        cur_h = h
        for layer in self.trans:
            x = layer(x, mem, deterministic=deterministic)
            if self.upsample:
                x = resize_tokens(x, (cur_h, cur_h), scale_factor=2, method="bilinear", impl=self.attn_impl)
                cur_h *= 2
        return x


class FTNDecoderV2(nn.Module):
    """model/ftn.py's ``Decoder`` (``:67-129``): per-stage linears to
    [256,512,1024,1024], top-down additions for stages 1-2, 512-d projections,
    RepeatTransformer attention (repeat 1/1/2/3, sr 1/2/2/2), stream sum."""

    dim_in: Sequence[int] = (128, 256, 512, 1024)
    dim_out: Sequence[int] = (256, 512, 1024, 1024)
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(param_dtype=self.param_dtype)
        self.linears = [Linear(self.dim_out[i], **kw, name=f"linears_{i}") for i in range(4)]
        self.linears2 = [Linear(512, **kw, name=f"linears2_{i}") for i in range(4)]
        specs = [dict(repeat=1, upsample=False, sr_ratio=1, nhead=1),
                 dict(repeat=1, upsample=True, sr_ratio=2, nhead=8),
                 dict(repeat=2, upsample=True, sr_ratio=2, nhead=8),
                 dict(repeat=3, upsample=True, sr_ratio=2, nhead=8)]
        self.attentions = [
            RepeatTransformer(dim=512, attn_impl=self.attn_impl, **s, **kw, name=f"attentions_{i}")
            for i, s in enumerate(specs)
        ]

    def __call__(self, x: List[jnp.ndarray], deterministic: bool = True):
        H = [128, 64, 32, 16]
        n = len(x)
        add = [None] * n
        for i in range(1, n - 1):
            r = resize_tokens(x[i + 1], (H[i + 1], H[i + 1]), scale_factor=2, method="bilinear", impl=self.attn_impl)
            add[i] = r
        out = [self.linears[i](x[i]) for i in range(n)]
        out = [out[i] + add[i] if i in (1, 2) else out[i] for i in range(n)]
        end = [self.attentions[i](self.linears2[i](out[i]), h=H[i], deterministic=deterministic)
               for i in range(1, n)]
        end = [self.linears2[0](out[0])] + end
        total = end[0]
        for e in end[1:]:
            total = total + e
        return total


class TextToPatch(nn.Module):
    """``model/text_patch.py:4-18``: project visual and textual features into
    the shared 512-d space; returns (t_feature, v_feature)."""

    out: int = 512
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.textual = Linear(self.out, param_dtype=self.param_dtype)
        self.visual = Linear(self.out, param_dtype=self.param_dtype)

    def __call__(self, img, text):
        return self.textual(text), self.visual(img)
