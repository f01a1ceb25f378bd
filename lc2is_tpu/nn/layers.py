"""Torch-semantics building blocks as flax.linen modules.

Parameters use torch layout and torch names (``weight`` is (out, in);
``in_proj_weight`` is packed (3E, E)) so reference checkpoints import with a
plain name walk (core/torch_import.py) — no transposes beyond what the math
itself needs.  Forward math matches torch:

- ``MultiheadAttention`` == ``nn.MultiheadAttention(batch_first=True)``,
  incl. the asymmetric kdim/vdim projections used by the reference's
  cross-attention (``model/decoder.py:13,28``) and key-padding masks
  (True = ignore; polarity per ``model/model.py:38``).
- ``TransformerEncoderLayer`` / ``TransformerDecoderLayer`` replicate torch's
  post-norm default and ``norm_first=True`` orderings with identical dropout
  placement (torch ``_sa_block``/``_mha_block``/``_ff_block``).
- SR (spatial-reduction) variants replicate the SegFormer/PVT-style strided
  conv K/V reduction (``model/decoder.py:113-134``,
  ``model/hierarchical.py:174-225``).

Layout note: everything is channels-last (B, P, C) internally — the
TPU-native layout — with spatial reshapes only at conv/resize boundaries.
"""

from __future__ import annotations

import functools

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lc2is_tpu.nn import init as tinit
from lc2is_tpu.ops.attention import merge_heads, scaled_dot_product_attention, split_heads
from lc2is_tpu.ops.dispatch import pallas_enabled, pallas_interpret


class Linear(nn.Module):
    out_features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        """``return_params=True`` creates/returns (weight, bias) without
        computing — ``x`` (array or ShapeDtypeStruct) supplies in_features.
        Used by the fused Pallas paths, which consume raw weights."""
        in_features = x.shape[-1]
        w = self.param("weight", tinit.torch_linear_weight, (self.out_features, in_features), self.param_dtype)
        b = (self.param("bias", tinit.torch_linear_bias(in_features), (self.out_features,), self.param_dtype)
             if self.use_bias else None)
        if return_params:
            return w, b
        y = x @ w.astype(x.dtype).T
        if b is not None:
            y = y + b.astype(x.dtype)
        return y


class LayerNorm(nn.Module):
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        dim = x.shape[-1]
        w = self.param("weight", tinit.ones, (dim,), self.param_dtype)
        b = self.param("bias", tinit.zeros, (dim,), self.param_dtype)
        if return_params:
            return w, b
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * w + b).astype(x.dtype)


def _s2d_matmul(x, w, k):
    """stride==kernel conv as space-to-depth + matmul (exact reassociation
    of the dot): pure MXU fwd AND vjp (no XLA conv/conv-transpose)."""
    b_, h, wd, c = x.shape
    oh, ow = h // k, wd // k
    p = x[:, : oh * k, : ow * k].reshape(b_, oh, k, ow, k, c)
    p = p.transpose(0, 1, 3, 2, 4, 5).reshape(b_, oh, ow, k * k * c)
    # (O, I, ky, kx) -> (ky·kx·I, O) in the patch vector's order
    wm = w.transpose(2, 3, 1, 0).reshape(k * k * c, w.shape[0])
    return p @ wm.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_sk_smallc(x, w, k):
    """Small-C stride==kernel conv: lax.conv FORWARD (the space-to-depth
    intermediate at C=3 tile-pads 3 lanes → 128, ~40× write amplification —
    measured embed chain 2.23 ms s2d vs 1.5 ms conv) with the SPACE-TO-DEPTH
    backward (XLA's conv-transpose data-grad at C=3 is far slower than the
    s2d matmul adjoints — measured bench_train 58.6 → 49.9 img/s when the
    embeds went conv both ways)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(k, k), padding="VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"))


def _conv_sk_smallc_fwd(x, w, k):
    return _conv_sk_smallc(x, w, k), (x, w)


def _conv_sk_smallc_bwd(k, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda xx, ww: _s2d_matmul(xx, ww, k), x, w)
    return vjp(g)


_conv_sk_smallc.defvjp(_conv_sk_smallc_fwd, _conv_sk_smallc_bwd)


class Conv2d(nn.Module):
    """Strided conv on NHWC input with torch-layout (O, I, kh, kw) weights.

    Covers the reference's uses: patch embedding (16×16/4×4 stride=k) and the
    SR reduction (k=s=sr_ratio) — all stride==kernel, no padding.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        import os as _os

        in_channels = x.shape[-1]
        k = self.kernel_size
        w = self.param("weight", tinit.torch_conv_weight, (self.out_channels, in_channels, k, k), self.param_dtype)
        s2d_minc = int(_os.environ.get("LC2IS_S2D_MINC", "4"))
        if self.stride == k and in_channels >= s2d_minc:
            y = _s2d_matmul(x, w, k)
        elif self.stride == k:
            # small C: conv fwd + s2d bwd hybrid (see _conv_sk_smallc)
            y = _conv_sk_smallc(x, w.astype(x.dtype), k)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                w.astype(x.dtype),
                window_strides=(self.stride, self.stride),
                padding="VALID",
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", tinit.torch_linear_bias(in_channels * k * k), (self.out_channels,), self.param_dtype)
            y = y + b.astype(x.dtype)
        return y


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - self.rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.rate), 0.0)


class MultiheadAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` (batch_first) in flax.

    If kdim == vdim == embed_dim: packed ``in_proj_weight`` (3E, E).
    Otherwise: ``q_proj_weight`` (E, E), ``k_proj_weight`` (E, kdim),
    ``v_proj_weight`` (E, vdim) — torch's ``_qkv_same_embed_dim=False`` path.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    kdim: Optional[int] = None
    vdim: Optional[int] = None
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        e = self.embed_dim
        kdim = self.kdim if self.kdim is not None else e
        vdim = self.vdim if self.vdim is not None else e
        self._same = kdim == e and vdim == e
        if self._same:
            self.in_proj_weight = self.param(
                "in_proj_weight", tinit.xavier_uniform, (3 * e, e), self.param_dtype)
        else:
            self.q_proj_weight = self.param("q_proj_weight", tinit.xavier_uniform, (e, e), self.param_dtype)
            self.k_proj_weight = self.param("k_proj_weight", tinit.xavier_uniform, (e, kdim), self.param_dtype)
            self.v_proj_weight = self.param("v_proj_weight", tinit.xavier_uniform, (e, vdim), self.param_dtype)
        self.in_proj_bias = self.param("in_proj_bias", tinit.zeros, (3 * e,), self.param_dtype)
        self.out_proj = OutProj(embed_dim=e, param_dtype=self.param_dtype)

    def proj_weights(self, dt):
        """(wq, wk, wv, bq, bk, bv) in ``dt`` — torch packed-QKV layout."""
        e = self.embed_dim
        if self._same:
            w = self.in_proj_weight.astype(dt)
            wq, wk, wv = w[:e], w[e : 2 * e], w[2 * e :]
        else:
            wq = self.q_proj_weight.astype(dt)
            wk = self.k_proj_weight.astype(dt)
            wv = self.v_proj_weight.astype(dt)
        b = self.in_proj_bias.astype(dt)
        return wq, wk, wv, b[:e], b[e : 2 * e], b[2 * e :]

    def __call__(
        self,
        query,
        key,
        value,
        key_padding_mask=None,
        attn_mask=None,
        deterministic: bool = True,
    ):
        dt = query.dtype
        wq, wk, wv, bq, bk, bv = self.proj_weights(dt)

        q = query @ wq.T + bq
        k = key @ wk.T + bk
        v = value @ wv.T + bv

        q = split_heads(q, self.num_heads)
        k = split_heads(k, self.num_heads)
        v = split_heads(v, self.num_heads)

        drop_rng = None
        if self.dropout > 0.0 and not deterministic:
            drop_rng = self.make_rng("dropout")
        out = scaled_dot_product_attention(
            q,
            k,
            v,
            key_padding_mask=key_padding_mask,
            attn_mask=attn_mask,
            dropout_rate=0.0 if deterministic else self.dropout,
            dropout_rng=drop_rng,
            impl=self.attn_impl,
        )
        out = merge_heads(out)
        return self.out_proj(out)


class OutProj(nn.Module):
    """MHA output projection: torch-Linear-default weight, zero bias."""

    embed_dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        w = self.param("weight", tinit.torch_linear_weight, (self.embed_dim, self.embed_dim), self.param_dtype)
        b = self.param("bias", tinit.zeros, (self.embed_dim,), self.param_dtype)
        if return_params:
            return w, b
        return x @ w.astype(x.dtype).T + b.astype(x.dtype)


def _activation(name_or_fn) -> Callable:
    if callable(name_or_fn):
        return name_or_fn
    return {"relu": jax.nn.relu, "gelu": jax.nn.gelu}[name_or_fn]


def _ff_res_norm(layer, x, norm, *, pre: bool, deterministic: bool):
    """The FF half of a torch transformer layer — ``x + ff(norm(x))`` (pre)
    or ``norm(x + ff(x))`` (post) — via the fused Pallas MLP kernel when the
    dropouts are inactive, the unfused module composition otherwise."""
    fusable = (
        pallas_enabled(layer.attn_impl)
        and isinstance(layer.activation, str)
        and (deterministic or layer.dropout == 0.0)
    )
    if fusable:
        ln_w, ln_b = norm(x, return_params=True)
        w1, b1 = layer.linear1(x, return_params=True)
        w2, b2 = layer.linear2(
            jax.ShapeDtypeStruct((layer.dim_feedforward,), x.dtype), return_params=True
        )
        if getattr(layer, "quant", False):
            from lc2is_tpu.ops.quant import fused_mlp_q

            return fused_mlp_q(
                x, ln_w, ln_b, w1, b1, w2, b2, activation=layer.activation,
                ln_position="pre" if pre else "post", eps=layer.layer_norm_eps,
                interpret=pallas_interpret(),
            )
        from lc2is_tpu.ops.fused_mlp import fused_mlp

        return fused_mlp(
            x, ln_w, ln_b, w1, b1, w2, b2, activation=layer.activation,
            ln_position="pre" if pre else "post", eps=layer.layer_norm_eps,
            interpret=pallas_interpret(),
        )
    if pre:
        return x + layer._ff_block(norm(x), deterministic)
    return norm(x + layer._ff_block(x, deterministic))


class TransformerEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` (batch_first)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    layer_norm_eps: float = 1e-5
    norm_first: bool = False
    attn_impl: str = "auto"
    quant: bool = False  # int8 q/out-proj + MLP matmuls (ops/quant.py), serving only
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiheadAttention(
            embed_dim=self.d_model, num_heads=self.nhead, dropout=self.dropout,
            attn_impl=self.attn_impl, param_dtype=self.param_dtype,
        )
        self.linear1 = Linear(self.dim_feedforward, param_dtype=self.param_dtype)
        self.linear2 = Linear(self.d_model, param_dtype=self.param_dtype)
        self.norm1 = LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype)
        self.norm2 = LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype)
        self.dropout_ff = Dropout(self.dropout)
        self.dropout1 = Dropout(self.dropout)
        self.dropout2 = Dropout(self.dropout)

    def _sa_block(self, x, attn_mask, key_padding_mask, deterministic):
        x = self.self_attn(x, x, x, key_padding_mask=key_padding_mask, attn_mask=attn_mask, deterministic=deterministic)
        return self.dropout1(x, deterministic)

    def _ff_block(self, x, deterministic):
        act = _activation(self.activation)
        x = self.linear2(self.dropout_ff(act(self.linear1(x)), deterministic))
        return self.dropout2(x, deterministic)

    def _sa_kv_source(self, x):
        return x

    def _fused_call(self, x, deterministic):
        from lc2is_tpu.ops.attention_block import fused_attn_block

        dt = x.dtype
        src = self._sa_kv_source(x)
        wq, wk, wv, bq, bk, bv = self.self_attn.proj_weights(dt)
        wo, bo = self.self_attn.out_proj(x, return_params=True)
        n1w, n1b = self.norm1(x, return_params=True)
        x = fused_attn_block(
            x, src @ wk.T + bk, src @ wv.T + bv, wq, bq, wo, bo, n1w, n1b,
            self.nhead, eps=self.layer_norm_eps, interpret=pallas_interpret(),
            quant=self.quant)
        return _ff_res_norm(self, x, self.norm2, pre=False, deterministic=deterministic)

    def __call__(self, src, src_mask=None, src_key_padding_mask=None, deterministic: bool = True):
        x = src
        if (
            not self.norm_first
            and pallas_enabled(self.attn_impl)
            and (deterministic or self.dropout == 0.0)
            and src_mask is None and src_key_padding_mask is None
            and isinstance(self.activation, str)
        ):
            return self._fused_call(x, deterministic)
        if self.norm_first:
            x = x + self._sa_block(self.norm1(x), src_mask, src_key_padding_mask, deterministic)
            x = _ff_res_norm(self, x, self.norm2, pre=True, deterministic=deterministic)
        else:
            x = self.norm1(x + self._sa_block(x, src_mask, src_key_padding_mask, deterministic))
            x = _ff_res_norm(self, x, self.norm2, pre=False, deterministic=deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """torch ``nn.TransformerDecoderLayer`` (batch_first) with the reference's
    asymmetric-cross-attention extension: ``d_kv`` sets kdim=vdim of the
    cross-attention (``model/decoder.py:9-13``)."""

    d_model: int
    nhead: int
    d_kv: Optional[int] = None
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    layer_norm_eps: float = 1e-5
    norm_first: bool = False
    attn_impl: str = "auto"
    quant: bool = False  # int8 q/out-proj + MLP matmuls (ops/quant.py), serving only
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(attn_impl=self.attn_impl, param_dtype=self.param_dtype)
        self.self_attn = MultiheadAttention(embed_dim=self.d_model, num_heads=self.nhead, dropout=self.dropout, **kw)
        self.multihead_attn = MultiheadAttention(
            embed_dim=self.d_model, num_heads=self.nhead, dropout=self.dropout,
            kdim=self.d_kv, vdim=self.d_kv, **kw,
        )
        self.linear1 = Linear(self.dim_feedforward, param_dtype=self.param_dtype)
        self.linear2 = Linear(self.d_model, param_dtype=self.param_dtype)
        self.norm1 = LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype)
        self.norm2 = LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype)
        self.norm3 = LayerNorm(eps=self.layer_norm_eps, param_dtype=self.param_dtype)
        self.dropout_ff = Dropout(self.dropout)
        self.dropout1 = Dropout(self.dropout)
        self.dropout2 = Dropout(self.dropout)
        self.dropout3 = Dropout(self.dropout)

    def _sa_block(self, x, attn_mask, key_padding_mask, deterministic):
        x = self.self_attn(x, x, x, key_padding_mask=key_padding_mask, attn_mask=attn_mask, deterministic=deterministic)
        return self.dropout1(x, deterministic)

    def _mha_block(self, x, mem, attn_mask, key_padding_mask, deterministic):
        x = self.multihead_attn(x, mem, mem, key_padding_mask=key_padding_mask, attn_mask=attn_mask, deterministic=deterministic)
        return self.dropout2(x, deterministic)

    def _ff_block(self, x, deterministic):
        act = _activation(self.activation)
        x = self.linear2(self.dropout_ff(act(self.linear1(x)), deterministic))
        return self.dropout3(x, deterministic)

    def _sa_kv_source(self, x):
        """K/V source of the self-attention (SR subclass reduces it)."""
        return x

    def _fused_call(self, x, memory, deterministic):
        """Post-norm layer via fused Pallas blocks: each attention half is
        q-proj+attn+proj+residual+LN in one kernel (K/V projected in XLA —
        key sets are small), FF via the fused MLP kernel."""
        from lc2is_tpu.ops.attention_block import fused_attn_block

        dt = x.dtype
        interp = pallas_interpret()
        eps = self.layer_norm_eps

        src = self._sa_kv_source(x)
        wq, wk, wv, bq, bk, bv = self.self_attn.proj_weights(dt)
        wo, bo = self.self_attn.out_proj(x, return_params=True)
        n1w, n1b = self.norm1(x, return_params=True)
        x = fused_attn_block(
            x, src @ wk.T + bk, src @ wv.T + bv, wq, bq, wo, bo, n1w, n1b,
            self.nhead, eps=eps, interpret=interp, quant=self.quant)

        # symmetric AND asymmetric kdim/vdim both land here: K/V are
        # projected to d_model in XLA first (wk2 is (E, kdim) — the kernel
        # only ever sees (B, L, E) keys), so the fused block and its Pallas
        # backward cover the reference's d_kv cross-attention too
        wq2, wk2, wv2, bq2, bk2, bv2 = self.multihead_attn.proj_weights(dt)
        wo2, bo2 = self.multihead_attn.out_proj(x, return_params=True)
        n2w, n2b = self.norm2(x, return_params=True)
        mem = memory.astype(dt)
        x = fused_attn_block(
            x, mem @ wk2.T + bk2, mem @ wv2.T + bv2, wq2, bq2, wo2, bo2,
            n2w, n2b, self.nhead, eps=eps, interpret=interp, quant=self.quant)

        return _ff_res_norm(self, x, self.norm3, pre=False, deterministic=deterministic)

    def __call__(
        self,
        tgt,
        memory,
        tgt_mask=None,
        memory_mask=None,
        tgt_key_padding_mask=None,
        memory_key_padding_mask=None,
        deterministic: bool = True,
    ):
        if (
            not self.norm_first
            and pallas_enabled(self.attn_impl)
            and (deterministic or self.dropout == 0.0)
            and tgt_mask is None and memory_mask is None
            and tgt_key_padding_mask is None and memory_key_padding_mask is None
            and isinstance(self.activation, str)
        ):
            return self._fused_call(tgt, memory, deterministic)
        x = tgt
        if self.norm_first:
            x = x + self._sa_block(self.norm1(x), tgt_mask, tgt_key_padding_mask, deterministic)
            x = x + self._mha_block(self.norm2(x), memory, memory_mask, memory_key_padding_mask, deterministic)
            x = _ff_res_norm(self, x, self.norm3, pre=True, deterministic=deterministic)
        else:
            x = self.norm1(x + self._sa_block(x, tgt_mask, tgt_key_padding_mask, deterministic))
            x = self.norm2(x + self._mha_block(x, memory, memory_mask, memory_key_padding_mask, deterministic))
            x = _ff_res_norm(self, x, self.norm3, pre=False, deterministic=deterministic)
        return x


class SRReduce(nn.Module):
    """Strided-conv spatial reduction + LayerNorm over a square token grid
    (``model/decoder.py:117-118,121-134``): params named ``sr`` and ``norm``."""

    d_model: int
    sr_ratio: int
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.sr = Conv2d(self.d_model, kernel_size=self.sr_ratio, stride=self.sr_ratio, param_dtype=self.param_dtype)
        self.norm = LayerNorm(param_dtype=self.param_dtype)

    def __call__(self, x):  # (B, P, C), P = H*W square
        b, p, c = x.shape
        h = int(round(p ** 0.5))
        r = self.sr(x.reshape(b, h, h, c))
        r = r.reshape(b, -1, c)
        return self.norm(r)


class SRTransformerEncoderLayer(TransformerEncoderLayer):
    """``SRTransformerSelfA`` (``model/hierarchical.py:174-199``): queries at
    full resolution, K/V from the conv-reduced tokens."""

    sr_ratio: int = 1

    def setup(self):
        super().setup()
        if self.sr_ratio > 1:
            self.sr_reduce = SRReduce(self.d_model, self.sr_ratio, param_dtype=self.param_dtype)

    def _sa_kv_source(self, x):
        return self.sr_reduce(x) if self.sr_ratio > 1 else x

    def _sa_block(self, x, attn_mask, key_padding_mask, deterministic):
        reduced = self._sa_kv_source(x)
        y = self.self_attn(x, reduced, reduced, key_padding_mask=key_padding_mask, attn_mask=attn_mask, deterministic=deterministic)
        return self.dropout1(y, deterministic)


class SRTransformerDecoderLayer(TransformerDecoderLayer):
    """``SRTransformerDecoder``/``SRTransformerCrossA`` (``model/decoder.py:113``,
    ``model/hierarchical.py:201-225``): SR applies to the SELF-attention K/V;
    cross-attention is untouched."""

    sr_ratio: int = 1

    def setup(self):
        super().setup()
        if self.sr_ratio > 1:
            self.sr_reduce = SRReduce(self.d_model, self.sr_ratio, param_dtype=self.param_dtype)

    def _sa_kv_source(self, x):
        return self.sr_reduce(x) if self.sr_ratio > 1 else x

    def _sa_block(self, x, attn_mask, key_padding_mask, deterministic):
        reduced = self._sa_kv_source(x)
        y = self.self_attn(x, reduced, reduced, key_padding_mask=key_padding_mask, attn_mask=attn_mask, deterministic=deterministic)
        return self.dropout1(y, deterministic)
