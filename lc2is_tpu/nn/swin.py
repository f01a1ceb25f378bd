"""Swin Transformer in flax, HF-``SwinModel``-weight-compatible.

Rebuilds the backbone behind the reference's ``SwinTransformer`` wrapper
(``model/encoder.py:121-131``: microsoft/swin-small, ``output_hidden_states``
pyramid ``hidden_states[:4]``) and ``model/ftn.py:12`` (swin-base).

TPU-first shape of the computation:
- window partition/shift = reshape + transpose + jnp.roll (no gathers);
- all windows batched into one attention call ((B·nW), heads, 49, 32) that
  rides the shared attention core (Pallas-switchable);
- padding to window multiples replicated exactly as HF does (zero pad
  right/bottom, shifted-window region mask computed on the padded canvas) so
  imported weights reproduce activations at 512²/640² where 128 % 7 != 0.

HF convention notes (verified against transformers.SwinModel):
- ``hidden_states[0]`` is the patch embedding output; ``hidden_states[i]``
  (i>=1) is stage i output AFTER patch merging — so ``hidden_states[:4]`` is
  the [(H/4)²·C, (H/8)²·2C, (H/16)²·4C, (H/32)²·8C] pyramid the reference
  consumes.
- relative_position_index is a buffer (recomputed here, not imported).
- attention mask for shifted windows uses the 9-region img_mask trick with
  -100.0 fill, computed on padded H/W.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lc2is_tpu.nn import init as tinit
from lc2is_tpu.nn.layers import LayerNorm, Linear
from lc2is_tpu.ops.dispatch import pallas_enabled, pallas_interpret


@functools.lru_cache(maxsize=32)
def _relative_position_index(window: int, table_window: Optional[int] = None) -> np.ndarray:
    """Index into a (2·tw-1)² bias table for an effective window ``window``
    (== table window normally; smaller when the input grid is smaller than
    the configured window, mirroring the shrink rule)."""
    tw = table_window or window
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += tw - 1
    rel[:, :, 1] += tw - 1
    rel[:, :, 0] *= 2 * tw - 1
    return rel.sum(-1)  # (w², w²)


def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> Optional[jnp.ndarray]:
    """HF get_attn_mask: region-id trick on the padded canvas; returns
    (num_windows, w², w²) additive mask with -100 at cross-region pairs.

    Built from iota ON DEVICE (not as a dense literal): a (nW, w², w²) f32
    constant is megabytes of StableHLO text per stage and blows the axon
    remote-compile payload limit; the iota construction is a few VPU ops."""
    if shift == 0:
        return None

    def region(n: int, idx):
        # 0: [0, n-window)   1: [n-window, n-shift)   2: [n-shift, n)
        return (idx >= n - window).astype(jnp.int32) + (idx >= n - shift).astype(jnp.int32)

    hh = region(hp, jnp.arange(hp))
    ww = region(wp, jnp.arange(wp))
    img_mask = hh[:, None] * 3 + ww[None, :]
    m = img_mask.reshape(hp // window, window, wp // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = m[:, None, :] - m[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0).astype(jnp.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B·nW, w², C)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """(B·nW, w², C) -> (B, H, W, C)"""
    c = x.shape[-1]
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class SwinSelfAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(param_dtype=self.param_dtype)
        self.query = Linear(self.dim, **kw)
        self.key = Linear(self.dim, **kw)
        self.value = Linear(self.dim, **kw)
        n = 2 * self.window - 1
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table", tinit.zeros, (n * n, self.num_heads), self.param_dtype
        )

    def _bias(self, eff_window: Optional[int]):
        win = eff_window or self.window
        p = win * win
        idx = _relative_position_index(win, self.window)
        bias = self.relative_position_bias_table[idx.reshape(-1)]
        return bias.reshape(p, p, self.num_heads).transpose(2, 0, 1).astype(jnp.float32)

    def fused_inputs(self, x, eff_window: Optional[int] = None):
        """(wqkv, bqkv, bias) for ops.window_attention.fused_window_block —
        params identical to the unfused path (plain packing, no transforms)."""
        wq, bq = self.query(x, return_params=True)
        wk, bk = self.key(x, return_params=True)
        wv, bv = self.value(x, return_params=True)
        return (jnp.concatenate([wq, wk, wv], axis=0),
                jnp.concatenate([bq, bk, bv], axis=0),
                self._bias(eff_window))

    def __call__(self, x, shift_info=None, eff_window: Optional[int] = None):
        """x: (BnW, w², C); shift_info: (hp, wp, win, shift) of the padded
        canvas (shift=0 → no region masking)."""
        bnw, p, c = x.shape
        hds = self.num_heads
        dh = c // hds
        hp, wp, win, shift = shift_info if shift_info is not None else (0, 0, self.window, 0)

        bias = self._bias(eff_window)  # (H, w², w²)

        if pallas_enabled(self.attn_impl):
            from lc2is_tpu.ops.window_attention import region_labels, window_attention

            nW = (hp // win) * (wp // win) if shift else 1
            regions = region_labels(bnw // max(nW, 1), hp, wp, win, shift) if shift else None
            return window_attention(
                self.query(x), self.key(x), self.value(x), bias, regions, hds,
                interpret=pallas_interpret(),
            )

        def heads(t):
            return t.reshape(bnw, p, hds, dh).transpose(0, 2, 1, 3)

        q = heads(self.query(x))
        k = heads(self.key(x))
        v = heads(self.value(x))
        region_mask = _shift_attn_mask(hp, wp, win, shift) if shift else None

        # 5-D attention with lazily-broadcast additive terms: logits are the
        # only (B, nW, H, w², w²) tensor XLA materialises; the bias/mask adds
        # fuse into the matmul epilogue instead of being broadcast in HBM.
        scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
        if region_mask is None:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            logits = logits * scale + bias[None]
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        else:
            nw = region_mask.shape[0]
            q5 = q.reshape(bnw // nw, nw, hds, p, dh)
            k5 = k.reshape(bnw // nw, nw, hds, p, dh)
            v5 = v.reshape(bnw // nw, nw, hds, p, dh)
            rm = jnp.asarray(region_mask)[None, :, None, :, :]  # (1, nW, 1, w², w²)
            logits = jnp.einsum("bwhqd,bwhkd->bwhqk", q5, k5, preferred_element_type=jnp.float32)
            logits = logits * scale + bias[None, None] + rm
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("bwhqk,bwhkd->bwhqd", probs, v5).reshape(bnw, hds, p, dh)
        return out.transpose(0, 2, 1, 3).reshape(bnw, p, c)


class SwinAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    attn_impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_ = SwinSelfAttention(
            self.dim, self.num_heads, self.window, attn_impl=self.attn_impl, param_dtype=self.param_dtype
        )
        self.output = SwinSelfOutput(self.dim, param_dtype=self.param_dtype)

    def fused_inputs(self, x, eff_window=None):
        wqkv, bqkv, bias = self.self_.fused_inputs(x, eff_window)
        wo, bo = self.output(x, return_params=True)
        return wqkv, bqkv, wo, bo, bias

    def __call__(self, x, shift_info=None, eff_window=None):
        return self.output(self.self_(x, shift_info, eff_window))


class SwinSelfOutput(nn.Module):
    dim: int
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.dense = Linear(self.dim, param_dtype=self.param_dtype)

    def __call__(self, x, return_params: bool = False):
        return self.dense(x, return_params=return_params)


class SwinIntermediate(nn.Module):
    dim: int
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.dense = Linear(self.dim, param_dtype=self.param_dtype)

    def __call__(self, x, return_params: bool = False):
        if return_params:
            return self.dense(x, return_params=True)
        return jax.nn.gelu(self.dense(x), approximate=False)


class SwinOutput(nn.Module):
    dim: int
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.dense = Linear(self.dim, param_dtype=self.param_dtype)

    def __call__(self, x, return_params: bool = False):
        return self.dense(x, return_params=return_params)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    attn_impl: str = "auto"
    quant: bool = False  # int8 QKV/proj/MLP matmuls (ops/quant.py), serving only
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(param_dtype=self.param_dtype)
        self.layernorm_before = LayerNorm(**kw)
        self.attention = SwinAttention(self.dim, self.num_heads, self.window, attn_impl=self.attn_impl, **kw)
        self.layernorm_after = LayerNorm(**kw)
        self.intermediate = SwinIntermediate(int(self.dim * self.mlp_ratio), **kw)
        self.output = SwinOutput(self.dim, **kw)

    def _drop_path(self, x, deterministic):
        if self.drop_path == 0.0 or deterministic:
            return x
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (x.shape[0], 1, 1))
        return jnp.where(mask, x / keep, 0.0)

    def __call__(self, x, hw: Tuple[int, int], deterministic: bool = True):
        h, w = hw
        b, p, c = x.shape
        win = self.window
        shift = self.shift if min(h, w) > self.window else 0
        win = min(win, h, w)  # HF: window_size = min(input_resolution) if smaller

        # Stochastic depth does NOT force the unfused path: the fused kernels
        # run with residual=False and the per-sample drop-path mask + residual
        # add happen outside (same math as HF's x + drop_path(branch); the
        # mask multiply autodiffs around the kernels' custom VJPs).
        drop_active = self.drop_path > 0.0 and not deterministic
        fuse_attn = pallas_enabled(self.attn_impl)

        import os as _os

        # canvas-direct kernel: no pad/roll/partition/reverse layout ops at
        # all — the kernel reads the raw (B, H, W, C) canvas (ops/swin_canvas).
        # Measured v5e 512²/b16 swin fwd: C-gate 192 → 30.6 ms, 384 → 28.8
        # (image-batched canvas beats the windowed path at stage 3 — the XLA
        # 7-granular partition/reverse transposes cost ~2.4 ms standalone),
        # 768 → 29.4 (stage-4 canvas loses; 2 blocks, 9 windows/img) — hence
        # the default gate at 384.  Training now routes through it too: the
        # custom VJP is a canvas-direct Pallas backward (in-VMEM recompute,
        # _canvas_bwd_kernel) — the earlier inference-only restriction dated
        # from a recompute-on-recompute fallback that no longer exists.
        # LC2IS_CANVAS_TRAIN=0 restores the windowed training path.
        canvas_maxc = int(_os.environ.get("LC2IS_SWIN_CANVAS_MAXC", "384"))
        # f32 compute doubles the kernel's canvas-sized VMEM intermediates;
        # a full f32 stage-1 canvas (6.3 MB) overflows the 128 MB VMEM
        # (measured: 139.1 MB requested) — fall back to the windowed kernel
        # for big f32 canvases (bf16, the serving dtype, is unaffected)
        canvas_fits = (x.dtype == jnp.bfloat16
                       or h * w * c * x.dtype.itemsize <= 4 * 1024 * 1024)
        # training additionally gates on a channel floor: every extra canvas
        # stage adds fwd+bwd Mosaic kernel variants to the one train-step
        # compile, and the remote compile helper has been OOM-killed with
        # all three stages canvased (SIGKILL from tpu_compile_helper)
        train_minc = int(_os.environ.get("LC2IS_CANVAS_TRAIN_MINC", "384"))
        use_canvas = (fuse_attn and c <= canvas_maxc and canvas_fits
                      and (deterministic
                           or (c >= train_minc
                               and _os.environ.get("LC2IS_CANVAS_TRAIN", "1") != "0"))
                      and _os.environ.get("LC2IS_SWIN_CANVAS", "1") != "0")
        if use_canvas:
            from lc2is_tpu.ops.swin_canvas import swin_canvas_block

            ln_w, ln_b = self.layernorm_before(x, return_params=True)
            wqkv, bqkv, wo, bo, bias = self.attention.fused_inputs(x, eff_window=win)
            ln_w2, ln_b2 = self.layernorm_after(x, return_params=True)
            w1, b1 = self.intermediate(x, return_params=True)
            ff_dim = int(self.dim * self.mlp_ratio)
            w2, b2 = self.output(jax.ShapeDtypeStruct((ff_dim,), x.dtype), return_params=True)
            yc = swin_canvas_block(
                x.reshape(b, h, w, c), ln_w, ln_b, wqkv, bqkv, wo, bo, bias,
                self.num_heads, win, shift, interpret=pallas_interpret(),
                residual=not drop_active)
            if drop_active:
                x = x + self._drop_path(yc.reshape(b, p, c), deterministic)
            else:
                x = yc.reshape(b, p, c)
            if self.quant and not drop_active:  # int8 is serving-only
                from lc2is_tpu.ops.quant import fused_mlp_q

                return fused_mlp_q(x, ln_w2, ln_b2, w1, b1, w2, b2,
                                   activation="gelu", ln_position="pre",
                                   interpret=pallas_interpret())
            from lc2is_tpu.ops.fused_mlp import fused_mlp

            y = fused_mlp(x, ln_w2, ln_b2, w1, b1, w2, b2, activation="gelu",
                          ln_position="pre", residual=not drop_active,
                          interpret=pallas_interpret())
            return x + self._drop_path(y, deterministic) if drop_active else y

        shortcut = x
        if not fuse_attn:
            x = self.layernorm_before(x)
        x = x.reshape(b, h, w, c)
        pad_h = (win - h % win) % win
        pad_w = (win - w % win) % win
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        xw = window_partition(x, win)
        if fuse_attn:
            # LN and the residual add commute with pad/roll/partition (LN is
            # per-token; roll permutes tokens; padded tokens are cropped), so
            # the whole attention half runs as one fused kernel on raw x.
            from lc2is_tpu.ops.window_attention import (
                fused_window_block, pad_labels, region_labels)

            ln_w, ln_b = self.layernorm_before(xw, return_params=True)
            wqkv, bqkv, wo, bo, bias = self.attention.fused_inputs(xw, eff_window=win)
            nW = (hp // win) * (wp // win) if shift else 1
            regions = region_labels(xw.shape[0] // max(nW, 1), hp, wp, win, shift) if shift else None
            # HF pads AFTER layernorm_before; LN runs inside the kernel, so
            # canvas-pad tokens are flagged for post-LN re-zeroing there
            pads = pad_labels(b, h, w, hp, wp, win, shift)
            aw = fused_window_block(
                xw, ln_w, ln_b, wqkv, bqkv, wo, bo, bias, regions,
                self.num_heads, residual=not drop_active,
                interpret=pallas_interpret(),
                pad_mask=pads, quant=self.quant,
            )
        else:
            aw = self.attention(xw, (hp, wp, win, shift), eff_window=win)
        x = window_reverse(aw, win, hp, wp)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            x = x[:, :h, :w, :]
        x = x.reshape(b, p, c)
        if not fuse_attn or drop_active:
            x = shortcut + self._drop_path(x, deterministic)

        if pallas_enabled(self.attn_impl):
            ln_w, ln_b = self.layernorm_after(x, return_params=True)
            w1, b1 = self.intermediate(x, return_params=True)
            ff_dim = int(self.dim * self.mlp_ratio)
            w2, b2 = self.output(jax.ShapeDtypeStruct((ff_dim,), x.dtype), return_params=True)
            if self.quant and not drop_active:  # int8 is serving-only
                from lc2is_tpu.ops.quant import fused_mlp_q

                return fused_mlp_q(x, ln_w, ln_b, w1, b1, w2, b2,
                                   activation="gelu", ln_position="pre",
                                   interpret=pallas_interpret())
            from lc2is_tpu.ops.fused_mlp import fused_mlp

            y = fused_mlp(x, ln_w, ln_b, w1, b1, w2, b2, activation="gelu",
                          ln_position="pre", residual=not drop_active,
                          interpret=pallas_interpret())
            return x + self._drop_path(y, deterministic) if drop_active else y
        y = self.output(self.intermediate(self.layernorm_after(x)))
        return x + self._drop_path(y, deterministic)


class SwinPatchMerging(nn.Module):
    dim: int  # input dim
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.reduction = Linear(2 * self.dim, use_bias=False, param_dtype=self.param_dtype)
        self.norm = LayerNorm(param_dtype=self.param_dtype)

    def __call__(self, x, hw: Tuple[int, int]):
        import os as _os

        h, w = hw
        b, p, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        if _os.environ.get("LC2IS_MERGE_CONV", "1") == "1":
            return self._merge_conv(x)
        # four strided slices + concat; a reshape+transpose variant measured
        # SLOWER on v5e (embed chain 2.23 → 2.72 ms) — XLA handles the
        # stride-2 gathers better than the (…, 2, 2, C)-minor transpose
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        x = self.norm(x)
        return self.reduction(x)

    def _merge_conv(self, x):
        """merge + LN + reduction as ONE stride-2 2×2 conv + pooled moments.

        reduction(LN(concat[x00,x10,x01,x11])) distributes over the concat:
        with the LN affine folded into the reduction weight (Wᵢ' = diag(γᵢ)Wᵢ),
        out[t] = rsqrt(var[t]) · (Σᵢ xᵢ[t]@Wᵢ' − mean[t]·u) + β@Wᵀ, where
        mean/var are moments of the 4C concat (= 2×2 stride-2 sum-pools of
        Σ_c x and Σ_c x², merged) and u = γ@Wᵀ.  The Σᵢ xᵢ[t]@Wᵢ' term IS a
        2×2/stride-2 conv of the raw canvas — no strided slices, no 4C concat
        canvas, no separate LN pass (the strided-gather path read the embed
        chain at 2.17 GB HBM for ~0.4 GB of logical tensors; measured v5e
        512²/b16: embed chain 2.19 → see STATUS).  Exact reassociation of the
        reference math (model/encoder.py Swin consumption; HF SwinPatchMerging
        semantics), pinned by tests/test_encoders.py::test_swin_parity and
        test_merge_conv_parity."""
        b, hp, wp, c = x.shape
        wred, _ = self.reduction(jax.ShapeDtypeStruct((4 * c,), x.dtype),
                                 return_params=True)  # (2C, 4C) torch layout
        lnw, lnb = self.norm(jax.ShapeDtypeStruct((4 * c,), x.dtype),
                             return_params=True)
        wi = wred.astype(jnp.float32).T  # (4C, 2C)
        wfold = lnw.astype(jnp.float32)[:, None] * wi
        # concat part i (rows i·C:(i+1)·C) sits at canvas offset
        # (dr, dc) = (i % 2, i // 2): x0=(0,0) x1=(1,0) x2=(0,1) x3=(1,1)
        wconv = wfold.reshape(2, 2, c, 2 * c).transpose(1, 0, 2, 3)  # (dr, dc, C, 2C)
        u = lnw.astype(jnp.float32) @ wi           # (2C,)
        const = lnb.astype(jnp.float32) @ wi       # (2C,)

        dt = x.dtype
        # conv in the compute dtype on BOTH sides (bf16 MXU accumulates in
        # f32 internally and rounds once — same noise as the slice path's
        # bf16 reduction matmul).  preferred_element_type=f32 here would
        # hand the conv VJP an f32 cotangent against bf16 operands, which
        # lax.conv rejects in the training backward.
        y = jax.lax.conv_general_dilated(
            x, wconv.astype(dt), window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))    # (B, H/2, W/2, 2C)
        y = y.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        xsum = jnp.sum(xf, axis=-1)
        xsq = jnp.sum(xf * xf, axis=-1)
        pool = lambda v: jax.lax.reduce_window(
            v, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID")
        n = 4.0 * c
        mean = pool(xsum) / n
        var = pool(xsq) / n - mean * mean
        inv = jax.lax.rsqrt(var + self.norm.eps)
        out = (y - mean[..., None] * u) * inv[..., None] + const
        return out.astype(dt).reshape(b, (hp // 2) * (wp // 2), 2 * c)


class SwinStage(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window: int
    downsample: bool
    drop_path_rates: Sequence[float]
    attn_impl: str = "auto"
    quant: bool = False
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.blocks = [
            SwinBlock(
                self.dim, self.num_heads, self.window,
                shift=0 if i % 2 == 0 else self.window // 2,
                drop_path=self.drop_path_rates[i],
                attn_impl=self.attn_impl, quant=self.quant,
                param_dtype=self.param_dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        if self.downsample:
            self.downsample_mod = SwinPatchMerging(self.dim, param_dtype=self.param_dtype)

    def __call__(self, x, hw, deterministic: bool = True):
        for blk in self.blocks:
            x = blk(x, hw, deterministic)
        if self.downsample:
            x = self.downsample_mod(x, hw)
            hw = ((hw[0] + 1) // 2, (hw[1] + 1) // 2)
        return x, hw


class SwinModel(nn.Module):
    """Returns the HF hidden_states tuple (embedding + per-stage outputs)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 18, 2)  # swin-small default
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    drop_path_rate: float = 0.1
    attn_impl: str = "auto"
    quant: bool = False  # int8 serving matmuls in blocks (ops/quant.py)
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.patch_proj = SwinPatchEmbed(self.embed_dim, self.patch_size, param_dtype=self.param_dtype)
        self.embed_norm = LayerNorm(param_dtype=self.param_dtype)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        stages = []
        cur = 0
        for i, depth in enumerate(self.depths):
            stages.append(
                SwinStage(
                    dim=self.embed_dim * (2 ** i),
                    depth=depth,
                    num_heads=self.num_heads[i],
                    window=self.window,
                    downsample=i < len(self.depths) - 1,
                    drop_path_rates=tuple(dpr[cur : cur + depth]),
                    attn_impl=self.attn_impl,
                    quant=self.quant,
                    param_dtype=self.param_dtype,
                    name=f"stages_{i}",
                )
            )
            cur += depth
        self.stages = stages
        self.layernorm = LayerNorm(param_dtype=self.param_dtype)

    def __call__(self, pixel_values, deterministic: bool = True) -> List[jnp.ndarray]:
        """pixel_values: (B, 3, H, W). Returns hidden_states list of length
        num_stages+1 matching HF SwinModel(output_hidden_states=True)."""
        x = pixel_values.astype(self.dtype)
        x, hw = self.patch_proj(x)
        x = self.embed_norm(x)
        hidden_states = [x]
        for stage in self.stages:
            x, hw = stage(x, hw, deterministic)
            hidden_states.append(x)
        # HF also produces layernorm(sequence_output); the reference never
        # consumes it (hidden_states[:4]) but we keep the param for import.
        return hidden_states


class SwinPatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):  # (B, 3, H, W)
        import os as _os

        p = self.patch_size
        w = self.param("projection", tinit.torch_conv_weight, (self.embed_dim, 3, p, p), self.param_dtype)
        b_ = self.param("projection_bias", tinit.torch_linear_bias(3 * p * p), (self.embed_dim,), self.param_dtype)
        # An NCHW-direct space-to-depth variant (never materialise the NHWC
        # canvas; c-major patch order) was built and measured 4× SLOWER
        # standalone on v5e (0.90 vs 0.22 ms at b16/512²) — the 48-wide minor
        # dim loses to lax.conv's own layout handling.  Deleted
        # (win-or-delete); scripts/probe_embed.py records the numbers.
        x = jnp.moveaxis(pixel_values, 1, -1)
        h, ww = x.shape[1], x.shape[2]
        pad_h = (p - h % p) % p
        pad_w = (p - ww % p) % p
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        bsz, hh, www, cin = x.shape
        oh, ow = hh // p, www // p
        if cin < int(_os.environ.get("LC2IS_S2D_MINC", "4")):
            # small C: lax.conv forward (the s2d intermediate at C=3
            # tile-pads 3 lanes → 128) + space-to-depth backward (XLA's
            # conv-transpose data-grad is the slow direction)
            from lc2is_tpu.nn.layers import _conv_sk_smallc

            y = _conv_sk_smallc(x, w.astype(x.dtype), p)
            y = y.reshape(bsz, oh * ow, self.embed_dim) + b_.astype(x.dtype)
            return y, (oh, ow)
        # stride==kernel conv as space-to-depth + matmul (same math, pure
        # MXU in forward AND backward — no conv-transpose in the VJP)
        patches = x.reshape(bsz, oh, p, ow, p, cin)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, oh * ow, p * p * cin)
        wm = w.transpose(2, 3, 1, 0).reshape(p * p * cin, self.embed_dim)
        y = patches @ wm.astype(x.dtype) + b_.astype(x.dtype)
        return y, (oh, ow)


# Named configs matching the HF checkpoints the reference loads.
SWIN_SMALL = dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24))
SWIN_BASE = dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32))
SWIN_TINY = dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24))
