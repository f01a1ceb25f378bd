"""The LC2IS model zoo — all four generations, TPU-native.

Forward contracts match the reference exactly (SURVEY.md §2.2):
- v1 (``model/model.py``): tuple-returning CLIP dual-encoder models
- v2 (``model/ftn.py``): Swin-FTN, ``(None, score_map)``
- v3 (``model/new.py``): DenseCLIP-prompt FTN, ``(None, out)``
- v4 (``model/final.py``): FINAL family, ``dict(outputs=..., low_score_map=...)``
  — the only family the current Engine consumes (``engine.py:82-86``)

Inputs are the reference's ``inputs`` dict: ``pixel_values`` (B,3,H,W),
optional ``input_ids``/``attention_mask``; outputs keep the reference's NCHW
(B, K, H, W) score-map layout.  Internals are channels-last.

Dim-consistency note: the reference's ``model.py:PromptFTN`` and
``new.py:Base`` wire a swin-small wrapper into swin-base-sized decoders
(d_kv=1024, in_dims=[128,256,512,1024]) — a stale-refactor crash if run
(SURVEY.md §8).  Here they default to swin-base (``swin_variant="base"``),
the configuration they were written against.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lc2is_tpu.nn import init as tinit
from lc2is_tpu.nn.clip import CLIPTextTransformer, CLIPVisionTransformer
from lc2is_tpu.nn.decoders import (
    DecoderBlock,
    FTNDecoder,
    FTNDecoderV2,
    HierarchicalCrossA,
    HierarchicalSelfA,
    TextToPatch,
)
from lc2is_tpu.nn.denseclip import CLIPTextContextEncoder, ContextDecoder
from lc2is_tpu.nn.layers import Linear
from lc2is_tpu.nn.swin import SWIN_BASE, SWIN_SMALL, SwinModel
from lc2is_tpu.ops.bpe import tokenize
from lc2is_tpu.ops.resize import resize

ADE20K_NUM_CLASSES = 151


def _norm(x, axis):
    """torch F.normalize(p=2): x / max(||x||, eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(n, 1e-12).astype(x.dtype)).astype(x.dtype)


def _score_map(v_tokens: jnp.ndarray, t: jnp.ndarray, grid: int) -> jnp.ndarray:
    """L2-normalised cosine classification: (B,P,C)x(B,K,C) -> (B,K,H,W)
    (``model/final.py:349-355`` einsum('bchw,bkc->bkhw'))."""
    b, p, c = v_tokens.shape
    v = _norm(v_tokens.reshape(b, grid, grid, c), axis=-1)
    t = _norm(t, axis=2)
    return jnp.einsum("bhwc,bkc->bkhw", v, t)


def default_denseclip_cfg() -> Dict[str, Any]:
    """The cfg-dict contract of the prompt models (``final.py:91-105``)."""
    return dict(
        text_encoder=dict(
            context_length=13, vocab_size=49408, transformer_width=512,
            transformer_heads=8, transformer_layers=12, embed_dim=512,
        ),
        context_decoder=dict(
            transformer_width=256, transformer_heads=4, transformer_layers=3,
        ),
        context_length=5,
        text_dim=512,
    )


# ---------------------------------------------------------------------------
# v1 — CLIP dual-encoder family (model/model.py)
# ---------------------------------------------------------------------------


class BaseModelWithText(nn.Module):
    """``model/model.py:12-56``.  Returns (feature_t, feature_v, feature_mm)."""

    patch_size: int = 16
    in_size: int = 224
    out_size: int = 224
    dropout: float = 0.0
    num_layers: int = 1
    prototypes: Optional[np.ndarray] = None  # (151, 512) ade20k_prototypes.pt
    vision_kwargs: Optional[Dict[str, Any]] = None  # encoder overrides (tests)
    text_kwargs: Optional[Dict[str, Any]] = None
    nhead: int = 8
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision_encoder = CLIPVisionTransformer(
            image_size=self.in_size, patch_size=self.patch_size,
            attn_impl=self.attn_impl, dtype=self.dtype, **(self.vision_kwargs or {}),
        )
        self.text_encoder = CLIPTextTransformer(attn_impl=self.attn_impl, **(self.text_kwargs or {}))
        protos = self.prototypes
        text_dim = self.text_encoder.hidden_size

        def proto_init(key, shape, dtype=jnp.float32):
            if protos is not None:
                return jnp.asarray(protos, dtype=dtype)
            return jax.random.normal(key, shape, dtype)

        self.class_prototypes = self.param(
            "class_prototypes", proto_init, (ADE20K_NUM_CLASSES, text_dim)
        )
        self.vision_decoder = DecoderBlock(
            d_model=self.vision_encoder.hidden_size, d_kv=text_dim,
            nhead=self.nhead, num_layers=self.num_layers,
            dropout=self.dropout, norm_first=True, attn_impl=self.attn_impl,
        )
        self.pixel_patch = TextToPatch(out=text_dim)

    def __call__(self, inputs: Dict[str, jnp.ndarray], deterministic: bool = True):
        enc_t, _ = self.text_encoder(inputs["input_ids"], inputs.get("attention_mask"))
        enc_v, _ = self.vision_encoder(inputs["pixel_values"])
        enc_v = enc_v[:, 1:, :]  # drop CLS (encoder.py:30)

        mask = inputs.get("attention_mask")
        kpm = None if mask is None else mask != 1  # polarity flip (model.py:38)
        dec_v = self.vision_decoder(enc_v, enc_t, memory_key_padding_mask=kpm,
                                    deterministic=deterministic)

        h = self.in_size // self.patch_size
        b, p, c = dec_v.shape
        x = jnp.moveaxis(dec_v.reshape(b, h, h, c), -1, 1)
        x = resize(x, scale_factor=4, method="bicubic")  # model.py:43
        dec_v = jnp.moveaxis(x, 1, -1).reshape(b, self.out_size * self.out_size, c)

        feature_t, feature_v = self.pixel_patch(dec_v, self.class_prototypes.astype(dec_v.dtype))
        feature_mm = feature_v @ feature_t.T  # (B, P, 151)
        feature_mm = feature_mm.reshape(b, self.out_size, self.out_size, -1)
        feature_mm = jnp.moveaxis(feature_mm, -1, 1)  # (B, 151, H, W)
        return feature_t, feature_v, feature_mm


class ContrastiveModel(nn.Module):
    """``model/model.py:59-103``: no fusion decoder, pooled text features."""

    patch_size: int = 16
    in_size: int = 224
    out_size: int = 224
    dropout: float = 0.0
    num_layers: int = 1
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision_encoder = CLIPVisionTransformer(
            image_size=self.in_size, patch_size=self.patch_size,
            attn_impl=self.attn_impl, dtype=self.dtype,
        )
        self.text_encoder = CLIPTextTransformer(attn_impl=self.attn_impl)
        self.pixel_patch = TextToPatch(out=512)

    def __call__(self, inputs, deterministic: bool = True):
        _, pooled_t = self.text_encoder(inputs["input_ids"], inputs.get("attention_mask"))
        enc_v, _ = self.vision_encoder(inputs["pixel_values"])
        enc_v = enc_v[:, 1:, :]
        h = self.in_size // self.patch_size
        b, p, c = enc_v.shape
        x = jnp.moveaxis(enc_v.reshape(b, h, h, c), -1, 1)
        x = resize(x, scale_factor=4, method="bicubic")
        enc_v = jnp.moveaxis(x, 1, -1).reshape(b, self.out_size * self.out_size, c)
        feature_t, feature_v = self.pixel_patch(enc_v, pooled_t)
        logits = feature_v @ feature_t.T
        return feature_t, feature_v, logits


class DenseClip(nn.Module):
    """``model/model.py:106-171`` (experimental in the reference; CLS kept,
    frozen text pooler, 8-layer prompt decoder).  Returns
    (None, score_map, out)."""

    patch_size: int = 16
    in_size: int = 224
    out_size: int = 224
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision_encoder = CLIPVisionTransformer(
            image_size=self.in_size, patch_size=self.patch_size,
            attn_impl=self.attn_impl, dtype=self.dtype,
        )
        self.text_encoder = CLIPTextTransformer(attn_impl=self.attn_impl)  # frozen
        self.text_patch = TextToPatch(out=512)
        self.prompt_decoder = DecoderBlock(d_model=512, nhead=8, num_layers=8,
                                           dropout=0.1, attn_impl=self.attn_impl)
        self.vision_decoder = DecoderBlock(d_model=768, d_kv=512, nhead=8, num_layers=8,
                                           norm_first=True, attn_impl=self.attn_impl)

    def __call__(self, inputs, deterministic: bool = True):
        b = inputs["pixel_values"].shape[0]
        _, pooled_t = self.text_encoder(inputs["input_ids"], inputs.get("attention_mask"))
        enc_v, _ = self.vision_encoder(inputs["pixel_values"])  # CLS kept
        feature_t, feature_v = self.text_patch(enc_v, pooled_t)
        feature_t = jnp.broadcast_to(feature_t[None], (b, *feature_t.shape))
        v_context = self.prompt_decoder(feature_t, feature_v, deterministic=deterministic)
        text_embeddings = feature_t + 1e-5 * v_context  # model.py:151
        h = self.in_size // self.patch_size
        vis = feature_v[:, 1:, :]
        score_map = _score_map(vis, text_embeddings, h)
        out = self.vision_decoder(enc_v, text_embeddings, deterministic=deterministic)
        return None, score_map, out


class PromptFTNv1(nn.Module):
    """``model/model.py:174-214``: frozen CLIP text pooler + Swin pyramid +
    prompt decoder + FTNDecoder; score map at 128² then bilinear x4.
    swin-base by default (see module docstring on the reference's dim bug)."""

    swin_variant: str = "base"
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = SWIN_BASE if self.swin_variant == "base" else SWIN_SMALL
        dims = [cfg["embed_dim"] * (2 ** i) for i in range(4)]
        self._dims = dims
        self.textual_encoder = CLIPTextTransformer(attn_impl=self.attn_impl)  # frozen
        self.visual_encoder = SwinModel(attn_impl=self.attn_impl, dtype=self.dtype, **cfg)
        self.prompt_decoder = DecoderBlock(d_model=512, d_kv=dims[3], nhead=8,
                                           num_layers=8, dropout=0.1, attn_impl=self.attn_impl)
        self.decoder = FTNDecoder(in_dims=dims, dim=512, attn_impl=self.attn_impl)

    def __call__(self, inputs, deterministic: bool = True):
        b = inputs["pixel_values"].shape[0]
        _, pooled_t = self.textual_encoder(inputs["input_ids"], inputs.get("attention_mask"))
        text_embeddings = jnp.broadcast_to(pooled_t[None], (b, *pooled_t.shape))
        stages = self.visual_encoder(inputs["pixel_values"], deterministic)[:4]
        global_feature = stages[-1]
        visual_context = self.prompt_decoder(text_embeddings, global_feature,
                                             deterministic=deterministic)
        text_embeddings = text_embeddings + 1e-4 * visual_context  # model.py:200
        visual_embeddings = self.decoder(stages, text_embeddings, deterministic)
        grid = int(round(visual_embeddings.shape[1] ** 0.5))  # 128 at 512² (model.py:206)
        score_map = _score_map(visual_embeddings, text_embeddings, grid)
        score_map = resize(score_map, scale_factor=4, method="bilinear")
        return None, score_map


# ---------------------------------------------------------------------------
# v2 — Swin-FTN family (model/ftn.py)
# ---------------------------------------------------------------------------


class BaseFTN(nn.Module):
    """``model/ftn.py:9-27``: swin-base + Decoder + Linear(512->151) head."""

    num_classes: int = ADE20K_NUM_CLASSES
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = SwinModel(attn_impl=self.attn_impl, dtype=self.dtype, **SWIN_BASE)
        self.decoder = FTNDecoderV2(attn_impl=self.attn_impl)
        self.classif = Linear(self.num_classes)

    def __call__(self, inputs, deterministic: bool = True):
        stages = self.backbone(inputs["pixel_values"], deterministic)[:4]
        out = self.decoder(stages, deterministic)
        cls = self.classif(out)  # (B, 128², 151)
        b, p, k = cls.shape
        reshaped = jnp.moveaxis(cls.reshape(b, 128, 128, k), -1, 1)
        reshaped = resize(reshaped, scale_factor=4, method="bilinear")
        return None, reshaped


class PromptFTNv2(nn.Module):
    """``model/ftn.py:29-64``: prompt decoder over the decoded 128² map."""

    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.text_encoder = CLIPTextTransformer(attn_impl=self.attn_impl)  # frozen
        self.backbone = SwinModel(attn_impl=self.attn_impl, dtype=self.dtype, **SWIN_BASE)
        self.prompt_decoder = DecoderBlock(d_model=512, d_kv=512, nhead=8,
                                           num_layers=8, dropout=0.1, attn_impl=self.attn_impl)
        self.decoder = FTNDecoderV2(attn_impl=self.attn_impl)

    def __call__(self, inputs, deterministic: bool = True):
        b = inputs["pixel_values"].shape[0]
        _, classes = self.text_encoder(inputs["input_ids"], inputs.get("attention_mask"))
        stages = self.backbone(inputs["pixel_values"], deterministic)[:4]
        visual_embeddings = self.decoder(stages, deterministic)
        classes_b = jnp.broadcast_to(classes[None], (b, *classes.shape))
        v_context = self.prompt_decoder(classes_b, visual_embeddings, deterministic=deterministic)
        text_embeddings = classes_b + 1e-5 * v_context  # ftn.py:53
        grid = int(round(visual_embeddings.shape[1] ** 0.5))  # 128 at 512² (ftn.py:56)
        score_map = _score_map(visual_embeddings, text_embeddings, grid)
        score_map = resize(score_map, scale_factor=4, method="bilinear")
        return None, score_map


# ---------------------------------------------------------------------------
# v3 — DenseCLIP-prompt FTN (model/new.py)
# ---------------------------------------------------------------------------


class PromptContextBase(nn.Module):
    """Shared prompt-encoding machinery of v3/v4 (``final.py:96-130``):
    frozen CLIPTextContextEncoder + learned contexts + gamma-scaled
    ContextDecoder residual."""

    cfg: Dict[str, Any]
    class_names: Sequence[str]
    visual_dim: int
    attn_impl: str = "auto"

    def setup(self):
        cfg = self.cfg
        self.text_encoder = CLIPTextContextEncoder(attn_impl=self.attn_impl, **cfg["text_encoder"])
        self.texts = jnp.asarray(
            np.concatenate([tokenize(c, context_length=cfg["context_length"]) for c in self.class_names])
        )
        context_length = cfg["text_encoder"]["context_length"] - cfg["context_length"]
        self.contexts = self.param("contexts", tinit.trunc_normal(1.0), (1, context_length, 512))
        self.gamma = self.param("gamma", lambda k, s, d=jnp.float32: jnp.ones(s, d) * 1e-4,
                                (cfg["text_dim"],))
        cd_cfg = {**cfg["context_decoder"], "visual_dim": self.visual_dim,
                  "text_dim": cfg["text_dim"], "dropout": 0.0}
        self.context_decoder = ContextDecoder(attn_impl=self.attn_impl, **cd_cfg)

    def embed_text(self) -> jnp.ndarray:
        """Image-independent half of the tower: (K, C) prompted class
        embeddings.  Depends only on params (texts buffer, learned contexts,
        frozen text encoder) — constant at serving time, so callers with a
        fixed checkpoint precompute it once (~8 ms/step of the 512²/b16
        profile is this transformer) and pass it back as ``text_static``."""
        return self.text_encoder(self.texts, self.contexts)

    def __call__(self, visual_context: jnp.ndarray, deterministic: bool = True,
                 text_static: Optional[jnp.ndarray] = None):
        b = visual_context.shape[0]
        t = self.embed_text() if text_static is None else text_static  # (K, C)
        t = jnp.broadcast_to(t[None], (b, *t.shape))
        text_diff = self.context_decoder(t, visual_context, deterministic)
        return t + self.gamma.astype(t.dtype) * text_diff


class DenseCLIPFTN(nn.Module):
    """``model/new.py:13-73`` (class ``Base``): prompt text encoder + Swin +
    FTNDecoder fusion.  swin-base default (reference dim bug, see header)."""

    cfg: Optional[Dict[str, Any]] = None
    class_names: Optional[Sequence[str]] = None
    swin_variant: str = "base"
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg or default_denseclip_cfg()
        names = self.class_names or [f"class {i}" for i in range(ADE20K_NUM_CLASSES)]
        swin = SWIN_BASE if self.swin_variant == "base" else SWIN_SMALL
        dims = [swin["embed_dim"] * (2 ** i) for i in range(4)]
        self.vision_encoder = SwinModel(attn_impl=self.attn_impl, dtype=self.dtype, **swin)
        self.prompt = PromptContextBase(cfg=cfg, class_names=tuple(names),
                                        visual_dim=dims[3], attn_impl=self.attn_impl)
        self.decoder = FTNDecoder(in_dims=dims, dim=512, dropout=0.0, attn_impl=self.attn_impl)

    def __call__(self, inputs, deterministic: bool = True):
        stages = self.vision_encoder(inputs["pixel_values"], deterministic)[:4]
        visual_context = stages[-1]  # last stage (new.py:40)
        text_embeddings = self.prompt(visual_context, deterministic,
                                      text_static=inputs.get("text_static"))
        x = self.decoder(stages, text_embeddings, deterministic)
        grid = int(round(x.shape[1] ** 0.5))  # 128 at 512² (new.py:66)
        out = _score_map(x, text_embeddings, grid)
        out = resize(out, scale_factor=4, method="bilinear")
        return None, out


# ---------------------------------------------------------------------------
# v4 — FINAL family (model/final.py), dict-returning
# ---------------------------------------------------------------------------


class _FinalBase(nn.Module):
    class_names: Sequence[str] = tuple(f"class {i}" for i in range(ADE20K_NUM_CLASSES))
    dec_dim: int = 512
    dec_depth: Sequence[int] = (1, 1, 1)
    nhead: int = 8
    dropout: float = 0.0
    tie_block_weights: bool = True
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    swin_cfg: Optional[Dict[str, Any]] = None  # override (tests/dryrun); default swin-small
    predict_masks: bool = False  # serving: outputs = argmax masks, upsampled map never materialised
    return_score_map: bool = False  # training: outputs = LOW-RES score map (feeds ops/fused_ce)
    quant_int8: bool = False  # int8 MXU matmuls in swin blocks + decoder (ops/quant.py), serving only

    @property
    def IN_DIMS(self):
        cfg = self.swin_cfg or SWIN_SMALL
        return tuple(cfg["embed_dim"] * (2 ** i) for i in range(len(cfg["depths"])))

    def _make_vision(self):
        return SwinModel(attn_impl=self.attn_impl, dtype=self.dtype,
                         quant=self.quant_int8, **(self.swin_cfg or SWIN_SMALL))

    def _make_decoder(self, cls):
        return cls(
            in_dims=self.IN_DIMS, depth=tuple(self.dec_depth), dim=self.dec_dim,
            nhead=self.nhead, dropout=self.dropout,
            tie_block_weights=self.tie_block_weights, attn_impl=self.attn_impl,
            quant=self.quant_int8,
        )

    def _finish(self, v_tokens, t):
        p = v_tokens.shape[1]
        grid = int(round(p ** 0.5))
        if self.predict_masks:
            # serving fast path: normalise + cosine classify + x4 upsample +
            # argmax in ONE kernel — neither the (B,K,H,W) score map nor its
            # pathological minor→major transpose ever touch HBM (measured:
            # the separate head cost 4.4 ms of the 55.8 ms 512²/b16 step)
            from lc2is_tpu.ops.dispatch import pallas_enabled, pallas_interpret

            if pallas_enabled(self.attn_impl) and grid % 8 == 0:
                from lc2is_tpu.ops.upsample_argmax import score_upsample_argmax

                return score_upsample_argmax(
                    v_tokens, _norm(t, axis=2), grid, r=4,
                    interpret=pallas_interpret())
            score_map = _score_map(v_tokens, t, grid)
            return jnp.argmax(resize(score_map, scale_factor=4, method="bilinear"), axis=1)
        score_map = _score_map(v_tokens, t, grid)
        if self.return_score_map:
            # training fast path: the x4 upsample folds into the fused
            # upsample+CE loss (ops/fused_ce.py) — same loss value/grads
            return score_map
        return resize(score_map, scale_factor=4, method="bilinear")


class ClassWeightTable(nn.Module):
    """The reference's bias-free ``nn.Linear(512, K)`` used purely as a
    (K, C) class-embedding table (``final.py:21,29``) — torch param path
    ``classes.weight`` preserved."""

    num_classes: int
    dim: int = 512

    @nn.compact
    def __call__(self, b: int, dtype):
        w = self.param("weight", tinit.torch_linear_weight, (self.num_classes, self.dim))
        return jnp.broadcast_to(w[None].astype(dtype), (b, self.num_classes, self.dim))


class BaseSelfA(_FinalBase):
    """``final.py:13-49``: class embeddings = bias-free Linear weight."""

    def setup(self):
        self.vision_encoder = self._make_vision()
        self.vision_decoder = self._make_decoder(HierarchicalSelfA)
        self.classes = ClassWeightTable(len(self.class_names), self.dec_dim)

    def __call__(self, inputs, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        v = self.vision_encoder(inputs["pixel_values"], deterministic)[:4]
        t = self.classes(v[-1].shape[0], v[-1].dtype)
        x = self.vision_decoder(v, deterministic)
        return dict(outputs=self._finish(x, t))


class BaseCrossA(_FinalBase):
    """``final.py:51-87``: every pyramid stage cross-attends to classes."""

    def setup(self):
        self.vision_encoder = self._make_vision()
        self.vision_decoder = self._make_decoder(HierarchicalCrossA)
        self.classes = ClassWeightTable(len(self.class_names), self.dec_dim)

    def __call__(self, inputs, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        v = self.vision_encoder(inputs["pixel_values"], deterministic)[:4]
        t = self.classes(v[-1].shape[0], v[-1].dtype)
        x = self.vision_decoder(v, t, deterministic)
        return dict(outputs=self._finish(x, t))


class _PromptFinalBase(_FinalBase):
    cfg: Optional[Dict[str, Any]] = None

    def embed_text(self) -> jnp.ndarray:
        """Serving precompute: run via
        ``model.apply(params, method="embed_text")`` once per checkpoint and
        feed the result back as ``inputs["text_static"]`` — skips the
        image-independent prompt-text transformer every step."""
        return self.prompt.embed_text()

    def _make_prompt(self):
        cfg = self.cfg or default_denseclip_cfg()
        return PromptContextBase(
            cfg=cfg, class_names=tuple(self.class_names),
            visual_dim=self.IN_DIMS[-2],  # stage 3 (final.py:109)
            attn_impl=self.attn_impl,
        )


class PromptSelfA(_PromptFinalBase):
    """``final.py:89-149``."""

    def setup(self):
        self.vision_encoder = self._make_vision()
        self.prompt = self._make_prompt()
        self.vision_decoder = self._make_decoder(HierarchicalSelfA)

    def __call__(self, inputs, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        v = self.vision_encoder(inputs["pixel_values"], deterministic)[:4]
        t = self.prompt(v[2], deterministic,  # stage-3 visual ctx; bf16 path
                        text_static=inputs.get("text_static")).astype(v[-1].dtype)
        x = self.vision_decoder(v, deterministic)
        return dict(outputs=self._finish(x, t))


class PromptCrossA(_PromptFinalBase):
    """``final.py:151-211``."""

    def setup(self):
        self.vision_encoder = self._make_vision()
        self.prompt = self._make_prompt()
        self.vision_decoder = self._make_decoder(HierarchicalCrossA)

    def __call__(self, inputs, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        v = self.vision_encoder(inputs["pixel_values"], deterministic)[:4]
        t = self.prompt(v[2], deterministic,
                        text_static=inputs.get("text_static")).astype(v[-1].dtype)
        x = self.vision_decoder(v, t, deterministic)
        return dict(outputs=self._finish(x, t))


class _AuxMixin:
    def _aux_map(self, v_stage3, t):
        v_low = self.aux_linear(v_stage3)  # (B, 32², 512)
        grid = int(round(v_low.shape[1] ** 0.5))
        return _score_map(v_low, t, grid)  # (B, K, 32, 32)


class PromptAuxSelfA(_PromptFinalBase, _AuxMixin):
    """``final.py:213-286``: + aux head on stage 3 -> low_score_map."""

    def setup(self):
        self.vision_encoder = self._make_vision()
        self.prompt = self._make_prompt()
        # reference hardcodes nn.Linear(in_dims[-2], 512) (final.py:240); 512
        # == cfg["text_dim"] in every reference cfg — tied here so tiny test
        # configs stay consistent
        self.aux_linear = Linear((self.cfg or default_denseclip_cfg())["text_dim"])
        self.vision_decoder = self._make_decoder(HierarchicalSelfA)

    def __call__(self, inputs, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        v = self.vision_encoder(inputs["pixel_values"], deterministic)[:4]
        t = self.prompt(v[2], deterministic,
                        text_static=inputs.get("text_static")).astype(v[-1].dtype)
        low = self._aux_map(v[2], t)
        x = self.vision_decoder(v, deterministic)
        return dict(outputs=self._finish(x, t), low_score_map=low)


class PromptAuxCrossA(_PromptFinalBase, _AuxMixin):
    """``final.py:288-361`` — the canonical training model (SURVEY.md §3.3)."""

    def setup(self):
        self.vision_encoder = self._make_vision()
        self.prompt = self._make_prompt()
        # reference hardcodes nn.Linear(in_dims[-2], 512) (final.py:311); 512
        # == cfg["text_dim"] in every reference cfg — tied here so tiny test
        # configs stay consistent
        self.aux_linear = Linear((self.cfg or default_denseclip_cfg())["text_dim"])
        self.vision_decoder = self._make_decoder(HierarchicalCrossA)

    def __call__(self, inputs, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        v = self.vision_encoder(inputs["pixel_values"], deterministic)[:4]
        t = self.prompt(v[2], deterministic,
                        text_static=inputs.get("text_static")).astype(v[-1].dtype)
        low = self._aux_map(v[2], t)
        x = self.vision_decoder(v, t, deterministic)
        return dict(outputs=self._finish(x, t), low_score_map=low)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

ZOO = {
    # v1
    "base_with_text": BaseModelWithText,
    "contrastive": ContrastiveModel,
    "dense_clip": DenseClip,
    "prompt_ftn_v1": PromptFTNv1,
    # v2
    "base_ftn": BaseFTN,
    "prompt_ftn": PromptFTNv2,
    # v3
    "denseclip_ftn": DenseCLIPFTN,
    # v4
    "base_self_a": BaseSelfA,
    "base_cross_a": BaseCrossA,
    "prompt_self_a": PromptSelfA,
    "prompt_cross_a": PromptCrossA,
    "prompt_aux_self_a": PromptAuxSelfA,
    "prompt_aux_cross_a": PromptAuxCrossA,
}

# Parameter sub-trees the reference freezes (requires_grad=False sites:
# model.py:115-117, ftn.py:33-35, final.py:97-99 ...).  The engine masks these
# out of the optimizer update.
FROZEN_PREFIXES = {
    "dense_clip": ("text_encoder",),
    "prompt_ftn_v1": ("textual_encoder",),
    "prompt_ftn": ("text_encoder",),
    "denseclip_ftn": ("prompt.text_encoder",),
    "prompt_self_a": ("prompt.text_encoder",),
    "prompt_cross_a": ("prompt.text_encoder",),
    "prompt_aux_self_a": ("prompt.text_encoder",),
    "prompt_aux_cross_a": ("prompt.text_encoder",),
}
