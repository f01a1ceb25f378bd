"""Numerical goldens for the DenseCLIP prompt tower against in-test torch
twins with PUBLIC DenseCLIP semantics (the vendored ``model/DenseCLIP``
package is absent from the reference tree — SURVEY.md §2.2; reference usage
contract at ``model/final.py:96-130``).

Pins, at real dims (512-wide text stream, 13-token total context):
- ``CLIPTextContextEncoder``: SOT + learned-context concat, causal CLIP
  transformer (QuickGELU, pre-LN), EOT indexing shifted by the context
  length, ln_final + text_projection.
- ``ContextDecoder``: LN->Linear->LN memory projection, LN->Linear text
  projection, pre-LN decoder layers with bias-free q/k/v, out LN+Linear.
  (Deviation #3, PARITY.md: explicit ``text_dim`` — the twin here renders
  the same deviation in torch, i.e. public DenseCLIP code with the text-side
  projections sized by the text width so the reference's visual_dim=384 /
  text 512-d configuration actually runs.)
- The gamma residual + whole PromptAuxCrossA wiring (``final.py:288-361``)
  end-to-end through the weight-import path.
"""

from collections import OrderedDict

import numpy as np
import pytest
import jax.numpy as jnp

from lc2is_tpu.core.torch_import import state_dict_to_params
from lc2is_tpu.models import zoo
from lc2is_tpu.nn.denseclip import CLIPTextContextEncoder, ContextDecoder
from lc2is_tpu.ops.bpe import tokenize

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402


# ---------------------------------------------------------------------------
# torch twins (public DenseCLIP models.py semantics)
# ---------------------------------------------------------------------------


class TorchQuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchResidualAttentionBlock(tnn.Module):
    def __init__(self, d_model, n_head, attn_mask=None):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d_model, n_head)
        self.ln_1 = tnn.LayerNorm(d_model)
        self.mlp = tnn.Sequential(OrderedDict([
            ("c_fc", tnn.Linear(d_model, d_model * 4)),
            ("gelu", TorchQuickGELU()),
            ("c_proj", tnn.Linear(d_model * 4, d_model)),
        ]))
        self.ln_2 = tnn.LayerNorm(d_model)
        self.attn_mask = attn_mask

    def attention(self, x):
        mask = self.attn_mask.to(dtype=x.dtype, device=x.device) if self.attn_mask is not None else None
        return self.attn(x, x, x, need_weights=False, attn_mask=mask)[0]

    def forward(self, x):
        x = x + self.attention(self.ln_1(x))
        x = x + self.mlp(self.ln_2(x))
        return x


class TorchCLIPTextContextEncoder(tnn.Module):
    """Public ``CLIPTextContextEncoder``: context tokens spliced after SOT,
    causal transformer in LND layout, EOT pooling shifted by the context
    length, ln_final + text_projection."""

    def __init__(self, context_length, vocab_size, transformer_width,
                 transformer_heads, transformer_layers, embed_dim):
        super().__init__()
        self.context_length = context_length
        self.embed_dim = embed_dim
        mask = torch.empty(context_length, context_length)
        mask.fill_(float("-inf"))
        mask.triu_(1)
        self.resblocks = tnn.ModuleList([
            TorchResidualAttentionBlock(transformer_width, transformer_heads, mask)
            for _ in range(transformer_layers)
        ])
        self.token_embedding = tnn.Embedding(vocab_size, transformer_width)
        self.positional_embedding = tnn.Parameter(torch.empty(context_length, transformer_width))
        self.ln_final = tnn.LayerNorm(transformer_width)
        self.text_projection = tnn.Parameter(torch.empty(transformer_width, embed_dim))
        tnn.init.normal_(self.positional_embedding, std=0.01)
        tnn.init.normal_(self.text_projection, std=transformer_width ** -0.5)

    def forward(self, text, context):
        x_text = self.token_embedding(text)  # (K, n1, C)
        K, N1, C = x_text.shape
        B, N2, C = context.shape
        eos_indx = text.argmax(dim=-1) + N2
        eos_indx = eos_indx.reshape(1, K).expand(B, K).reshape(-1)
        x_text = x_text.reshape(1, K, N1, C).expand(B, K, N1, C)
        context = context.reshape(B, 1, N2, C).expand(B, K, N2, C)
        x = torch.cat([x_text[:, :, 0:1], context, x_text[:, :, 1:]], dim=2).reshape(B * K, N1 + N2, C)
        x = x + self.positional_embedding[: N1 + N2]
        x = x.permute(1, 0, 2)  # NLD -> LND
        for blk in self.resblocks:
            x = blk(x)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), eos_indx] @ self.text_projection
        return x.reshape(B, K, self.embed_dim)


class TorchDenseAttention(tnn.Module):
    """Public DenseCLIP ``Attention``: separate q/k/v (qkv_bias=False),
    bias'd out proj, head-batched einsum attention."""

    def __init__(self, dim, num_heads, proj_drop=0.0):
        super().__init__()
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = head_dim ** -0.5
        self.q_proj = tnn.Linear(dim, dim, bias=False)
        self.k_proj = tnn.Linear(dim, dim, bias=False)
        self.v_proj = tnn.Linear(dim, dim, bias=False)
        self.proj = tnn.Linear(dim, dim)
        self.proj_drop = tnn.Dropout(proj_drop)

    def forward(self, q, k, v):
        B, N, C = q.shape
        _, M, _ = k.shape
        q = self.q_proj(q).reshape(B, N, self.num_heads, C // self.num_heads)
        k = self.k_proj(k).reshape(B, M, self.num_heads, C // self.num_heads)
        v = self.v_proj(v).reshape(B, M, self.num_heads, C // self.num_heads)
        attn = torch.einsum("bnkc,bmkc->bknm", q, k) * self.scale
        attn = attn.softmax(dim=-1)
        x = torch.einsum("bknm,bmkc->bnkc", attn, v).reshape(B, N, C)
        return self.proj_drop(self.proj(x))


class TorchTransformerDecoderLayer(tnn.Module):
    def __init__(self, d_model, nhead, dropout=0.0):
        super().__init__()
        self.self_attn = TorchDenseAttention(d_model, nhead, proj_drop=dropout)
        self.cross_attn = TorchDenseAttention(d_model, nhead, proj_drop=dropout)
        self.norm1 = tnn.LayerNorm(d_model)
        self.norm2 = tnn.LayerNorm(d_model)
        self.norm3 = tnn.LayerNorm(d_model)
        self.dropout = tnn.Dropout(dropout)
        self.mlp = tnn.Sequential(
            tnn.Linear(d_model, d_model * 4),
            tnn.GELU(),
            tnn.Dropout(dropout),
            tnn.Linear(d_model * 4, d_model),
        )

    def forward(self, x, mem):
        q = k = v = self.norm1(x)
        x = x + self.self_attn(q, k, v)
        q = self.norm2(x)
        x = x + self.cross_attn(q, mem, mem)
        x = x + self.dropout(self.mlp(self.norm3(x)))
        return x


class TorchContextDecoder(tnn.Module):
    """Public ``ContextDecoder`` with the text-side projections sized by the
    text width (PARITY.md deviation #3 rendered in torch — public code sizes
    them by ``visual_dim``, which shape-errors on the reference cfg)."""

    def __init__(self, transformer_width, transformer_heads, transformer_layers,
                 visual_dim, text_dim, dropout=0.0):
        super().__init__()
        self.memory_proj = tnn.Sequential(
            tnn.LayerNorm(visual_dim),
            tnn.Linear(visual_dim, transformer_width),
            tnn.LayerNorm(transformer_width),
        )
        self.text_proj = tnn.Sequential(
            tnn.LayerNorm(text_dim),
            tnn.Linear(text_dim, transformer_width),
        )
        self.decoder = tnn.ModuleList([
            TorchTransformerDecoderLayer(transformer_width, transformer_heads, dropout)
            for _ in range(transformer_layers)
        ])
        self.out_proj = tnn.Sequential(
            tnn.LayerNorm(transformer_width),
            tnn.Linear(transformer_width, text_dim),
        )

    def forward(self, text, visual):
        visual = self.memory_proj(visual)
        x = self.text_proj(text)
        for layer in self.decoder:
            x = layer(x, visual)
        return self.out_proj(x)


# ---------------------------------------------------------------------------
# renames torch state_dict -> flax params
# ---------------------------------------------------------------------------


def _text_encoder_rename(key: str) -> str:
    key = key.replace("mlp.c_fc", "c_fc").replace("mlp.c_proj", "c_proj")
    return key


_CTX_DECODER_MAP = {
    "memory_proj.0.": "memory_norm_in.",
    "memory_proj.1.": "memory_proj.",
    "memory_proj.2.": "memory_norm_out.",
    "text_proj.0.": "text_norm_in.",
    "text_proj.1.": "text_proj.",
    "out_proj.0.": "out_norm.",
    "out_proj.1.": "out_proj.",
}


def _ctx_decoder_rename(key: str) -> str:
    for old, new in _CTX_DECODER_MAP.items():
        if key.startswith(old):
            key = new + key[len(old):]
            break
    key = key.replace("self_attn.q_proj", "self_attn.q")
    key = key.replace("self_attn.k_proj", "self_attn.k")
    key = key.replace("self_attn.v_proj", "self_attn.v")
    key = key.replace("cross_attn.q_proj", "cross_attn.q")
    key = key.replace("cross_attn.k_proj", "cross_attn.k")
    key = key.replace("cross_attn.v_proj", "cross_attn.v")
    key = key.replace("mlp.0.", "fc1.").replace("mlp.3.", "fc2.")
    return key


# real dims: 512-wide text stream, 13-token total context (default cfg),
# reference visual_dim=384 (swin-small stage 3) with 512-d text
TE_CFG = dict(context_length=13, vocab_size=49408, transformer_width=512,
              transformer_heads=8, transformer_layers=2, embed_dim=512)
CD_CFG = dict(transformer_width=256, transformer_heads=4, transformer_layers=3,
              visual_dim=384, text_dim=512)
K = 6
TOKENIZED_LEN = 5  # cfg["context_length"] -> learned context fills 13-5=8


def test_text_context_encoder_golden(rng):
    torch.manual_seed(0)
    ref = TorchCLIPTextContextEncoder(**TE_CFG)
    ref.eval()

    texts = tokenize([f"thing {i}" for i in range(K)], context_length=TOKENIZED_LEN)
    n2 = TE_CFG["context_length"] - TOKENIZED_LEN
    context = rng.randn(1, n2, TE_CFG["transformer_width"]).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(texts), torch.from_numpy(context)).numpy()[0]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, rename=_text_encoder_rename)
    model = CLIPTextContextEncoder(**TE_CFG)
    got = model.apply({"params": params}, jnp.asarray(texts), jnp.asarray(context))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_text_context_encoder_causal(rng):
    """Perturbing a token AFTER the EOT must not change the pooled embedding
    (fails without the causal mask)."""
    texts = tokenize([f"thing {i}" for i in range(K)], context_length=TOKENIZED_LEN)
    n2 = TE_CFG["context_length"] - TOKENIZED_LEN
    context = jnp.asarray(rng.randn(1, n2, TE_CFG["transformer_width"]).astype(np.float32))
    model = CLIPTextContextEncoder(**TE_CFG)
    import jax

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(texts), context)
    base = model.apply(params, jnp.asarray(texts), context)
    # texts are padded with zeros after EOT; tokenize() leaves trailing zeros
    # for short names — write a junk id into the final (post-EOT) slot
    texts2 = texts.copy()
    assert (texts2[:, -1] == 0).all(), "test premise: padding after EOT"
    texts2[:, -1] = 7
    # EOT index unchanged (ids < SOT), outputs must match exactly
    pert = model.apply(params, jnp.asarray(texts2), context)
    np.testing.assert_allclose(np.asarray(base), np.asarray(pert), atol=1e-6)


def test_context_decoder_golden(rng):
    torch.manual_seed(1)
    ref = TorchContextDecoder(**CD_CFG, dropout=0.0)
    ref.eval()

    B, N = 2, 16
    text = rng.randn(B, K, CD_CFG["text_dim"]).astype(np.float32)
    visual = rng.randn(B, N, CD_CFG["visual_dim"]).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(text), torch.from_numpy(visual)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, rename=_ctx_decoder_rename, sr_fix=False)
    model = ContextDecoder(**CD_CFG, dropout=0.0)
    got = model.apply({"params": params}, jnp.asarray(text), jnp.asarray(visual))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# full PromptAuxCrossA twin (final.py:288-361): prompt tower + gamma residual
# + aux head + cross-attention decoder + cosine scoring, imported weights
# ---------------------------------------------------------------------------


@pytest.mark.slow  # 93 s: full HF/torch-twin golden — slow-tier class; the
# flagship forward stays fast-tier-covered by test_zoo + the canvas suites
def test_prompt_aux_cross_a_golden(rng):
    transformers = pytest.importorskip("transformers")
    from test_v4_golden import DIMS, HEADS, IMG, TorchHierCross, WINDOW, DEC_DIM, NHEAD

    # text_dim == embed_dim == DEC_DIM: the real model keeps all three at 512
    # (final.py:15,96); the tiny twin keeps them equal at 64
    te_cfg = dict(context_length=10, vocab_size=49408, transformer_width=512,
                  transformer_heads=8, transformer_layers=1, embed_dim=DEC_DIM)
    cd_cfg_pub = dict(transformer_width=64, transformer_heads=4, transformer_layers=1)
    tokenized_len = 5
    cfg = dict(text_encoder=te_cfg, context_decoder=cd_cfg_pub,
               context_length=tokenized_len, text_dim=DEC_DIM)
    KK = 3

    class TorchPromptAuxCrossA(tnn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(5)
            swin_cfg = transformers.SwinConfig(
                image_size=IMG, patch_size=4, embed_dim=DIMS[0],
                depths=[1, 1, 1, 1], num_heads=list(HEADS), window_size=WINDOW,
                drop_path_rate=0.0,
            )
            self.vision_encoder = transformers.SwinModel(swin_cfg)
            self.text_encoder = TorchCLIPTextContextEncoder(**te_cfg)
            self.texts = torch.from_numpy(
                tokenize([f"c{i}" for i in range(KK)], context_length=tokenized_len))
            n2 = te_cfg["context_length"] - tokenized_len
            self.contexts = tnn.Parameter(torch.randn(1, n2, 512))
            self.gamma = tnn.Parameter(torch.ones(cfg["text_dim"]) * 1e-4)
            self.context_decoder = TorchContextDecoder(
                **cd_cfg_pub, visual_dim=DIMS[2], text_dim=cfg["text_dim"], dropout=0.0)
            self.aux_linear = tnn.Linear(DIMS[2], cfg["text_dim"])
            self.vision_decoder = TorchHierCross()

        def forward(self, pixel_values):
            feats = self.vision_encoder(pixel_values=pixel_values, output_hidden_states=True)
            v = list(feats.hidden_states)[:4]
            B = v[2].shape[0]
            visual_context = v[2]
            text_embeddings = self.text_encoder(self.texts, self.contexts).expand(B, -1, -1)
            text_diff = self.context_decoder(text_embeddings, visual_context)
            t = text_embeddings + self.gamma * text_diff

            v_low = self.aux_linear(v[2])
            h_low = int(v_low.shape[1] ** 0.5)
            v_low = v_low.transpose(1, 2).reshape(B, -1, h_low, h_low)
            v_low = TF.normalize(v_low, dim=1, p=2)
            t_low = TF.normalize(t, dim=2, p=2)
            low_score_map = torch.einsum("bchw,bkc->bkhw", v_low, t_low)

            x = self.vision_decoder(v, t)
            h = int(x.shape[1] ** 0.5)
            xm = x.transpose(1, 2).reshape(B, -1, h, h)
            xm = TF.normalize(xm, dim=1, p=2)
            tn_ = TF.normalize(t, dim=2, p=2)
            score = torch.einsum("bchw,bkc->bkhw", xm, tn_)
            return TF.interpolate(score, scale_factor=4, mode="bilinear"), low_score_map

    ref = TorchPromptAuxCrossA()
    ref.eval()
    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        want, want_low = (o.numpy() for o in ref(torch.from_numpy(x)))

    from lc2is_tpu.models.weights import _swin_rename

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd.pop("texts", None)

    def rename(key):
        if key.startswith("vision_encoder."):
            sub = _swin_rename(key[len("vision_encoder."):])
            return None if sub is None else "vision_encoder." + sub
        if key.startswith("text_encoder."):
            return "prompt.text_encoder." + _text_encoder_rename(key[len("text_encoder."):])
        if key.startswith("context_decoder."):
            return "prompt.context_decoder." + _ctx_decoder_rename(key[len("context_decoder."):])
        if key in ("contexts", "gamma"):
            return "prompt." + key
        return key

    params = state_dict_to_params(sd, rename=rename)

    model = zoo.PromptAuxCrossA(
        class_names=tuple(f"c{i}" for i in range(KK)), cfg=cfg, dropout=0.0,
        dec_dim=DEC_DIM, nhead=NHEAD,
        swin_cfg=dict(embed_dim=DIMS[0], depths=(1, 1, 1, 1), num_heads=HEADS, window=WINDOW),
    )
    out = model.apply({"params": params}, {"pixel_values": jnp.asarray(x)})
    d = np.abs(np.asarray(out["outputs"]) - want).max()
    d_low = np.abs(np.asarray(out["low_score_map"]) - want_low).max()
    assert d < 5e-5, f"score map maxdiff {d}"
    assert d_low < 5e-5, f"low score map maxdiff {d_low}"
    # argmax equality except where the top-2 gap is inside float noise (random
    # 3-class cosine scores tie at ~1e-5 on some pixels)
    got_am = np.asarray(jnp.argmax(out["outputs"], 1))
    want_am = want.argmax(1)
    srt = np.sort(want, axis=1)
    gap = srt[:, -1] - srt[:, -2]
    mism = (got_am != want_am) & (gap > 1e-4)
    assert not mism.any(), f"{mism.sum()} non-tie argmax mismatches"
