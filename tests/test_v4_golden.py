"""Whole-model golden test for the v4 FINAL family: BaseCrossA vs a torch
structural twin (HF Swin backbone + SR-attention hierarchical decoder +
cosine head, the ``final.py:51-87`` wiring) with imported weights.

Validates end-to-end what the per-module tests cover piecewise: the swin
pyramid indexing convention, top-down upsample+linear chain, SR cross-attn
blocks with per-block x2 upsampling, class-table cosine scoring and the
final bilinear x4 — through the real weight-import path.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
import jax
import jax.numpy as jnp

from lc2is_tpu.core.torch_import import state_dict_to_params
from lc2is_tpu.models import zoo
from lc2is_tpu.models.weights import _swin_rename

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

IMG = 128  # all swin grids >= window (HF crashes when it shrinks windows)
WINDOW = 4
DIMS = (16, 32, 64, 128)
HEADS = (1, 2, 4, 8)
DEC_DIM = 64
NHEAD = 4
K = 3  # classes


class TorchSRCross(tnn.TransformerDecoderLayer):
    """SR cross-attention layer twin (conv-reduced self-attn K/V)."""

    def __init__(self):
        super().__init__(DEC_DIM, NHEAD, dropout=0.0, batch_first=True)
        self.sr_ratio = 2
        self.sr = tnn.Conv2d(DEC_DIM, DEC_DIM, kernel_size=2, stride=2)
        self.norm = tnn.LayerNorm(DEC_DIM)

    def _sa_block(self, x, attn_mask, key_padding_mask, is_causal=False):
        b, p, c = x.shape
        h = int(p ** 0.5)
        r = self.sr(x.transpose(1, 2).reshape(b, c, h, h))
        r = self.norm(r.reshape(b, c, -1).transpose(1, 2))
        return self.dropout1(self.self_attn(x, r, r, need_weights=False)[0])


class TorchCrossBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layers = tnn.ModuleList([TorchSRCross()])

    def forward(self, tgt, memory):
        b, p, c = tgt.shape
        h = int(p ** 0.5)
        x = tgt
        for m in self.layers:
            x = m(tgt=x, memory=memory)
        x = x.transpose(1, 2).reshape(b, c, h, h)
        x = TF.interpolate(x, scale_factor=2, mode="bilinear")
        return x.reshape(b, c, 4 * p).transpose(1, 2)


class TorchHierCross(tnn.Module):
    def __init__(self):
        super().__init__()
        self.linear_stage_2 = tnn.Linear(DIMS[2], DIMS[1])
        self.linear_stage_3 = tnn.Linear(DIMS[3], DIMS[2])
        self.linear2_stage_1 = tnn.Linear(DIMS[0], DEC_DIM)
        self.linear2_stage_2 = tnn.Linear(DIMS[1], DEC_DIM)
        self.linear2_stage_3 = tnn.Linear(DIMS[2], DEC_DIM)
        self.linear2_stage_4 = tnn.Linear(DIMS[3], DEC_DIM)
        self.attention_stage_2 = tnn.ModuleList([TorchCrossBlock()])
        self.attention_stage_3 = tnn.ModuleList([TorchCrossBlock() for _ in range(2)])
        self.attention_stage_4 = tnn.ModuleList([TorchCrossBlock() for _ in range(3)])

    def forward(self, visual, textual):
        hs = [int(t.shape[1] ** 0.5) for t in visual]
        td4 = visual[3]
        x = td4.transpose(1, 2).reshape(td4.shape[0], -1, hs[3], hs[3])
        x = TF.interpolate(x, scale_factor=2, mode="bilinear")
        td3 = self.linear_stage_3(x.flatten(2).transpose(1, 2))
        x = td3.transpose(1, 2).reshape(td3.shape[0], -1, hs[2], hs[2])
        x = TF.interpolate(x, scale_factor=2, mode="bilinear")
        td2 = self.linear_stage_2(x.flatten(2).transpose(1, 2))
        td1 = visual[0]
        td1 = self.linear2_stage_1(td1)
        td2 = self.linear2_stage_2(td2)
        td3 = self.linear2_stage_3(td3)
        td4 = self.linear2_stage_4(td4)
        for m in self.attention_stage_4:
            td4 = m(td4, textual)
        for m in self.attention_stage_3:
            td3 = m(td3, textual)
        for m in self.attention_stage_2:
            td2 = m(td2, textual)
        return td1 + td2 + td3 + td4


class TorchV4(tnn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(3)
        cfg = transformers.SwinConfig(
            image_size=IMG, patch_size=4, embed_dim=DIMS[0],
            depths=[1, 1, 1, 1], num_heads=list(HEADS), window_size=WINDOW,
            drop_path_rate=0.0,
        )
        self.vision_encoder = transformers.SwinModel(cfg)
        self.vision_decoder = TorchHierCross()
        self.classes = tnn.Linear(DEC_DIM, K, bias=False)

    def forward(self, pixel_values):
        feats = self.vision_encoder(pixel_values=pixel_values, output_hidden_states=True)
        v = list(feats.hidden_states)[:4]
        b = v[-1].shape[0]
        t = self.classes.weight.expand(b, -1, -1)
        x = self.vision_decoder(v, t)
        p = x.shape[1]
        h = int(p ** 0.5)
        xm = x.transpose(1, 2).reshape(b, -1, h, h)
        xm = TF.normalize(xm, dim=1, p=2)
        tn_ = TF.normalize(t, dim=2, p=2)
        score = torch.einsum("bchw,bkc->bkhw", xm, tn_)
        return TF.interpolate(score, scale_factor=4, mode="bilinear")


def test_v4_base_cross_golden(rng):
    ref = TorchV4()
    ref.eval()
    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def rename(key):
        if key.startswith("vision_encoder."):
            sub = _swin_rename(key[len("vision_encoder."):])
            return None if sub is None else "vision_encoder." + sub
        return key

    params = state_dict_to_params(sd, rename=rename)

    model = zoo.BaseCrossA(
        class_names=tuple(f"c{i}" for i in range(K)), dropout=0.0,
        dec_dim=DEC_DIM, nhead=NHEAD,
        swin_cfg=dict(embed_dim=DIMS[0], depths=(1, 1, 1, 1), num_heads=HEADS, window=WINDOW),
    )
    out = model.apply({"params": params}, {"pixel_values": jnp.asarray(x)})["outputs"]
    d = np.abs(np.asarray(out) - out_ref).max()
    assert d < 5e-5, f"maxdiff {d}"
    assert np.array_equal(np.asarray(jnp.argmax(out, 1)), out_ref.argmax(1))
