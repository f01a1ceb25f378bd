"""Whole-model golden test (SURVEY.md §7 step 2): a torch composite with the
reference ``BaseModelWithText`` structure (HF CLIP encoders + asymmetric
cross-attn decoder + prototype cosine head, ``model/model.py:12-56``) vs our
flax model with the checkpoint imported through
``load_base_model_with_text_params`` — the exact path a real reference
``step-400.pt`` takes."""

import numpy as np
import pytest
import jax.numpy as jnp

from lc2is_tpu.models.weights import load_base_model_with_text_params
from lc2is_tpu.models.zoo import BaseModelWithText

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

VIS_C, TXT_C, HEADS = 64, 48, 4
IMG, PATCH = 64, 16


class TorchComposite(tnn.Module):
    """Structural twin of the reference v1 model at test scale."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        vis_cfg = transformers.CLIPVisionConfig(
            hidden_size=VIS_C, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=HEADS, image_size=IMG, patch_size=PATCH,
        )
        txt_cfg = transformers.CLIPTextConfig(
            hidden_size=TXT_C, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=HEADS, vocab_size=1000, eos_token_id=999, bos_token_id=998,
        )

        class VisWrap(tnn.Module):
            def __init__(self):
                super().__init__()
                self.enc = transformers.CLIPVisionModel(vis_cfg)

        class TxtWrap(tnn.Module):
            def __init__(self):
                super().__init__()
                self.enc = transformers.CLIPTextModel(txt_cfg)

        self.vision_encoder = VisWrap()
        self.text_encoder = TxtWrap()
        self.class_prototypes = tnn.Parameter(torch.randn(151, TXT_C))

        layer = tnn.TransformerDecoderLayer(VIS_C, HEADS, dropout=0.0,
                                            batch_first=True, norm_first=True)
        layer.multihead_attn = tnn.MultiheadAttention(
            VIS_C, HEADS, dropout=0.0, batch_first=True, kdim=TXT_C, vdim=TXT_C
        )
        self.vision_decoder = tnn.TransformerDecoder(layer, num_layers=1)

        class PixelPatch(tnn.Module):
            def __init__(self):
                super().__init__()
                self.textual = tnn.Linear(TXT_C, TXT_C)
                self.visual = tnn.Linear(VIS_C, TXT_C)

        self.pixel_patch = PixelPatch()

    def forward(self, pixel_values, input_ids, attention_mask):
        enc_t = self.text_encoder.enc(input_ids=input_ids, attention_mask=attention_mask).last_hidden_state
        enc_v = self.vision_encoder.enc(pixel_values=pixel_values).last_hidden_state[:, 1:, :]
        kpm = torch.where(attention_mask == 1, False, True)
        dec = self.vision_decoder(tgt=enc_v, memory=enc_t, memory_key_padding_mask=kpm)
        h = IMG // PATCH
        b, p, c = dec.shape
        x = dec.transpose(1, 2).reshape(b, c, h, h)
        x = TF.interpolate(x, scale_factor=4, mode="bicubic")
        out = IMG // PATCH * 4
        dec = x.reshape(b, c, out * out).transpose(1, 2)
        t = self.pixel_patch.textual(self.class_prototypes)
        v = self.pixel_patch.visual(dec)
        mm = v @ t.T
        return t, v, mm.transpose(1, 2).reshape(b, 151, out, out)


def test_v1_full_model_golden(rng):
    ref = TorchComposite()
    ref.eval()
    pixel = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    ids = rng.randint(1, 900, size=(2, 10)).astype(np.int64)
    ids[0, 7] = 999
    ids[1, 5] = 999
    mask = np.ones_like(ids)
    mask[1, 6:] = 0
    with torch.no_grad():
        t_ref, v_ref, mm_ref = ref(torch.from_numpy(pixel), torch.from_numpy(ids),
                                   torch.from_numpy(mask))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = load_base_model_with_text_params(sd, in_size=IMG, patch_size=PATCH)

    model = BaseModelWithText(
        in_size=IMG, out_size=IMG // 4, patch_size=PATCH, dropout=0.0,
        nhead=HEADS,
        vision_kwargs=dict(hidden_size=VIS_C, num_layers=2, num_heads=HEADS, mlp_dim=128),
        text_kwargs=dict(vocab_size=1000, hidden_size=TXT_C, num_layers=2,
                         num_heads=HEADS, mlp_dim=96, eos_token_id=999),
    )
    t, v, mm = model.apply(
        {"params": params},
        {"pixel_values": jnp.asarray(pixel), "input_ids": jnp.asarray(ids),
         "attention_mask": jnp.asarray(mask)},
    )
    assert np.abs(np.asarray(t) - t_ref.numpy()).max() < 3e-5
    assert np.abs(np.asarray(v) - v_ref.numpy()).max() < 3e-5
    assert np.abs(np.asarray(mm) - mm_ref.numpy()).max() < 2e-4
    # the served artifact: identical per-pixel argmax masks
    assert np.array_equal(np.asarray(jnp.argmax(mm, axis=1)), mm_ref.argmax(1).numpy())
