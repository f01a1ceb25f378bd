"""Parity: nn/layers vs torch modules with imported weights (eval mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lc2is_tpu.core.torch_import import state_dict_to_params
from lc2is_tpu.nn import layers as L

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _close(a, b, tol=2e-5):
    d = np.abs(np.asarray(a) - b.detach().numpy()).max()
    assert d < tol, f"maxdiff {d}"


def test_linear(rng):
    t = tnn.Linear(8, 16)
    x = rng.randn(2, 5, 8).astype(np.float32)
    params = state_dict_to_params(_np_sd(t))
    y = L.Linear(16).apply({"params": params}, jnp.asarray(x))
    _close(y, t(torch.from_numpy(x)))


def test_layernorm(rng):
    t = tnn.LayerNorm(32)
    with torch.no_grad():
        t.weight.mul_(1.7)
        t.bias.add_(0.3)
    x = rng.randn(4, 32).astype(np.float32)
    params = state_dict_to_params(_np_sd(t))
    y = L.LayerNorm().apply({"params": params}, jnp.asarray(x))
    _close(y, t(torch.from_numpy(x)))


def test_conv2d_strided(rng):
    t = tnn.Conv2d(12, 24, kernel_size=2, stride=2)
    x = rng.randn(2, 12, 8, 8).astype(np.float32)
    params = state_dict_to_params(_np_sd(t))
    y = L.Conv2d(24, kernel_size=2, stride=2).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    ref = t(torch.from_numpy(x)).permute(0, 2, 3, 1)
    _close(y, ref, tol=1e-4)


def test_mha_packed(rng):
    t = tnn.MultiheadAttention(64, 8, batch_first=True)
    t.eval()
    q = rng.randn(2, 10, 64).astype(np.float32)
    kv = rng.randn(2, 7, 64).astype(np.float32)
    mask = np.zeros((2, 7), dtype=bool)
    mask[0, 5:] = True
    params = state_dict_to_params(_np_sd(t))
    y = L.MultiheadAttention(embed_dim=64, num_heads=8).apply(
        {"params": params},
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
        key_padding_mask=jnp.asarray(mask),
    )
    ref, _ = t(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv),
               key_padding_mask=torch.from_numpy(mask))
    _close(y, ref)


def test_mha_kdim_vdim(rng):
    """The reference's asymmetric cross-attn: 768-d queries over 512-d memory
    (model/decoder.py:13)."""
    t = tnn.MultiheadAttention(64, 8, kdim=48, vdim=48, batch_first=True)
    t.eval()
    q = rng.randn(2, 10, 64).astype(np.float32)
    kv = rng.randn(2, 7, 48).astype(np.float32)
    params = state_dict_to_params(_np_sd(t))
    y = L.MultiheadAttention(embed_dim=64, num_heads=8, kdim=48, vdim=48).apply(
        {"params": params}, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv)
    )
    ref, _ = t(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))
    _close(y, ref)


@pytest.mark.parametrize("norm_first", [False, True])
def test_encoder_layer(rng, norm_first):
    t = tnn.TransformerEncoderLayer(64, 4, dim_feedforward=128, dropout=0.0,
                                    batch_first=True, norm_first=norm_first)
    t.eval()
    x = rng.randn(2, 9, 64).astype(np.float32)
    params = state_dict_to_params(_np_sd(t))
    mod = L.TransformerEncoderLayer(d_model=64, nhead=4, dim_feedforward=128,
                                    dropout=0.0, norm_first=norm_first)
    y = mod.apply({"params": params}, jnp.asarray(x))
    _close(y, t(torch.from_numpy(x)))


@pytest.mark.parametrize("norm_first", [False, True])
def test_decoder_layer(rng, norm_first):
    t = tnn.TransformerDecoderLayer(64, 4, dim_feedforward=128, dropout=0.0,
                                    batch_first=True, norm_first=norm_first)
    t.eval()
    x = rng.randn(2, 9, 64).astype(np.float32)
    mem = rng.randn(2, 5, 64).astype(np.float32)
    params = state_dict_to_params(_np_sd(t))
    mod = L.TransformerDecoderLayer(d_model=64, nhead=4, dim_feedforward=128,
                                    dropout=0.0, norm_first=norm_first)
    y = mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(mem))
    _close(y, t(torch.from_numpy(x), torch.from_numpy(mem)))


def test_decoder_layer_dkv_with_padding_mask(rng):
    """DecoderLayer(d_model=768, d_kv=512) + memory_key_padding_mask — the
    BaseModelWithText fusion contract (model/model.py:38)."""

    class RefLayer(tnn.TransformerDecoderLayer):
        def __init__(self):
            super().__init__(64, 8, dropout=0.0, batch_first=True, norm_first=True)
            self.multihead_attn = tnn.MultiheadAttention(
                64, 8, dropout=0.0, batch_first=True, kdim=48, vdim=48
            )

    t = RefLayer()
    t.eval()
    x = rng.randn(2, 16, 64).astype(np.float32)
    mem = rng.randn(2, 6, 48).astype(np.float32)
    mask = np.zeros((2, 6), dtype=bool)
    mask[1, 4:] = True
    params = state_dict_to_params(_np_sd(t))
    mod = L.TransformerDecoderLayer(d_model=64, nhead=8, d_kv=48, dropout=0.0, norm_first=True)
    y = mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(mem),
                  memory_key_padding_mask=jnp.asarray(mask))
    ref = t(torch.from_numpy(x), torch.from_numpy(mem),
            memory_key_padding_mask=torch.from_numpy(mask))
    _close(y, ref)


def _make_torch_sr_decoder_layer(d_model, nhead, sr_ratio, norm_first=False):
    """Torch test-double of the reference's SRTransformerDecoder override
    (strided-conv-reduced K/V in self-attention, decoder.py:113-134)."""
    import torch.nn.functional as TF

    class SRLayer(tnn.TransformerDecoderLayer):
        def __init__(self):
            super().__init__(d_model, nhead, dropout=0.0, batch_first=True,
                             norm_first=norm_first)
            self.sr_ratio = sr_ratio
            self.sr = tnn.Conv2d(d_model, d_model, kernel_size=sr_ratio, stride=sr_ratio)
            self.norm = tnn.LayerNorm(d_model)

        def _sa_block(self, x, attn_mask, key_padding_mask, is_causal=False):
            b, p, c = x.shape
            h = int(p ** 0.5)
            if self.sr_ratio > 1:
                r = self.sr(x.transpose(1, 2).reshape(b, c, h, h))
                r = r.reshape(b, c, -1).transpose(1, 2)
                r = self.norm(r)
            else:
                r = x
            y = self.self_attn(x, r, r, attn_mask=attn_mask,
                               key_padding_mask=key_padding_mask, need_weights=False)[0]
            return self.dropout1(y)

    return SRLayer()


def test_sr_decoder_layer(rng):
    t = _make_torch_sr_decoder_layer(32, 4, sr_ratio=2)
    t.eval()
    x = rng.randn(2, 64, 32).astype(np.float32)  # 8x8 grid
    mem = rng.randn(2, 5, 32).astype(np.float32)
    params = state_dict_to_params(_np_sd(t))
    mod = L.SRTransformerDecoderLayer(d_model=32, nhead=4, dropout=0.0, sr_ratio=2)
    y = mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(mem))
    _close(y, t(torch.from_numpy(x), torch.from_numpy(mem)))


def test_init_statistics():
    """Torch-default init: Linear weights U(-1/sqrt(in), 1/sqrt(in))."""
    params = L.Linear(256).init(jax.random.PRNGKey(0), jnp.ones((1, 128)))["params"]
    w = np.asarray(params["weight"])
    bound = 1 / np.sqrt(128)
    assert w.min() >= -bound and w.max() <= bound
    assert abs(w.std() - bound / np.sqrt(3)) < 0.002
