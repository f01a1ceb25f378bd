"""Full-scale golden tests (VERDICT r1 item 4): real-dimension CLIP ViT-B/16
and swin-small vs HF-from-config torch twins (random init, no network), plus
a dedicated unit test for ``interpolate_position_embedding`` against the
reference procedure (``model/encoder.py:32-44``).

Tiny-config parity (test_encoders.py) can miss real-dim bugs: head splits at
768/12, the 14²→32² pos-emb interpolation, window behavior at 512². These
tests run the real shapes once each.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
import jax.numpy as jnp

from lc2is_tpu.models.weights import load_clip_vision_params, load_swin_params
from lc2is_tpu.nn.clip import CLIPVisionTransformer, interpolate_position_embedding
from lc2is_tpu.nn.swin import SwinModel

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# interpolate_position_embedding vs the reference procedure
# ---------------------------------------------------------------------------


def _reference_pos_interp(pos: np.ndarray, old_grid: int, tgt: int) -> np.ndarray:
    """Torch re-enactment of ``model/encoder.py:32-44``: CLS row preserved,
    grid rows reshaped to (1,C,H,W), F.interpolate bicubic to tgt, flattened."""
    import torch.nn.functional as F

    t = torch.from_numpy(pos)
    cls_row = t[:1]
    grid = t[1:].reshape(1, old_grid, old_grid, -1).permute(0, 3, 1, 2)
    new = F.interpolate(grid, mode="bicubic", size=tgt)
    new = new.permute(0, 2, 3, 1).reshape(tgt * tgt, -1)
    return torch.cat([cls_row, new], dim=0).numpy()


@pytest.mark.parametrize("tgt_size", [512, 128, 640])
def test_interpolate_position_embedding_vs_reference(tgt_size, rng):
    """14² -> 32²/8²/40² bicubic with CLS row untouched — the single
    highest-risk numeric transform for v1 parity at 512²."""
    pos = rng.randn(14 * 14 + 1, 768).astype(np.float32)
    ours = np.asarray(interpolate_position_embedding(pos, patch_size=16, new_size=tgt_size))
    ref = _reference_pos_interp(pos, old_grid=14, tgt=tgt_size // 16)
    assert ours.shape == ref.shape == ((tgt_size // 16) ** 2 + 1, 768)
    np.testing.assert_allclose(ours[0], pos[0], atol=0)  # CLS row bit-exact
    assert np.abs(ours - ref).max() < 1e-5


def test_interpolate_position_embedding_identity():
    pos = np.arange((14 * 14 + 1) * 4, dtype=np.float32).reshape(-1, 4)
    out = interpolate_position_embedding(pos, patch_size=16, new_size=224)
    np.testing.assert_array_equal(np.asarray(out), pos)


# ---------------------------------------------------------------------------
# CLIP ViT-B/16 at real dims (768-d, 12 layers, 12 heads)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hf_vit_b16():
    cfg = transformers.CLIPVisionConfig()  # ViT-B/16-ish: 768/12L/12H, patch 32 default
    cfg.patch_size = 16
    assert (cfg.hidden_size, cfg.num_hidden_layers, cfg.num_attention_heads) == (768, 12, 12)
    torch.manual_seed(0)
    m = transformers.CLIPVisionModel(cfg)
    m.eval()
    return m, cfg


def test_clip_vit_b16_parity_224(hf_vit_b16, rng):
    m, cfg = hf_vit_b16
    x = rng.randn(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = m(pixel_values=torch.from_numpy(x)).last_hidden_state.numpy()
    mod = CLIPVisionTransformer(
        image_size=224, patch_size=16, hidden_size=768, num_layers=12,
        num_heads=12, mlp_dim=3072,
    )
    params = load_clip_vision_params(_sd(m), in_size=224, patch_size=16)
    out, _ = mod.apply({"params": params}, jnp.asarray(x))
    assert out.shape == (1, 14 * 14 + 1, 768)
    d = np.abs(np.asarray(out) - ref).max()
    assert d < 1e-4, f"maxdiff {d}"


def test_clip_vit_b16_parity_512_pos_interp(hf_vit_b16, rng):
    """The v1 vision path at the canonical 512² eval size: 1024 visual tokens
    through 12 real-dim layers, position embeddings interpolated 14²→32².
    The torch twin applies the REFERENCE interpolation procedure
    (``model/encoder.py:24-27,32-44``) to the same HF model."""
    m, cfg = hf_vit_b16
    emb = m.vision_model.embeddings
    pos = emb.position_embedding.weight.detach().numpy()
    new_pos = _reference_pos_interp(pos, old_grid=14, tgt=32)

    torch.manual_seed(0)
    m512 = transformers.CLIPVisionModel(cfg)
    m512.load_state_dict(m.state_dict())
    e = m512.vision_model.embeddings
    e.position_ids = torch.arange(32 * 32 + 1).unsqueeze(0)
    e.position_embedding = torch.nn.Embedding(32 * 32 + 1, 768)
    e.position_embedding.weight = torch.nn.Parameter(torch.from_numpy(new_pos))
    if hasattr(e, "image_size"):
        e.image_size = 512
    m512.eval()

    x = rng.randn(1, 3, 512, 512).astype(np.float32)
    with torch.no_grad():
        try:
            ref = m512(pixel_values=torch.from_numpy(x)).last_hidden_state.numpy()
        except (ValueError, RuntimeError):
            ref = m512(pixel_values=torch.from_numpy(x),
                       interpolate_pos_encoding=False).last_hidden_state.numpy()

    mod = CLIPVisionTransformer(
        image_size=512, patch_size=16, hidden_size=768, num_layers=12,
        num_heads=12, mlp_dim=3072,
    )
    params = load_clip_vision_params(_sd(m), in_size=512, patch_size=16)
    assert params["embeddings"]["position_embedding"].shape == (32 * 32 + 1, 768)
    out, _ = mod.apply({"params": params}, jnp.asarray(x))
    assert out.shape == (1, 32 * 32 + 1, 768)
    d = np.abs(np.asarray(out) - ref).max()
    assert d < 2e-4, f"maxdiff {d}"


# ---------------------------------------------------------------------------
# swin-small at real dims (96/192/384/768, depths 2-2-18-2, window 7)
# ---------------------------------------------------------------------------


def test_swin_small_parity_224(rng):
    cfg = transformers.SwinConfig(
        image_size=224, patch_size=4, embed_dim=96, depths=[2, 2, 18, 2],
        num_heads=[3, 6, 12, 24], window_size=7, drop_path_rate=0.0,
    )
    torch.manual_seed(3)
    m = transformers.SwinModel(cfg)
    m.eval()
    x = rng.randn(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = m(pixel_values=torch.from_numpy(x), output_hidden_states=True)
    mod = SwinModel(
        embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), window=7,
        patch_size=4, drop_path_rate=0.0,
    )
    params = load_swin_params(_sd(m))
    hs = mod.apply({"params": params}, jnp.asarray(x))
    # the pyramid the models consume: hidden_states[:4] (encoder.py:130-131)
    for i, (mine, theirs) in enumerate(zip(hs[:4], ref.hidden_states[:4])):
        d = np.abs(np.asarray(mine) - theirs.numpy()).max()
        assert d < 2e-4, f"stage {i}: maxdiff {d}"
