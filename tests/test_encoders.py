"""Activation parity: CLIP ViT / CLIP text / Swin vs HF transformers models
built from config (random init — no hub download needed) with imported
weights.  These are the module-level golden tests from SURVEY.md §7 step 2.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lc2is_tpu.models.weights import (
    load_clip_text_params,
    load_clip_vision_params,
    load_swin_params,
)
from lc2is_tpu.nn.clip import CLIPTextTransformer, CLIPVisionTransformer
from lc2is_tpu.nn.swin import SwinModel

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def hf_clip_vision():
    cfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=64, patch_size=16,
    )
    torch.manual_seed(0)
    m = transformers.CLIPVisionModel(cfg)
    m.eval()
    return m, cfg


@pytest.fixture(scope="module")
def hf_clip_text():
    cfg = transformers.CLIPTextConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=77, vocab_size=1000,
        eos_token_id=999, bos_token_id=998,
    )
    torch.manual_seed(1)
    m = transformers.CLIPTextModel(cfg)
    m.eval()
    return m, cfg


def test_clip_vision_parity(hf_clip_vision, rng):
    m, cfg = hf_clip_vision
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = m(pixel_values=torch.from_numpy(x)).last_hidden_state.numpy()
    mod = CLIPVisionTransformer(
        image_size=64, patch_size=16, hidden_size=64, num_layers=3,
        num_heads=4, mlp_dim=128,
    )
    params = load_clip_vision_params(_sd(m), in_size=64, patch_size=16)
    out, _ = mod.apply({"params": params}, jnp.asarray(x))
    assert np.abs(np.asarray(out) - ref).max() < 2e-5


def test_clip_vision_pos_interp(hf_clip_vision, rng):
    """Pos-embedding bicubic interpolation path (in_size != pretrain size):
    structural check — shapes line up and forward runs at 128²."""
    m, cfg = hf_clip_vision
    params = load_clip_vision_params(_sd(m), in_size=128, patch_size=16)
    assert params["embeddings"]["position_embedding"].shape == (8 * 8 + 1, 64)
    mod = CLIPVisionTransformer(
        image_size=128, patch_size=16, hidden_size=64, num_layers=3,
        num_heads=4, mlp_dim=128,
    )
    x = rng.randn(1, 3, 128, 128).astype(np.float32)
    out, _ = mod.apply({"params": params}, jnp.asarray(x))
    assert out.shape == (1, 65, 64)


def test_clip_text_parity(hf_clip_text, rng):
    m, cfg = hf_clip_text
    eos = int(m.config.eos_token_id)
    ids = rng.randint(1, 900, size=(2, 12)).astype(np.int64)
    ids[:, -3:] = 0
    ids[0, 9] = eos  # EOT position (HF pools at first eos_token_id)
    ids[1, 7] = eos
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        ref = m(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    mod = CLIPTextTransformer(
        vocab_size=1000, hidden_size=48, num_layers=3, num_heads=4, mlp_dim=96,
        eos_token_id=eos,
    )
    params = load_clip_text_params(_sd(m))
    out, pooled = mod.apply(
        {"params": params}, jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )
    assert np.abs(np.asarray(out) - ref.last_hidden_state.numpy()).max() < 2e-5
    assert np.abs(np.asarray(pooled) - ref.pooler_output.numpy()).max() < 2e-5


@pytest.fixture()
def hf_swin():
    # NOTE function-scoped: HF SwinLayer.set_shift_and_window_size MUTATES the
    # torch model when a forward sees min(resolution) <= window, permanently
    # zeroing shift for later forwards.  A fresh instance per test keeps the
    # torch reference honest (our implementation is stateless).
    cfg = transformers.SwinConfig(
        image_size=64, patch_size=4, embed_dim=24, depths=[2, 2, 2],
        num_heads=[2, 4, 8], window_size=4, drop_path_rate=0.0,
    )
    torch.manual_seed(2)
    m = transformers.SwinModel(cfg)
    m.eval()
    return m, cfg


def test_swin_parity(hf_swin, rng):
    m, cfg = hf_swin
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = m(pixel_values=torch.from_numpy(x), output_hidden_states=True)
    mod = SwinModel(
        embed_dim=24, depths=(2, 2, 2), num_heads=(2, 4, 8), window=4,
        patch_size=4, drop_path_rate=0.0,
    )
    params = load_swin_params(_sd(m))
    hs = mod.apply({"params": params}, jnp.asarray(x))
    assert len(hs) == len(ref.hidden_states)
    for i, (mine, theirs) in enumerate(zip(hs, ref.hidden_states)):
        d = np.abs(np.asarray(mine) - theirs.numpy()).max()
        assert d < 5e-5, f"stage {i}: maxdiff {d}"


def test_swin_nondivisible_input(hf_swin, rng):
    """512²-style case: grid not divisible by window (HF pads with zeros,
    shifted mask computed on padded canvas)."""
    m, cfg = hf_swin
    x = rng.randn(1, 3, 72, 72).astype(np.float32)  # 18x18 grid, window 4 -> pad to 20
    with torch.no_grad():
        ref = m(pixel_values=torch.from_numpy(x), output_hidden_states=True)
    mod = SwinModel(
        embed_dim=24, depths=(2, 2, 2), num_heads=(2, 4, 8), window=4,
        patch_size=4, drop_path_rate=0.0,
    )
    params = load_swin_params(_sd(m))
    hs = mod.apply({"params": params}, jnp.asarray(x))
    for i, (mine, theirs) in enumerate(zip(hs, ref.hidden_states)):
        d = np.abs(np.asarray(mine) - theirs.numpy()).max()
        assert d < 5e-5, f"stage {i}: maxdiff {d}"


def test_merge_conv_parity(rng, monkeypatch):
    """LC2IS_MERGE_CONV (merge+LN+reduction as one stride-2 conv + pooled
    moments) vs the strided-slice+concat path: same values and same VJP,
    including the odd-size pad case."""
    from lc2is_tpu.nn.swin import SwinPatchMerging

    for hw, c in ((16, 24), (9, 8)):  # 9: odd → pad path
        mod = SwinPatchMerging(dim=c)
        x = jnp.asarray(rng.randn(2, hw * hw, c).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(0), x, (hw, hw))
        # non-trivial LN params so the affine folding is actually exercised
        params = jax.tree_util.tree_map(
            lambda l: l + 0.1 * np.random.RandomState(1).randn(*l.shape).astype(l.dtype),
            params)

        def loss(p, xx):
            y = mod.apply(p, xx, (hw, hw))
            return (y * jnp.sin(y)).sum()

        monkeypatch.setenv("LC2IS_MERGE_CONV", "0")
        y0 = mod.apply(params, x, (hw, hw))
        g0 = jax.grad(loss, argnums=(0, 1))(params, x)
        monkeypatch.setenv("LC2IS_MERGE_CONV", "1")
        y1 = mod.apply(params, x, (hw, hw))
        g1 = jax.grad(loss, argnums=(0, 1))(params, x)

        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=0, atol=1e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=5e-4),
            g0, g1)


def test_merge_conv_bf16_grad_executes(rng):
    """Training-path regression: the merge-conv VJP at bf16 compute.  The
    original conv used preferred_element_type=f32, whose VJP hands lax.conv
    an f32 cotangent against bf16 operands — TypeError only when
    DIFFERENTIATED at bf16 (inference and f32 tests never hit it; the
    training bench did)."""
    from lc2is_tpu.nn.swin import SwinPatchMerging

    mod = SwinPatchMerging(dim=8)
    x = jnp.asarray(rng.randn(1, 16 * 16, 8).astype(np.float32), jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x, (16, 16))

    def loss(p, xx):
        return mod.apply(p, xx, (16, 16)).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
    assert jnp.isfinite(jnp.asarray(g[1], jnp.float32)).all()
