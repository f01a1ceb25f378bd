"""Forward-contract tests for the full model zoo (tiny shapes, CPU).

Checks the reference output contracts (SURVEY.md §2.2): tuple vs dict
returns, score-map shapes (B, K, 4*grid, 4*grid), aux low_score_map, and
that gradients flow through every trainable leaf.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lc2is_tpu.models import zoo
from lc2is_tpu.ops.bpe import tokenize_batch_padded

B = 1
IMG = 64  # 4x4 ViT grid at patch 16; swin pyramid 16/8/4/2


def _small_denseclip_cfg():
    return dict(
        text_encoder=dict(context_length=10, vocab_size=49408, transformer_width=512,
                          transformer_heads=8, transformer_layers=1, embed_dim=512),
        context_decoder=dict(transformer_width=64, transformer_heads=4, transformer_layers=1),
        context_length=5,
        text_dim=512,
    )


def _inputs(rng, with_text=True):
    x = rng.randn(B, 3, IMG, IMG).astype(np.float32)
    d = {"pixel_values": jnp.asarray(x)}
    if with_text:
        ids, mask = tokenize_batch_padded(["wall, sky", "tree"][:B])
        d["input_ids"] = jnp.asarray(ids)
        d["attention_mask"] = jnp.asarray(mask)
    return d


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def _init_apply(model, inputs):
    params = model.init(jax.random.PRNGKey(0), inputs)
    return params, model.apply(params, inputs)


# --- v1 ---------------------------------------------------------------------

def test_base_model_with_text(rng):
    protos = rng.randn(151, 512).astype(np.float32)
    model = zoo.BaseModelWithText(in_size=IMG, out_size=IMG // 4, prototypes=protos)
    inputs = _inputs(rng)
    params, (t, v, mm) = _init_apply(model, inputs)
    assert t.shape == (151, 512)
    assert v.shape == (B, (IMG // 4) ** 2, 512)
    assert mm.shape == (B, 151, IMG // 4, IMG // 4)
    # prototype table imported verbatim as the trainable param (model.py:22)
    assert np.array_equal(np.asarray(params["params"]["class_prototypes"]), protos)


def test_contrastive_model(rng):
    model = zoo.ContrastiveModel(in_size=IMG, out_size=IMG // 4)
    inputs = _inputs(rng)
    _, (t, v, logits) = _init_apply(model, inputs)
    assert t.shape == (B, 512)
    assert logits.shape == (B, (IMG // 4) ** 2, B)


def test_dense_clip(rng):
    model = zoo.DenseClip(in_size=IMG, out_size=IMG // 4)
    inputs = _inputs(rng)
    _, (none, score, out) = _init_apply(model, inputs)
    assert none is None
    assert score.shape == (B, B, IMG // 16, IMG // 16)
    assert out.shape[0] == B


@pytest.mark.slow  # 48 s: full-width CLIP+FTN build; v1 wiring stays
# fast-tier-covered by test_base_model_with_text / test_contrastive_model
def test_prompt_ftn_v1(rng):
    model = zoo.PromptFTNv1()
    inputs = _inputs(rng)
    _, (none, score) = _init_apply(model, inputs)
    # swin pyramid at 64²: stage1 16² -> decoder sums at 16², then x4
    assert none is None
    assert score.shape == (B, B, IMG, IMG)


# --- v2 ---------------------------------------------------------------------

def test_base_ftn(rng):
    model = zoo.BaseFTN()
    # FTNDecoderV2 hardcodes H=[128,64,32,16] (ftn.py:106) -> needs 512² input;
    # use a 512² zero image to keep it cheap? too big for CPU test — instead
    # validate the decoder graph via a direct call with the right token counts.
    from lc2is_tpu.nn.decoders import FTNDecoderV2

    dec = FTNDecoderV2()
    stages = [jnp.zeros((1, h * h, c)) for h, c in zip([128, 64, 32, 16], [128, 256, 512, 1024])]
    params = dec.init(jax.random.PRNGKey(0), stages)
    out = dec.apply(params, stages)
    assert out.shape == (1, 128 * 128, 512)


# --- v3/v4 ------------------------------------------------------------------

def test_denseclip_ftn(rng):
    model = zoo.DenseCLIPFTN(cfg=_small_denseclip_cfg(), class_names=("wall", "sky", "tree"))
    inputs = _inputs(rng, with_text=False)
    _, (none, out) = _init_apply(model, inputs)
    assert none is None
    assert out.shape == (B, 3, IMG, IMG)


TINY_SWIN = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window=4)


@pytest.mark.parametrize("name", ["base_self_a", "base_cross_a"])
def test_final_base_family(rng, name):
    cls = zoo.ZOO[name]
    model = cls(class_names=("wall", "sky", "tree"), dropout=0.0, swin_cfg=TINY_SWIN)
    inputs = _inputs(rng, with_text=False)
    _, out = _init_apply(model, inputs)
    assert set(out.keys()) == {"outputs"}
    assert out["outputs"].shape == (B, 3, IMG, IMG)


@pytest.mark.parametrize("name", ["prompt_self_a", "prompt_cross_a"])
def test_final_prompt_family(rng, name):
    cls = zoo.ZOO[name]
    model = cls(cfg=_small_denseclip_cfg(), class_names=("wall", "sky", "tree"),
                swin_cfg=TINY_SWIN)
    inputs = _inputs(rng, with_text=False)
    _, out = _init_apply(model, inputs)
    assert out["outputs"].shape == (B, 3, IMG, IMG)


@pytest.mark.parametrize("name", ["prompt_aux_self_a", "prompt_aux_cross_a"])
def test_final_aux_family(rng, name):
    cls = zoo.ZOO[name]
    model = cls(cfg=_small_denseclip_cfg(), class_names=("wall", "sky", "tree"),
                swin_cfg=TINY_SWIN)
    inputs = _inputs(rng, with_text=False)
    params, out = _init_apply(model, inputs)
    assert set(out.keys()) == {"outputs", "low_score_map"}
    assert out["outputs"].shape == (B, 3, IMG, IMG)
    # low_score_map at swin stage-3 resolution (grid/4)² (final.py:258-268)
    assert out["low_score_map"].shape == (B, 3, IMG // 16, IMG // 16)


@pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
def test_grads_flow_aux_cross(rng):
    """End-to-end gradient through the canonical model (CE + 0.4*aux)."""
    from lc2is_tpu.nn.losses import auxiliary_loss, cross_entropy

    model = zoo.PromptAuxCrossA(cfg=_small_denseclip_cfg(), class_names=("wall", "sky", "tree"),
                                swin_cfg=TINY_SWIN)
    inputs = _inputs(rng, with_text=False)
    labels = jnp.asarray(rng.randint(0, 3, size=(B, IMG // 4, IMG // 4)))
    params = model.init(jax.random.PRNGKey(0), inputs)

    def loss_fn(p):
        out = model.apply(p, inputs)
        return cross_entropy(
            jnp.asarray(
                # CE against a label at score-map resolution
                out["outputs"][:, :, :: 4, :: 4]
            ),
            labels,
        ) + 0.4 * auxiliary_loss(out["low_score_map"], labels)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    nonzero = sum(int(jnp.any(g != 0)) for g in flat)
    assert nonzero > len(flat) * 0.5  # most leaves receive gradient


def test_text_static_parity():
    """Serving text-precompute: embed_text once + text_static input must
    reproduce the per-step path bit-for-bit (bench.py serving path)."""
    import numpy as np

    from lc2is_tpu.models import zoo

    model = zoo.PromptAuxCrossA(class_names=tuple(f"c{i}" for i in range(7)),
                                swin_cfg=TINY_SWIN, attn_impl="xla",
                                cfg=_small_denseclip_cfg())
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 64, 64), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), {"pixel_values": x})
    base = model.apply(params, {"pixel_values": x})
    ts = model.apply(params, method="embed_text")
    cached = model.apply(params, {"pixel_values": x, "text_static": ts})
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(cached[k]))
