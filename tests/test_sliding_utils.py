"""Sliding-window inference + root-utils tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lc2is_tpu.engine.sliding import (
    _window_origins,
    multi_scale_sliding_eval,
    sliding_window_logits,
)
from lc2is_tpu.utils import (
    apply_color,
    count_params,
    generate_masks,
    pad_and_concat,
    unpad,
)

torch = pytest.importorskip("torch")


def test_window_origins():
    assert _window_origins(640, 512, 341) == [0, 128]
    assert _window_origins(512, 512, 341) == [0]
    assert _window_origins(1024, 512, 341) == [0, 341, 512]  # last snapped


def test_sliding_window_constant_model(rng):
    """With a linear pixel-local model, sliding-window averaging must equal
    direct application (overlap normalisation correctness)."""
    K = 4
    w = jnp.asarray(rng.randn(K, 3).astype(np.float32))

    def forward(x):  # (N,3,c,c) -> (N,K,c,c) pixel-local linear probe
        return jnp.einsum("kc,nchw->nkhw", w, x)

    img = jnp.asarray(rng.randn(2, 3, 96, 96).astype(np.float32))
    out = sliding_window_logits(forward, img, crop=64, stride=32)
    direct = forward(img)
    assert out.shape == direct.shape
    assert np.abs(np.asarray(out) - np.asarray(direct)).max() < 1e-5


def test_multi_scale_returns_probs(rng):
    K = 5
    w = jnp.asarray(rng.randn(K, 3).astype(np.float32))

    def forward(x):
        return jnp.einsum("kc,nchw->nkhw", w, x)

    img = jnp.asarray(rng.randn(1, 3, 80, 80).astype(np.float32))
    probs = multi_scale_sliding_eval(forward, img, scales=(0.75, 1.0), crop=64, stride=48)
    assert probs.shape == (1, K, 80, 80)
    s = np.asarray(probs.sum(axis=1))
    assert np.abs(s - 1.0).max() < 1e-4  # softmax-averaged


def test_count_params():
    params = {"a": np.zeros((10, 10)), "b": {"c": np.zeros((5,))}}
    assert count_params(params) == pytest.approx(105 / 1e6)
    mask = {"a": True, "b": {"c": False}}
    assert count_params(params, mask) == pytest.approx(100 / 1e6)


def test_generate_masks_matches_torch(rng):
    import torch.nn.functional as TF

    preds = rng.randn(2, 6, 8, 8).astype(np.float32)
    sizes = [(19, 23), (8, 8)]
    mine = generate_masks(jnp.asarray(preds), sizes)
    for i, s in enumerate(sizes):
        ref = TF.interpolate(torch.from_numpy(preds[i : i + 1]), size=s, mode="bicubic")[0]
        assert np.array_equal(np.asarray(mine[i]), ref.argmax(0).numpy())


def test_apply_color(rng):
    mask = jnp.asarray([[1, 2], [2, 9]])
    colors = jnp.asarray([[1, 255, 0, 0], [2, 0, 255, 0]])
    out = np.asarray(apply_color(mask, colors))
    assert out.shape == (3, 2, 2)
    assert tuple(out[:, 0, 0]) == (255, 0, 0)
    assert tuple(out[:, 0, 1]) == (0, 255, 0)
    assert tuple(out[:, 1, 1]) == (9, 9, 9)  # uncovered id keeps raw value


def test_pad_concat_unpad(rng):
    tensors = [jnp.asarray(rng.randn(5, 7)), jnp.asarray(rng.randn(3, 9))]
    sizes = [(5, 7), (3, 9)]
    stacked = pad_and_concat(tensors, sizes)
    assert stacked.shape == (2, 5, 9)
    back = unpad(stacked, sizes)
    for t, b in zip(tensors, back):
        assert np.array_equal(np.asarray(t), np.asarray(b))


@pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
def test_dp_sliding_miou_matches_single_device(rng):
    """BASELINE.json config #5 as one path: multi-scale sliding eval DATA-
    PARALLEL over the 8-device mesh with psum'd per-image mIoU must equal the
    single-device eval exactly (hierarchical variant, tiny dims)."""
    from lc2is_tpu.core.mesh import make_mesh
    from lc2is_tpu.engine.sliding import dp_sliding_miou
    from lc2is_tpu.metrics.miou import per_image_miou
    from lc2is_tpu.models import zoo

    tiny_swin = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window=4)
    cfg = dict(
        text_encoder=dict(context_length=8, vocab_size=49408, transformer_width=512,
                          transformer_heads=8, transformer_layers=1, embed_dim=512),
        context_decoder=dict(transformer_width=64, transformer_heads=4, transformer_layers=1),
        context_length=4,
        text_dim=512,
    )
    names = ("wall", "sky", "tree", "road")
    model = zoo.PromptCrossA(class_names=names, cfg=cfg, swin_cfg=tiny_swin, dropout=0.0)

    # crops must stay divisible by 32 (grid/4 through three pyramid halvings
    # — same constraint as the reference's 480/512 sliding crops), so scales
    # are chosen to keep every scaled size >= crop
    base, crop, stride = 96, 64, 32
    images = jnp.asarray(rng.randn(8, 3, base, base).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, len(names), size=(8, base, base)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), {"pixel_values": images[:1, :, :crop, :crop]})

    def apply_fn(p, x):
        return model.apply(p, {"pixel_values": x})["outputs"]

    kw = dict(scales=(0.75, 1.0), crop=crop, stride=stride, flip=True)
    mesh = make_mesh(data=jax.device_count(), model=1)
    got = dp_sliding_miou(apply_fn, params, images, labels, mesh,
                          num_classes=len(names), **kw)

    probs = multi_scale_sliding_eval(lambda x: apply_fn(params, x), images, **kw)
    want = per_image_miou(probs, labels, num_classes=len(names),
                          upsample_logits_to_label=False)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5, atol=2e-6)
