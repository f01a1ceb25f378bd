"""Parity tests: lc2is_tpu.ops.resize vs torch F.interpolate and PIL.

Covers the three resize semantics the reference mixes (SURVEY.md §7):
torch bicubic/bilinear (no antialias), torch/PIL nearest, PIL bicubic with
antialias (the HF CLIPFeatureExtractor path, evaluate.py:58-60).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lc2is_tpu.ops.resize import resize, resize_tokens

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _maxdiff(a, b):
    return float(np.abs(np.asarray(a) - b.numpy()).max())


@pytest.mark.parametrize("method", ["bilinear", "bicubic"])
@pytest.mark.parametrize("scale", [2, 4])
def test_torch_upsample_scale(rng, method, scale):
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    mine = resize(jnp.asarray(x), scale_factor=scale, method=method)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=scale, mode=method)
    assert _maxdiff(mine, ref) < 3e-5


@pytest.mark.parametrize("method", ["bilinear", "bicubic"])
@pytest.mark.parametrize("size", [(129, 67), (16, 16), (224, 224), (7, 300)])
def test_torch_resize_arbitrary_size(rng, method, size):
    x = rng.randn(1, 2, 37, 41).astype(np.float32)
    mine = resize(jnp.asarray(x), size=size, method=method)
    ref = F.interpolate(torch.from_numpy(x), size=size, mode=method)
    assert _maxdiff(mine, ref) < 3e-5


def test_torch_downsample(rng):
    x = rng.randn(1, 3, 512, 512).astype(np.float32)
    mine = resize(jnp.asarray(x), size=(128, 128), method="bicubic")
    ref = F.interpolate(torch.from_numpy(x), size=(128, 128), mode="bicubic")
    assert _maxdiff(mine, ref) < 3e-5


@pytest.mark.parametrize("scale", [2, 4])
def test_torch_nearest_scale(rng, scale):
    x = rng.randint(0, 151, size=(2, 1, 33, 57)).astype(np.float32)
    mine = resize(jnp.asarray(x), scale_factor=scale, method="nearest")
    ref = F.interpolate(torch.from_numpy(x), scale_factor=scale, mode="nearest")
    assert _maxdiff(mine, ref) == 0.0


@pytest.mark.parametrize("size", [(128, 128), (100, 77)])
def test_torch_nearest_size(rng, size):
    x = rng.randint(0, 151, size=(2, 1, 313, 457)).astype(np.float32)
    mine = resize(jnp.asarray(x), size=size, method="nearest")
    ref = F.interpolate(torch.from_numpy(x), size=size, mode="nearest")
    assert _maxdiff(mine, ref) == 0.0


@pytest.mark.parametrize("size", [(512, 512), (128, 128), (700, 300)])
def test_pil_bicubic_antialias_float_exact(rng, size):
    """Parity vs PIL float ('F') mode — same kernel, same support.  Weight
    matrices are built on-device in f32 (exact integer coordinate
    decomposition; ~1e-6 weight error vs PIL's f64), so the bound is f32
    accumulation on 0..255 inputs, not semantic drift."""
    from PIL import Image

    x = rng.rand(300, 400).astype(np.float32) * 255
    ref = np.asarray(Image.fromarray(x, mode="F").resize((size[1], size[0]), Image.BICUBIC))
    mine = np.asarray(resize(jnp.asarray(x), size=size, method="bicubic", semantics="pil"))
    assert np.abs(mine - ref).max() < 1e-3


def test_pil_bicubic_uint8_statistical(rng):
    """PIL's uint8 path uses fixed-point coefficients and a quantised
    intermediate between the two passes, so it deviates from its own float
    path (up to ~19/255 on noise upscales).  We match the float path; assert
    the uint8 deviation is the same order as PIL-float-vs-PIL-uint8."""
    from PIL import Image

    x8 = (rng.rand(300, 400) * 255).astype(np.uint8)
    size = (128, 128)  # downscale: PIL u8 and float agree within 1
    ref = np.asarray(Image.fromarray(x8).resize((size[1], size[0]), Image.BICUBIC)).astype(np.float32)
    mine = np.asarray(
        resize(jnp.asarray(x8.astype(np.float32)), size=size, method="bicubic", semantics="pil")
    )
    mine_u8 = np.clip(np.round(mine), 0, 255)
    assert np.abs(mine_u8 - ref).max() <= 1.0


def test_pil_nearest(rng):
    from PIL import Image

    x = rng.randint(0, 151, size=(300, 400)).astype(np.uint8)
    im = Image.fromarray(x).resize((128, 128), Image.NEAREST)
    ref = np.asarray(im)
    mine = resize(jnp.asarray(x.astype(np.int32)), size=(128, 128), method="nearest", semantics="pil")
    assert np.array_equal(np.asarray(mine), ref)


def test_resize_tokens_matches_nchw(rng):
    x = rng.randn(2, 64, 8).astype(np.float32)  # (B, 8x8 tokens, C)
    y = resize_tokens(jnp.asarray(x), (8, 8), scale_factor=2, method="bilinear")
    assert y.shape == (2, 256, 8)
    nchw = jnp.moveaxis(jnp.asarray(x).reshape(2, 8, 8, 8), -1, 1)
    ref = resize(nchw, scale_factor=2, method="bilinear")
    ref = np.asarray(jnp.moveaxis(ref, 1, -1).reshape(2, 256, 8))
    assert np.abs(np.asarray(y) - ref).max() < 1e-6


def test_bf16_input_roundtrip(rng):
    x = rng.randn(1, 1, 16, 16).astype(np.float32)
    y = resize(jnp.asarray(x, dtype=jnp.bfloat16), scale_factor=4, method="bicubic")
    assert y.dtype == jnp.bfloat16
    ref = F.interpolate(torch.from_numpy(x), scale_factor=4, mode="bicubic").numpy()
    assert np.abs(np.asarray(y, dtype=np.float32) - ref).max() < 0.05


def test_resize_tokens_integer_upsample_fast_path_parity():
    """The channels-last phase-interleave x2/x4 path must match the
    [out,in]-matrix path (same torch half-pixel taps)."""
    import jax.numpy as jnp
    from lc2is_tpu.ops.resize import resize, resize_tokens

    r = np.random.RandomState(0)
    for factor in (2, 4):
        for h, w, c in ((8, 8, 16), (7, 5, 8)):
            x = jnp.asarray(r.randn(2, h * w, c).astype(np.float32))
            got = resize_tokens(x, (h, w), scale_factor=factor, method="bilinear")
            nchw = jnp.moveaxis(x.reshape(2, h, w, c), -1, 1)
            want = jnp.moveaxis(
                resize(nchw, scale_factor=factor, method="bilinear"), 1, -1
            ).reshape(2, h * factor * w * factor, c)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)
