"""Config overrides + on-device-vs-host preprocessing parity."""

import numpy as np
import pytest
import jax.numpy as jnp

from lc2is_tpu.core.config import Config, apply_overrides
from lc2is_tpu.data.collators import _clip_image_batch, _label_batch
from lc2is_tpu.data.preprocess import preprocess_batch


def test_apply_overrides():
    cfg = Config()
    apply_overrides(cfg, [
        "data.img_size=640", "train.lr=0.001", "model.dropout=0.1",
        "train.fp16=true", "model.dec_depth=[2,2,2]", "mesh.model=2",
    ])
    assert cfg.data.img_size == 640
    assert cfg.train.lr == pytest.approx(1e-3)
    assert cfg.model.dropout == pytest.approx(0.1)
    assert cfg.train.fp16 is True
    assert cfg.model.dec_depth == [2, 2, 2]
    assert cfg.mesh.model == 2


def test_on_device_preprocess_matches_host(rng):
    """The jit preprocess stage vs the host collator path (HF extractor
    semantics): same shortest-edge bicubic + crop + CLIP normalize.

    Geometry chosen tie-free: when (i+0.5)*in/out lands exactly on an
    integer, PIL's double rounding can pick the other neighbor (e.g. 96x128
    -> 32: column 21 maps to exactly 64.0).  The reference's canonical
    configs are 4:1/2:1 ratios with no ties."""
    imgs = (rng.rand(2, 3, 128, 192) * 255).astype(np.float32)
    labels = rng.randint(0, 151, size=(2, 128, 192)).astype(np.int32)

    dev_x, dev_y = preprocess_batch(jnp.asarray(imgs), jnp.asarray(labels),
                                    img_size=64, label_size=32, stats="clip")
    host_x = _clip_image_batch([im.astype(np.uint8) for im in imgs.astype(np.uint8)], 64)
    host_y = _label_batch([l.astype(np.uint8) for l in labels.astype(np.uint8)], 32)

    # image path: both use PIL-semantics bicubic; host goes through actual
    # PIL (uint8 fixed point) so allow small quantisation differences
    d = np.abs(np.asarray(dev_x) - host_x)
    assert d.max() < 0.15  # ~2-3 uint8 LSB after normalization
    assert (d > 0.05).mean() < 0.05
    # label path: nearest must agree exactly
    assert np.array_equal(np.asarray(dev_y), host_y)
