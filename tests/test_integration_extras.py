"""Integration extras: v1 model + text collator through the Engine,
weight-tying flag off, dropout training mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lc2is_tpu.core.mesh import make_mesh
from lc2is_tpu.data.loader import DataLoader
from lc2is_tpu.engine.engine import Engine
from lc2is_tpu.models import zoo


class TinyTextDataset:
    """Synthetic dataset with the (inputs, metas) contract plus text ids,
    feeding a v1-style model directly (collator output pre-built)."""

    def __init__(self, n=8, img=32, num_classes=151):
        self.n = n
        self.img = img
        self.num_classes = num_classes

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        img = rng.rand(1, 3, self.img, self.img).astype(np.float32)
        label = rng.randint(0, self.num_classes, size=(1, self.img // 4, self.img // 4)).astype(np.int64)
        ids = np.zeros((1, 12), np.int64)
        ids[0, 0] = 998  # BOS within the tiny test vocab (jnp.take NaN-fills OOB ids)
        ids[0, 1:6] = rng.randint(1, 900, size=5)
        ids[0, 6] = 999
        mask = (ids != 0).astype(np.int64)
        return img, label, ids, mask


def _collate(items):
    img = np.concatenate([i[0] for i in items])
    label = np.concatenate([i[1] for i in items])
    ids = np.concatenate([i[2] for i in items])
    mask = np.concatenate([i[3] for i in items])
    return dict(pixel_values=img, label=label, input_ids=ids, attention_mask=mask), None


def test_engine_trains_v1_with_text(tmp_path):
    """v1 BaseModelWithText (tuple-returning + text inputs) end-to-end in the
    Engine — exercises _normalize_output and the text input plumbing."""
    model = zoo.BaseModelWithText(
        in_size=32, out_size=8, patch_size=16, dropout=0.0, nhead=2,
        vision_kwargs=dict(hidden_size=32, num_layers=1, num_heads=2, mlp_dim=64),
        text_kwargs=dict(vocab_size=1000, hidden_size=16, num_layers=1,
                         num_heads=2, mlp_dim=32, eos_token_id=999),
    )
    loader = DataLoader(TinyTextDataset(), 8, _collate, drop_last=True)
    eng = Engine(
        name="v1", model=model, mesh=make_mesh(), train_loader=loader,
        max_steps=2, log_step=10, eval_step=10 ** 9, save_step=10 ** 9,
        out_dir=str(tmp_path), logger="null", lr=1e-3, num_classes=151,
    )
    metrics, _ = eng.train()
    assert eng.train_step_count == 2
    assert all(np.isfinite(v) for v in eng.all_train_metrics.get("train_loss", [0.0]))


def test_untied_block_weights(rng):
    """tie_block_weights=False creates depth distinct layers (the fixed
    version of the hierarchical.py:137,157 quirk)."""
    from lc2is_tpu.nn.decoders import SelfABlock

    x = jnp.asarray(rng.randn(1, 16, 32).astype(np.float32))
    tied = SelfABlock(d_model=32, nhead=2, depth=2, dropout=0.0, tie_weights=True)
    untied = SelfABlock(d_model=32, nhead=2, depth=2, dropout=0.0, tie_weights=False)
    pt = tied.init(jax.random.PRNGKey(0), x)["params"]
    pu = untied.init(jax.random.PRNGKey(0), x)["params"]
    assert set(pt.keys()) == {"layers_0"}
    assert set(pu.keys()) == {"layers_0", "layers_1"}


def test_dropout_training_mode(rng):
    """deterministic=False with dropout>0 needs the dropout rng and must
    produce stochastic outputs."""
    from lc2is_tpu.nn.layers import TransformerEncoderLayer

    x = jnp.asarray(rng.randn(2, 8, 32).astype(np.float32))
    layer = TransformerEncoderLayer(d_model=32, nhead=2, dim_feedforward=64, dropout=0.5)
    params = layer.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                        x, deterministic=False)
    y1 = layer.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = layer.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)})
    y3 = layer.apply(params, x, deterministic=True)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    assert np.allclose(np.asarray(y3), np.asarray(layer.apply(params, x, deterministic=True)))
