"""Engine integration tests on the 8-device CPU mesh with synthetic data.

The multi-chip story (SURVEY.md §5.8 / BASELINE config #5): batch sharded
over the ``data`` axis, params replicated, GSPMD-inserted gradient reduction.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lc2is_tpu.core.mesh import make_mesh
from lc2is_tpu.data.ade20k import SyntheticADE20K
from lc2is_tpu.data.collators import ADE20KCollator
from lc2is_tpu.data.loader import DataLoader
from lc2is_tpu.data.transforms import Compose, Resize
from lc2is_tpu.engine.engine import Engine
from lc2is_tpu.models import zoo


TINY_SWIN = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window=4)


def _tiny_model():
    return zoo.BaseCrossA(class_names=tuple(f"c{i}" for i in range(7)), dropout=0.0,
                          swin_cfg=TINY_SWIN)


def _loaders(img=64, n=16, batch=8, num_classes=7):
    # canonical v4 path: ONE transform drives image and label (dataset.py:145-149)
    # so labels come out at img_size == model output size
    tr = Compose([Resize(img)])
    ds = SyntheticADE20K(length=n, img_size=img, num_classes=num_classes, transform=tr)
    coll = ADE20KCollator()
    return (
        DataLoader(ds, batch, coll, shuffle=True, seed=0, drop_last=True),
        DataLoader(ds, batch, coll, shuffle=False, drop_last=True),
    )


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    train_loader, eval_loader = _loaders()
    mesh = make_mesh()  # 8 CPU devices
    eng = Engine(
        name="test-run",
        model=_tiny_model(),
        mesh=mesh,
        train_loader=train_loader,
        eval_loader=eval_loader,
        max_steps=4,
        max_epoch=1,
        log_step=2,
        eval_step=4,
        save_step=4,
        out_dir=str(tmp_path_factory.mktemp("exp")),
        logger="csv",
        lr=1e-3,
        num_classes=7,
        seed=1024,
    )
    return eng


def test_train_decreases_loss(engine):
    losses = []
    orig = engine._train_step
    metrics, save_path = engine.train()
    assert engine.train_step_count == 4
    assert "eval_mIOU_label" in engine.eval_metrics
    assert save_path is not None
    assert os.path.exists(os.path.join(engine.out_dir, "log.csv"))


def test_eval_metrics_range(engine):
    m = engine.evaluate()
    assert 0.0 <= m["eval_mIOU_label"] <= 1.0
    assert 0.0 <= m["eval_mIOU_dataset"] <= 1.0
    assert np.isfinite(m["eval_loss"])


def test_checkpoint_roundtrip(engine):
    engine.save()
    step = engine.train_step_count
    p_before = jax.device_get(engine.params)
    engine.train_step_count = 0
    got = engine.resume()
    assert got == step
    p_after = jax.device_get(engine.params)
    for a, b in zip(jax.tree_util.tree_leaves(p_before), jax.tree_util.tree_leaves(p_after)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_reference_pt_export(engine, tmp_path):
    """Our checkpoint must be torch-loadable (interop with reference tooling)."""
    torch = pytest.importorskip("torch")
    path = str(tmp_path / "export.pt")
    engine.save_reference_pt(path)
    sd = torch.load(path, map_location="cpu", weights_only=False)
    assert any(k.startswith("vision_encoder") for k in sd)
    assert all(hasattr(v, "numpy") for v in sd.values())


@pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
def test_training_moves_loss(tmp_path):
    """Loss decreases on an overfit-one-batch task (the reference's de-facto
    integration test is the 64-image overfit run, SURVEY.md §4)."""
    train_loader, _ = _loaders(n=8, batch=8)
    eng = Engine(
        name="overfit",
        model=_tiny_model(),
        mesh=make_mesh(),
        train_loader=train_loader,
        max_steps=6,
        log_step=100,
        eval_step=10 ** 9,
        save_step=10 ** 9,
        out_dir=str(tmp_path),
        logger="null",
        lr=3e-3,
        num_classes=7,
    )
    losses = []
    for data in [next(iter(train_loader))] * 6:
        inputs = dict(data[0])
        labels = jnp.asarray(inputs.pop("label"))
        inputs = eng._cast(inputs)
        eng.rng, r = jax.random.split(eng.rng)
        eng.params, eng.opt_state, l = eng._train_step(eng.params, eng.opt_state, inputs, labels, r)
        losses.append(float(l["train_loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
def test_engine_fused_loss_path_matches_unfused(tmp_path, monkeypatch):
    """With LC2IS_PALLAS_INTERPRET=1 the engine's default-loss fast path
    (low-res score map + fused upsample+CE) must produce the same first-step
    train loss as the unfused engine."""
    def mk_engine(out_dir):
        train_loader, eval_loader = _loaders(n=8, batch=8)
        return Engine(
            name="fused-loss", model=_tiny_model(), mesh=make_mesh(),
            train_loader=train_loader, eval_loader=eval_loader,
            max_steps=1, max_epoch=1, log_step=1, eval_step=100, save_step=100,
            out_dir=out_dir, logger="null", lr=1e-3, seed=3,
        )

    eng_plain = mk_engine(str(tmp_path / "a"))
    assert not eng_plain._train_uses_fused_loss
    monkeypatch.setenv("LC2IS_PALLAS_INTERPRET", "1")
    eng_fused = mk_engine(str(tmp_path / "b"))
    assert eng_fused._train_uses_fused_loss

    m_plain, _ = eng_plain.train()
    m_fused, _ = eng_fused.train()
    assert abs(m_plain["train_loss"] - m_fused["train_loss"]) < 1e-4, (m_plain, m_fused)


@pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
def test_engine_tp_mesh_matches_dp(tmp_path):
    """Engine on a (4,2) TP mesh reproduces the (8,1) DP engine: params are
    megatron-placed (parallel/sharding.py) and optimizer moments inherit the
    param shardings — numerics must not change (TP is a layout choice)."""
    results = {}
    for tag, (d, m) in {"dp": (8, 1), "tp": (4, 2)}.items():
        train_loader, eval_loader = _loaders()
        eng = Engine(
            name=f"tp-{tag}", model=_tiny_model(), mesh=make_mesh(data=d, model=m),
            train_loader=train_loader, eval_loader=eval_loader,
            max_steps=2, max_epoch=1, log_step=10, eval_step=10, save_step=10,
            out_dir=str(tmp_path), logger="null", lr=1e-4, num_classes=7,
            seed=1024, progress=False,
        )
        eng.train()
        results[tag] = jax.device_get(eng.params)
    if "tp" in results:
        flat_dp = jax.tree_util.tree_leaves(results["dp"])
        flat_tp = jax.tree_util.tree_leaves(results["tp"])
        # tolerance is the ANALYTIC bound, not a measured constant: on a
        # near-zero-grad param AdamW's m/(sqrt(v)+eps) is reduction-order
        # noise of either sign, so TP and DP can each move such an element
        # by up to ~lr per step in opposite directions -> |diff| <= 2*steps*lr
        # = 4e-4 here (measured worst case 2.2e-4 on 1 of 2048 elements;
        # every other element matches at <1e-5)
        for a, b in zip(flat_dp, flat_tp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2 * 2 * 1e-4 * 1.25, rtol=2e-4)
