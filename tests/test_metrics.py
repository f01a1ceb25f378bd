"""Metric parity: per-image present-class mIoU vs a torch reference that
replicates torchmetrics ``JaccardIndex(num_classes, average='none')``
semantics + the reference's present-class masking (``metrics.py:82-102``)."""

import numpy as np
import pytest
import jax.numpy as jnp

from lc2is_tpu.metrics.gt import compute_gt_miou, segmentation_metrics
from lc2is_tpu.metrics.miou import (
    batch_confusion,
    dataset_miou,
    per_image_miou,
    pixel_accuracy,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def _torch_reference_miou(outputs, labels, n_cls=151, ignore_index=0):
    """Replicates compute_mIOU (metrics.py:82-102): bicubic x4 logits,
    nearest x4 labels, softmax->argmax, per-class IoU (absent classes 0),
    mean over label-present classes != ignore, mean over images."""
    t_out = torch.from_numpy(np.asarray(outputs))
    t_lab = torch.from_numpy(np.asarray(labels))
    all_miou = []
    for i in range(t_out.shape[0]):
        o = TF.interpolate(t_out[i : i + 1], scale_factor=4, mode="bicubic")[0]
        l = TF.interpolate(t_lab[i : i + 1, None].float(), scale_factor=4, mode="nearest")[0, 0].long()
        pred = o.softmax(0).argmax(0)
        ious = torch.zeros(n_cls)
        for c in range(n_cls):
            inter = ((pred == c) & (l == c)).sum().float()
            union = ((pred == c) | (l == c)).sum().float()
            ious[c] = inter / union if union > 0 else 0.0
        classes = l.unique()
        if ignore_index is not None:
            classes = classes[classes != ignore_index]
        all_miou.append(ious[classes.long()].mean())
    return float(torch.stack(all_miou).mean())


def test_per_image_miou_matches_torch(rng):
    n_cls = 12
    logits = rng.randn(3, n_cls, 16, 16).astype(np.float32)
    labels = rng.randint(0, n_cls, size=(3, 16, 16)).astype(np.int64)
    ref = _torch_reference_miou(logits, labels, n_cls=n_cls)
    mine = float(per_image_miou(jnp.asarray(logits), jnp.asarray(labels), num_classes=n_cls))
    assert abs(mine - ref) < 1e-6


def test_miou_ignores_background(rng):
    n_cls = 5
    logits = rng.randn(1, n_cls, 8, 8).astype(np.float32)
    labels = np.zeros((1, 8, 8), dtype=np.int64)
    labels[0, 0, 0] = 2  # one non-background class present
    mine = float(per_image_miou(jnp.asarray(logits), jnp.asarray(labels), num_classes=n_cls))
    ref = _torch_reference_miou(logits, labels, n_cls=n_cls)
    assert abs(mine - ref) < 1e-6


def test_miou_all_background_is_finite(rng):
    """Reference would produce NaN for an image whose label is 100%
    ignore_index (mean over an empty class set, metrics.py:91-97); we clamp
    to 0 so eval aggregates stay finite — documented deviation."""
    logits = rng.randn(1, 5, 8, 8).astype(np.float32)
    labels = np.zeros((1, 8, 8), dtype=np.int64)
    mine = float(per_image_miou(jnp.asarray(logits), jnp.asarray(labels), num_classes=5))
    assert mine == 0.0


def test_perfect_prediction():
    n_cls = 4
    labels = np.random.RandomState(0).randint(0, n_cls, size=(2, 12, 12)).astype(np.int64)
    logits = np.eye(n_cls, dtype=np.float32)[labels].transpose(0, 3, 1, 2) * 10
    mine = float(per_image_miou(jnp.asarray(logits), jnp.asarray(labels),
                                num_classes=n_cls, upsample_logits_to_label=False))
    assert mine == pytest.approx(1.0)


def test_pixel_accuracy(rng):
    labels = rng.randint(0, 4, size=(2, 8, 8)).astype(np.int64)
    logits = np.eye(4, dtype=np.float32)[labels].transpose(0, 3, 1, 2)
    acc = float(pixel_accuracy(jnp.asarray(logits), jnp.asarray(labels)))
    assert acc == pytest.approx(1.0)


def test_dataset_confusion_accumulates(rng):
    logits = rng.randn(4, 6, 8, 8).astype(np.float32)
    labels = rng.randint(0, 6, size=(4, 8, 8)).astype(np.int64)
    cm1 = np.asarray(batch_confusion(jnp.asarray(logits[:2]), jnp.asarray(labels[:2]), 6))
    cm2 = np.asarray(batch_confusion(jnp.asarray(logits[2:]), jnp.asarray(labels[2:]), 6))
    cm_all = np.asarray(batch_confusion(jnp.asarray(logits), jnp.asarray(labels), 6))
    assert np.array_equal(cm1 + cm2, cm_all)
    assert 0.0 <= float(dataset_miou(jnp.asarray(cm_all))) <= 1.0


def test_gt_miou_grouped_sizes(rng):
    """compute_gt_mIOU path with heterogeneous original sizes."""
    logits = rng.randn(3, 5, 8, 8).astype(np.float32)
    gt_list = [
        rng.randint(0, 5, size=(33, 47)).astype(np.int64),
        rng.randint(0, 5, size=(33, 47)).astype(np.int64),
        rng.randint(0, 5, size=(21, 21)).astype(np.int64),
    ]
    sizes = [(33, 47), (33, 47), (21, 21)]
    out = compute_gt_miou(logits, gt_list, sizes, num_classes=5)
    assert 0.0 <= out["mIOU_gt"] <= 1.0

    # parity vs per-image torch pipeline
    t_out = torch.from_numpy(logits)
    vals = []
    for i, (g, s) in enumerate(zip(gt_list, sizes)):
        o = TF.interpolate(t_out[i : i + 1], size=s, mode="bicubic")[0]
        pred = o.softmax(0).argmax(0)
        l = torch.from_numpy(g)
        ious = torch.zeros(5)
        for c in range(5):
            inter = ((pred == c) & (l == c)).sum().float()
            union = ((pred == c) | (l == c)).sum().float()
            ious[c] = inter / union if union > 0 else 0.0
        classes = l.unique()
        classes = classes[classes != 0]
        vals.append(ious[classes.long()].mean())
    ref = float(torch.stack(vals).mean())
    assert abs(out["mIOU_gt"] - ref) < 1e-5


def test_segmentation_metrics_surface(rng):
    logits = rng.randn(2, 5, 8, 8).astype(np.float32)
    labels = rng.randint(0, 5, size=(2, 8, 8)).astype(np.int64)
    m = segmentation_metrics(logits, labels)
    assert set(m.keys()) == {"mIOU_label"}
    gt = [rng.randint(0, 5, size=(16, 16)).astype(np.int64) for _ in range(2)]
    m2 = segmentation_metrics(logits, labels, gt_list=gt, sizes=[(16, 16), (16, 16)])
    assert set(m2.keys()) == {"mIOU_label", "mIOU_gt"}


def test_gt_miou_bucket_matches_exact():
    """bucket=N groups sizes into canvases but must reproduce the exact
    per-size path bit-for-bit (traced-size resize matrix + sentinel pad)."""
    from lc2is_tpu.metrics.gt import compute_gt_miou

    rng = np.random.RandomState(3)
    n, k = 5, 7
    logits = rng.randn(n, k, 8, 8).astype(np.float32)
    sizes = [(17, 23), (17, 23), (30, 14), (9, 9), (32, 32)]
    gt_list = [rng.randint(0, k, size=s).astype(np.int32) for s in sizes]

    exact = compute_gt_miou(logits, gt_list, sizes, num_classes=k)
    for bucket in (8, 16, 64):
        bucketed = compute_gt_miou(logits, gt_list, sizes, num_classes=k, bucket=bucket)
        np.testing.assert_allclose(bucketed["mIOU_gt"], exact["mIOU_gt"], atol=1e-9), bucket
