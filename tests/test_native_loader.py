"""Native C++ loader vs PIL (decode correctness, shapes, threading)."""

import os

import numpy as np
import pytest
from PIL import Image

from lc2is_tpu.data.native_loader import (
    NativeADE20KBatcher,
    decode_resize_batch,
    native_available,
)


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    jpgs, pngs = [], []
    for i in range(6):
        arr = (rng.rand(200 + i * 10, 300, 3) * 255).astype(np.uint8)
        p = str(tmp / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        jpgs.append(p)
        lab = rng.randint(0, 151, (150 + i * 5, 200)).astype(np.uint8)
        q = str(tmp / f"lab{i}.png")
        Image.fromarray(lab).save(q)
        pngs.append(q)
    return jpgs, pngs


def test_native_builds():
    assert native_available(), "native loader .so should build in this image"


def test_batch_shapes(image_files):
    jpgs, pngs = image_files
    imgs = decode_resize_batch(jpgs, (128, 128), 3, nearest=False, num_threads=4)
    assert imgs.shape == (6, 128, 128, 3) and imgs.dtype == np.uint8
    labs = decode_resize_batch(pngs, (64, 64), 1, nearest=True, num_threads=4)
    assert labs.shape == (6, 64, 64, 1)


def test_label_nearest_preserves_ids(image_files):
    """Nearest label resize must never invent class ids."""
    _, pngs = image_files
    orig = np.asarray(Image.open(pngs[0]))
    labs = decode_resize_batch(pngs[:1], (64, 64), 1, nearest=True)
    assert set(np.unique(labs)).issubset(set(np.unique(orig)))


def test_native_matches_pil_decode(image_files, tmp_path):
    """Raw decode parity on a lossless PNG (JPEG decoders may differ by IDCT
    rounding; PNG must be exact)."""
    rng = np.random.RandomState(1)
    arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    out = decode_resize_batch([p], (64, 64), 3, nearest=True)
    assert np.array_equal(out[0], arr)


def test_missing_file_raises(tmp_path):
    if not native_available():
        pytest.skip("native lib unavailable")
    with pytest.raises(IOError):
        decode_resize_batch([str(tmp_path / "nope.jpg")], (32, 32), 3)


def test_batcher(image_files):
    jpgs, pngs = image_files
    b = NativeADE20KBatcher(img_size=96, label_size=48)
    pix, lab = b(jpgs[:4], pngs[:4])
    assert pix.shape == (4, 3, 96, 96)
    assert lab.shape == (4, 48, 48) and lab.dtype == np.int32
