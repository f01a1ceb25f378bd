"""Torch-free .pt reader/writer vs torch itself + reference assets."""

import os

import numpy as np
import pytest

from lc2is_tpu.core.pt_io import load_pt, save_pt
from lc2is_tpu.core.torch_import import (
    params_to_state_dict,
    state_dict_to_params,
    torch_key_to_flax_path,
)

torch = pytest.importorskip("torch")

REF_PROTOS = "/root/reference/model/ade20k_prototypes.pt"


@pytest.mark.skipif(not os.path.exists(REF_PROTOS), reason="reference asset absent")
def test_reference_prototypes_bit_exact():
    mine = load_pt(REF_PROTOS)
    ref = torch.load(REF_PROTOS, map_location="cpu", weights_only=False).numpy()
    assert mine.shape == (151, 512) and mine.dtype == np.float32
    assert np.array_equal(mine, ref)


def test_roundtrip_through_torch(tmp_path, rng):
    d = {
        "a.weight": rng.randn(3, 4).astype(np.float32),
        "b.bias": np.arange(7, dtype=np.int64),
        "c": rng.randn(2, 2, 2).astype(np.float32).transpose(2, 0, 1),  # non-contiguous
    }
    p = str(tmp_path / "x.pt")
    save_pt(d, p)
    back_torch = torch.load(p, map_location="cpu", weights_only=False)
    back_mine = load_pt(p)
    for k in d:
        assert np.array_equal(back_torch[k].numpy(), d[k]), k
        assert np.array_equal(back_mine[k], d[k]), k


def test_read_torch_written(tmp_path, rng):
    d = {"w": torch.randn(5, 6), "scalar_like": torch.arange(3)}
    p = str(tmp_path / "t.pt")
    torch.save(d, p)
    back = load_pt(p)
    for k, v in d.items():
        assert np.array_equal(back[k], v.numpy()), k


def test_bf16_storage(tmp_path):
    d = {"w": torch.randn(4, 4, dtype=torch.bfloat16)}
    p = str(tmp_path / "bf.pt")
    torch.save(d, p)
    back = load_pt(p)  # widened to fp32
    assert back["w"].dtype == np.float32
    assert np.array_equal(back["w"], d["w"].float().numpy())


def test_key_translation_roundtrip():
    assert torch_key_to_flax_path("layers.0.self_attn.in_proj_weight") == [
        "layers_0", "self_attn", "in_proj_weight"
    ]
    sd = {"layers.0.linear1.weight": np.zeros((2, 2)), "norm1.bias": np.ones((2,))}
    tree = state_dict_to_params(sd)
    back = params_to_state_dict(tree)
    assert set(back.keys()) == set(sd.keys())
    for k in sd:
        assert np.array_equal(back[k], sd[k])
