"""HF checkpoint -> flax params mapping for CLIP and Swin backbones.

The reference pulls ``openai/clip-vit-base-patch16`` and
``microsoft/swin-small-patch4-window7-224`` from the HF hub
(``model/encoder.py:19,96,126``; swin-base at ``model/ftn.py:12``).  Here a
torch ``state_dict`` (read torch-free via core.pt_io.load_pt, or from a live
transformers model in tests) is renamed into our flax module tree.

Includes the position-embedding bicubic interpolation applied at load time
when ``in_size != 224`` (``model/encoder.py:24-27,32-44``).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional

import numpy as np

from lc2is_tpu.core.torch_import import state_dict_to_params
from lc2is_tpu.nn.clip import interpolate_position_embedding

_LAYERS = re.compile(r"encoder\.layers\.(\d+)\.")


def _clip_rename(key: str, prefix: str) -> Optional[str]:
    if not key.startswith(prefix):
        return None
    k = key[len(prefix):]
    if k.endswith("position_ids"):
        return None
    k = _LAYERS.sub(lambda m: f"encoder_layers_{m.group(1)}.", k)
    k = k.replace("embeddings.patch_embedding.weight", "embeddings.patch_embedding")
    k = k.replace("embeddings.position_embedding.weight", "embeddings.position_embedding")
    k = k.replace("embeddings.token_embedding.", "token_embedding.")
    # text positions: embeddings.position_embedding.weight already rewritten
    if k.startswith("embeddings.position_embedding") and prefix == "text_model.":
        k = k.replace("embeddings.position_embedding", "position_embedding.weight")
    return k


def load_clip_vision_params(
    state_dict: Mapping[str, np.ndarray], in_size: int = 224, patch_size: int = 16
) -> Dict:
    """Accepts a CLIPVisionModel (or full CLIPModel) state_dict."""
    params = state_dict_to_params(
        state_dict, rename=lambda k: _clip_rename(k, "vision_model."), sr_fix=False
    )
    if in_size != 224:
        pos = params["embeddings"]["position_embedding"]
        params["embeddings"]["position_embedding"] = interpolate_position_embedding(
            np.asarray(pos), patch_size, in_size
        )
    return params


def load_clip_text_params(state_dict: Mapping[str, np.ndarray]) -> Dict:
    def rn(k):
        k2 = _clip_rename(k, "text_model.")
        return k2

    return state_dict_to_params(state_dict, rename=rn, sr_fix=False)


_SWIN_BLOCK = re.compile(r"encoder\.layers\.(\d+)\.blocks\.(\d+)\.")
_SWIN_DS = re.compile(r"encoder\.layers\.(\d+)\.downsample\.")


def _swin_rename(key: str) -> Optional[str]:
    k = key
    if k.startswith("swin."):
        k = k[len("swin."):]
    if "relative_position_index" in k or k.startswith("pooler"):
        return None
    if k.startswith("embeddings.patch_embeddings.projection.weight"):
        return "patch_proj.projection"
    if k.startswith("embeddings.patch_embeddings.projection.bias"):
        return "patch_proj.projection_bias"
    if k.startswith("embeddings.norm."):
        return k.replace("embeddings.norm.", "embed_norm.")
    if k.startswith("embeddings.position_embeddings"):
        return None  # absolute embeddings unused by the reference checkpoints
    k = _SWIN_BLOCK.sub(lambda m: f"stages_{m.group(1)}.blocks_{m.group(2)}.", k)
    k = _SWIN_DS.sub(lambda m: f"stages_{m.group(1)}.downsample_mod.", k)
    k = k.replace("attention.self.", "attention.self_.")
    return k


def load_swin_params(state_dict: Mapping[str, np.ndarray]) -> Dict:
    return state_dict_to_params(state_dict, rename=_swin_rename, sr_fix=False)


def load_base_model_with_text_params(
    state_dict: Mapping[str, np.ndarray], in_size: int = 224, patch_size: int = 16
) -> Dict:
    """Import a full reference ``BaseModelWithText`` checkpoint
    (``torch.save(model.state_dict())`` — the evaluate.sh ``step-400.pt``
    shape): splits the flat dict by the reference submodule prefixes
    (``model/model.py:20-25``) and routes each through the matching mapper."""
    vis_sd = {k[len("vision_encoder.enc."):]: v for k, v in state_dict.items()
              if k.startswith("vision_encoder.enc.")}
    txt_sd = {k[len("text_encoder.enc."):]: v for k, v in state_dict.items()
              if k.startswith("text_encoder.enc.")}
    params: Dict = {
        # NOTE: reference checkpoints already carry interpolated pos-embs when
        # trained at in_size != 224 (interpolation happens at ctor time,
        # encoder.py:24-27), so in_size here describes the CHECKPOINT's size.
        "vision_encoder": load_clip_vision_params(vis_sd, in_size=in_size, patch_size=patch_size),
        "text_encoder": load_clip_text_params(txt_sd),
    }
    rest = {
        k: v for k, v in state_dict.items()
        if not (k.startswith("vision_encoder.") or k.startswith("text_encoder."))
    }
    tail = state_dict_to_params(rest, sr_fix=False)
    if "class_prototypes" in tail:
        params["class_prototypes"] = tail["class_prototypes"]
    if "vision_decoder" in tail:
        params["vision_decoder"] = tail["vision_decoder"]
    if "pixel_patch" in tail:
        params["pixel_patch"] = tail["pixel_patch"]
    return params
