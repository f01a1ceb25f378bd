"""LC2IS-TPU: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the LC2IS
language-guided semantic-segmentation framework.

The capability surface mirrors the reference AntoineBlanot/LC2IS (see SURVEY.md):
open-vocabulary semantic segmentation on ADE20K with CLIP/Swin backbones,
cross-attention decoders and per-pixel cosine classification — redesigned
TPU-first: pure-functional flax modules, jitted train/eval steps over a
`jax.sharding.Mesh`, Pallas flash-attention for the hot kernels, and bf16 by
default.
"""

__version__ = "0.1.0"
